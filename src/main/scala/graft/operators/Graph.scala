package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph centrality — the PageRank quality signal web-scale corpus
  * curation attaches to documents (the public practice: Common Crawl
  * ranks its host graph by centrality, and harmonic/PageRank centrality
  * is a standard quality prior for pretraining-corpus filtering; Page et
  * al. 1999 for the algorithm).
  *
  * EXACT INTEGER arithmetic end to end: ranks live in micro-units
  * (1e6 = mass 1.0) as BIGINTs; each round distributes `rank div
  * outdeg` along every edge (floor division — positive operands, so
  * Spark's `div` and an oracle's floor-div agree bit-for-bit) and
  * re-bases as `teleport + (damp · inflow) div 1000` with damp = 850/1000.
  * No floats anywhere — a SQL oracle unrolling the same rounds derives
  * identical BIGINTs at any scale, partitioning, or engine.
  *
  * Semantics (documented simplifications, both deterministic):
  * dangling nodes (no out-edges) do not redistribute their mass — it
  * decays (the standard "lost mass" variant); parallel edges each carry
  * a share (outdeg counts edge multiplicity). Self-loops are the
  * caller's choice — filter them edge-side if unwanted.
  *
  * Scale shape: the per-round plan is the Pregel floor — one join of
  * the (static, pre-degreed, checkpointed) edge frame with the current
  * rank frame on src, one map-side-combined SUM by dst, one left join
  * back to the node set for teleport-only nodes. Rounds are
  * checkpoint-stepped (eager localCheckpoint, previous round freed) so
  * lineage and estimated stats stay flat — the [[Ann.kmeans]]
  * discipline. Edges never move after the one degree join; only the
  * O(nodes) rank frame shuffles per round.
  */
object Graph {

  /** Fixed-round PageRank over `edges` (srcCol, dstCol) and the node
    * universe `nodes` (idCol — nodes with no edges still rank: teleport
    * mass). Teleport is `initMicro · (1000 − dampMilli) div 1000` per
    * node per round. Returns (idCol, rank_micro BIGINT). Result is an
    * eager checkpoint; release via [[Curate.release]]. */
  def pageRank(edges: DataFrame, nodes: DataFrame, idCol: String,
      srcCol: String, dstCol: String, iters: Int,
      dampMilli: Long = 850L, initMicro: Long = 1000000L): DataFrame = {
    require(iters >= 0, s"iters must be non-negative, got $iters")
    require(dampMilli >= 0L && dampMilli <= 1000L,
      s"dampMilli must be in [0, 1000], got $dampMilli")
    val teleport = initMicro * (1000L - dampMilli) / 1000L
    val ids = nodes.select(col(idCol)).distinct().localCheckpoint(true)
    // degree the edge frame ONCE; it never changes across rounds
    val deg = edges.groupBy(col(srcCol)).agg(count(lit(1)).as("__deg"))
    val degEdges = edges.select(col(srcCol), col(dstCol))
      .join(deg, srcCol)
      .localCheckpoint(true)
    var ranks = ids.withColumn("rank_micro", lit(initMicro)).localCheckpoint(true)
    try {
      for (_ <- 1 to iters) {
        val inflow = degEdges
          .join(ranks.withColumnRenamed(idCol, srcCol), srcCol)
          .select(col(dstCol).as(idCol),
            // INTEGER division (div, not /): `/` is double division and
            // a float quotient has no place in an exact-replay contract
            expr("rank_micro div __deg").as("__c"))
          .groupBy(col(idCol))
          .agg(sum(col("__c")).as("__in"))
        val next = ids.join(inflow, Seq(idCol), "left_outer")
          .select(col(idCol),
            expr(s"$teleport + ($dampMilli * coalesce(__in, 0)) div 1000")
              .cast("long").as("rank_micro"))
          .localCheckpoint(true)
        NearDup.freeCheckpoint(ranks)
        ranks = next
      }
      ranks
    } catch { case e: Throwable => NearDup.freeCheckpoint(ranks); throw e }
    finally {
      NearDup.freeCheckpoint(degEdges)
      NearDup.freeCheckpoint(ids)
    }
  }
}
