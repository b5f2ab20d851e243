package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Benchmark decontamination: find corpus documents that share word
  * n-grams with an evaluation/benchmark set — the standard train/test
  * overlap check a training-data pipeline runs before every data release
  * (exact n-gram collision, the approach published for GPT-3/PaLM-class
  * dataset reports and open reproductions such as Dolma/RedPajama).
  *
  * Scale shape (the whole point of the operator):
  *   - The benchmark side is SMALL (eval suites are thousands of
  *     documents → at most a few hundred MB of distinct gram hashes),
  *     so its distinct gram set is **broadcast** — the corpus is pruned
  *     map-side with zero corpus-sized shuffle.
  *   - Corpus grams are deduped **within the row** (`array_distinct`
  *     before `explode`) — per-document distinctness costs nothing and
  *     the later `count(*)` per document IS the distinct-overlap count,
  *     no `countDistinct` Expand needed.
  *   - The only shuffle is the final per-document hit count, a
  *     partial-aggregatable `count` over rows already filtered down to
  *     actual collisions (normally a vanishing fraction of the corpus).
  *   At 100 TB this is: scan corpus → hash grams in-row → broadcast-hash
  *   probe → tiny aggregate. Nothing corpus-sized ever moves.
  *
  * Grams are md5 hex hashes of [[Text.normalize]]d, space-joined token
  * n-grams — same canonicalization as the MinHash/winnowing family
  * (reference behavior: `/root/reference/etl_sales_analytics.py` has no
  * dedup at all; this is part of the §2.8b pipeline surface).
  */
object Decontam {

  /** Distinct hashed word n-grams per document: (idCol, gram_hash).
    * Dedup happens inside the row (NearDup.shingleArrays' array_distinct,
    * which also projects the token array so the shingle lambda doesn't
    * re-evaluate the normalize chain per element) — a pure projection,
    * NO shuffle; documents shorter than `n` tokens contribute no rows. */
  def ngramHashes(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    // hash AFTER the explode, not inside a transform() lambda over the
    // array: the exploded md5 is whole-stage-codegen'd, a HOF lambda is
    // interpreted — same rows either way since the shingle array is
    // already per-doc distinct (and shingleSets carries the
    // explode_outer guard against the inferred-filter pitfall)
    // Par.spread: tokenize+shingle+md5 is the dense map; the overlap
    // counts downstream are exact integers
    NearDup.shingleSets(Par.spread(df), idCol, textCol, n)
      .select(col(idCol), md5(col("shingle").cast("binary")).as("gram_hash"))

  /** Corpus documents sharing at least `minHits` DISTINCT n-gram hashes
    * with any document of `bench`. Returns (idCol, hits) where `hits`
    * is the exact distinct-overlap count, one row per flagged document.
    *
    * The benchmark gram set is deduped across its documents (it is the
    * small side — that distinct is cheap) and broadcast; corpus rows
    * that survive the broadcast hash probe are counted per document.
    * Exactness: per-document grams are already distinct
    * ([[ngramHashes]]), so `count(*)` after the inner probe equals the
    * number of distinct shared grams — by construction, no
    * approximation and no second dedup pass. */
  def contamination(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int, minHits: Long): DataFrame = {
    require(minHits >= 1, s"minHits must be >= 1, got $minHits")
    val corpusGrams = ngramHashes(corpus, idCol, textCol, n)
    val benchGrams = ngramHashes(bench, idCol, textCol, n)
      .select("gram_hash").distinct()
    corpusGrams
      .join(broadcast(benchGrams), Seq("gram_hash"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("hits"))
      .filter(col("hits") >= minHits)
  }
}
