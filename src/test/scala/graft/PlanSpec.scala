package graft

import org.apache.spark.sql.DataFrame

import graft.queries.{DocQueries, EtlQueries, OlapQueries, SalesQueries, VectorQueries}

/** Plan-shape regression guards: the optimizations the engine claims
  * (pushdown, pruning, broadcast, top-k, partial aggregation) must be
  * visible in the executed plan, not just asserted in comments. A change
  * that silently degrades one of these shapes fails here long before a
  * benchmark would catch it. */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(df: DataFrame): String = {
    df.collect() // let AQE finalize before reading the plan
    df.queryExecution.executedPlan.toString
  }

  test("etl_filter_project pushes predicates into the parquet scan") {
    val plan = planOf(EtlQueries.filterProject(spark, dir))
    assert(plan.contains("PushedFilters: ["))
    assert(plan.contains("GreaterThan(l_quantity"))
    assert(plan.contains("IsNotNull(l_quantity)"))
  }

  test("doc_quality scan is pruned to (doc_id, text)") {
    val plan = planOf(DocQueries.docQuality(spark, dir))
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"))
  }

  test("q05 top-k plans TakeOrderedAndProject over a broadcast dim join") {
    val plan = planOf(SalesQueries.q05TopProducts(spark, dir))
    assert(plan.contains("TakeOrderedAndProject"))
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("q11 scalar pick stays a broadcast join, no driver collect") {
    val plan = planOf(SalesQueries.q11LatestOrderDetail(spark, dir))
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("dedupeKeepLastAgg aggregates partially before the shuffle") {
    val plan = planOf(EtlQueries.dedupeKeepLastAgg(spark, dir))
    assert(plan.contains("partial_max_by") || plan.contains("partial max_by")
      || "HashAggregate".r.findAllIn(plan).size >= 2)
  }

  test("doc_lang_id expression tree stays codegen-sized") {
    // The when-fold form of langId grew quadratically in the language
    // count and blew Janino's 64KB method limit (whole stage silently
    // dropped to interpreted eval). Guard the tree size, not the plan
    // string: the codegen fallback happens at runtime, after the plan
    // would already have printed a codegen'd stage.
    val df = DocQueries.docLangId(spark, dir)
    val nodes = df.queryExecution.optimizedPlan.expressions
      .map(_.collect { case e => e }.size).sum
    assert(nodes < 1500, s"lang_id expression tree has $nodes nodes")
  }

  test("emb_knn_lsh selects through the map-side bounded top-k aggregate") {
    val plan = planOf(VectorQueries.embKnnLsh(spark, dir))
    assert(plan.contains("partial_graft_topk_by_score")
      || "ObjectHashAggregate".r.findAllIn(plan).size >= 2)
    assert(!plan.contains("CartesianProduct"))
  }

  test("emb_knn_lsh_mp selects through the map-side bounded top-k aggregate") {
    val plan = planOf(VectorQueries.embKnnLshMp(spark, dir))
    assert(plan.contains("partial_graft_topk_by_score")
      || "ObjectHashAggregate".r.findAllIn(plan).size >= 2)
    assert(!plan.contains("CartesianProduct"))
  }

  test("q21 per-group top-k aggregates partially before the shuffle") {
    val plan = planOf(OlapQueries.q21TopPerGroup(spark, dir))
    assert(plan.contains("partial_graft_topk_by_score")
      || plan.contains("partial graft_topk_by_score"), plan)
  }

  test("q22 frequent items aggregates partially before the shuffle") {
    val plan = planOf(OlapQueries.q22FreqPriorities(spark, dir))
    assert(plan.contains("partial_graft_freq_items")
      || plan.contains("partial graft_freq_items"), plan)
  }

  test("bloom semi-join probes before the join and never goes cartesian") {
    val plan = planOf(EtlQueries.bloomSemi(spark, dir))
    assert(plan.contains("might_contain"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // the probe must sit BELOW the join: on the streamed (fact) side,
    // not applied to the join output
    val probeLine = plan.linesIterator.indexWhere(_.contains("might_contain"))
    val joinLine = plan.linesIterator.indexWhere(_.contains("Join"))
    assert(joinLine >= 0 && probeLine > joinLine,
      s"expected the bloom probe under the join:\n$plan")
  }

  test("q25 value buckets plan has no Window and broadcasts the cut points") {
    // the whole point of the operator: NTILE-equivalent banding WITHOUT
    // the single-partition global-sort window
    val plan = planOf(OlapQueries.q25ValueBuckets(spark, dir))
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"), plan)
  }

  test("doc_tfidf computes df without a countDistinct Expand") {
    val plan = planOf(DocQueries.docTfidf(spark, dir))
    assert(!plan.contains("Expand"), plan)
  }

  test("events_funnel reuses the user_id partitioning across its joins") {
    // every aggregate/join keys on user_id: once AQE finalizes, at least
    // one exchange must be reused rather than re-shuffled, and nothing
    // may go cartesian
    val plan = planOf(graft.queries.EventQueries.eventsFunnel(spark, dir))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage")
      || "Exchange hashpartitioning\\(user_id".r.findAllIn(plan).size <= 4, plan)
  }

  test("events_pattern plans keyed joins only; the negation is an ANTI join") {
    val plan = planOf(graft.queries.EventQueries.eventsPattern(spark, dir))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("LeftAnti"), plan)
  }

  test("etl_apply_cdc plans keyed joins only: no cartesian, no nested loop") {
    val plan = planOf(EtlQueries.applyCdcOrders(spark, dir))
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // the delete branch must be an ANTI join, the upsert a FULL outer
    assert(plan.contains("LeftAnti"), plan)
    assert(plan.contains("FullOuter"), plan)
  }

  test("emb_knn_filtered keeps the candidate filter below the bucket join") {
    val plan = planOf(VectorQueries.embKnnFiltered(spark, dir))
    assert(!plan.contains("CartesianProduct"), plan)
    // selection still runs through the map-side bounded top-k aggregate
    assert(plan.contains("partial_graft_topk") || plan.contains("partial graft_topk"), plan)
    // the label predicate is applied under the join (on the candidate
    // scan side), not to the joined output
    val joinLine = plan.linesIterator.indexWhere(l =>
      l.contains("BroadcastHashJoin") || l.contains("SortMergeJoin"))
    val filterLine = plan.linesIterator.zipWithIndex
      .collectFirst { case (l, i) if l.contains("(label") => i }.getOrElse(-1)
    assert(joinLine >= 0 && filterLine > joinLine,
      s"expected the label filter under the bucket join:\n$plan")
  }

  test("salted join result is row-identical to the plain join") {
    val salted = EtlQueries.saltedJoin(spark, dir).collect().map(_.toSeq).toSeq
    val l = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_linenumber", "l_quantity")
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_custkey")
    val plain = l.join(o, l("l_orderkey") === o("o_orderkey"))
      .select("l_orderkey", "l_partkey", "l_linenumber", "l_quantity", "o_custkey")
      .orderBy("l_orderkey", "l_partkey", "l_linenumber", "l_quantity")
      .collect().map(_.toSeq).toSeq
    assert(salted == plain)
  }

  test("emb_knn_pq plans equi-joins only: no cartesian, codes never windowed") {
    // the gated query checkpoints its result (to free the codebooks), so
    // assert on the raw operator pipeline the checkpoint materializes
    import org.apache.spark.sql.functions.col
    import graft.operators.{Ann, NearDup}
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val cbs = Ann.pqCodebooks(emb, "vec_id", "embedding", dim = 64, m = 4, k = 4, iters = 1)
    try {
      val plan = planOf(Ann.knnPq(emb, "vec_id", "embedding", cbs, dim = 64, m = 4,
        col("vec_id") < 5, k = 5))
      assert(!plan.contains("CartesianProduct"), plan)
      // ADC selection runs through the map-side bounded top-k aggregate,
      // not a corpus-wide ranking window
      assert(plan.contains("partial_graft_topk") || plan.contains("partial graft_topk"), plan)
      // encode/ADC joins broadcast the small side (codebook / tables)
      assert(plan.contains("BroadcastHashJoin"), plan)
    } finally NearDup.freeCheckpoint(cbs)
  }

  test("emb_semdedup pairs meet in a cluster equi-join, never all-pairs") {
    // semDedup returns an eager checkpoint, so its interesting plan runs
    // INSIDE the call — capture every materialized plan via the QE
    // listener and assert on the final (kept-producing) one
    val plans = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        plans.add(qe.executedPlan.toString)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      graft.operators.Curate.release(VectorQueries.embSemDedup(spark, dir))
      val deadline = System.currentTimeMillis() + 20000
      def finalPlan() = {
        import scala.jdk.CollectionConverters._
        plans.asScala.find(_.contains("kept"))
      }
      while (finalPlan().isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      val plan = finalPlan().getOrElse(fail("no kept-producing plan captured"))
      // the corpus×corpus pair generation is an equi-join on the cluster
      // id: hash/merge join only — no cartesian, no nested loop
      assert(!plan.contains("CartesianProduct"), plan)
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(plan.contains("Join"), plan)
    } finally spark.listenerManager.unregister(listener)
  }

  test("doc_bm25 selects through TakeOrderedAndProject with one stats broadcast") {
    val plan = planOf(DocQueries.docBm25(spark, dir))
    // bounded head — no corpus-wide ranking window before the limit
    assert(plan.contains("TakeOrderedAndProject"), plan)
    // the corpus stats row arrives by broadcast, not a shuffled join
    assert(plan.contains("BroadcastNestedLoopJoin BuildRight, Cross")
      || plan.contains("BroadcastHashJoin"), plan)
  }

  test("doc_lm_score aggregates partially before its per-doc shuffle") {
    val plan = planOf(DocQueries.docLmScore(spark, dir))
    assert(!plan.contains("CartesianProduct"), plan)
    // per-doc NLL sum is map-side combined (partial aggregate present)
    assert(plan.contains("partial_count") || plan.contains("partial_sum")
      || plan.linesIterator.exists(l => l.contains("HashAggregate") && l.contains("partial")),
      plan)
    // the vocab joins back by broadcast
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("etl_dpp_join: the fact scan's partition filter arrives at runtime") {
    val plan = planOf(EtlQueries.dppJoin(spark, dir))
    // dynamic partition pruning: the dim side's filter reaches the
    // partitioned fact scan as a runtime dynamicpruning expression
    assert(plan.contains("dynamicpruning"), plan)
    assert(plan.contains("PartitionFilters"), plan)
  }

  test("doc_weighted_sample is a pure pushable filter — no shuffle at all") {
    val df = DocQueries.docWeightedSample(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // one scan, a filter, a sort for output determinism — no exchange
    // other than the final orderBy's range partitioning
    assert(!plan.contains("hashpartitioning"), plan)
  }

  test("doc_collocations tokenizes the corpus ONCE (pair counts checkpointed)") {
    val plan = planOf(DocQueries.docCollocations(spark, dir))
    // the pair-count frame is checkpointed, so its four consumers
    // (bigrams, two marginals, the total) read the materialized rows —
    // the corpus scan + tokenize chain never re-runs: zero parquet
    // scans survive in the final plan
    assert(!plan.contains("Scan parquet"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("etl_expectations row checks share one scan per table (conditional sums)") {
    val plan = planOf(EtlQueries.expectationsReport(spark, dir))
    // 3 tables × (rowChecks + unique + fk probes): orders scans appear a
    // bounded number of times, and NO join in the audit goes cartesian
    assert(!plan.contains("CartesianProduct"), plan)
    // the row-check aggregate is a single partial+final pair per table:
    // violations for all four orders checks ride one HashAggregate
    assert(plan.contains("stack("), plan)
  }
}
