package graft

import graft.operators.SubstrDedup

/** Exact-substring dedup semantics on hand-built fixtures: span
  * positions/lengths, the every-window-duplicated removal criterion,
  * within-doc repeats, full excision, and the short-doc/unique-doc
  * no-ops. Token streams are pre-normalized so clean_text comparisons
  * read literally. */
class SubstrDedupSpec extends SparkSpec {
  import sqlImplicits._

  private val boiler = "one two three four five six seven eight nine ten" // 10 tokens
  private val docs = Seq(
    // boilerplate prefix + unique tail: span covers exactly the boiler
    (1L, boiler + " unique alpha content here"),
    // same boilerplate after a 4-token unique prefix
    (2L, "different start words then " + boiler),
    // an 8-token phrase repeated back to back: two spans, whole doc
    (3L, "red blue green gold gray pink teal cyan " +
      "red blue green gold gray pink teal cyan"),
    // all-unique doc: untouched
    (4L, "nothing in this sentence repeats anywhere in the tiny corpus today"),
    // too short for one window: untouched
    (5L, "just a few words")
  ).toDF("doc_id", "text")

  test("duplicatedSpans: maximal runs of corpus-duplicated 8-token windows") {
    val spans = SubstrDedup.duplicatedSpans(docs, "doc_id", "text", minTokens = 8)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("span_start"),
        r.getAs[Long]("span_tokens"))).toSet
    assert(spans == Set(
      (1L, 0L, 10L),  // boiler at 0..9: window starts 0,1,2 merge
      (2L, 4L, 10L),  // boiler shifted by the 4-token prefix
      (3L, 0L, 8L), (3L, 8L, 8L))) // the repeated phrase, both copies;
    // the cross-boundary windows are NOT duplicated, so the two spans
    // stay separate — no unduplicated window is ever covered
  }

  test("exciseSpans: removes spans, keeps the unique remainder, audits tokens") {
    val out = SubstrDedup.exciseSpans(docs, "doc_id", "text", minTokens = 8)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("clean_text"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("kept_tokens")))).toMap
    assert(out(1L) == (("unique alpha content here", 14L, 4L)))
    assert(out(2L) == (("different start words then", 14L, 4L)))
    assert(out(3L) == (("", 16L, 0L))) // boilerplate end-to-end
    assert(out(4L)._3 == out(4L)._2)   // unique doc untouched
    assert(out(5L) == (("just a few words", 4L, 4L)))
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L)) // every row comes back
  }

  test("plan shape: hash-partitioned seed count, no cartesian anywhere") {
    val plan = SubstrDedup.duplicatedSpans(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    // candidate generation is generator + hash aggregate + semi join —
    // a corpus-token exchange that partitions freely, never a pair join
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("Generate"), plan) // in-row window explode
    val scrub = SubstrDedup.exciseSpans(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!scrub.contains("CartesianProduct") &&
      !scrub.contains("BroadcastNestedLoopJoin"), scrub)
  }

  test("partition independence: spans identical under any layout") {
    val a = SubstrDedup.duplicatedSpans(docs.repartition(7), "doc_id", "text")
      .collect().map(_.toSeq).toSet
    val b = SubstrDedup.duplicatedSpans(docs.coalesce(1), "doc_id", "text")
      .collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
