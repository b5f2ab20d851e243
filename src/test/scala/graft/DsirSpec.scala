package graft

import org.apache.spark.sql.functions.col

import graft.operators.Dsir

class DsirSpec extends SparkSpec {
  import sqlImplicits._

  // target slice (curated = true) talks about engines; the raw remainder
  // mixes that vocabulary with off-target noise
  private val docs = Seq(
    (1L, true, "distributed query engines shuffle and broadcast joins"),
    (2L, true, "query engines prune columns and push down filters"),
    (3L, false, "engines and joins appear here too among other words"),
    (4L, false, "cheap viagra lottery winner click now free prize"),
    (5L, false, "the weather today is cloudy with light rain showers"),
    (6L, false, null.asInstanceOf[String])
  ).toDF("doc_id", "curated", "text")

  test("logRatios returns every row, NULL text included") {
    val out = Dsir.logRatios(docs, "doc_id", "text", col("curated"))
    assert(out.count() == 6L)
    val nullRow = out.filter(col("doc_id") === 6L).collect().head
    assert(nullRow.getAs[Long]("n_tokens") == 1L) // the one empty OOV token
  }

  test("target-like docs outrank off-target noise on lr_micro") {
    val lr = Dsir.logRatios(docs, "doc_id", "text", col("curated"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("lr_micro")).toMap
    // every curated doc must beat the spam doc, and per-token the overlap
    // doc (3) must beat it too: target-vocab tokens carry positive deltas
    assert(lr(1L) > lr(4L) && lr(2L) > lr(4L))
    assert(lr(3L) > lr(4L))
  }

  test("resample: exactly k deterministic winners, reproducible keys") {
    val a = Dsir.resample(docs, "doc_id", "text", col("curated"), k = 3).collect()
    val b = Dsir.resample(docs, "doc_id", "text", col("curated"), k = 3).collect()
    assert(a.length == 3 && b.length == 3)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    assert(a.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L, 3L))
    // keys really are sorted descending
    val keys = a.map(_.getAs[Long]("key_micro")).toSeq
    assert(keys == keys.sorted(Ordering[Long].reverse))
  }

  test("resample with k >= corpus returns the whole corpus, still ranked") {
    val out = Dsir.resample(docs, "doc_id", "text", col("curated"), k = 100)
    assert(out.count() == 6L)
  }

  test("empty target slice propagates NULL ratios instead of erroring") {
    val out = Dsir.logRatios(docs, "doc_id", "text", col("curated") && col("doc_id") < 0L)
      .collect()
    assert(out.length == 6)
    assert(out.forall(_.isNullAt(out.head.fieldIndex("lr_micro"))))
  }
}
