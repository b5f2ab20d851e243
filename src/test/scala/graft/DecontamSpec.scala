package graft

import org.apache.spark.sql.functions._

import graft.operators.Decontam

class DecontamSpec extends SparkSpec {
  import sqlImplicits._

  // 3-grams of "a b c d e": {a b c, b c d, c d e}
  private val bench = Seq((100L, "a b c d e")).toDF("doc_id", "text")

  private val corpus = Seq(
    (1L, "a b c d e"),          // exact copy: 3 shared grams
    (2L, "z a b c q"),          // one shared gram ("a b c")
    (3L, "x y z w v"),          // disjoint
    (4L, "a b c a b c a b c"),  // "a b c" repeated — still ONE distinct shared gram
    (5L, "ab"),                 // too short for any 3-gram
  ).toDF("doc_id", "text")

  test("ngramHashes dedupes within the document and skips short docs") {
    val grams = Decontam.ngramHashes(corpus, "doc_id", "text", 3)
      .groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(grams(1L) == 3)
    assert(grams(2L) == 3)
    // doc 4 has 7 positional 3-grams but only 3 distinct ones
    // ({a b c, b c a, c a b})
    assert(grams(4L) == 3)
    assert(!grams.contains(5L), "sub-n docs contribute no grams")
  }

  test("contamination counts DISTINCT shared grams and applies minHits") {
    val out = Decontam.contamination(corpus, bench, "doc_id", "text",
        n = 3, minHits = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 3L, 2L -> 1L, 4L -> 1L), s"got $out")

    val strict = Decontam.contamination(corpus, bench, "doc_id", "text",
        n = 3, minHits = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(strict == Map(1L -> 3L), s"got $strict")
  }

  test("contamination against an empty or gram-free benchmark is empty") {
    val emptyBench = bench.filter(lit(false))
    assert(Decontam.contamination(corpus, emptyBench, "doc_id", "text",
      n = 3, minHits = 1).count() == 0)
    val shortBench = Seq((200L, "a b")).toDF("doc_id", "text")
    assert(Decontam.contamination(corpus, shortBench, "doc_id", "text",
      n = 3, minHits = 1).count() == 0)
    intercept[IllegalArgumentException](
      Decontam.contamination(corpus, bench, "doc_id", "text", n = 3, minHits = 0))
  }

  test("contamination result is partition-independent") {
    val a = Decontam.contamination(corpus, bench, "doc_id", "text", 3, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Decontam.contamination(corpus.repartition(7), bench.repartition(3),
        "doc_id", "text", 3, 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }
}
