package graft

import graft.operators.Bm25

class Bm25Spec extends SparkSpec {
  import sqlImplicits._

  private val docs = Seq(
    (0L, "spark shuffle join and hash join run fast"),
    (1L, "join"),
    (2L, "a very long document about nothing relevant at all padded with words " +
      "that keep going and going to stretch the length normalization join"),
    (3L, "vectors are not the vector token here exactly once: vector"),
    (4L, "completely unrelated text")
  ).toDF("doc_id", "text")

  test("bm25: only term-hitting docs return, ranked by score desc then id") {
    val got = Bm25.topK(docs, "doc_id", "text", Seq("join", "vector"), k = 10)
      .orderBy("rank").collect()
    assert(got.map(_.getAs[Long]("doc_id")).toSet == Set(0L, 1L, 2L, 3L))
    val scores = got.map(_.getAs[Double]("bm25"))
    assert(scores.sameElements(scores.sorted.reverse))
    assert(got.map(_.getAs[Long]("rank")).toSeq == (1L to got.length).toSeq)
  }

  test("bm25: length normalization — same tf, shorter doc scores higher") {
    // docs 1 and 2 both have tf(join)=1; doc 1 is far shorter
    val got = Bm25.topK(docs, "doc_id", "text", Seq("join"), k = 10)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("bm25")).toMap
    assert(got(1L) > got(2L))
    // tf saturation: doc 0 (tf=2) still beats doc 1 (tf=1, shorter)... or
    // not — what must hold is that tf=2 beats tf=1 at EQUAL length, which
    // the k1 monotonicity guarantees; here just pin that doc 0 scores
    // strictly above doc 2 (higher tf AND shorter)
    assert(got(0L) > got(2L))
  }

  test("bm25: k bounds the result and validation rejects bad args") {
    assert(Bm25.topK(docs, "doc_id", "text", Seq("join"), k = 2).count() == 2)
    intercept[IllegalArgumentException] {
      Bm25.topK(docs, "doc_id", "text", Seq.empty, k = 3)
    }
    intercept[IllegalArgumentException] {
      Bm25.topK(docs, "doc_id", "text", Seq("join"), k = 0)
    }
  }

  test("bm25: rarer term contributes more (idf monotonicity)") {
    // 'join' appears in 3 docs, 'vector' in 1 — a doc hitting only
    // 'vector' must outscore an equal-length doc hitting only 'join'
    val pair = Seq(
      (10L, "vector words pad pad pad"),
      (11L, "join words pad pad pad")
    ).toDF("doc_id", "text").unionAll(docs)
    val got = Bm25.topK(pair, "doc_id", "text", Seq("join", "vector"), k = 10)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("bm25")).toMap
    assert(got(10L) > got(11L))
  }
}
