package graft

import graft.operators.Bpe

class BpeSpec extends SparkSpec {
  import sqlImplicits._

  private def merges(df: org.apache.spark.sql.DataFrame, n: Int) = {
    val out = Bpe.trainMerges(df, "text", n)
    try out.orderBy("merge_rank").collect()
      .map(r => (r.getAs[Long]("merge_rank"), r.getAs[String]("pair"),
        r.getAs[String]("merged"), r.getAs[Long]("pair_count"))).toSeq
    finally graft.operators.Curate.release(out)
  }

  test("trainMerges replays the textbook example, stops when pairs exhaust") {
    // vocab: aaab ×3, ab ×2
    // r1: (a,a)=6 beats (a,b)=5 → aaab = "aa a b"
    // r2: (a,b)=3+2=5 beats (aa,a)=3 → "aa ab", "ab"
    // r3: (aa,ab)=3 → "aaab"
    // r4: no pairs anywhere → training exhausts at 3 merges
    val docs = Seq((0L, "aaab aaab aaab ab ab")).toDF("doc_id", "text")
    val got = merges(docs, n = 4)
    assert(got == Seq(
      (1L, "a a", "aa", 6L),
      (2L, "a b", "ab", 5L),
      (3L, "aa ab", "aaab", 3L)), got)
    // segmentations SURVIVE exhaustion: the vocab state from the last
    // productive round comes back, not an empty table
    val segs = Bpe.trainSegmentations(docs, "text", numMerges = 4)
    try {
      val bySeg = segs.collect().map(r =>
        r.getAs[String]("word") -> (r.getAs[Long]("n_occurrences"),
          r.getAs[String]("segmentation"))).toMap
      assert(bySeg == Map("aaab" -> ((3L, "aaab")), "ab" -> ((2L, "ab"))), bySeg)
    } finally graft.operators.Curate.release(segs)
    // a corpus of single-char words has nothing to merge at all
    val none = Seq((0L, "a b c a")).toDF("doc_id", "text")
    assert(merges(none, n = 2).isEmpty)
  }

  test("merge is canonical left-to-right non-overlapping across symbol runs") {
    // "aaaa": chars a a a a; (a,a) appears 3× per word (overlapping count)
    // canonical merge → "aa aa" (NOT "aa a a"), so round 2's best pair is
    // (aa,aa) — this is exactly where a boundary-consuming string replace
    // diverges from the real algorithm
    val docs = Seq((0L, "aaaa aaaa")).toDF("doc_id", "text")
    val got = merges(docs, n = 2)
    assert(got == Seq(
      (1L, "a a", "aa", 6L),
      (2L, "aa aa", "aaaa", 2L)), got)
  }

  test("counts weight by word frequency; ties break on the pair string") {
    // "xy" ×2 and "zw" ×2: both pairs count 2 → lexicographic winner (x y)
    val docs = Seq((0L, "xy xy zw zw")).toDF("doc_id", "text")
    val got = merges(docs, n = 1)
    assert(got == Seq((1L, "x y", "xy", 2L)), got)
    intercept[IllegalArgumentException](Bpe.trainMerges(docs, "text", 0))
  }
}
