package graft

import org.apache.spark.sql.functions.col

import graft.operators.QualityClassifier

/** Perceptron quality-classifier semantics: a linearly separable toy
  * corpus trains to a separator in the fixed rounds, the frozen
  * artifact scores held-out docs, every row comes back, and training
  * is bit-deterministic under any partitioning. */
class QualityClassifierSpec extends SparkSpec {
  import sqlImplicits._

  private val good = Seq(
    "alpha beta gamma delta epsilon alpha beta gamma",
    "beta gamma delta epsilon alpha delta epsilon beta",
    "gamma alpha epsilon beta delta gamma alpha delta")
  private val bad = Seq(
    "zork quux blarg snarf grue zork quux blarg",
    "quux blarg snarf grue zork snarf grue quux",
    "blarg zork grue quux snarf blarg zork snarf")
  private val docs = (good.zipWithIndex.map { case (t, i) => (i.toLong, true, t) } ++
    bad.zipWithIndex.map { case (t, i) => (100L + i, false, t) })
    .toDF("doc_id", "is_good", "text")

  test("train separates a separable corpus; frozen scoreWith serves held-out docs") {
    val w = QualityClassifier.train(docs, "doc_id", "text", col("is_good"),
      iters = 4, numFeatures = 256)
    assert(w.count() == 256) // the artifact carries the full table
    val scored = QualityClassifier.scoreWith(w, docs, "doc_id", "text",
      numFeatures = 256)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("margin"), r.getAs[Boolean]("keep")))).toMap
    good.indices.foreach(i => assert(scored(i.toLong)._2, s"good doc $i"))
    bad.indices.foreach(i => assert(!scored(100L + i)._2, s"bad doc $i"))
    // held-out docs the trainer never saw, scored by the FROZEN weights
    val heldOut = Seq((500L, "epsilon alpha gamma beta"),
      (501L, "grue snarf zork quux")).toDF("doc_id", "text")
    val ho = QualityClassifier.scoreWith(w, heldOut, "doc_id", "text",
      numFeatures = 256)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    assert(ho == Map(500L -> true, 501L -> false))
  }

  test("every row scores: empty/NULL text gets margin 0, keep false") {
    val w = QualityClassifier.train(docs, "doc_id", "text", col("is_good"),
      iters = 2, numFeatures = 64)
    val edge = Seq((1L, ""), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = QualityClassifier.scoreWith(w, edge, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getAs[Long]("margin"),
        r.getAs[Boolean]("keep"))).toSet
    assert(out == Set((1L, 0L, false), (2L, 0L, false)))
  }

  test("training is bit-deterministic under any partitioning") {
    def weights(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      QualityClassifier.train(df, "doc_id", "text", col("is_good"),
        iters = 4, numFeatures = 64)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(weights(docs.repartition(7)) == weights(docs.coalesce(1)))
  }
}
