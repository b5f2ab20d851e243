package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** TRAINED quality classifier — the GPT-3 / PaLM data-filtering recipe
  * (Brown et al. 2020 §A, "we trained a classifier to distinguish
  * [high-quality reference] from raw Common Crawl … and kept documents
  * by classifier score"): learn a LINEAR separator between a reference
  * slice and the rest of the corpus over hashed bag-of-words features,
  * then score every document by its margin. The third trained component
  * beside [[LangProfile]] (nearest-profile) and [[LangModel]]
  * (generative NLL) — this one is DISCRIMINATIVE, and like them it
  * splits train-once / apply-forever ([[train]] returns a persistable
  * (feature, weight) table; [[scoreWith]] serves any later batch).
  *
  * The learner is a full-batch PERCEPTRON rather than logistic
  * regression, deliberately: every quantity is an exact integer —
  * feature counts, dot-product margins, misclassification updates
  * (Σ y·x over misclassified docs, a map-side-combined per-feature
  * sum, order-independent by integer addition) — so training and
  * scoring are bit-identical on any engine, partitioning, or rerun,
  * where LR's per-doc sigmoid would drift with libm. Fixed `iters`
  * full-batch rounds, no learning rate (classic perceptron), weights
  * start at zero.
  *
  * Features: tokens hash into `numFeatures` buckets via the same
  * 31-bit md5 base hash the dedup state uses ([[DedupState]] base31,
  * so the oracle shares the formula), counted IN-ROW — one md5 per
  * token, then O(numFeatures·len) integer compares per doc, shuffle-
  * free. Scale shape: each training round is one pass over the
  * checkpointed feature frame — margins in-row against the broadcast
  * weight literal, updates a ≤numFeatures-row aggregate collected to
  * the driver (the k-means codebook discipline); scoring explodes the
  * fixed-width feature vector and joins the broadcast weight table —
  * never a corpus-sized shuffle beyond the per-doc combine. */
object QualityClassifier {

  /** token → feature bucket: base-31 md5 hash mod `numFeatures`. */
  private def bucket(t: Column, numFeatures: Int): Column =
    (conv(substring(md5(t.cast("binary")), 1, 8), 16, 10)
      .cast("long").bitwiseAND(lit(0x7fffffffL))) % numFeatures

  /** (idCol, __f) — the length-`numFeatures` integer count vector per
    * doc. Empty/NULL text ⇒ all zeros. Each stage its own projection
    * (the HOF re-evaluation pitfall): one md5 per token, then counts. */
  def features(docs: DataFrame, idCol: String, textCol: String,
      numFeatures: Int = 64): DataFrame = {
    require(numFeatures > 0, s"numFeatures must be positive, got $numFeatures")
    docs
      .select(docs.columns.map(col) :+
        filter(Text.tokens(Text.normalize(coalesce(col(textCol), lit("")))),
          t => length(t) > 0).as("__tk"): _*)
      .select(docs.columns.map(col) :+
        transform(col("__tk"), t => bucket(t, numFeatures)).as("__b"): _*)
      .select(docs.columns.map(col) :+
        transform(sequence(lit(0), lit(numFeatures - 1)),
          b => size(filter(col("__b"), x => x === b)).cast("long")).as("__f"): _*)
      .drop(textCol)
  }

  /** Train the separator: reference docs (`targetPred` true) label +1,
    * the rest −1; `iters` full-batch perceptron rounds from zero
    * weights. Returns the persistable (feature, weight) artifact —
    * LONG weights, exact by construction. The feature frame
    * checkpoints once and feeds every round; each round collects the
    * ≤`numFeatures`-row update to the driver (bounded, the k-means
    * codebook pattern). */
  def train(docs: DataFrame, idCol: String, textCol: String,
      targetPred: Column, iters: Int = 4, numFeatures: Int = 64): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val spark = docs.sparkSession
    val feats = features(
        docs.select(col(idCol), col(textCol), targetPred.as("__t")),
        idCol, textCol, numFeatures)
      .select(col(idCol), when(col("__t"), 1L).otherwise(-1L).as("__y"), col("__f"))
      .localCheckpoint(true)
    try {
      val w = Array.fill(numFeatures)(0L)
      for (_ <- 1 to iters) {
        val wLit = array(w.map(lit(_)): _*)
        val upd = feats
          .withColumn("__m", aggregate(
            zip_with(col("__f"), wLit, (a, b) => a * b), lit(0L), (acc, x) => acc + x))
          .filter(col("__y") * col("__m") <= 0)
          .select(posexplode(transform(col("__f"), c => c * col("__y"))))
          .groupBy(col("pos")).agg(sum(col("col")).as("__d"))
          .collect() // <= numFeatures rows — bounded by construction
        upd.foreach(r => w(r.getInt(0)) += r.getLong(1))
      }
      import spark.implicits._
      w.toSeq.zipWithIndex.map { case (wt, f) => (f.toLong, wt) }
        .toDF("feature", "weight")
    } finally NearDup.freeCheckpoint(feats)
  }

  /** Score with the FROZEN artifact: (idCol, margin, keep) for every
    * input row — margin = w·x in exact integers, keep = margin > 0.
    * The fixed-width feature vector explodes to (doc, feature, count)
    * and joins the broadcast weight table; the per-doc sum map-side
    * combines (docs are row-contiguous). Every input row returns (all-
    * zero features score margin 0, keep = false). */
  def scoreWith(weights: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, numFeatures: Int = 64): DataFrame =
    features(docs.select(col(idCol), col(textCol)), idCol, textCol, numFeatures)
      .select(col(idCol), posexplode_outer(col("__f")))
      .join(broadcast(weights.select(col("feature").cast("int").as("pos"),
        col("weight"))), Seq("pos"), "left_outer")
      .groupBy(col(idCol))
      .agg(sum(col("col") * coalesce(col("weight"), lit(0L))).as("margin"))
      .select(col(idCol), col("margin"), (col("margin") > 0).as("keep"))
}
