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
  * so the oracle shares the formula). The count vector x is never
  * materialized: margin w·x = Σ_tokens w[bucket(t)], an O(len) in-row
  * fold over the per-token bucket array against the broadcast weight
  * literal (`element_at`), and the perceptron update Σ y·x is the
  * bucket array EXPLODED under y — each token occurrence contributes
  * its label once, which sums to exactly y·count per feature — a
  * map-side-combined ≤`numFeatures`-row aggregate. (The earlier dense
  * form counted all `numFeatures` buckets per doc in-row —
  * O(numFeatures·len) integer compares per document, 64× this cost at
  * the default width; measured 231 s → ~13 s at sf1.) Scale shape:
  * one tokenize+hash pass checkpoints per corpus, each training round
  * is one O(len)-per-doc pass over it with a bounded driver collect
  * (the k-means codebook discipline), and scoring is a pure in-row map
  * against the ≤`numFeatures`-row artifact — no corpus shuffle
  * anywhere. */
object QualityClassifier {

  /** token → feature bucket: base-31 md5 hash mod `numFeatures`. */
  private def bucket(t: Column, numFeatures: Int): Column =
    (conv(substring(md5(t.cast("binary")), 1, 8), 16, 10)
      .cast("long").bitwiseAND(lit(0x7fffffffL))) % numFeatures

  /** Token array → bucket array, in-row: the non-empty tokens each
    * hash to their feature bucket. The bridge that lets a caller who
    * already tokenized (a shared curation scan) feed the classifier
    * without re-reading text — the array is element-for-element what
    * [[bucketed]] derives, so margins and updates are bit-identical. */
  private def toBuckets(toks: Column, numFeatures: Int): Column =
    transform(filter(toks, t => length(t) > 0), t => bucket(t, numFeatures))

  /** (docs' columns minus textCol, __b) — the per-token bucket array:
    * one md5 + mod per token, O(len) per doc, shuffle-free. Empty/NULL
    * text ⇒ empty array (an all-zero feature vector). Tokenize and
    * hash are separate projections (the HOF re-evaluation pitfall). */
  private def bucketed(docs: DataFrame, textCol: String,
      numFeatures: Int): DataFrame =
    // Par.spread: tokenize+bucket is the dense map; the perceptron's
    // full-batch updates are exact integer sums — partitioning-invariant
    Par.spread(docs)
      .select(docs.columns.map(col) :+
        Text.tokens(Text.normalize(coalesce(col(textCol), lit("")))).as("__tk"): _*)
      .select(docs.columns.map(col) :+
        toBuckets(col("__tk"), numFeatures).as("__b"): _*)
      .drop(textCol)

  /** w·x as the O(len) in-row fold Σ_tokens w[bucket(t)] — `wLit` is
    * the dense `numFeatures`-long weight array literal (element_at is
    * 1-based). Empty bucket array folds to the exact 0L margin. */
  private def marginCol(b: Column, wLit: Column): Column =
    aggregate(b, lit(0L),
      (acc, bk) => acc + element_at(wLit, (bk + 1).cast("int")))

  /** Train the separator: reference docs (`targetPred` true) label +1,
    * the rest −1; `iters` full-batch perceptron rounds from zero
    * weights. Returns the persistable (feature, weight) artifact — the
    * FULL `numFeatures`-row table (zero weights included), LONG
    * weights, exact by construction. The bucket-array frame
    * checkpoints once and feeds every round; each round computes
    * margins in-row against the broadcast weight literal and collects
    * the ≤`numFeatures`-row misclassification update to the driver
    * (bounded, the k-means codebook pattern). */
  def train(docs: DataFrame, idCol: String, textCol: String,
      targetPred: Column, iters: Int = 4, numFeatures: Int = 64): DataFrame =
    trainCore(
      bucketed(
          docs.select(col(idCol), col(textCol), targetPred.as("__t")),
          textCol, numFeatures)
        .select(when(col("__t"), 1L).otherwise(-1L).as("__y"), col("__b")),
      iters, numFeatures)

  /** [[train]] fed from an ALREADY-TOKENIZED frame (`tokCol`: the
    * array [[graft.functions.Text.tokens]]∘normalize produces — the
    * shared curation scan): same perceptron, same artifact, zero text
    * re-reads. Bit-identical to training on the text the tokens came
    * from. */
  def trainFromTokens(toks: DataFrame, idCol: String, tokCol: String,
      targetPred: Column, iters: Int = 4, numFeatures: Int = 64): DataFrame =
    trainCore(
      toks.select(when(targetPred, 1L).otherwise(-1L).as("__y"),
        toBuckets(col(tokCol), numFeatures).as("__b")),
      iters, numFeatures)

  private def trainCore(labeled: DataFrame, iters: Int,
      numFeatures: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(numFeatures > 0, s"numFeatures must be positive, got $numFeatures")
    val spark = labeled.sparkSession
    val feats = labeled.localCheckpoint(true)
    try {
      val w = Array.fill(numFeatures)(0L)
      for (_ <- 1 to iters) {
        val wLit = array(w.map(lit(_)): _*)
        val upd = feats
          .withColumn("__m", marginCol(col("__b"), wLit))
          .filter(col("__y") * col("__m") <= 0)
          // each token occurrence carries its doc's label: summing y per
          // bucket IS Σ y·count — the dense update without the vector
          .select(explode(col("__b")).as("pos"), col("__y"))
          .groupBy(col("pos")).agg(sum(col("__y")).as("__d"))
          .collect() // <= numFeatures rows — bounded by construction
        upd.foreach(r => w(r.getLong(0).toInt) += r.getLong(1))
      }
      import spark.implicits._
      w.toSeq.zipWithIndex.map { case (wt, f) => (f.toLong, wt) }
        .toDF("feature", "weight")
    } finally NearDup.freeCheckpoint(feats)
  }

  /** Score with the FROZEN artifact: (idCol, margin, keep) for every
    * input row — margin = w·x in exact integers, keep = margin > 0.
    * The ≤`numFeatures`-row artifact collects to a dense weight-array
    * literal (absent features weigh 0) and the margin folds in-row —
    * a pure map over the batch, no join, no shuffle. Every input row
    * returns (an empty/NULL text scores margin 0, keep = false). */
  def scoreWith(weights: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, numFeatures: Int = 64): DataFrame =
    scoreCore(weights,
      bucketed(docs.select(col(idCol), col(textCol)), textCol, numFeatures),
      Seq(idCol), numFeatures)

  /** [[scoreWith]] fed from an already-tokenized frame (the
    * [[trainFromTokens]] counterpart): scores every row of `toks` from
    * its `tokCol` array — the same pure in-row map, no text read.
    * Returns `toks`' columns minus `tokCol`, plus (margin, keep), so a
    * caller's labels/metadata ride along without a re-join. */
  def scoreFromTokens(weights: DataFrame, toks: DataFrame, idCol: String,
      tokCol: String, numFeatures: Int = 64): DataFrame = {
    val carried = toks.columns.filterNot(_ == tokCol)
    scoreCore(weights,
      toks.select(carried.map(col) :+
        toBuckets(col(tokCol), numFeatures).as("__b"): _*),
      carried, numFeatures)
  }

  private def scoreCore(weights: DataFrame, buckets: DataFrame,
      carried: Seq[String], numFeatures: Int): DataFrame = {
    require(numFeatures > 0, s"numFeatures must be positive, got $numFeatures")
    val w = Array.fill(numFeatures)(0L)
    weights.select(col("feature").cast("long"), col("weight").cast("long"))
      .collect() // the artifact is <= numFeatures rows by contract
      .foreach { r =>
        val f = r.getLong(0)
        if (f >= 0 && f < numFeatures) w(f.toInt) = r.getLong(1)
      }
    val wLit = array(w.map(lit(_)): _*)
    buckets
      .select(carried.map(col) :+ marginCol(col("__b"), wLit).as("margin"): _*)
      .select(carried.map(col) ++
        Seq(col("margin"), (col("margin") > 0).as("keep")): _*)
  }
}
