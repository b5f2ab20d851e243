package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Text

/** The Gopher document-quality rule set (Rae et al. 2021,
  * arXiv:2112.11446 Table A1): a battery of cheap heuristic REJECT
  * rules a web-scale corpus is filtered through before any trained
  * model sees it. Unlike the scalar [[graft.functions.Text.qualityScore]]
  * (a weighted blend), Gopher publishes each rule as an independent
  * keep/reject threshold and the verdict as their conjunction — which
  * is what makes the battery auditable: a rejected doc names the rule
  * that killed it.
  *
  * Rules carried here (thresholds are the published ones unless noted):
  *   - word count within [minWords, maxWords] (published: 50..100'000);
  *   - mean word length within [3, 10] characters;
  *   - >= minStopHits DISTINCT stopwords present (published: 2 of a
  *     small English function-word set; the set here is the engine's
  *     [[Text.stopwordRatio]] five — the corpus vocabulary contains no
  *     other function words, so the published 8-word set would reject
  *     every document and gate nothing);
  *   - fraction of words containing an alphabetic character >= 80%;
  *   - most-frequent-2-gram share of all 2-grams <= 20% (the Gopher
  *     repetition family's first row; the remaining n-gram rows are the
  *     same computation at other n — see doc_repetition).
  *
  * Every feature is an exact integer (ppm / x100 fixed-point) computed
  * IN THE ROW — the whole battery is one pure map over the corpus scan,
  * no shuffle, no explode; flags and verdict are plain comparisons on
  * those integers, so any engine reproduces them bit-for-bit.
  */
object QualityRules {

  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to")

  /** One row per input row: integer features, per-rule booleans, and
    * the conjunctive `verdict`. NULL text behaves as the empty string
    * (0 words → word-count rule rejects; ratio rules vacuously pass on
    * n=0 via their 0-numerator forms). */
  def gopher(df: DataFrame, idCol: String, textCol: String,
      minWords: Long = 50L, maxWords: Long = 100000L,
      minStopHits: Int = 2): DataFrame = {
    val tk = col("__tk")
    val grams = col("__g")
    val withTok = df
      .select(col(idCol),
        filter(Text.tokens(Text.normalize(coalesce(col(textCol), lit("")))),
          t => length(t) > 0).as("__tk"))
      .select(col(idCol), tk,
        when(size(tk) >= 2,
          transform(sequence(lit(0), size(tk) - 2),
            i => concat_ws(" ", slice(tk, i + 1, lit(2)))))
          .otherwise(array().cast("array<string>")).as("__g"))
    val nWords = size(tk).cast("long")
    val sumLen = aggregate(tk, lit(0L), (acc, t) => acc + length(t))
    val stopHits = Stopwords
      .map(w => when(array_contains(tk, w), 1).otherwise(0))
      .reduce(_ + _).cast("long")
    val alphaWords = size(filter(tk, t => t.rlike("[a-z]"))).cast("long")
    // raw integer counts first, fixed-point divisions second — `div` is
    // SQL-only, and a double `/`+floor would trade away the exactness
    // claim the flags rest on
    val raw = withTok.select(
      col(idCol),
      nWords.as("n_words"),
      sumLen.cast("long").as("__sum_len"),
      stopHits.as("stop_hits"),
      alphaWords.as("__alpha_words"),
      Text.topElementCount(grams).cast("long").as("__top_gram"),
      size(grams).cast("long").as("__n_grams"))
    val features = raw.select(
      col(idCol), col("n_words"),
      expr("CASE WHEN n_words > 0 THEN (__sum_len * 100) div n_words ELSE 0 END")
        .as("mean_len_x100"),
      col("stop_hits"),
      expr("CASE WHEN n_words > 0 THEN (__alpha_words * 1000000) div n_words ELSE 1000000 END")
        .as("alpha_ppm"),
      expr("CASE WHEN __n_grams > 0 THEN (__top_gram * 1000000) div __n_grams ELSE 0 END")
        .as("rep_ppm"))
    features.select(
        col(idCol), col("n_words"), col("mean_len_x100"), col("stop_hits"),
        col("alpha_ppm"), col("rep_ppm"),
        (col("n_words") >= minWords && col("n_words") <= maxWords)
          .as("r_word_count"),
        (col("mean_len_x100") >= 300L && col("mean_len_x100") <= 1000L)
          .as("r_mean_len"),
        (col("stop_hits") >= minStopHits).as("r_stopwords"),
        (col("alpha_ppm") >= 800000L).as("r_alpha"),
        (col("rep_ppm") <= 200000L).as("r_repetition"))
      .withColumn("verdict",
        col("r_word_count") && col("r_mean_len") && col("r_stopwords") &&
          col("r_alpha") && col("r_repetition"))
  }
}
