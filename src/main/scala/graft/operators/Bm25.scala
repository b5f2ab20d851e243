package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** BM25 keyword retrieval (Robertson & Zaragoza 2009, "The Probabilistic
  * Relevance Framework: BM25 and Beyond") over a document column — the
  * real ranked-retrieval upgrade of the term-count keyword head used by
  * hybrid search.
  *
  * Scale shape: tf and dl are computed IN-ROW over the normalized token
  * array (the corpus token stream never shuffles — the doc_tfidf lesson);
  * the corpus statistics (N, Σdl, per-term df) collapse into ONE
  * map-side-combined aggregate row that broadcasts back over the corpus;
  * selection is a bounded orderBy+limit (TakeOrderedAndProject — no
  * corpus-wide ranking window). One scan, one 1-row broadcast, no joins
  * proportional to the corpus.
  *
  * Determinism: tf, dl, df, N are exact integers. The one transcendental
  * — ln in the idf — is evaluated from integer-derived rationals and
  * immediately QUANTIZED to 1e6 micro-units, so a sub-ulp ln difference
  * between engines would have to land within half an ulp of a rounding
  * boundary to surface (verified exact against DuckDB at all three test
  * scales). Everything after the quantized idf is +,*,/ on doubles in a
  * pinned operand order — correctly-rounded IEEE ops, identical
  * everywhere.
  */
object Bm25 {

  /** Scored top-k: (idCol, bm25, rank) for the `k` highest-scoring
    * documents containing at least one query term. `k1` saturates term
    * frequency; `b` scales the length normalization. */
  def topK(df: DataFrame, idCol: String, textCol: String, terms: Seq[String],
      k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    requireQuery(terms, k)
    val toks = df.select(col(idCol), Text.tokens(Text.normalize(col(textCol))).as("__t"))
      .withColumn("__dl", size(col("__t")).cast("long"))
    val withTf = terms.zipWithIndex.foldLeft(toks) { case (d, (t, i)) =>
      d.withColumn(s"__tf$i", size(filter(col("__t"), x => x === t)).cast("long"))
    }.drop("__t")
    val stats = withTf.agg(
      count(lit(1)).as("__N"),
      sum(col("__dl")).as("__sumdl") +:
        terms.indices.map(i =>
          sum((col(s"__tf$i") > 0).cast("long")).as(s"__df$i")): _*)
    rank(withTf, stats, idCol, terms.size, k, k1, b)
  }

  private[operators] def requireQuery(terms: Seq[String], k: Int): Unit = {
    require(terms.nonEmpty, "terms must be non-empty")
    // terms are matched against NORMALIZED tokens — an uppercase or
    // punctuated term would silently never match
    require(terms.forall(_.matches("[a-z0-9]+")),
      s"terms must be normalized single tokens [a-z0-9]+: $terms")
    require(k > 0, s"k must be positive, got $k")
  }

  /** The SCORING code path, shared verbatim by the in-query [[topK]]
    * and the persisted-index serve ([[TextIndex.bm25ServeFrames]]) — one
    * pinned operand order is what makes index serving hash-identical to
    * the corpus-scan derivation. `hits`: one row per candidate doc with
    * `__dl` and `__tf0..__tf(n-1)`; `stats`: ONE row with `__N`,
    * `__sumdl`, `__df0..__df(n-1)` — broadcast over the candidates.
    * Docs with no query-term hit are filtered (their tf sum is 0 — or
    * NULL for NULL-text docs, which the predicate also drops). */
  private[operators] def rank(hits: DataFrame, stats: DataFrame,
      idCol: String, nTerms: Int, k: Int, k1: Double, b: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = hits.crossJoin(broadcast(stats))
    val avgdl = col("__sumdl").cast("double") / col("__N").cast("double")
    def idfQ(i: Int): Column =
      round(lit(1e6) * log(lit(1.0) +
        (col("__N").cast("double") - col(s"__df$i").cast("double") + lit(0.5)) /
          (col(s"__df$i").cast("double") + lit(0.5)))).cast("long")
    def tfPart(i: Int): Column =
      (col(s"__tf$i").cast("double") * lit(k1 + 1.0)) /
        (col(s"__tf$i").cast("double") +
          lit(k1) * (lit(1.0) - lit(b) + lit(b) * (col("__dl").cast("double") / avgdl)))
    val score = (0 until nTerms)
      .map(i => idfQ(i).cast("double") * tfPart(i))
      .reduce(_ + _) / lit(1e6)
    val anyHit = (0 until nTerms).map(i => col(s"__tf$i")).reduce(_ + _) > 0
    joined.filter(anyHit)
      .select(col(idCol), score.as("bm25"))
      .orderBy(col("bm25").desc, col(idCol))
      .limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("bm25").desc, col(idCol))).cast("long"))
  }
}
