package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** EXACT SUBSTRING deduplication (the "ExactSubstr" half of Lee et al.
  * 2022, "Deduplicating Training Data Makes Language Models Better",
  * arXiv:2107.06499): the document-level dedup family
  * ([[NearDup]] minhash/simhash, [[graft.queries.DocQueries]] winnowing)
  * asks "are these two DOCUMENTS near-copies?"; this asks the finer
  * question that actually bites LLM training — "which SPANS inside a
  * document are verbatim repeats of text elsewhere in the corpus?"
  * (boilerplate headers, license blocks, templated paragraphs inside
  * otherwise-unique pages) — and excises the spans while keeping the
  * unique remainder, where doc-level dedup would either keep the
  * boilerplate or drop the whole document.
  *
  * Method (the paper builds a suffix array; the relational equivalent):
  *   1. every doc explodes into POSITIONED `minTokens`-token window
  *      hashes — md5 of the space-joined token window, one row per
  *      window start (a flatMap over in-row arrays, no shuffle);
  *   2. a window hash occurring more than ONCE corpus-wide is a
  *      duplicated seed (one map-side-combined count — the one
  *      corpus-token-sized exchange, the same sort-by-suffix cost
  *      center as the paper's suffix array, here a hash shuffle that
  *      partitions freely at any scale);
  *   3. per doc, maximal RUNS of consecutive duplicated window starts
  *      merge into spans (gaps-and-islands: `pos − row_number` within
  *      the doc — millions of tiny doc partitions, never a global
  *      sort). A span [s, s+n) emitted this way satisfies the paper's
  *      removal criterion exactly: EVERY `minTokens`-window inside it
  *      occurs elsewhere in the corpus (a run merges only step-1
  *      neighbors, so no unduplicated window is ever covered).
  *
  * Spans are token-index intervals over the SAME normalized token
  * stream every other text operator uses ([[Text.tokens]] ∘
  * [[Text.normalize]], empties filtered). Exact integer positions +
  * md5 seeds ⇒ bit-identical across engines and partitionings.
  *
  * At 100 TB: the seed count is the dominant exchange and is exactly
  * the shape Spark scales — hash partition, map-side combine, AQE; the
  * span merge shuffles (doc, pos) pairs ONLY for duplicated seeds
  * (boilerplate-dense corpora pay proportionally); excision re-joins
  * the ≤docs-sized span lists back and rebuilds text in-row. */
object SubstrDedup {

  /** (idCol, span_start, span_tokens) — maximal repeated spans per doc:
    * `span_start` is the 0-based token index, `span_tokens` the span
    * length in tokens (>= `minTokens` by construction). A doc with no
    * repeated window emits no rows. */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
      minTokens: Int = 8): DataFrame = {
    val starts = dupWindowStarts(docs, idCol, textCol, minTokens)
    val w = Window.partitionBy(col(idCol)).orderBy(col("__pos"))
    starts
      .withColumn("__grp", col("__pos") - row_number().over(w))
      .groupBy(col(idCol), col("__grp"))
      .agg(min(col("__pos")).cast("long").as("span_start"),
        (count(lit(1)) + lit(minTokens.toLong - 1)).as("span_tokens"))
      .select(col(idCol), col("span_start"), col("span_tokens"))
  }

  /** The corpus with every duplicated span excised: (original columns,
    * `clean_text` = the doc's kept tokens space-joined, `n_tokens` =
    * original token count, `kept_tokens`). Docs without spans keep all
    * tokens; a doc that is boilerplate end-to-end comes back with an
    * empty `clean_text` (dropping it is the caller's policy call —
    * Lee et al. keep empties to preserve alignment). The span list per
    * doc is ≤ tokens/minTokens entries and joins back broadcast-shaped
    * (AQE picks it at real skews); token filtering is in-row. */
  def exciseSpans(docs: DataFrame, idCol: String, textCol: String,
      minTokens: Int = 8): DataFrame = {
    val spans = duplicatedSpans(docs, idCol, textCol, minTokens)
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("span_start"), col("span_tokens"))).as("__spans"))
    val tk = col("__tk")
    // spread: the excision pass re-tokenizes and rebuilds text in-row —
    // per-row expensive, exact
    Par.spread(docs)
      // NULL text coalesces to '' (n_tokens=0, clean_text='') — the same
      // NULL contract every sibling text operator applies before
      // tokenizing; without it a NULL-text doc rides through as NULL
      // __tk and reports NULL counts.
      .withColumn("__tk", filter(
        Text.tokens(Text.normalize(coalesce(col(textCol), lit("")))),
        t => length(t) > 0))
      .join(spans, Seq(idCol), "left_outer")
      // keep token at 0-based q unless a span [s, s+n) covers it; the
      // spans array is NULL for span-free docs → keep all
      .withColumn("__kept",
        when(col("__spans").isNull, tk).otherwise(
          filter(zip_with(tk, sequence(lit(0), size(tk) - 1), (t, q) =>
            struct(t.as("t"), q.as("q"))),
            e => !exists(col("__spans"), s =>
              e.getField("q") >= s.getField("span_start") &&
                e.getField("q") < s.getField("span_start") + s.getField("span_tokens")))
            .getField("t")))
      .withColumn("clean_text", concat_ws(" ", col("__kept")))
      .withColumn("n_tokens", size(tk).cast("long"))
      .withColumn("kept_tokens", size(col("__kept")).cast("long"))
      .drop("__tk", "__spans", "__kept")
  }

  /** Positioned duplicated-window starts: (idCol, __pos) for every
    * window whose hash repeats corpus-wide. Windows hash md5 over the
    * space-joined token slice — the [[NearDup]] shingle recipe at
    * length `minTokens`; the token array projects FIRST (the HOF
    * re-evaluation pitfall). */
  private def dupWindowStarts(docs: DataFrame, idCol: String,
      textCol: String, minTokens: Int): DataFrame = {
    require(minTokens >= 2, s"minTokens must be >= 2, got $minTokens")
    val tk = col("__tk")
    // Par.spread: tokenize + per-window md5 is the dense map; the seed
    // count and the (id, pos)-keyed window are exact under any
    // partitioning
    val grams = Par.spread(docs)
      .select(col(idCol), filter(
        Text.tokens(Text.normalize(coalesce(col(textCol), lit("")))),
        t => length(t) > 0).as("__tk"))
      .select(col(idCol), posexplode(
        when(size(tk) >= minTokens,
          transform(sequence(lit(0), size(tk) - minTokens),
            i => md5(concat_ws(" ", slice(tk, i + 1, lit(minTokens))).cast("binary"))))
          .otherwise(array().cast("array<string>"))))
      .withColumnsRenamed(Map("pos" -> "__pos", "col" -> "__h"))
    val dup = grams.groupBy(col("__h")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= 2)
      .select(col("__h"))
    grams.join(dup, Seq("__h"), "left_semi")
      .select(col(idCol), col("__pos"))
  }
}
