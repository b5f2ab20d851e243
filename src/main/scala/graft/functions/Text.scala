package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for document pipelines: normalization,
  * tokenization, language-ID, quality scoring, fingerprinting. All are
  * compositions of codegen'd built-ins (no UDFs) and all are expressible
  * in ANSI SQL for the DuckDB oracle (Spark `regexp_replace` replaces all
  * matches; the oracle uses the 'g' flag for the same semantics).
  */
object Text {

  /** Canonical form for fingerprinting/dedup: lowercase, strip everything
    * but [a-z0-9 ], collapse runs of spaces, trim. */
  def normalize(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", ""), " +", " "))

  /** Whitespace tokens (single-space split — matches DuckDB
    * string_split semantics including empty tokens). */
  def tokens(c: Column): Column = split(c, " ")

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword count approximation: alpha runs count ~1 token per
    * 4 chars (ceil), digits and other symbols 1 each. A cheap, portable
    * stand-in for a real BPE vocab (which would be a broadcast lookup). */
  def bpeishTokenCount(c: Column): Column = {
    val alpha = regexp_replace(lower(c), "[^a-z]", "")
    val nonAlnumNonSpace = regexp_replace(lower(c), "[a-z0-9\\s]", "")
    ceil(length(alpha) / lit(4.0)).cast("long") +
      length(regexp_replace(lower(c), "[^0-9]", "")).cast("long") +
      length(nonAlnumNonSpace).cast("long")
  }

  /** Share of [a-z] characters after lowercasing (0 for empty). */
  def alphaRatio(c: Column): Column = {
    val len = length(c)
    when(len > 0, length(regexp_replace(lower(c), "[^a-z]", "")).cast("double") / len)
      .otherwise(lit(0.0))
  }

  /** Share of punctuation characters. */
  def punctRatio(c: Column): Column = {
    val len = length(c)
    when(len > 0,
      length(regexp_replace(c, "[^.,;:!?'\"()-]", "")).cast("double") / len)
      .otherwise(lit(0.0))
  }

  /** Number of occurrences of `word` as a token (space-delimited match,
    * counted via plain-`replace` length arithmetic so it is portable to
    * ANSI SQL; non-overlapping left-to-right in both engines). */
  def wordHits(c: Column, word: String): Column = {
    val padded = concat(lit(" "), lower(c), lit(" "))
    val target = s" $word "
    val stripped = call_function("replace", padded, lit(target), lit(""))
    ((length(padded) - length(stripped)) / lit(target.length)).cast("long")
  }

  /** Stopword ratio: hits of a small English stopword set / token count. */
  def stopwordRatio(c: Column, stopwords: Seq[String] = Seq("the", "a", "of", "and", "to")): Column = {
    val hits = stopwords.map(wordHits(c, _)).reduce(_ + _)
    val n = tokenCount(c)
    when(n > 0, hits.cast("double") / n).otherwise(lit(0.0))
  }

  /** Language markers: tiny per-language stopword sets (public knowledge).
    * CJK presence short-circuits to zh. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des"))

  /** Heuristic language-ID: CJK characters → zh; else argmax of marker
    * hits with 'unknown' when nothing matched. Ties break in the fixed
    * [[langMarkers]] order, so the result is deterministic.
    *
    * The argmax runs over an array of (score, rev, lang) structs built
    * once — array_max compares structs lexicographically, so it picks the
    * highest score and, via the REVERSED index, the earliest language on
    * ties. A pairwise when-fold would re-inline every earlier score
    * expression into each comparison (the tree grows quadratically in the
    * language count), which pushed the generated code for this projection
    * past Janino's 64KB method limit and silently dropped the whole stage
    * to interpreted eval. */
  def langId(c: Column): Column = {
    val n = langMarkers.size
    val best = array_max(array(langMarkers.zipWithIndex.map { case ((lang, ws), i) =>
      struct(
        ws.map(wordHits(c, _)).reduce(_ + _).as("score"),
        lit((n - 1 - i).toLong).as("rev"),
        lit(lang).as("lang"))
    }: _*))
    val hasCjk = length(regexp_replace(c, "[^\\u4e00-\\u9fff]", "")) > 0
    when(hasCjk, lit("zh"))
      .when(best.getField("score") > 0, best.getField("lang"))
      .otherwise(lit("unknown"))
  }

  /** Composite quality score in [0,1]: length band + alpha share +
    * stopword signal. Weights are arbitrary but fixed; per-row double
    * arithmetic only (deterministic across engines). */
  def qualityScore(c: Column): Column = {
    val n = tokenCount(c).cast("double")
    val lengthScore = when(n >= 10 && n <= 10000, lit(1.0))
      .when(n > 0, lit(0.5)).otherwise(lit(0.0))
    val alpha = alphaRatio(c)
    val stop = stopwordRatio(c)
    val stopScore = when(stop > 0.01 && stop < 0.6, lit(1.0)).otherwise(lit(0.0))
    lengthScore * 0.4 + alpha * 0.4 + stopScore * 0.2
  }

  /** Document fingerprint: md5 of the normalized text (hex string —
    * identical in Spark and DuckDB). */
  def fingerprint(c: Column): Column = md5(normalize(c).cast("binary"))

  /** Word n-gram shingles via higher-order functions: contiguous n-token
    * windows joined by a single space. Empty result for short docs —
    * including an all-empty-token doc (empty tokens are filtered, so an
    * empty normalized text yields [] rather than [""]). */
  def shingles(c: Column, n: Int): Column = {
    require(n > 0, s"shingle size must be positive, got $n")
    val toks = filter(tokens(normalize(c)), t => length(t) > 0)
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** PII scrubbing: emails, bare IPv4s, then long digit runs
    * (phone/card/id-ish) replaced with typed placeholder tokens — the
    * standard redaction pass a corpus takes before training. A pure
    * codegen'd regexp_replace chain: map-only at any scale, no UDF.
    * Order matters and is fixed (emails first — they contain digits and
    * dots the later patterns would shred). The placeholders contain no
    * letters@/digits, so the pass is IDEMPOTENT: redact∘redact = redact.
    * Patterns are the conservative RE2∩Java subset, so the DuckDB
    * oracle applies character-identical regexes. */
  def redact(c: Column): Column = {
    val email = regexp_replace(c,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val ip = regexp_replace(email,
      "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>")
    regexp_replace(ip, "\\+?\\d[\\d() -]{6,}\\d", "<NUM>")
  }

  /** Occurrence count of the MOST FREQUENT element of an array column,
    * computed entirely inside the row: for each distinct element, count
    * its occurrences, take the max. O(distinct × total) comparisons per
    * row — documents are short (10³–10⁴ grams), so this in-row quadratic
    * beats the alternative (explode → two shuffled aggregates) by
    * keeping repetition scoring a PURE MAP over the corpus: at 100 TB
    * there is no shuffle at all, every executor streams its split.
    * 0 for an empty array. IMPORTANT caller contract (see
    * graft-spark-perf-pitfalls): pass a column REFERENCE (project the
    * array first), not an expression — HOF lambdas re-evaluate captured
    * subexpressions per element. */
  def topElementCount(arr: Column): Column =
    coalesce(
      array_max(transform(array_distinct(arr),
        x => size(filter(arr, y => y === x)))),
      lit(0)).cast("long")

  /** Shannon-entropy integer NUMERATOR of an array column's element
    * distribution: Σ_distinct c·round(10⁶·ln(n/c)), where c is each
    * distinct element's count and n the array length — the entropy in
    * nats is this over (n·10⁶), one double division the CALLER performs
    * (kept out of here so the per-row value stays an exact integer; a
    * floor-div here would risk ulp-flips against engines with true
    * integer division). Low entropy = repetitive/templated content.
    * Same in-row O(distinct × total) shape and caller contract as
    * [[topElementCount]] (pass a column REFERENCE): at any scale this is
    * a PURE MAP — the elements never leave their row, no explode, no
    * shuffle. Each ln lands on an exact small-integer ratio and is
    * quantized immediately (the Bm25 determinism contract), and the
    * integer sum is order-proof, so any engine that walks the distinct
    * elements in ANY order agrees bit-for-bit. 0 for empty arrays. */
  def entropySumMicro(arr: Column): Column = {
    val n = size(arr)
    val contribs = transform(
      transform(array_distinct(arr), x => size(filter(arr, y => y === x))),
      c => c.cast("long") *
        round(lit(1e6) * log(n.cast("double") / c.cast("double"))).cast("long"))
    when(n > 0, aggregate(contribs, lit(0L), (acc, x) => acc + x))
      .otherwise(lit(0L))
  }
}
