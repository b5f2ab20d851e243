package graft

import org.apache.spark.sql.functions._

import graft.functions.Text

/** Pins Text's column functions on literal inputs (the round-2 advice:
  * shingles had zero tests when its slice bug zeroed round 1). */
class TextSpec extends SparkSpec {
  import sqlImplicits._

  private def eval[T](c: org.apache.spark.sql.Column): T =
    spark.range(1).select(c).collect().head.getAs[T](0)

  test("normalize lowercases, strips non-alnum, collapses spaces, trims") {
    assert(eval[String](Text.normalize(lit("  Hello,   WORLD!! 42 "))) == "hello world 42")
    assert(eval[String](Text.normalize(lit("...")))== "")
  }

  test("tokenCount counts single-space-delimited tokens") {
    assert(eval[Int](Text.tokenCount(lit("a b c"))) == 3)
    assert(eval[Int](Text.tokenCount(lit(""))) == 1) // [""] — DuckDB string_split parity
  }

  test("shingles('a b c', 2) == [a b, b c]; short and empty docs give []") {
    def sh(s: String, n: Int): Seq[String] =
      eval[scala.collection.Seq[String]](Text.shingles(lit(s), n)).toSeq
    assert(sh("a b c", 2) == Seq("a b", "b c"))
    assert(sh("a b", 3) == Seq.empty)
    assert(sh("", 1) == Seq.empty)
    assert(sh("!!!", 1) == Seq.empty)
    intercept[IllegalArgumentException](Text.shingles(lit("a b"), 0))
    intercept[IllegalArgumentException](Text.shingles(lit("a b"), -1))
  }

  test("wordHits counts token-delimited occurrences only") {
    assert(eval[Long](Text.wordHits(lit("the cat the hat theory"), "the")) == 2L)
    assert(eval[Long](Text.wordHits(lit("theory other"), "the")) == 0L)
  }

  test("langId picks marker-argmax with deterministic ties, CJK short-circuit") {
    assert(eval[String](Text.langId(lit("the cat and the hat is here"))) == "en")
    assert(eval[String](Text.langId(lit("el perro y la casa de los gatos"))) == "es")
    assert(eval[String](Text.langId(lit("der hund und das haus ist gut"))) == "de")
    assert(eval[String](Text.langId(lit("le chat et les maisons des chiens"))) == "fr")
    assert(eval[String](Text.langId(lit("中文文本"))) == "zh")
    assert(eval[String](Text.langId(lit("xyzzy plugh"))) == "unknown")
  }

  test("fingerprint is normalization-invariant") {
    val a = eval[String](Text.fingerprint(lit("Hello,   World!")))
    val b = eval[String](Text.fingerprint(lit("hello world")))
    val c = eval[String](Text.fingerprint(lit("different text")))
    assert(a == b && a != c && a.length == 32)
  }

  test("quality score lands in [0,1] and rewards normal prose") {
    val good = eval[Double](Text.qualityScore(
      lit("the quick brown fox jumps over the lazy dog and runs to the hills again")))
    val junk = eval[Double](Text.qualityScore(lit("!!!! ???? ####")))
    assert(good > 0.8 && good <= 1.0)
    assert(junk < 0.3 && junk >= 0.0)
  }

  test("redact replaces emails, IPs, digit runs; idempotent; no-PII unchanged") {
    def red(s: String): String = eval[String](Text.redact(lit(s)))
    assert(red("contact bob.smith+x@example.co.uk now") == "contact <EMAIL> now")
    assert(red("server at 192.168.0.1 down") == "server at <IP> down")
    assert(red("call +1 (555) 123-4567 today") == "call <NUM> today")
    assert(red("card 4111 1111 1111 1111") == "card <NUM>")
    // email wins over the digit-run pattern inside the address
    assert(red("a1234567@mail.com") == "<EMAIL>")
    val noPii = "the quick brown fox jumps over the lazy dog"
    assert(red(noPii) == noPii)
    // idempotent: placeholders contain nothing the patterns match
    val mixed = "bob@x.io from 10.0.0.1 phone 555-123-9999"
    assert(red(red(mixed)) == red(mixed))
  }

  test("TextSql: SQL-text functions are the Column-API trees, verbatim") {
    import graft.functions.TextSql
    TextSql.register(spark)
    val docs = Seq(
      (1L, "The QUICK brown fox! Call +1 (555) 123-4567 or a@b.com"),
      (2L, "der hund und die katze und das haus"),
      (3L, "")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("textsql_docs")
    val viaSql = spark.sql("""
      SELECT doc_id, graft_normalize(text) AS n, graft_token_count(text) AS tc,
             graft_quality(text) AS q, graft_lang_id(text) AS l,
             graft_fingerprint(text) AS fp, graft_redact(text) AS r
      FROM textsql_docs""")
    val viaCol = docs.select(col("doc_id"),
      Text.normalize(col("text")).as("n"),
      Text.tokenCount(col("text")).cast("long").as("tc"),
      Text.qualityScore(col("text")).as("q"),
      Text.langId(col("text")).as("l"),
      Text.fingerprint(col("text")).as("fp"),
      Text.redact(col("text")).as("r"))
    assert(viaSql.exceptAll(viaCol).count() == 0 && viaCol.exceptAll(viaSql).count() == 0)
    // and the redaction actually fired through SQL
    val red = viaSql.filter(col("doc_id") === 1).collect().head.getAs[String]("r")
    assert(red.contains("<NUM>") && red.contains("<EMAIL>"))
  }

  test("topElementCount: max multiplicity in-row, 0 for empty") {
    def top(xs: Seq[String]): Long =
      eval[Long](Text.topElementCount(
        if (xs.isEmpty) array().cast("array<string>")
        else array(xs.map(lit): _*)))
    assert(top(Seq("a", "b", "a", "c", "a")) == 3)
    assert(top(Seq("a", "b", "c")) == 1)   // all distinct
    assert(top(Seq("x", "x", "x")) == 3)   // fully repeated
    assert(top(Seq.empty) == 0)
    // over 2-gram shingles: "x x x x" -> grams {x x, x x, x x} -> top 3
    assert(eval[Long](Text.topElementCount(Text.shingles(lit("x x x x"), 2))) == 3)
  }

  test("entropySumMicro: 0 for uniform-single and empty, exact for known mixes") {
    def ent(xs: Seq[String]): Long =
      eval[Long](Text.entropySumMicro(
        if (xs.isEmpty) array().cast("array<string>")
        else array(xs.map(lit): _*)))
    assert(ent(Seq.empty) == 0L)
    assert(ent(Seq("x", "x", "x")) == 0L)            // one symbol: ln(1) = 0
    // two equally-likely symbols: each contributes 1 * round(1e6*ln 2)
    assert(ent(Seq("a", "b")) == 2L * math.round(1e6 * math.log(2)))
    // skewed 3-of-4 + 1-of-4: 3*round(1e6*ln(4/3)) + 1*round(1e6*ln 4)
    assert(ent(Seq("a", "a", "a", "b")) ==
      3L * math.round(1e6 * math.log(4.0 / 3.0)) + math.round(1e6 * math.log(4.0)))
    // order-independence: any permutation sums identically
    assert(ent(Seq("b", "a", "a", "a")) == ent(Seq("a", "a", "b", "a")))
  }
}
