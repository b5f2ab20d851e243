package graft

import org.apache.spark.sql.functions._

import graft.operators.LangModel

class LangModelSpec extends SparkSpec {
  import sqlImplicits._

  // reference slice = en; tokens: "a a b" and "a c" → cnt(a)=3, b=1, c=1,
  // total=5, V=3, denominator total+V=8
  private val docs = Seq(
    (0L, "en", "a a b"),
    (1L, "en", "a c"),
    (2L, "de", "a z"), // z is OOV
    (3L, "de", "b b b")
  ).toDF("doc_id", "lang", "text")

  private def nllq(p: Double): Long = Math.round(1e6 * -Math.log(p))

  test("unigramNll: add-one smoothed micro-nat sums and OOV handling") {
    val got = LangModel.unigramNll(docs, "doc_id", "text", col("lang") === "en")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("nll_micro"), r.getAs[Double]("avg_nll")))
      .toMap
    val qa = nllq(4.0 / 8.0)  // (3+1)/8
    val qb = nllq(2.0 / 8.0)
    val qc = nllq(2.0 / 8.0)
    val qoov = nllq(1.0 / 8.0)
    assert(got(0L) == ((3L, 2 * qa + qb, (2 * qa + qb).toDouble / 3.0 / 1e6)))
    assert(got(1L) == ((2L, qa + qc, (qa + qc).toDouble / 2.0 / 1e6)))
    // non-reference docs score under the same model; z is out-of-vocab
    assert(got(2L) == ((2L, qa + qoov, (qa + qoov).toDouble / 2.0 / 1e6)))
    assert(got(3L)._2 == 3 * qb)
    // the model only trains on the reference slice: every doc scored
    assert(got.keySet == Set(0L, 1L, 2L, 3L))
  }

  test("scoreWith: frozen vocab reproduces unigramNll; the yardstick cannot drift") {
    val model = LangModel.train(docs, "text", col("lang") === "en")
    // persisted artifact shape: (token, cnt)
    assert(model.columns.toSeq == Seq("token", "cnt"))
    assert(model.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("a" -> 3L, "b" -> 1L, "c" -> 1L))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("nll_micro"))).sortBy(_._1).toSeq
    assert(rows(LangModel.scoreWith(model, docs, "doc_id", "text")) ==
      rows(LangModel.unigramNll(docs, "doc_id", "text", col("lang") === "en")))
    // scoring a batch the model never saw uses the FROZEN counts: the
    // batch's own tokens do not enter the denominator (unlike a naive
    // retrain-per-batch, where new vocab shifts every probability)
    val batch = Seq((10L, "a zzz")).toDF("doc_id", "text")
    val got = rows(LangModel.scoreWith(model, batch, "doc_id", "text")).head
    val qa = nllq(4.0 / 8.0)
    val qoov = nllq(1.0 / 8.0)
    assert(got == ((10L, 2L, qa + qoov)))
  }

  test("unigramNll: fluent-vs-noise ordering and partition independence") {
    val corpus = Seq(
      (0L, "en", "the cat sat on the mat"),
      (1L, "en", "the dog sat on the rug"),
      (2L, "en", "the cat and the dog sat"),
      (10L, "xx", "zzq qqz zqq xqx qxq zzz") // all OOV noise
    ).toDF("doc_id", "lang", "text")
    val got = LangModel.unigramNll(corpus, "doc_id", "text", col("lang") === "en")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("avg_nll")).toMap
    assert(got(10L) > got(0L) && got(10L) > got(1L) && got(10L) > got(2L))
    val re = LangModel.unigramNll(corpus.repartition(7), "doc_id", "text",
        col("lang") === "en")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("avg_nll")).toMap
    assert(re == got)
  }

  test("unigramNll: NULL text scores like empty text — no row is dropped") {
    val withNull = docs.unionAll(
      Seq((9L, "de", null.asInstanceOf[String])).toDF("doc_id", "lang", "text"))
    val got = LangModel.unigramNll(withNull, "doc_id", "text", col("lang") === "en")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("nll_micro"))).toMap
    assert(got.keySet == Set(0L, 1L, 2L, 3L, 9L))
    // empty normalization yields one empty OOV token: denom = 8
    assert(got(9L) == ((1L, nllq(1.0 / 8.0))))
  }

  test("unigramNll: empty reference slice scores NULL, never a rounded infinity") {
    val got = LangModel.unigramNll(docs, "doc_id", "text", lit(false))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.isNullAt(r.fieldIndex("nll_micro")), r.isNullAt(r.fieldIndex("avg_nll"))))
      .toMap
    // token counts still real; the model side is honestly absent
    assert(got.size == 4 && got.values.forall(v => v._1 && v._2))
  }

  // Bigram model over the en slice: pairs (a,a),(a,b) from doc 0 and
  // (a,c) from doc 1 → cnt(a,a)=1, (a,b)=1, (a,c)=1; ctx(a)=3; vocab
  // V = |{a,b,c}| = 3 → seen-pair p = 2/6, known-context OOV p = 1/6,
  // unknown-context OOV p = 1/3
  test("bigramNll: per-context add-one smoothing with both OOV fallbacks") {
    val got = LangModel.bigramNll(docs, "doc_id", "text", col("lang") === "en")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Long]("nll_micro"))).toMap
    val qSeen = nllq(2.0 / 6.0)
    val qCtxOov = nllq(1.0 / 6.0)
    val qNoCtx = nllq(1.0 / 3.0)
    assert(got(0L) == ((2L, 2 * qSeen)))        // (a,a), (a,b)
    assert(got(1L) == ((1L, qSeen)))            // (a,c)
    assert(got(2L) == ((1L, qCtxOov)))          // (a,z): context a, pair unseen
    assert(got(3L) == ((2L, 2 * qNoCtx)))       // (b,b) twice: context b unseen
    assert(got.keySet == Set(0L, 1L, 2L, 3L))
  }

  test("bigramNll: sub-2-token docs are excluded; fluent text scores lower") {
    val tiny = docs.unionAll(Seq((7L, "en", "a"), (8L, "de", null.asInstanceOf[String]))
      .toDF("doc_id", "lang", "text"))
    val got = LangModel.bigramNll(tiny, "doc_id", "text", col("lang") === "en")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("avg_nll")).toMap
    assert(got.keySet == Set(0L, 1L, 2L, 3L)) // 7 and 8 have no bigrams
    // reference-fluent doc 0 (seen pairs, p = 2/6) scores strictly below
    // doc 2's unseen-pair fallback (p = 1/6)
    assert(got(0L) < got(2L))
  }

  test("trainBigram/bigramNllWith: frozen pair table reproduces bigramNll") {
    val model = LangModel.trainBigram(docs, "text", col("lang") === "en")
    assert(model.columns.toSeq == Seq("prev", "tok", "cnt"))
    assert(model.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap ==
      Map(("a", "a") -> 1L, ("a", "b") -> 1L, ("a", "c") -> 1L))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_bigrams"),
        r.getAs[Long]("nll_micro"))).sortBy(_._1).toSeq
    assert(rows(LangModel.bigramNllWith(model, docs, "doc_id", "text")) ==
      rows(LangModel.bigramNll(docs, "doc_id", "text", col("lang") === "en")))
    // a batch the model never saw scores by the FROZEN yardstick:
    // (a,z) = known context a, unseen pair → 1/(ctx(a)+V) = 1/6
    val batch = Seq((10L, "a z")).toDF("doc_id", "text")
    assert(rows(LangModel.bigramNllWith(model, batch, "doc_id", "text")) ==
      Seq((10L, 1L, nllq(1.0 / 6.0))))
  }

  test("bigramNll: empty reference slice scores NULL, never a rounded infinity") {
    val got = LangModel.bigramNll(docs, "doc_id", "text", lit(false))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.isNullAt(r.fieldIndex("nll_micro"))).toMap
    assert(got.size == 4 && got.values.forall(identity))
  }
}
