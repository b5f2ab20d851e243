package graft

import graft.operators.LangProfile

class LangProfileSpec extends SparkSpec {
  import sqlImplicits._

  // two "languages" with genuinely different character statistics
  private val docs = Seq(
    (1L, "aa", "der hund und die katze laufen durch den wald und der regen faellt"),
    (2L, "aa", "die sonne und der mond stehen ueber dem wald und den feldern dort"),
    (3L, "bb", "el perro y el gato corren por el bosque y la lluvia cae fuerte"),
    (4L, "bb", "la luna y el sol estan sobre el bosque y los campos verdes hoy"),
    (5L, "aa", "der wind weht durch die baeume und die voegel singen in dem wald"),
    (6L, "bb", "los pajaros cantan en los arboles y el viento sopla por el campo")
  ).toDF("doc_id", "lang", "text")

  test("profiles: top-k ranked trigrams per language, ties lexical") {
    val p = LangProfile.profiles(docs, "lang", "text", k = 10)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(p.count(_._1 == "aa") == 10 && p.count(_._1 == "bb") == 10)
    assert(p.filter(_._1 == "aa").map(_._3).sorted.toSeq == (1L to 10L))
    // 'der' sequences are frequent in aa and absent from bb's top ranks
    assert(p.exists(x => x._1 == "aa" && x._2 == "er "))
  }

  test("classify recovers the language of every training doc") {
    val pred = LangProfile.classify(docs, "doc_id", "lang", "text", k = 64)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang_pred")).toMap
    val truth = docs.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang")).toMap
    assert(pred == truth)
  }

  test("classify scores an unlabeled-style near-duplicate to its language") {
    // a fresh sentence reusing aa's character patterns classifies aa
    val aug = docs.union(Seq((7L, "zz", "und der wald und die katze und der hund dort"))
      .toDF("doc_id", "lang", "text"))
    // train on the six originals only, but classify all seven rows: the
    // profile of fake lang zz comes from one doc, yet doc 7's grams are
    // pure aa — distance to aa must beat bb
    val out = LangProfile.classify(aug, "doc_id", "lang", "text", k = 64)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang_pred")).toMap
    assert(Set("aa", "zz").contains(out(7L))) // its own grams dominate both
    assert(out(7L) != "bb")
  }

  test("classifyWith: frozen profiles reproduce classify bit-for-bit") {
    val prof = LangProfile.profiles(docs, "lang", "text", k = 64)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang_pred"),
        r.getAs[Long]("dist"))).sortBy(_._1).toSeq
    // frozen-apply on the training slice == self-trained classify
    assert(rows(LangProfile.classifyWith(prof, docs, "doc_id", "text", k = 64)) ==
      rows(LangProfile.classify(docs, "doc_id", "lang", "text", k = 64)))
    // a NEW batch (no labels, never seen in training) classifies against
    // the frozen table, and its presence cannot perturb another doc's
    // score — the frozen-yardstick contract
    val batch = Seq(
      (10L, "und der wald und die katze und der hund laufen dort im regen"),
      (11L, "el gato y el perro corren por el campo con la lluvia")
    ).toDF("doc_id", "text")
    val out = LangProfile.classifyWith(prof, batch, "doc_id", "text", k = 64)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang_pred")).toMap
    assert(out == Map(10L -> "aa", 11L -> "bb"))
    val solo = LangProfile.classifyWith(prof, batch.filter($"doc_id" === 10L),
      "doc_id", "text", k = 64).collect()
    assert(solo.length == 1 && solo.head.getAs[String]("lang_pred") == "aa")
  }

  test("docs too short for a trigram are excluded, not erroneous") {
    val withShort = docs.union(Seq((8L, "aa", "ab")).toDF("doc_id", "lang", "text"))
    val out = LangProfile.classify(withShort, "doc_id", "lang", "text")
    assert(out.filter($"doc_id" === 8L).count() == 0)
    assert(out.count() == 6)
  }
}
