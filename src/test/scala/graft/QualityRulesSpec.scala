package graft

import graft.operators.QualityRules

class QualityRulesSpec extends SparkSpec {
  import sqlImplicits._

  private def run(rows: Seq[(Long, String)],
      minWords: Long = 5L, maxWords: Long = 10L) =
    QualityRules.gopher(rows.toDF("doc_id", "text"), "doc_id", "text",
        minWords = minWords, maxWords = maxWords)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap

  test("gopher: integer features are exact fixed-point") {
    val got = run(Seq((1L, "the data of and rows")))
    val r = got(1L)
    assert(r.getAs[Long]("n_words") == 5L)
    // chars = 3+4+2+3+4 = 16 → 16*100 div 5 = 320
    assert(r.getAs[Long]("mean_len_x100") == 320L)
    assert(r.getAs[Long]("stop_hits") == 3L) // the, of, and present; a, to absent
    assert(r.getAs[Long]("alpha_ppm") == 1000000L)
  }

  test("gopher: stopword hits count DISTINCT set members present") {
    val got = run(Seq((1L, "the the the data"), (2L, "the a data rows")))
    assert(got(1L).getAs[Long]("stop_hits") == 1L) // 'the' repeated = 1 hit
    assert(got(2L).getAs[Long]("stop_hits") == 2L)
  }

  test("gopher: each rule rejects independently and the verdict conjuncts") {
    val got = run(Seq(
      (1L, "the a big table scan rows"),        // 6 words, passes all
      (2L, "the a"),                            // too short → r_word_count
      (3L, "the a scan scan scan scan scan"),   // top 2-gram 'scan scan' 4/6 → r_repetition
      (4L, "big table scan rows here data")))   // no stopwords → r_stopwords
    assert(got(1L).getAs[Boolean]("verdict"))
    assert(!got(2L).getAs[Boolean]("r_word_count") && !got(2L).getAs[Boolean]("verdict"))
    assert(!got(3L).getAs[Boolean]("r_repetition") && !got(3L).getAs[Boolean]("verdict"))
    assert(!got(4L).getAs[Boolean]("r_stopwords") && !got(4L).getAs[Boolean]("verdict"))
    // the rules that did not fire still pass on the rejected docs
    assert(got(3L).getAs[Boolean]("r_word_count"))
  }

  test("gopher: NULL and empty text behave as zero words, never crash") {
    val got = QualityRules.gopher(
        Seq((1L, null.asInstanceOf[String]), (2L, "")).toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    Seq(1L, 2L).foreach { id =>
      val r = got(id)
      assert(r.getAs[Long]("n_words") == 0L)
      assert(r.getAs[Long]("mean_len_x100") == 0L)
      assert(r.getAs[Long]("rep_ppm") == 0L)
      // ratio rules vacuously pass on n=0; word count rejects
      assert(r.getAs[Boolean]("r_alpha") && r.getAs[Boolean]("r_repetition"))
      assert(!r.getAs[Boolean]("r_word_count") && !r.getAs[Boolean]("verdict"))
    }
  }

  test("gopher: the battery is a pure map — no exchange in the plan") {
    val df = QualityRules.gopher(
      Seq((1L, "the a data")).toDF("doc_id", "text"), "doc_id", "text")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free plan:\n$plan")
  }
}
