package graft

import org.apache.spark.sql.functions._

import graft.operators.Bloom

class BloomSpec extends SparkSpec {
  import sqlImplicits._

  private val fact = Seq[(java.lang.Long, String)](
    (1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"),
    (null, "null-key"), (7L, "g"), (100L, "h"))
    .toDF("fk", "payload")
  private val dim = Seq(1L, 3L, 5L, 7L, 9L).toDF("dk")

  test("bloomSemiJoin equals the plain semi-join exactly") {
    val out = Bloom.bloomSemiJoin(fact, dim, "fk", "dk", expectedItems = 100)
      .orderBy("fk").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val plain = fact.join(dim.select(col("dk").as("fk")), Seq("fk"), "left_semi")
      .orderBy("fk").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out == plain)
    assert(out == Seq((1L, "a"), (3L, "c"), (5L, "e"), (7L, "g")))
  }

  test("high-fpp filter still yields the exact result (join removes FPs)") {
    // 1-bit-per-several-items sketch: nearly everything might_contain
    val out = Bloom.bloomSemiJoin(fact, dim, "fk", "dk",
        expectedItems = 100, fpp = 0.9)
      .orderBy("fk").collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L, 3L, 5L, 7L))
  }

  test("empty or all-NULL dim matches nothing; schema is preserved") {
    val empty = Bloom.bloomSemiJoin(fact, dim.filter(lit(false)), "fk", "dk", 100)
    assert(empty.count() == 0)
    assert(empty.columns.toSeq == Seq("fk", "payload"))
    val nullDim = Seq[java.lang.Long](null, null).toDF("dk")
    assert(Bloom.bloomSemiJoin(fact, nullDim, "fk", "dk", 100).count() == 0)
  }

  test("the bloom probe sits in the plan as a fact-side filter") {
    // ConvertToLocalRelation would eval the filter at optimize time on
    // this in-memory fixture and hide it from the plan; real scans keep
    // it. Exclude the rule so the plan shows what a table scan would.
    val key = "spark.sql.optimizer.excludedRules"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation")
    try {
      val plan = Bloom.bloomSemiJoin(fact, dim, "fk", "dk", 100)
        .queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected a might_contain pre-filter in the plan:\n$plan")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
