package graft

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.operators.Scd

class ScdSpec extends SparkSpec {
  import sqlImplicits._

  private def d(s: String) = Date.valueOf(s)

  test("scd2Build derives version chains with no-change suppression") {
    val events = Seq(
      (1L, d("2024-01-01"), "bronze"),
      (1L, d("2024-02-01"), "bronze"), // no-change: suppressed
      (1L, d("2024-03-01"), "gold"),
      (2L, d("2024-01-15"), "silver"))
      .toDF("k", "valid_from", "tier")
    val out = Scd.scd2Build(events, Seq("k"), Seq("tier"), "valid_from")
      .orderBy("k", "valid_from")
      .collect().map(r => (r.getLong(0), r.getDate(1).toString, r.getString(2),
        Option(r.getDate(3)).map(_.toString), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      (1L, "2024-01-01", "bronze", Some("2024-03-01"), false),
      (1L, "2024-03-01", "gold", None, true),
      (2L, "2024-01-15", "silver", None, true)))
  }

  test("scd2Apply == scd2Build under any batch split, untouched keys pass through") {
    val events = Seq(
      (1L, d("2024-01-01"), "a"), (1L, d("2024-02-01"), "b"),
      (1L, d("2024-03-01"), "b"), (1L, d("2024-04-01"), "c"),
      (2L, d("2024-01-01"), "x"), (2L, d("2024-05-01"), "y"),
      (3L, d("2024-02-01"), "m"))
      .toDF("k", "valid_from", "v")
    val full = Scd.scd2Build(events, Seq("k"), Seq("v"), "valid_from")
      .orderBy("k", "valid_from").collect().map(_.toSeq)
    // split mid-timeline: keys 1 and 2 straddle; key 3 arrives in batch 2
    for (cut <- Seq("2024-02-15", "2024-01-10", "2024-06-01")) {
      val hist = Scd.scd2Build(events.filter(col("valid_from") < lit(cut)),
        Seq("k"), Seq("v"), "valid_from")
      val inc = Scd.scd2Apply(hist, events.filter(col("valid_from") >= lit(cut)),
          Seq("k"), Seq("v"), "valid_from")
        .orderBy("k", "valid_from").collect().map(_.toSeq)
      assert(inc.toSeq == full.toSeq, s"split at $cut diverged")
    }
  }

  test("scd2Apply: a no-change batch event leaves the chain untouched") {
    val hist = Scd.scd2Build(
      Seq((1L, d("2024-01-01"), "a")).toDF("k", "valid_from", "v"),
      Seq("k"), Seq("v"), "valid_from")
    val out = Scd.scd2Apply(hist,
        Seq((1L, d("2024-02-01"), "a")).toDF("k", "valid_from", "v"),
        Seq("k"), Seq("v"), "valid_from")
      .collect()
    assert(out.length == 1)
    assert(out.head.getDate(1).toString == "2024-01-01" && out.head.getBoolean(4))
  }

  test("scd2 handles NULL attribute transitions null-safely") {
    val events = Seq(
      (1L, d("2024-01-01"), null), (1L, d("2024-02-01"), null), // suppressed
      (1L, d("2024-03-01"), "v"), (1L, d("2024-04-01"), null))  // real changes
      .toDF("k", "valid_from", "v")
    val out = Scd.scd2Build(events, Seq("k"), Seq("v"), "valid_from")
      .orderBy("valid_from").collect()
    assert(out.map(_.getDate(1).toString).toSeq ==
      Seq("2024-01-01", "2024-03-01", "2024-04-01"))
  }
}
