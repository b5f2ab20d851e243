package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import sqlImplicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val points = Seq(
    (100L, 1L, ts("2024-01-01 09:00:00")), // == start → IN (inclusive)
    (101L, 1L, ts("2024-01-01 09:59:59")), // inside
    (102L, 1L, ts("2024-01-01 10:00:00")), // == end → OUT (exclusive)
    (103L, 2L, ts("2024-01-01 09:30:00")), // right time, other key
    (104L, 1L, ts("2024-01-02 00:00:00"))  // outside any interval
  ).toDF("pid", "key", "pts")

  private val intervals = Seq(
    (1L, 1L, ts("2024-01-01 09:00:00"), ts("2024-01-01 10:00:00")),
    (2L, 2L, ts("2024-01-01 09:15:00"), ts("2024-01-01 09:45:00")),
    (3L, 1L, ts("2024-01-01 09:30:00"), ts("2024-01-01 09:30:00"))  // empty → never matches
  ).toDF("iid", "key", "istart", "iend")

  private def run(bucketSeconds: Long) =
    RangeJoin.pointInInterval(points, intervals, Seq("key"),
        "pts", "istart", "iend", bucketSeconds)
      .select("pid", "iid").as[(Long, Long)].collect().toSet

  test("half-open [start, end) matching with equi keys") {
    assert(run(3600) == Set((100L, 1L), (101L, 1L), (103L, 2L)))
  }

  test("result is bucket-width-invariant (incl. intervals spanning many buckets)") {
    val expected = run(3600)
    for (w <- Seq(1L, 7L, 60L, 1800L, 86400L)) assert(run(w) == expected, s"bucket=$w")
  }

  test("matches the naive non-equi join on a generated frame") {
    val p = spark.range(200).select(col("id").as("pid"), (col("id") % 5).as("key"),
      timestamp_micros(col("id") * 777000000L).as("pts"))
    val i = spark.range(40).select(col("id").as("iid"), (col("id") % 5).as("key"),
      timestamp_micros(col("id") * 3600000000L).as("istart"),
      timestamp_micros(col("id") * 3600000000L + col("id") * 500000000L).as("iend"))
    val got = RangeJoin.pointInInterval(p, i, Seq("key"), "pts", "istart", "iend", 600)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val naive = p.join(i, Seq("key"))
      .filter(col("istart") <= col("pts") && col("pts") < col("iend"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == naive)
    assert(got.nonEmpty, "generated frames must actually overlap")
  }

  test("output carries key + both sides' columns, exactly once per match") {
    val out = RangeJoin.pointInInterval(points, intervals, Seq("key"),
      "pts", "istart", "iend", 60)
    assert(out.columns.toSeq == Seq("key", "pid", "pts", "iid", "istart", "iend"))
    val rows = out.collect()
    assert(rows.length == rows.map(r => (r.getAs[Long]("pid"), r.getAs[Long]("iid"))).distinct.length)
  }

  test("plan is an equi-join: no cartesian / nested-loop node") {
    val plan = RangeJoin.pointInInterval(points, intervals, Seq("key"),
      "pts", "istart", "iend", 3600).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop in plan:\n$plan")
  }

  private val spansL = Seq(
    (1L, 1L, ts("2024-01-01 09:00:00"), ts("2024-01-01 11:00:00")),
    (2L, 1L, ts("2024-01-01 12:00:00"), ts("2024-01-01 12:30:00")),
    (3L, 2L, ts("2024-01-01 09:00:00"), ts("2024-01-01 11:00:00"))  // other key
  ).toDF("aid", "key", "astart", "aend")

  private val spansR = Seq(
    (10L, 1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 13:00:00")), // overlaps 1 and 2
    (11L, 1L, ts("2024-01-01 11:00:00"), ts("2024-01-01 11:30:00")), // abuts 1 → half-open, no match
    (12L, 1L, ts("2024-01-01 08:00:00"), ts("2024-01-01 09:00:01")), // 1s overlap with 1
    (13L, 1L, ts("2024-01-01 14:00:00"), ts("2024-01-01 14:00:00"))  // empty → never matches
  ).toDF("bid", "key", "bstart", "bend")

  private def runOverlap(bucketSeconds: Long) =
    RangeJoin.intervalOverlap(spansL, spansR, Seq("key"),
        "astart", "aend", "bstart", "bend", bucketSeconds)
      .select("aid", "bid").as[(Long, Long)].collect().toSeq

  test("intervalOverlap: half-open overlap semantics, duplicate-free") {
    val got = runOverlap(3600)
    assert(got.toSet == Set((1L, 10L), (2L, 10L), (1L, 12L)))
    // a pair spanning many shared buckets still emits exactly once
    assert(got.length == got.distinct.length)
  }

  test("intervalOverlap: bucket-width-invariant") {
    val expected = runOverlap(3600).toSet
    for (w <- Seq(1L, 7L, 60L, 1800L, 86400L))
      assert(runOverlap(w).toSet == expected, s"bucket=$w")
  }

  test("intervalOverlap matches the naive non-equi join on a generated frame") {
    val a = spark.range(60).select(col("id").as("aid"), (col("id") % 3).as("key"),
      timestamp_micros(col("id") * 1800000000L).as("astart"),
      timestamp_micros(col("id") * 1800000000L + 2400000000L).as("aend"))
    val b = spark.range(80).select(col("id").as("bid"), (col("id") % 3).as("key"),
      timestamp_micros(col("id") * 1300000000L).as("bstart"),
      timestamp_micros(col("id") * 1300000000L + col("id") % 7 * 1000000000L).as("bend"))
    val got = RangeJoin.intervalOverlap(a, b, Seq("key"),
        "astart", "aend", "bstart", "bend", 600)
      .select("aid", "bid").as[(Long, Long)].collect()
    val naive = a.join(b, Seq("key"))
      // the raw inequality alone would claim EMPTY right intervals
      // ([x, x) sitting inside a span) — half-open ∅ intersects nothing
      .filter(col("astart") < col("aend") && col("bstart") < col("bend"))
      .filter(col("astart") < col("bend") && col("bstart") < col("aend"))
      .select("aid", "bid").as[(Long, Long)].collect().toSet
    assert(got.toSet == naive && got.length == naive.size)
    assert(got.nonEmpty, "generated frames must actually overlap")
  }

  test("intervalOverlap plan is an equi-join: no cartesian / nested-loop node") {
    val plan = RangeJoin.intervalOverlap(spansL, spansR, Seq("key"),
      "astart", "aend", "bstart", "bend", 3600).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop in plan:\n$plan")
  }

  test("reserved and colliding column names are rejected") {
    intercept[IllegalArgumentException](
      RangeJoin.pointInInterval(points.withColumnRenamed("pid", "__bkt"), intervals,
        Seq("key"), "pts", "istart", "iend", 60))
    intercept[IllegalArgumentException](
      RangeJoin.pointInInterval(points.withColumnRenamed("pid", "iid"), intervals,
        Seq("key"), "pts", "istart", "iend", 60))
    intercept[IllegalArgumentException](
      RangeJoin.pointInInterval(points, intervals, Seq("key"), "pts", "istart", "iend", 0))
  }
}
