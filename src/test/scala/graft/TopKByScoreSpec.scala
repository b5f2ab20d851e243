package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.TopKByScore

class TopKByScoreSpec extends SparkSpec {
  import sqlImplicits._

  test("matches the row_number window top-k on randomized data, any partitioning") {
    val rnd = new scala.util.Random(5)
    val rows = Seq.fill(2000)((rnd.nextInt(20).toLong, rnd.nextLong(1000), rnd.nextInt(50) / 10.0))
      .map { case (g, id, s) => (g, id, s) }
    // force many upstream partitions so partial/merge paths really run
    val df = rows.toDF("g", "id", "score").repartition(13)
    val k = 4
    val agg = df.groupBy("g")
      .agg(TopKByScore(col("score"), col("id"), k).as("top"))
      .select(col("g"), posexplode(col("top")))
      .select(col("g"), col("col.id").as("id"), col("col.score").as("score"),
        (col("pos") + 1).as("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
    val win = df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("g", "id", "score", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(agg == win)
  }

  test("keeps at most k, best-first, with (score desc, id asc) tie-break") {
    val df = Seq((1L, 10L, 1.0), (1L, 11L, 1.0), (1L, 12L, 1.0), (1L, 13L, 0.5))
      .toDF("g", "id", "score")
    val got = df.groupBy("g").agg(TopKByScore(col("score"), col("id"), 2).as("top"))
      .select(explode(col("top"))).select("col.id", "col.score")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq((10L, 1.0), (11L, 1.0))) // ties broken by lowest id
  }

  test("null scores/ids are ignored; empty groups yield empty arrays") {
    val df = Seq(
      (1L, Some(10L), Some(1.0)), (1L, None, Some(2.0)), (1L, Some(11L), None),
      (2L, None, None)
    ).toDF("g", "id", "score")
    val got = df.groupBy("g").agg(TopKByScore(col("score"), col("id"), 3).as("top"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1).length).toMap
    assert(got(1L) == 1 && got(2L) == 0)
  }

  test("plan aggregates partially before the shuffle") {
    val df = spark.range(100).select((col("id") % 5).as("g"), col("id"),
      (col("id") % 7).cast("double").as("score"))
    val agg = df.groupBy("g").agg(TopKByScore(col("score"), col("id"), 3).as("top"))
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("partial_graft_topk_by_score") ||
      "ObjectHashAggregate".r.findAllIn(plan).size >= 2 ||
      "SortAggregate".r.findAllIn(plan).size >= 2)
  }
}
