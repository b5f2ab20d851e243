package graft

import org.apache.spark.sql.functions._

import graft.expressions.KmvSketch

class KmvSketchSpec extends SparkSpec {
  import sqlImplicits._

  private def mins(rows: Seq[Long], k: Int, parts: Int = 1): Seq[Long] =
    rows.toDF("h").repartition(parts)
      .agg(KmvSketch(col("h"), k).as("m"))
      .collect().head.getAs[scala.collection.Seq[Long]]("m").toSeq

  test("keeps the k smallest DISTINCT values, ascending") {
    // duplicates must not occupy slots: 5 distinct values, heavy dupes
    val rows = Seq(9L, 3L, 9L, 3L, 7L, 1L, 1L, 5L, 9L)
    assert(mins(rows, k = 3) == Seq(1L, 3L, 5L))
    // below k the buffer holds the whole distinct set
    assert(mins(rows, k = 100) == Seq(1L, 3L, 5L, 7L, 9L))
  }

  test("partition-independent: same set under any parallelism") {
    val rows = (1L to 5000L).map(i => (i * 2654435761L) % 100003L)
    val one = mins(rows, 256, parts = 1)
    val many = mins(rows, 256, parts = 13)
    assert(one == many)
    assert(one.size == 256 && one == one.sorted && one.distinct == one)
  }

  test("nulls are ignored; empty input yields an empty sketch") {
    val withNulls = Seq(Some(5L), None, Some(2L), None).toDF("h")
    val got = withNulls.agg(KmvSketch(col("h"), 4).as("m"))
      .collect().head.getAs[scala.collection.Seq[Long]]("m").toSeq
    assert(got == Seq(2L, 5L))
    val empty = Seq.empty[Long].toDF("h")
      .agg(KmvSketch(col("h"), 4).as("m"))
      .collect().head.getAs[scala.collection.Seq[Long]]("m")
    assert(empty.isEmpty)
  }

  test("graft_kmv is callable from SQL text") {
    KmvSketch.register(spark)
    Seq(4L, 2L, 4L, 8L).toDF("h").createOrReplaceTempView("kmv_t")
    val got = spark.sql("SELECT graft_kmv(h, 2) AS m FROM kmv_t")
      .collect().head.getAs[scala.collection.Seq[Long]]("m").toSeq
    assert(got == Seq(2L, 4L))
  }

  test("partial aggregation: map-side partial + final merge in the plan") {
    val df = (1L to 1000L).toDF("h").repartition(8)
      .agg(KmvSketch(col("h"), 16).as("m"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // ObjectHashAggregate appears twice: partial (map side) and final
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, s"plan:\n$plan")
  }
}
