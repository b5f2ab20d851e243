package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.expressions.FreqItems

class FreqItemsSpec extends SparkSpec {
  import sqlImplicits._

  private def items(df: org.apache.spark.sql.DataFrame): Seq[(String, Long)] =
    df.select(explode(col("f")).as("e")).select("e.item", "e.est_count")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  test("exact when distinct items fit the capacity, in (count desc, item) order") {
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(3)("c") ++ Seq("d"))
      .toDF("v").repartition(7)
    val out = items(df.agg(FreqItems(col("v"), 8).as("f")))
    assert(out == Seq(("a", 5L), ("b", 3L), ("c", 3L), ("d", 1L)))
  }

  test("over capacity: heavy hitter survives with MG error bound, any partitioning") {
    // 1000 of "hot", 1 each of 200 cold items; n = 1200, capacity 9
    // → undercount ≤ n/(capacity+1) = 120
    val rows = Seq.fill(1000)("hot") ++ (0 until 200).map(i => f"cold$i%03d")
    for (parts <- Seq(1, 13)) {
      val df = rows.toDF("v").repartition(parts)
      val out = items(df.agg(FreqItems(col("v"), 9).as("f")))
      assert(out.size <= 9)
      val hot = out.toMap.get("hot")
      assert(hot.nonEmpty, s"heavy hitter evicted at parts=$parts: $out")
      assert(hot.get <= 1000L && hot.get >= 1000L - 120L,
        s"hot count ${hot.get} outside MG bound")
    }
  }

  test("null items are ignored; empty group yields an empty summary") {
    val df = Seq[Option[String]](Some("x"), None, Some("x"), None).toDF("v")
    assert(items(df.agg(FreqItems(col("v"), 4).as("f"))) == Seq(("x", 2L)))
    val empty = Seq.empty[String].toDF("v")
    val r = empty.agg(FreqItems(col("v"), 4).as("f")).head
    assert(r.getSeq[Row](0).isEmpty)
  }

  test("SQL registration: graft_freq_items and graft_topk callable from spark.sql") {
    graft.expressions.FreqItems.register(spark)
    graft.expressions.TopKByScore.register(spark)
    Seq("a", "a", "b").toDF("v").createOrReplaceTempView("fi_t")
    val f = spark.sql("SELECT graft_freq_items(v, 4) AS f FROM fi_t").head
      .getSeq[Row](0).map(e => (e.getString(0), e.getLong(1)))
    assert(f == Seq(("a", 2L), ("b", 1L)))
    Seq((1.0, 10L), (3.0, 30L), (2.0, 20L)).toDF("s", "i")
      .createOrReplaceTempView("tk_t")
    val t = spark.sql("SELECT graft_topk(s, i, 2) AS t FROM tk_t").head
      .getSeq[Row](0).map(e => (e.getDouble(0), e.getLong(1)))
    assert(t == Seq((3.0, 30L), (2.0, 20L)))
  }

  test("grouped: per-group summaries are independent and exact under capacity") {
    val df = Seq(("g1", "a"), ("g1", "a"), ("g1", "b"), ("g2", "z")).toDF("g", "v")
    val out = df.groupBy("g").agg(FreqItems(col("v"), 4).as("f"))
      .orderBy("g").collect()
      .map(r => r.getString(0) ->
        r.getSeq[Row](1).map(e => (e.getString(0), e.getLong(1))))
    assert(out.toSeq == Seq(
      "g1" -> Seq(("a", 2L), ("b", 1L)),
      "g2" -> Seq(("z", 1L))))
  }
}
