package graft

import org.apache.spark.sql.functions._

import graft.queries.OlapQueries

class OlapQueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q15 rollup: grand total row equals the sum of the detail level") {
    val rows = OlapQueries.q15RollupSales(spark, sf).collect()
    val detail = rows.filter(r => r.getAs[Long]("g_brand") == 0 && r.getAs[Long]("g_category") == 0)
    val subtot = rows.filter(r => r.getAs[Long]("g_brand") == 0 && r.getAs[Long]("g_category") == 1)
    val grand = rows.filter(r => r.getAs[Long]("g_brand") == 1 && r.getAs[Long]("g_category") == 1)
    assert(grand.length == 1)
    def tot(rs: Array[org.apache.spark.sql.Row]) =
      math.round(rs.map(_.getAs[Double]("sales_amount")).sum * 100)
    assert(tot(detail) == tot(grand) && tot(subtot) == tot(grand))
    assert(detail.map(_.getAs[Long]("line_count")).sum == grand.head.getAs[Long]("line_count"))
  }

  test("q23 cube: every grouping set totals to the same grand total") {
    val rows = OlapQueries.q23CubeSales(spark, sf).collect()
    def level(gm: Long, gs: Long) = rows.filter(r =>
      r.getAs[Long]("g_month") == gm && r.getAs[Long]("g_status") == gs)
    def tot(rs: Array[org.apache.spark.sql.Row]) =
      math.round(rs.map(_.getAs[Double]("sales_amount")).sum * 100)
    val grand = level(1, 1)
    assert(grand.length == 1)
    // all four grouping sets present, each reconciling to the grand total
    Seq((0L, 0L), (0L, 1L), (1L, 0L)).foreach { case (gm, gs) =>
      val rs = level(gm, gs)
      assert(rs.nonEmpty, s"grouping set ($gm,$gs) missing")
      assert(tot(rs) == tot(grand), s"grouping set ($gm,$gs) total mismatch")
      assert(rs.map(_.getAs[Long]("orders_count")).sum == grand.head.getAs[Long]("orders_count"))
    }
  }

  test("q16 running total is monotone and ends at the overall sum") {
    val rows = OlapQueries.q16RunningSales(spark, sf).collect()
    val runs = rows.map(_.getAs[Double]("running_sales"))
    assert(runs.zip(runs.tail).forall { case (a, b) => b >= a })
    val total = math.round(rows.map(_.getAs[Double]("day_sales")).sum * 100)
    assert(math.round(runs.last * 100) == total)
    // ma7 of the first row is just that day's sales
    assert(rows.head.getAs[Double]("ma7_sales") == rows.head.getAs[Double]("day_sales"))
  }

  test("q17 pivot cells reconcile with the status distribution") {
    val rows = OlapQueries.q17StatusPivot(spark, sf).collect()
    def colSum(c: String) =
      math.round(rows.flatMap(r => Option(r.getAs[java.lang.Double](c)).map(_.toDouble)).sum * 100)
    val byStatus = Tables.ordersByStatusCents(spark, sf)
    assert(colSum("f_sales") == byStatus("F"))
    assert(colSum("o_sales") == byStatus("O"))
    assert(colSum("p_sales") == byStatus("P"))
  }

  test("q25 value buckets partition the table into ordered quartile bands") {
    val rows = OlapQueries.q25ValueBuckets(spark, sf).collect()
    val total = spark.read.parquet(s"$sf/orders.parquet").count()
    assert(rows.map(_.getAs[Long]("bucket")).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(rows.map(_.getAs[Long]("n_orders")).sum == total)
    // bands don't overlap: each bucket's max <= the next bucket's min
    val bounds = rows.map(r => (r.getAs[Double]("min_value"), r.getAs[Double]("max_value")))
    bounds.sliding(2).foreach { case Array((_, hi), (lo, _)) => assert(hi <= lo) }
    // value-defined quartiles: each band holds roughly a quarter
    rows.map(_.getAs[Long]("n_orders")).foreach(n =>
      assert(math.abs(n - total / 4.0) < total * 0.05, s"bucket size $n vs total $total"))
  }

  test("q18 quartiles are ordered and bracket the per-status means") {
    val rows = OlapQueries.q18ValueQuartiles(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (p25, med, p75) = (r.getAs[Double]("p25"), r.getAs[Double]("median"), r.getAs[Double]("p75"))
      assert(p25 <= med && med <= p75)
      assert(p25 > 0 && r.getAs[Long]("orders_count") > 0)
    }
  }

  private object Tables {
    def ordersByStatusCents(spark: org.apache.spark.sql.SparkSession, dir: String): Map[String, Long] =
      graft.model.Tables.orders(spark, dir)
        .groupBy("o_orderstatus")
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("c"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }
}
