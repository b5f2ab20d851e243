package graft

/** Smoke + shape checks for every registered query at sf0.001 (the DuckDB
  * hash gate runs driver-side; here we pin row-level invariants). */
class QueriesSpec extends SparkSpec {
  val dir = "/root/testdata/sf0.001"

  test("every registered query runs and matches its oracle-key naming") {
    val qs = SparkEntry.queries
    assert(qs.nonEmpty)
    // every oracle key must have a query
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet))
    qs.foreach { case (name, fn) =>
      val df = fn(spark, dir)
      assert(df.columns.nonEmpty, s"$name has no columns")
      df.count() // must execute
    }
  }

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q01 counts match table sizes") {
    val m = SparkEntry.queries("q01_counts")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("lineitem") == spark.read.parquet(s"$dir/lineitem.parquet").count())
    assert(m("orders") == spark.read.parquet(s"$dir/orders.parquet").count())
  }

  test("etl semi+anti partition the input") {
    val semi = SparkEntry.queries("etl_fk_semi")(spark, dir).count()
    val anti = SparkEntry.queries("etl_fk_anti")(spark, dir).count()
    val total = spark.read.parquet(s"$dir/lineitem.parquet").count()
    assert(semi + anti == total && semi > 0 && anti > 0)
  }

  test("dedupe output has unique keys") {
    val out = SparkEntry.queries("etl_dedupe_keep_last")(spark, dir)
    assert(out.count() == out.select("l_orderkey", "l_partkey").distinct().count())
  }

  test("views are queryable BY NAME through spark.sql, like the reference's SQL objects") {
    graft.queries.SalesQueries.registerViews(spark, dir)
    val byDay = spark.sql("SELECT * FROM vw_SalesByDay")
    assert(byDay.columns.toSeq == Seq("sale_date", "total_sales") && byDay.count() > 0)
    val totals = spark.sql(
      "SELECT l_orderkey, order_total FROM vw_OrderTotals WHERE order_total > 0")
    assert(totals.count() > 0)
    // the view is a lazy plan: SQL over it matches the function form
    assert(spark.sql("SELECT count(*) FROM vw_OrderTotals").head().getLong(0) ==
      graft.queries.SalesQueries.vOrderTotals(spark, dir).count())
  }
}
