package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.model.Tables

/** The reference's 14 analytic queries + 2 views, re-expressed Spark-first
  * over the harness testdata (sales schema ↔ TPC-H-ish mapping per
  * /root/repo/FIXTURES.md: Customer→customer, Product→part, Orders→orders,
  * OrderDetail→lineitem).
  *
  * Reference query surface: /root/reference/queries.sql:10-193 and the two
  * views at /root/reference/schema_sales_analytics.sql:101-121.
  *
  * Determinism contract (for the DuckDB-oracle hash compare):
  *  - every double SUM goes through DECIMAL(18,2) per-row casts so the
  *    aggregate is exact and order-independent, then back to DOUBLE so the
  *    output schema matches DuckDB's; see [[dsum]];
  *  - AVG is expressed as exact-sum / count — one IEEE double division that
  *    both engines evaluate identically;
  *  - every ORDER BY carries enough tie-break keys that the row sequence is
  *    unique up to fully-identical rows.
  *
  * Scale notes (the plans these produce at 100 TB):
  *  - fact⋈fact joins (orders⋈lineitem) shuffle on the join key — that is
  *    the right plan; AQE picks SMJ vs shuffled-hash at runtime;
  *  - dimension joins (part, customer at TPC-H proportions ~1/10 of fact)
  *    stay under autoBroadcastJoinThreshold per-partition at typical dim
  *    sizes; we additionally hint `broadcast()` where the dimension is
  *    bounded by schema design (part, customer side of top-k queries);
  *  - top-k (ORDER BY + LIMIT) plans as TakeOrderedAndProject — no global
  *    sort materialization;
  *  - group-bys are partial+final hash aggregates (map-side combine), so
  *    the shuffle carries one row per group per partition, not raw rows.
  */
object SalesQueries {

  /** Order-independent exact sum of a double column: per-row cast to
    * DECIMAL(18,2) (exact for 2-dp-generated data), exact decimal sum,
    * then back to double. Matches
    * `CAST(SUM(CAST(c AS DECIMAL(18,2))) AS DOUBLE)` in ANSI SQL. */
  private def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  /** q1 — row counts per table, unioned (queries.sql:10-13). */
  def q01Counts(spark: SparkSession, dir: String): DataFrame = {
    def one(name: String): DataFrame =
      Tables.load(spark, dir, name)
        .agg(count(lit(1)).as("n"))
        .select(lit(name).as("table_name"), col("n"))
    one("customer").union(one("part")).union(one("orders")).union(one("lineitem"))
      .orderBy("table_name")
  }

  /** q2 — TOP-10 row sample, newest keys first (queries.sql:19-22).
    * Plans as TakeOrderedAndProject — no full sort at scale. */
  def q02Sample(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .orderBy(col("o_orderkey").desc)
      .limit(10)

  /** The reference's post-load verification samples ALL FOUR loaded
    * tables, not just orders (Result Set del select de cada tabla
    * cargada..sql:5-27). Same TakeOrderedAndProject shape per table;
    * lineitem orders by its full composite key so the top-k is total. */
  def q02SampleCustomer(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).orderBy(col("c_custkey").desc).limit(10)

  def q02SamplePart(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir).orderBy(col("p_partkey").desc).limit(10)

  def q02SampleLineitem(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .orderBy(col("l_orderkey").desc, col("l_linenumber").desc)
      .limit(10)

  /** Lineitem pre-aggregated to exact per-order decimal sums — the
    * partial-agg-below-join pushdown Catalyst won't do (same rationale
    * as q6): the orderkey shuffle the orders join pays anyway now
    * carries map-combined per-order partials instead of raw line items,
    * and every downstream date/month/order aggregate sees ONE row per
    * order. Exact by decimal associativity. */
  private def perOrderSales(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_extendedprice")
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2))).as("__order_sales"))

  /** q3 — sales by day (queries.sql:28-34; also vw_SalesByDay). */
  def q03SalesByDay(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_orderdate")
    o.join(perOrderSales(spark, dir), o("o_orderkey") === col("l_orderkey"))
      .groupBy(to_date(col("o_orderdate")).as("sale_date"))
      .agg(sum(col("__order_sales")).cast("double").as("total_sales"))
      .orderBy(col("sale_date").desc)
  }

  /** q4 — sales by month, ISO yyyy-MM (queries.sql:40-46). */
  def q04SalesByMonth(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_orderdate")
    o.join(perOrderSales(spark, dir), o("o_orderkey") === col("l_orderkey"))
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("year_month"))
      .agg(sum(col("__order_sales")).cast("double").as("total_sales"))
      .orderBy(col("year_month").desc)
  }

  /** q5 — top-10 products by sales (queries.sql:52-60). part is the
    * bounded dimension side → broadcast hint. */
  def q05TopProducts(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir).select("l_partkey", "l_extendedprice", "l_quantity")
    val p = Tables.part(spark, dir).select("p_partkey", "p_name")
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .groupBy(col("p_partkey"), col("p_name"))
      .agg(
        dsum(col("l_extendedprice")).as("sales_amount"),
        dsum(col("l_quantity")).as("units"))
      .orderBy(col("sales_amount").desc, col("p_partkey"))
      .limit(10)
  }

  /** q6 — top-10 customers by sales with distinct-order counts
    * (queries.sql:66-75). customer is the dimension → broadcast. The
    * display name reproduces the reference's NULL-safe
    * CONCAT(ISNULL(a,''),' ',ISNULL(b,'')) (queries.sql:68, F3+F4).
    *
    * Scale shape: lineitem is PRE-AGGREGATED per order below the join
    * (partial-agg pushdown the optimizer won't do for us). The orderkey
    * shuffle it costs is one the plain join pays anyway, but with
    * map-side combine it ships per-order partials instead of raw line
    * items; the fact side entering the customer aggregate is then one
    * row per ORDER (not per line item), and COUNT(DISTINCT o_orderkey)
    * becomes a plain count(*) — no doubling Expand. Exact by decimal
    * associativity: sum of per-order exact sums = the flat sum. */
  def q06TopCustomers(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val c = Tables.customer(spark, dir).select("c_custkey", "c_name", "c_mktsegment")
    val perOrder = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_extendedprice")
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2))).as("__order_sales"))
    o.join(perOrder, o("o_orderkey") === perOrder("l_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .agg(
        sum(col("__order_sales")).cast("double").as("sales_amount"),
        count(lit(1)).as("orders_count"))
      .select(col("c_custkey"), col("c_name"),
        concat(coalesce(col("c_name"), lit("")), lit(" "),
          coalesce(col("c_mktsegment"), lit(""))).as("customer_display"),
        col("sales_amount"), col("orders_count"))
      .orderBy(col("sales_amount").desc, col("c_custkey"))
      .limit(10)
  }

  /** q7 — order-status distribution with NULL bucketing (queries.sql:81-86). */
  def q07StatusDistribution(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(coalesce(col("o_orderstatus"), lit("(NULL)")).as("status"))
      .agg(count(lit(1)).as("orders_count"))
      .orderBy(col("orders_count").desc, col("status"))

  /** q8 — average order value: per-order totals then one global aggregate
    * (queries.sql:93-103). Two Aggregate nodes, one exchange on the order
    * key; the outer aggregate is a single-row reduce. */
  def q08AverageOrderValue(spark: SparkSession, dir: String): DataFrame = {
    val perOrder = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2))).as("order_total"))
    perOrder.agg(
      count(lit(1)).as("num_orders"),
      sum(col("order_total")).cast("double").as("gross_sales"))
      .select(
        col("num_orders"),
        col("gross_sales"),
        (col("gross_sales") / col("num_orders")).as("avg_order_value"))
  }

  /** q9 — products with no sales: anti-join part ⟕̸ lineitem
    * (queries.sql:109-113). Empty on the harness data — exercised for
    * plan parity; the non-trivial anti-join is q10. */
  def q09ProductsWithoutSales(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    val l = Tables.lineitem(spark, dir).select("l_partkey")
    p.join(l, p("p_partkey") === l("l_partkey"), "left_anti")
      .select("p_partkey", "p_name", "p_type", "p_retailprice", "p_size")
      .orderBy("p_partkey")
  }

  /** q10 — customers with no orders (queries.sql:119-123), made non-trivial
    * on this data by restricting the probe to 1998 orders. The filter on
    * the build side lands before the anti-join's shuffle. */
  def q10CustomersWithoutOrders(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1998-01-01").cast("date") &&
              col("o_orderdate") <  lit("1999-01-01").cast("date"))
      .select("o_custkey")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** q11 — line detail of the latest order with estimated unit price
    * (queries.sql:130-148). The scalar "latest OrderID" pick is a 1-row
    * broadcast cross-join — no driver collect. Unit price stays a single
    * per-row IEEE division (deterministic across engines). */
  def q11LatestOrderDetail(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_orderdate")
    val maxKey = o.agg(max(col("o_orderkey")).as("max_orderkey"))
    val l = Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity", "l_extendedprice")
    val p = Tables.part(spark, dir).select("p_partkey", "p_name")
    l.join(broadcast(maxKey), l("l_orderkey") === maxKey("max_orderkey"))
      .join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .select(
        col("l_orderkey"), col("o_orderdate"), col("l_partkey"), col("p_name"),
        col("l_quantity"), col("l_extendedprice"),
        when(col("l_quantity") > 0, col("l_extendedprice") / col("l_quantity"))
          .as("estimated_unit_price"),
        col("l_suppkey"), col("l_linenumber"))
      .orderBy("l_partkey", "l_suppkey", "l_linenumber")
      .drop("l_suppkey", "l_linenumber")
  }

  /** q12 — reconciliation: per-order line totals (queries.sql:156-163).
    * With the per-order pre-aggregate the join is 1:1 on the key, so no
    * second aggregate exists at all — just a projection. */
  def q12OrderTotalsReconciliation(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_orderdate")
    o.join(perOrderSales(spark, dir), o("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"), col("o_orderdate"),
        col("__order_sales").cast("double").as("lines_total"))
      .orderBy(col("o_orderkey").desc)
  }

  /** q13 — sales by product category (queries.sql:169-176); p_type plays
    * Category. */
  def q13SalesByCategory(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir).select("l_partkey", "l_extendedprice", "l_quantity")
    val p = Tables.part(spark, dir).select("p_partkey", "p_type")
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .groupBy(col("p_type").as("category"))
      .agg(
        dsum(col("l_extendedprice")).as("sales_amount"),
        dsum(col("l_quantity")).as("units"))
      .orderBy(col("sales_amount").desc, col("category"))
  }

  /** q14 — date-range sales report (queries.sql:182-193); the reference's
    * GETDATE()-relative window is parameterized to a fixed anchor so the
    * result is reproducible, but the range is still COMPUTED with date
    * arithmetic exactly as the reference does (DATEADD(day, -n, @d) and
    * the half-open DATEADD(day, 1, @d2) upper bound — F9). */
  def q14DateRangeSales(spark: SparkSession, dir: String): DataFrame = {
    val anchor = lit("1998-12-31").cast("date") // stands in for GETDATE()
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= date_add(anchor, -364) &&
              col("o_orderdate") <  date_add(anchor, 1))
      .select("o_orderkey", "o_orderdate")
    o.join(perOrderSales(spark, dir), o("o_orderkey") === col("l_orderkey"))
      .groupBy(to_date(col("o_orderdate")).as("sale_date"))
      .agg(sum(col("__order_sales")).cast("double").as("total_sales"))
      .orderBy(col("sale_date").desc)
  }

  /** vw_OrderTotals (schema_sales_analytics.sql:113-121): per-order total,
    * item count (NULL-safe), and line count. */
  def vOrderTotals(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(
        dsum(col("l_extendedprice")).as("order_total"),
        dsum(coalesce(col("l_quantity"), lit(0.0))).as("total_items"),
        count(lit(1)).as("lines"))
      .orderBy("l_orderkey")

  /** vw_SalesByDay (schema_sales_analytics.sql:101-108) — same body as q3,
    * exposed as the view name for API parity. */
  def vSalesByDay(spark: SparkSession, dir: String): DataFrame =
    q03SalesByDay(spark, dir)

  /** SQL-text parity with the reference's view OBJECTS
    * (schema_sales_analytics.sql:101-121): registers vw_SalesByDay and
    * vw_OrderTotals as session temp views, so a SQL-first user can run
    * `spark.sql("SELECT * FROM vw_SalesByDay")` exactly as they would
    * against the reference warehouse. Views are lazy plans — each query
    * against them re-resolves against the parquet under `dir`, with the
    * usual pushdown/pruning (a filter over the view reaches the scan). */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    vSalesByDay(spark, dir).createOrReplaceTempView("vw_SalesByDay")
    vOrderTotals(spark, dir).createOrReplaceTempView("vw_OrderTotals")
  }

  /** DuckDB-equivalent ANSI SQL for each query above (driver oracle). */
  val oracle: Map[String, String] = Map(
    "q01_counts" ->
      """SELECT * FROM (
        |  SELECT 'customer' AS table_name, COUNT(*) AS n FROM customer
        |  UNION ALL SELECT 'part', COUNT(*) FROM part
        |  UNION ALL SELECT 'orders', COUNT(*) FROM orders
        |  UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
        |) ORDER BY table_name""".stripMargin,
    "q02_sample" ->
      "SELECT * FROM orders ORDER BY o_orderkey DESC LIMIT 10",
    "q02_sample_customer" ->
      "SELECT * FROM customer ORDER BY c_custkey DESC LIMIT 10",
    "q02_sample_part" ->
      "SELECT * FROM part ORDER BY p_partkey DESC LIMIT 10",
    "q02_sample_lineitem" ->
      "SELECT * FROM lineitem ORDER BY l_orderkey DESC, l_linenumber DESC LIMIT 10",
    "q03_sales_by_day" ->
      """SELECT CAST(o.o_orderdate AS DATE) AS sale_date,
        |       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_sales
        |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |GROUP BY 1 ORDER BY sale_date DESC""".stripMargin,
    "q04_sales_by_month" ->
      """SELECT strftime(o.o_orderdate, '%Y-%m') AS year_month,
        |       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_sales
        |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |GROUP BY 1 ORDER BY year_month DESC""".stripMargin,
    "q05_top_products" ->
      """SELECT p.p_partkey, p.p_name,
        |       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sales_amount,
        |       CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS units
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |GROUP BY 1, 2 ORDER BY sales_amount DESC, p.p_partkey LIMIT 10""".stripMargin,
    "q06_top_customers" ->
      """SELECT c.c_custkey, c.c_name,
        |       COALESCE(c.c_name, '') || ' ' || COALESCE(c.c_mktsegment, '') AS customer_display,
        |       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sales_amount,
        |       COUNT(DISTINCT o.o_orderkey) AS orders_count
        |FROM orders o
        |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY 1, 2, 3 ORDER BY sales_amount DESC, c.c_custkey LIMIT 10""".stripMargin,
    "q07_status_distribution" ->
      """SELECT COALESCE(o_orderstatus, '(NULL)') AS status, COUNT(*) AS orders_count
        |FROM orders GROUP BY 1 ORDER BY orders_count DESC, status""".stripMargin,
    "q08_average_order_value" ->
      """WITH per_order AS (
        |  SELECT l_orderkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS order_total
        |  FROM lineitem GROUP BY 1
        |)
        |SELECT COUNT(*) AS num_orders,
        |       CAST(SUM(order_total) AS DOUBLE) AS gross_sales,
        |       CAST(SUM(order_total) AS DOUBLE) / COUNT(*) AS avg_order_value
        |FROM per_order""".stripMargin,
    "q09_products_without_sales" ->
      """SELECT p_partkey, p_name, p_type, p_retailprice, p_size
        |FROM part p WHERE NOT EXISTS (
        |  SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
        |ORDER BY p_partkey""".stripMargin,
    "q10_customers_without_orders" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer c WHERE NOT EXISTS (
        |  SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |    AND o.o_orderdate >= DATE '1998-01-01'
        |    AND o.o_orderdate <  DATE '1999-01-01')
        |ORDER BY c_custkey""".stripMargin,
    "q11_latest_order_detail" ->
      """SELECT l.l_orderkey, o.o_orderdate, l.l_partkey, p.p_name,
        |       l.l_quantity, l.l_extendedprice,
        |       CASE WHEN l.l_quantity > 0
        |            THEN l.l_extendedprice / l.l_quantity END AS estimated_unit_price
        |FROM lineitem l
        |JOIN orders o ON o.o_orderkey = l.l_orderkey
        |JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE l.l_orderkey = (SELECT MAX(o_orderkey) FROM orders)
        |ORDER BY l.l_partkey, l.l_suppkey, l.l_linenumber""".stripMargin,
    "q12_order_totals_reconciliation" ->
      """SELECT o.o_orderkey, o.o_orderdate,
        |       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS lines_total
        |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |GROUP BY 1, 2 ORDER BY o.o_orderkey DESC""".stripMargin,
    "q13_sales_by_category" ->
      """SELECT p.p_type AS category,
        |       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sales_amount,
        |       CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS units
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |GROUP BY 1 ORDER BY sales_amount DESC, category""".stripMargin,
    "q14_date_range_sales" ->
      """SELECT CAST(o.o_orderdate AS DATE) AS sale_date,
        |       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_sales
        |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |WHERE o.o_orderdate >= DATE '1998-12-31' - 364
        |  AND o.o_orderdate <  DATE '1998-12-31' + 1
        |GROUP BY 1 ORDER BY sale_date DESC""".stripMargin,
    "v_order_totals" ->
      """SELECT l_orderkey,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS order_total,
        |       CAST(SUM(CAST(COALESCE(l_quantity, 0) AS DECIMAL(18,2))) AS DOUBLE) AS total_items,
        |       COUNT(*) AS lines
        |FROM lineitem GROUP BY 1 ORDER BY l_orderkey""".stripMargin,
    "v_sales_by_day" ->
      """SELECT CAST(o.o_orderdate AS DATE) AS sale_date,
        |       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_sales
        |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |GROUP BY 1 ORDER BY sale_date DESC""".stripMargin,
  )

  /** Query registry (names align with [[oracle]] keys). */
  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_counts" -> q01Counts _,
    "q02_sample" -> q02Sample _,
    "q02_sample_customer" -> q02SampleCustomer _,
    "q02_sample_part" -> q02SamplePart _,
    "q02_sample_lineitem" -> q02SampleLineitem _,
    "q03_sales_by_day" -> q03SalesByDay _,
    "q04_sales_by_month" -> q04SalesByMonth _,
    "q05_top_products" -> q05TopProducts _,
    "q06_top_customers" -> q06TopCustomers _,
    "q07_status_distribution" -> q07StatusDistribution _,
    "q08_average_order_value" -> q08AverageOrderValue _,
    "q09_products_without_sales" -> q09ProductsWithoutSales _,
    "q10_customers_without_orders" -> q10CustomersWithoutOrders _,
    "q11_latest_order_detail" -> q11LatestOrderDetail _,
    "q12_order_totals_reconciliation" -> q12OrderTotalsReconciliation _,
    "q13_sales_by_category" -> q13SalesByCategory _,
    "q14_date_range_sales" -> q14DateRangeSales _,
    "v_order_totals" -> vOrderTotals _,
    "v_sales_by_day" -> vSalesByDay _,
  )
}
