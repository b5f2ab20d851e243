package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.{FreqItems, TopKByScore}
import graft.model.Tables
import graft.operators.{Profile, Sketch}

/** OLAP surface beyond the reference's flat GROUP BYs: hierarchical
  * rollup, running/moving windows, pivot, and exact quantiles — the
  * report shapes a warehouse user reaches for next, expressed with the
  * operators Catalyst plans natively (Expand for rollup, a single
  * post-aggregation window, partial+final hash aggregates).
  *
  * Determinism contract: every money aggregate runs in exact integer
  * cent space (`round(x*100)` as BIGINT — the inputs are 2-dp doubles),
  * and doubles only appear in a FINAL per-row division that both engines
  * evaluate as the same single IEEE op. Running sums are integer sums,
  * so window-frame summation ORDER (sequential in Spark, segment-tree in
  * DuckDB) cannot change the result — a double running sum would diverge
  * between engines even though both are "correct".
  */
object OlapQueries {

  /** Exact cents (BIGINT) of a 2-dp double money column. */
  private def cents(c: Column): Column = round(c * 100).cast("long")

  /** Cents→money: one exact cast + one IEEE division. */
  private def money(c: Column): Column = c.cast("double") / 100.0

  /** q15 — sales by (brand, category) with ROLLUP subtotals and grand
    * total. Catalyst plans one Expand (3 grouping sets) into a single
    * partial+final hash aggregate: one scan, one shuffle — the same
    * cost as the flat GROUP BY at any scale. Grouping indicators are
    * exposed (not NULL-mangled labels) so consumers can tell a subtotal
    * row from a NULL group. */
  def q15RollupSales(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir).select("l_partkey", "l_extendedprice")
    val p = Tables.part(spark, dir).select("p_partkey", "p_brand", "p_type")
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .select(col("p_brand").as("brand"), col("p_type").as("category"),
        col("l_extendedprice"))
      .rollup(col("brand"), col("category"))
      .agg(sum(cents(col("l_extendedprice"))).as("__c"), count(lit(1)).as("line_count"),
        // grouping() is only resolvable inside the rollup's aggregate list
        grouping(col("brand")).cast("long").as("g_brand"),
        grouping(col("category")).cast("long").as("g_category"))
      .select(col("brand"), col("category"), col("g_brand"), col("g_category"),
        money(col("__c")).as("sales_amount"), col("line_count"))
      .orderBy("g_brand", "g_category", "brand", "category")
  }

  /** q23 — order counts/sales by (month, status) with CUBE: all four
    * grouping sets (detail, per-month, per-status, grand total) from ONE
    * scan — a 4-way Expand into the same single partial+final aggregate
    * as q15's ROLLUP; the cross-dimension subtotals ROLLUP can't emit. */
  def q23CubeSales(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("year_month"),
        coalesce(col("o_orderstatus"), lit("(NULL)")).as("status"),
        col("o_totalprice"))
      .cube(col("year_month"), col("status"))
      .agg(sum(cents(col("o_totalprice"))).as("__c"), count(lit(1)).as("orders_count"),
        grouping(col("year_month")).cast("long").as("g_month"),
        grouping(col("status")).cast("long").as("g_status"))
      .select(col("year_month"), col("status"), col("g_month"), col("g_status"),
        money(col("__c")).as("sales_amount"), col("orders_count"))
      .orderBy("g_month", "g_status", "year_month", "status")

  /** q16 — daily sales with running total and 7-day moving average. The
    * window runs AFTER aggregation, over one row per day — at 100 TB the
    * fact scan feeds a hash aggregate (shuffle on day) and the ordered
    * window sees only ~years×365 rows; running totals stay in integer
    * cents so frame-summation order can't perturb them. */
  def q16RunningSales(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .select(to_date(col("o_orderdate")).as("sale_date"), cents(col("o_totalprice")).as("__c"))
      .groupBy("sale_date")
      .agg(sum(col("__c")).as("__day_c"), count(lit(1)).as("orders_count"))
    val byDate = Window.orderBy("sale_date")
    val last7 = byDate.rowsBetween(-6, Window.currentRow)
    daily
      .withColumn("__run_c", sum(col("__day_c")).over(byDate.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__w7_c", sum(col("__day_c")).over(last7))
      .withColumn("__w7_n", count(lit(1)).over(last7))
      .select(col("sale_date"), money(col("__day_c")).as("day_sales"), col("orders_count"),
        money(col("__run_c")).as("running_sales"),
        (col("__w7_c").cast("double") / (lit(100.0) * col("__w7_n"))).as("ma7_sales"))
      .orderBy("sale_date")
  }

  /** q17 — month × order-status pivot (explicit status values, so the
    * plan is a single aggregate with three conditional sums — no
    * distinct-values pre-pass, which is what an implicit pivot costs). */
  def q17StatusPivot(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("year_month"),
        col("o_orderstatus"), cents(col("o_totalprice")).as("__c"))
      .groupBy("year_month")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(sum(col("__c")))
      .select(col("year_month"),
        money(col("F")).as("f_sales"), money(col("O")).as("o_sales"),
        money(col("P")).as("p_sales"))
      .orderBy("year_month")

  /** q18 — exact order-value quartiles per status. `percentile` is
    * Spark's EXACT sort-based aggregate (partial per-partition value
    * maps, merged); memory is O(distinct values per group), fine for
    * per-status groups here. At 100 TB with high-cardinality groups the
    * scale path is approx_percentile (t-digest sketch, bounded memory) —
    * same call shape, no oracle parity since sketches are
    * engine-specific. Quartile fractions are dyadic (0.25/0.5/0.75), so
    * interpolating between integer cents is EXACT in both engines no
    * matter how each writes the lerp — the doubles agree bit-for-bit. */
  def q18ValueQuartiles(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderstatus").as("status"), cents(col("o_totalprice")).as("__c"))
      .groupBy("status")
      .agg(
        expr("percentile(__c, array(0.25D, 0.5D, 0.75D))").as("__q"),
        count(lit(1)).as("orders_count"))
      .select(col("status"),
        money(element_at(col("__q"), 1)).as("p25"),
        money(element_at(col("__q"), 2)).as("median"),
        money(element_at(col("__q"), 3)).as("p75"),
        col("orders_count"))
      .orderBy("status")

  /** q25 — quartile VALUE buckets without the global window: NTILE(4)
    * over a whole table plans a single-partition sort (every row
    * shuffles to one task — the canonical scale-killer); here the cut
    * points come from one exact percentile aggregate (a 3-double row),
    * broadcast onto the table, and bucket assignment is three codegen'd
    * comparisons + one partial-agg groupBy. Two pruned single-column
    * scans, no global sort, no skew. Ties land in the LOWER bucket
    * (value-defined buckets — equal values never split across buckets,
    * unlike row-number NTILE), and the dyadic quartile interpolation is
    * bit-exact in both engines (same contract as q18). */
  def q25ValueBuckets(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.orders(spark, dir).select(cents(col("o_totalprice")).as("__c"))
    val cuts = c
      .agg(expr("percentile(__c, array(0.25D, 0.5D, 0.75D))").as("__q"))
      .select(
        element_at(col("__q"), 1).as("__p25"),
        element_at(col("__q"), 2).as("__p50"),
        element_at(col("__q"), 3).as("__p75"))
    c.crossJoin(broadcast(cuts))
      .select(col("__c"),
        (lit(1) +
          when(col("__c") > col("__p25"), 1).otherwise(0) +
          when(col("__c") > col("__p50"), 1).otherwise(0) +
          when(col("__c") > col("__p75"), 1).otherwise(0)).cast("long").as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_orders"),
        money(min(col("__c"))).as("min_value"),
        money(max(col("__c"))).as("max_value"),
        money(sum(col("__c"))).as("total_value"))
      .orderBy("bucket")
  }

  /** q26 — approximate order-value percentiles from a 32-bin equal-width
    * histogram sketch (Sketch.histQuantiles): p50/p90/p99 in one scan
    * with 32 long counters per partition — the bounded-memory quantile
    * path next to q18's exact percentile (O(distinct) memory) and the
    * engine-private approx_percentile t-digest. Fully oracle-gated:
    * integer bin assignment and pinned-order interpolation make the
    * estimates bit-identical across engines. */
  def q26HistQuantiles(spark: SparkSession, dir: String): DataFrame =
    Sketch.histQuantiles(
        Tables.orders(spark, dir).select(cents(col("o_totalprice")).as("__c")),
        col("__c"), bins = 32, probs = Seq(0.5, 0.9, 0.99))
      .select(col("quantile"), (col("est") / lit(100.0)).as("est_value"))
      .orderBy("quantile")

  /** q28 — q26's histogram-quantile sketch PER GROUP: p50/p90 of order
    * value for each status from per-group 32-bin histograms — the
    * "percentiles per segment" read (Sketch.histQuantilesBy). Same
    * bit-exact integer/pinned-order contract as q26, now with per-group
    * edges and targets. */
  def q28HistQuantilesBy(spark: SparkSession, dir: String): DataFrame =
    Sketch.histQuantilesBy(
        Tables.orders(spark, dir).select(col("o_orderstatus"),
          cents(col("o_totalprice")).as("__c")),
        Seq("o_orderstatus"), col("__c"), bins = 32, probs = Seq(0.5, 0.9))
      .select(col("o_orderstatus"), col("quantile"),
        (col("est") / lit(100.0)).as("est_value"))
      .orderBy("o_orderstatus", "quantile")

  /** q27 — count-min-sketch frequency estimates (Sketch.cmsFreq, 4×512
    * counters) of lineitem part keys for the first 20 parts — including
    * parts with no lineitems at all (estimate 0 unless a collision
    * inflates it; CMS is one-sided by construction and the oracle
    * reproduces every collision exactly, since the sketch hashes are
    * md5-derived and engine-portable). */
  def q27CmsFreq(spark: SparkSession, dir: String): DataFrame =
    Sketch.cmsFreq(
        Tables.lineitem(spark, dir).select("l_partkey"),
        "l_partkey",
        Tables.part(spark, dir).filter(col("p_partkey") < 20)
          .select(col("p_partkey").as("l_partkey")),
        d = 4, w = 512)
      .orderBy("l_partkey")

  /** q19 — KMV distinct-count sketch of order keys per return flag. The
    * estimate path (groups hold >> k distinct keys at every test SF) is
    * what's gated: portable md5-derived 48-bit hashes and integer
    * division make the estimate bit-identical across engines, while the
    * shuffle carries at most k hashes per group (see
    * [[graft.operators.Sketch.kmvDistinct]]). */
  def q19KmvDistinct(spark: SparkSession, dir: String): DataFrame =
    Sketch.kmvDistinct(Tables.lineitem(spark, dir), "l_orderkey",
      groupCols = Seq("l_returnflag"), k = 256)
      .orderBy("l_returnflag")

  /** q20 — one-pass profile of the orders table (row/null/distinct
    * counts, value ranges) — the post-load data-quality summary. The
    * profiled projection pre-casts types whose string rendering differs
    * across engines: the timestamp to DATE and the double price to exact
    * cents, so min/max render identically in Spark and the oracle. */
  def q20ProfileOrders(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_orderdate").cast("date").as("o_orderdate"),
      cents(col("o_totalprice")).as("o_totalprice_cents"))
    Profile.profile(o, Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_orderdate", "o_totalprice_cents"))
      .orderBy("col_name")
  }

  /** q24 — q20's profile in its wide-table form: distinct counts from
    * the KMV sketch aggregate (exact below k=256, ~6% error above) —
    * one pass, no Expand, no dedup exchange; ≤256 longs per column per
    * partition reach the shuffle. Same table prep as q20 so the two
    * gates can be compared column-for-column. */
  def q24ProfileSketched(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_orderdate").cast("date").as("o_orderdate"),
      cents(col("o_totalprice")).as("o_totalprice_cents"))
    Profile.profileSketched(o, Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_orderdate", "o_totalprice_cents"), k = 256)
      .orderBy("col_name")
  }

  /** q21 — top-3 parts per brand by revenue, selected by the bounded
    * top-k AGGREGATE ([[graft.expressions.TopKByScore]]) instead of a
    * row_number window: the window shuffles every (brand, part) row to
    * its brand's partition before ranking; the aggregate's map-side
    * partial sends ≤3 candidates per brand per partition. Revenue ranks
    * in exact cents (lossless in the aggregate's double score up to
    * 2^53), tie-broken by part id ascending — the same total order the
    * oracle's ROW_NUMBER spells out. */
  def q21TopPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(
      col("l_partkey"), cents(col("l_extendedprice")).as("__c"))
    val p = Tables.part(spark, dir).select("p_partkey", "p_brand")
    val rev = li.join(p, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_partkey")
      .agg(sum("__c").as("__rev"))
    rev.groupBy("p_brand")
      .agg(TopKByScore(col("__rev").cast("double"), col("p_partkey"), 3).as("__top"))
      .select(col("p_brand"), posexplode(col("__top")))
      .select(col("p_brand"),
        (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("p_partkey"),
        money(col("col.score").cast("long")).as("revenue"))
      .orderBy("p_brand", "rank")
  }

  /** q22 — frequent order priorities per status via the Misra-Gries
    * summary ([[graft.expressions.FreqItems]]): O(capacity) state per
    * group, map-side partials ship ≤ capacity counters — the hot-key
    * detector that feeds Salt's factor choice at 100 TB. Gated on its
    * EXACTNESS precondition (capacity 8 > 5 distinct priorities ⇒ MG
    * counts equal true counts), so the full-recompute oracle matches
    * bit-for-bit; the approximate over-capacity path is spec-gated with
    * its n/(capacity+1) error bound. */
  def q22FreqPriorities(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy("o_orderstatus")
      .agg(FreqItems(col("o_orderpriority"), 8).as("__f"))
      .select(col("o_orderstatus"), posexplode(col("__f")))
      .select(col("o_orderstatus"),
        (col("pos") + 1).cast("long").as("rank"),
        col("col.item").as("o_orderpriority"),
        col("col.est_count").as("n_orders"))
      .orderBy("o_orderstatus", "rank")

  /** One per-column SELECT of the q24 sketched-profile oracle: the KMV
    * estimate from first principles — k-th smallest distinct 48-bit
    * md5 hash at OFFSET k-1, (k-1)·2^48 // kth, exact COUNT(DISTINCT)
    * below k. Constant 71776119061217280 = 255·2^48 (as q19). */
  private def sketchProfileBlock(c: String): String =
    s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows, COUNT($c) AS n_nonnull,
       |       CASE WHEN COUNT(DISTINCT $c) < 256 THEN COUNT(DISTINCT $c)
       |            ELSE 71776119061217280 // (
       |              SELECT h FROM (
       |                SELECT DISTINCT CAST('0x' || substring(md5(CAST($c AS VARCHAR)), 1, 12) AS BIGINT) AS h
       |                FROM t WHERE $c IS NOT NULL)
       |              ORDER BY h LIMIT 1 OFFSET 255) END AS est_distinct,
       |       CAST(MIN($c) AS VARCHAR) AS min_value,
       |       CAST(MAX($c) AS VARCHAR) AS max_value
       |FROM t""".stripMargin

  /** q29 — market-basket pair affinity: the 20 part pairs most often
    * bought together, with the marginals (per-part order counts, total
    * orders) that turn the counts into support/confidence/lift
    * downstream. The self-join is bounded by construction — pairs
    * explode per ORDER (≤ lines²/2 with single-digit lines per order),
    * never across the corpus — and the marginals join AFTER the top-20
    * cut, so they touch 20 rows. The canonical a<b orientation halves
    * the pair space and makes the key deterministic. */
  def q29BasketPairs(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val pairs = l.as("a")
      .join(l.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("part_a"), col("b.l_partkey").as("part_b"))
      .agg(count(lit(1)).as("n_pair"))
      .orderBy(desc("n_pair"), col("part_a"), col("part_b"))
      .limit(20)
    val freq = l.groupBy(col("l_partkey")).agg(count(lit(1)).as("n_part"))
    val tot = l.select(countDistinct(col("l_orderkey")).as("n_orders"))
    pairs
      .join(freq.select(col("l_partkey").as("part_a"), col("n_part").as("n_a")),
        Seq("part_a"))
      .join(freq.select(col("l_partkey").as("part_b"), col("n_part").as("n_b")),
        Seq("part_b"))
      .crossJoin(broadcast(tot))
      .select(col("part_a"), col("part_b"), col("n_pair"),
        col("n_a"), col("n_b"), col("n_orders"))
      .orderBy(desc("n_pair"), col("part_a"), col("part_b"))
  }

  /** q30 — RFM segmentation on a FIXED scoring grid: per customer,
    * recency (days since last order vs the corpus max date), frequency
    * and monetary cents, each bucketed by a business-constant CASE
    * ladder. Deliberately NOT data-derived quantile scores: a global
    * ntile is a one-partition window (the scale anti-pattern
    * q18_value_quartiles documents on its bounded input), while a fixed
    * grid is one partial+final aggregate per customer plus a broadcast
    * 1-row max-date — embarrassingly parallel at any corpus size, and
    * scores stay comparable across runs, which is what a marketing
    * pipeline actually wants. */
  def q30Rfm(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(col("o_custkey"),
      col("o_orderdate").cast("date").as("o_date"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
    val maxd = o.select(max(col("o_date")).as("max_date"))
    def ladder(c: Column, cuts: Seq[Long]): Column =
      cuts.zipWithIndex.foldLeft(lit(1L)) { case (acc, (cut, i)) =>
        when(c >= cut, lit((i + 2).toLong)).otherwise(acc)
      }
    o.groupBy(col("o_custkey"))
      .agg(max(col("o_date")).as("last_order"),
        count(lit(1)).as("frequency"),
        sum(col("cents")).as("monetary_cents"))
      .crossJoin(broadcast(maxd))
      .withColumn("recency_days", datediff(col("max_date"), col("last_order")).cast("long"))
      .withColumn("r_score",
        when(col("recency_days") <= 30, lit(4L))
          .when(col("recency_days") <= 90, lit(3L))
          .when(col("recency_days") <= 365, lit(2L)).otherwise(lit(1L)))
      .withColumn("f_score", ladder(col("frequency"), Seq(5L, 10L, 20L)))
      .withColumn("m_score", ladder(col("monetary_cents"), Seq(10000000L, 30000000L, 100000000L)))
      .select(col("o_custkey"), col("recency_days"), col("frequency"),
        col("monetary_cents"), col("r_score"), col("f_score"), col("m_score"))
      .orderBy("o_custkey")
  }

  /** q31 — HLL distinct orders per return flag: q19's question answered
    * by the CONSTANT-register sketch ([[Sketch.hllDistinct]], p=10 →
    * 1024 registers, ~3.3%) instead of KMV's k-hash buffer — the shape
    * that scales to millions of groups. The oracle rebuilds registers
    * and the integer estimator from first principles on the same md5
    * hash, so the match is bit-exact, not approximate-vs-approximate. */
  def q31HllDistinct(spark: SparkSession, dir: String): DataFrame =
    Sketch.hllDistinct(Tables.lineitem(spark, dir), "l_orderkey",
      groupCols = Seq("l_returnflag"), p = 10)
      .orderBy("l_returnflag")

  /** q32 — KMV set operations: how many customers placed open ('O')
    * vs finished ('F') orders, and how big is the overlap — union /
    * intersection / Jaccard estimated from two 256-hash sketches
    * ([[Sketch.kmvSetOps]]) without shuffling either distinct set. */
  def q32KmvSetops(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    Sketch.kmvSetOps(
      o.filter(col("o_orderstatus") === "O"),
      o.filter(col("o_orderstatus") === "F"),
      "o_custkey", k = 256)
  }

  /** q33 — per-month sales TREND: exact least-squares slope/intercept
    * of daily revenue within each month, from the five classic sums
    * (n, Σx, Σy, Σx², Σxy) kept in BIGINT — one partial+final aggregate
    * over the daily frame, no window, no per-month scan. x is the day
    * of month, y daily cents, so slope reads "cents/day of in-month
    * drift". The ONLY doubles are the final num/den divisions — both
    * engines convert the same exact integers and perform the same two
    * IEEE ops, so even >2^53 numerators stay bit-identical. */
  def q33SalesTrend(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .select(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        dayofmonth(col("o_orderdate")).cast("long").as("x"),
        cents(col("o_totalprice")).as("c"))
      .groupBy("month", "x").agg(sum(col("c")).as("y"))
    daily.groupBy("month")
      .agg(count(lit(1)).as("n_days"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      .withColumn("den", col("n_days") * col("sxx") - col("sx") * col("sx"))
      // den = n·Σx² − (Σx)² > 0 whenever ≥2 distinct days exist; a
      // single-day month has no trend — report NULL, don't divide.
      .select(col("month"), col("n_days"),
        when(col("den") > 0,
          (col("n_days") * col("sxy") - col("sx") * col("sy")).cast("double") /
            col("den").cast("double")).as("slope_cents_per_day"),
        when(col("den") > 0,
          (col("sy") * col("sxx") - col("sx") * col("sxy")).cast("double") /
            col("den").cast("double")).as("intercept_cents"))
      .orderBy("month")
  }

  /** α_ppm for p=10 (m=1024) — computed ONCE here and interpolated into
    * both engines' arithmetic (the operator recomputes the identical
    * value from the same formula). */
  private val HllAlphaPpm1024: Long = math.round(1e6 * 0.7213 / (1.0 + 1.079 / 1024))

  val oracle: Map[String, String] = Map(
    "q31_hll_distinct" ->
      s"""WITH h AS (
         |  SELECT l_returnflag,
         |         CAST('0x' || substring(md5(CAST(l_orderkey AS VARCHAR)), 1, 12) AS BIGINT) AS h
         |  FROM lineitem WHERE l_orderkey IS NOT NULL
         |), r AS (
         |  SELECT l_returnflag, h // 274877906944 AS bucket,
         |         MAX(CASE WHEN h % 274877906944 = 0 THEN 39
         |                  ELSE 39 - length(bin(h % 274877906944)) END) AS m
         |  FROM h GROUP BY 1, 2
         |), s AS (
         |  SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_regs_set,
         |         CAST(1024 - COUNT(*) AS BIGINT) AS n_zero_regs,
         |         (1024 - COUNT(*)) * 1099511627776
         |           + SUM(CAST(1 AS BIGINT) << (40 - m)) AS s
         |  FROM r GROUP BY 1
         |)
         |SELECT l_returnflag, n_regs_set, n_zero_regs,
         |       CAST((1152921504606846976 // s) * $HllAlphaPpm1024 // 1000000 AS BIGINT)
         |         AS est_distinct
         |FROM s ORDER BY l_returnflag""".stripMargin,
    "q32_kmv_setops" ->
      """WITH ha AS (
        |  SELECT DISTINCT CAST('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 1, 12) AS BIGINT) AS h
        |  FROM orders WHERE o_orderstatus = 'O' AND o_custkey IS NOT NULL
        |), hb AS (
        |  SELECT DISTINCT CAST('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 1, 12) AS BIGINT) AS h
        |  FROM orders WHERE o_orderstatus = 'F' AND o_custkey IS NOT NULL
        |), ma AS (SELECT h FROM ha ORDER BY h LIMIT 256),
        |mb AS (SELECT h FROM hb ORDER BY h LIMIT 256),
        |u AS (SELECT h FROM (SELECT h FROM ma UNION SELECT h FROM mb) ORDER BY h LIMIT 256),
        |st AS (
        |  SELECT CAST((SELECT COUNT(*) FROM ma) AS BIGINT) AS n_a,
        |         CAST((SELECT COUNT(*) FROM mb) AS BIGINT) AS n_b,
        |         CAST((SELECT COUNT(*) FROM u) AS BIGINT) AS n_union_kept,
        |         (SELECT h FROM u ORDER BY h LIMIT 1 OFFSET 255) AS kth_min_union,
        |         CAST((SELECT COUNT(*) FROM u
        |                 JOIN ma USING (h) JOIN mb USING (h)) AS BIGINT) AS inter
        |)
        |SELECT n_a, n_b, n_union_kept, kth_min_union,
        |       CAST(CASE WHEN n_union_kept < 256 THEN n_union_kept
        |            ELSE 71776119061217280 // kth_min_union END AS BIGINT) AS est_union,
        |       CAST(inter * 1000000 // n_union_kept AS BIGINT) AS jaccard_ppm,
        |       CAST(inter * (CASE WHEN n_union_kept < 256 THEN n_union_kept
        |              ELSE 71776119061217280 // kth_min_union END)
        |            // n_union_kept AS BIGINT) AS est_intersect
        |FROM st""".stripMargin,
    "q33_sales_trend" ->
      """WITH daily AS (
        |  SELECT strftime(o_orderdate, '%Y-%m') AS month,
        |         CAST(EXTRACT(day FROM o_orderdate) AS BIGINT) AS x,
        |         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
        |  FROM orders GROUP BY 1, 2
        |), s AS (
        |  SELECT month, CAST(COUNT(*) AS BIGINT) AS n_days,
        |         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |         CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(x * y) AS BIGINT) AS sxy
        |  FROM daily GROUP BY 1
        |)
        |SELECT month, n_days,
        |       CASE WHEN n_days * sxx - sx * sx > 0
        |            THEN CAST(n_days * sxy - sx * sy AS DOUBLE)
        |              / CAST(n_days * sxx - sx * sx AS DOUBLE) END AS slope_cents_per_day,
        |       CASE WHEN n_days * sxx - sx * sx > 0
        |            THEN CAST(sy * sxx - sx * sxy AS DOUBLE)
        |              / CAST(n_days * sxx - sx * sx AS DOUBLE) END AS intercept_cents
        |FROM s ORDER BY month""".stripMargin,
    "q29_basket_pairs" ->
      """WITH l AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |p AS (
        |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
        |         CAST(COUNT(*) AS BIGINT) AS n_pair
        |  FROM l a JOIN l b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2
        |),
        |top AS (SELECT * FROM p ORDER BY n_pair DESC, part_a, part_b LIMIT 20),
        |f AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_part FROM l GROUP BY 1),
        |t AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM l)
        |SELECT top.part_a, top.part_b, top.n_pair,
        |       fa.n_part AS n_a, fb.n_part AS n_b, t.n_orders
        |FROM top
        |JOIN f fa ON fa.l_partkey = top.part_a
        |JOIN f fb ON fb.l_partkey = top.part_b
        |CROSS JOIN t
        |ORDER BY n_pair DESC, part_a, part_b""".stripMargin,
    "q30_rfm" ->
      """WITH o AS (
        |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS o_date,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders
        |), agg AS (
        |  SELECT o_custkey, MAX(o_date) AS last_order,
        |         CAST(COUNT(*) AS BIGINT) AS frequency,
        |         CAST(SUM(cents) AS BIGINT) AS monetary_cents
        |  FROM o GROUP BY 1
        |), m AS (SELECT MAX(o_date) AS max_date FROM o)
        |SELECT o_custkey,
        |       CAST(max_date - last_order AS BIGINT) AS recency_days,
        |       frequency, monetary_cents,
        |       CAST(CASE WHEN max_date - last_order <= 30 THEN 4
        |            WHEN max_date - last_order <= 90 THEN 3
        |            WHEN max_date - last_order <= 365 THEN 2
        |            ELSE 1 END AS BIGINT) AS r_score,
        |       CAST(CASE WHEN frequency >= 20 THEN 4 WHEN frequency >= 10 THEN 3
        |            WHEN frequency >= 5 THEN 2 ELSE 1 END AS BIGINT) AS f_score,
        |       CAST(CASE WHEN monetary_cents >= 100000000 THEN 4
        |            WHEN monetary_cents >= 30000000 THEN 3
        |            WHEN monetary_cents >= 10000000 THEN 2
        |            ELSE 1 END AS BIGINT) AS m_score
        |FROM agg CROSS JOIN m
        |ORDER BY o_custkey""".stripMargin,
    "q28_hist_quantiles_by" -> {
      val width = "(CAST(mx - mn + 1 AS DOUBLE) / 32.0)"
      s"""WITH v AS (SELECT o_orderstatus, CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders),
         |st AS (SELECT o_orderstatus, MIN(v) AS mn, MAX(v) AS mx,
         |         CAST(COUNT(*) AS BIGINT) AS n FROM v GROUP BY 1),
         |c AS (SELECT v.o_orderstatus, (v - mn) * 32 // (mx - mn + 1) AS bin,
         |        CAST(COUNT(*) AS BIGINT) AS cnt
         |      FROM v JOIN st USING (o_orderstatus) GROUP BY 1, 2),
         |cc AS (SELECT o_orderstatus, bin, cnt,
         |         CAST(SUM(cnt) OVER (PARTITION BY o_orderstatus ORDER BY bin) AS BIGINT) AS cum
         |       FROM c),
         |p AS (SELECT unnest([0.5, 0.9]) AS quantile),
         |cand AS (SELECT cc.o_orderstatus, quantile,
         |           CAST(CEIL(quantile * CAST(n AS DOUBLE)) AS BIGINT) AS target,
         |           bin, cnt, cum, mn, mx
         |         FROM p CROSS JOIN cc JOIN st USING (o_orderstatus)),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderstatus, quantile
         |        ORDER BY bin) AS rn
         |      FROM cand WHERE cum >= target)
         |SELECT o_orderstatus, quantile,
         |  (CAST(mn AS DOUBLE) + CAST(bin AS DOUBLE) * $width
         |    + (CAST(target - (cum - cnt) AS DOUBLE) / CAST(cnt AS DOUBLE)) * $width) / 100.0
         |    AS est_value
         |FROM r WHERE rn = 1 ORDER BY o_orderstatus, quantile""".stripMargin
    },
    "q27_cms_freq" -> {
      def bucketSql(key: String, i: Int) =
        s"CAST('0x' || substr(md5(CAST($key AS VARCHAR) || '~cms$i'), 1, 12) AS BIGINT) % 512"
      val buildArms = (0 until 4).map(i =>
        s"SELECT $i AS i, ${bucketSql("l_partkey", i)} AS bucket FROM lineitem WHERE l_partkey IS NOT NULL")
        .mkString("\n    UNION ALL ")
      val probeArms = (0 until 4).map(i =>
        s"SELECT l_partkey, $i AS i, ${bucketSql("l_partkey", i)} AS bucket FROM probes")
        .mkString("\n    UNION ALL ")
      s"""WITH cells AS (
         |  SELECT i, bucket, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
         |    $buildArms
         |  ) GROUP BY 1, 2
         |), probes AS (
         |  SELECT p_partkey AS l_partkey FROM part WHERE p_partkey < 20
         |), pr AS (
         |    $probeArms
         |)
         |SELECT pr.l_partkey, MIN(COALESCE(c.cnt, 0)) AS est_count
         |FROM pr LEFT JOIN cells c ON c.i = pr.i AND c.bucket = pr.bucket
         |GROUP BY 1 ORDER BY 1""".stripMargin
    },
    "q26_hist_quantiles" -> {
      val width = "(CAST(mx - mn + 1 AS DOUBLE) / 32.0)"
      s"""WITH v AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v FROM orders),
         |st AS (SELECT MIN(v) AS mn, MAX(v) AS mx, CAST(COUNT(*) AS BIGINT) AS n FROM v),
         |c AS (SELECT (v - mn) * 32 // (mx - mn + 1) AS bin, CAST(COUNT(*) AS BIGINT) AS cnt
         |      FROM v CROSS JOIN st GROUP BY 1),
         |cc AS (SELECT bin, cnt, CAST(SUM(cnt) OVER (ORDER BY bin) AS BIGINT) AS cum FROM c),
         |p AS (SELECT unnest([0.5, 0.9, 0.99]) AS quantile),
         |cand AS (SELECT quantile,
         |           CAST(CEIL(quantile * CAST(n AS DOUBLE)) AS BIGINT) AS target,
         |           bin, cnt, cum, mn, mx
         |         FROM p CROSS JOIN cc CROSS JOIN st),
         |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY quantile ORDER BY bin) AS rn
         |      FROM cand WHERE cum >= target)
         |SELECT quantile,
         |  (CAST(mn AS DOUBLE) + CAST(bin AS DOUBLE) * $width
         |    + (CAST(target - (cum - cnt) AS DOUBLE) / CAST(cnt AS DOUBLE)) * $width) / 100.0
         |    AS est_value
         |FROM r WHERE rn = 1 ORDER BY quantile""".stripMargin
    },
    "q24_profile_sketched" ->
      s"""WITH t AS (
         |  SELECT o_orderkey, o_custkey, o_orderstatus,
         |         CAST(o_orderdate AS DATE) AS o_orderdate,
         |         CAST(round(o_totalprice * 100) AS BIGINT) AS o_totalprice_cents
         |  FROM orders
         |)
         |SELECT * FROM (
         |${Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderdate", "o_totalprice_cents")
            .map(sketchProfileBlock).mkString("\n  UNION ALL\n")}
         |) ORDER BY col_name""".stripMargin,
    "q15_rollup_sales" ->
      """SELECT p.p_brand AS brand, p.p_type AS category,
        |       CAST(GROUPING(p.p_brand) AS BIGINT) AS g_brand,
        |       CAST(GROUPING(p.p_type) AS BIGINT) AS g_category,
        |       CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sales_amount,
        |       COUNT(*) AS line_count
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |GROUP BY ROLLUP (p.p_brand, p.p_type)
        |ORDER BY g_brand, g_category, brand, category""".stripMargin,
    "q23_cube_sales" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS year_month,
        |       COALESCE(o_orderstatus, '(NULL)') AS status,
        |       CAST(GROUPING(strftime(o_orderdate, '%Y-%m')) AS BIGINT) AS g_month,
        |       CAST(GROUPING(COALESCE(o_orderstatus, '(NULL)')) AS BIGINT) AS g_status,
        |       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sales_amount,
        |       COUNT(*) AS orders_count
        |FROM orders
        |GROUP BY CUBE (1, 2)
        |ORDER BY g_month, g_status, year_month, status""".stripMargin,
    "q16_running_sales" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS sale_date,
        |         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS day_c,
        |         COUNT(*) AS orders_count
        |  FROM orders GROUP BY 1
        |), win AS (
        |  SELECT sale_date, day_c, orders_count,
        |         SUM(day_c) OVER (ORDER BY sale_date
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_c,
        |         SUM(day_c) OVER (ORDER BY sale_date
        |           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS w7_c,
        |         COUNT(*) OVER (ORDER BY sale_date
        |           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS w7_n
        |  FROM daily
        |)
        |SELECT sale_date, CAST(day_c AS DOUBLE) / 100.0 AS day_sales, orders_count,
        |       CAST(run_c AS DOUBLE) / 100.0 AS running_sales,
        |       CAST(w7_c AS DOUBLE) / (100.0 * w7_n) AS ma7_sales
        |FROM win ORDER BY sale_date""".stripMargin,
    "q17_status_pivot" ->
      """SELECT strftime(o_orderdate, '%Y-%m') AS year_month,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(round(o_totalprice * 100) AS BIGINT) END) AS DOUBLE) / 100.0 AS f_sales,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(round(o_totalprice * 100) AS BIGINT) END) AS DOUBLE) / 100.0 AS o_sales,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(round(o_totalprice * 100) AS BIGINT) END) AS DOUBLE) / 100.0 AS p_sales
        |FROM orders GROUP BY 1 ORDER BY year_month""".stripMargin,
    "q19_kmv_distinct" ->
      """WITH h AS (
        |  SELECT DISTINCT l_returnflag,
        |         CAST('0x' || substring(md5(CAST(l_orderkey AS VARCHAR)), 1, 12) AS BIGINT) AS h
        |  FROM lineitem WHERE l_orderkey IS NOT NULL
        |), r AS (
        |  SELECT l_returnflag, h,
        |         row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rn
        |  FROM h
        |)
        |SELECT l_returnflag,
        |       CAST(LEAST(COUNT(*), 256) AS BIGINT) AS n_kept,
        |       MAX(CASE WHEN rn = 256 THEN h END) AS kth_min_hash,
        |       CASE WHEN COUNT(*) < 256 THEN COUNT(*)
        |            ELSE 71776119061217280 // MAX(CASE WHEN rn = 256 THEN h END) END AS est_distinct
        |FROM r GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q22_freq_priorities" ->
      """WITH c AS (
        |  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
        |  FROM orders WHERE o_orderpriority IS NOT NULL
        |  GROUP BY o_orderstatus, o_orderpriority
        |)
        |SELECT o_orderstatus,
        |       ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |         ORDER BY n_orders DESC, o_orderpriority ASC) AS rank,
        |       o_orderpriority, n_orders
        |FROM c ORDER BY o_orderstatus, rank""".stripMargin,
    "q21_top_per_group" ->
      """WITH r AS (
        |  SELECT p.p_brand, p.p_partkey,
        |         SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS rev
        |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |  GROUP BY p.p_brand, p.p_partkey
        |), k AS (
        |  SELECT p_brand, p_partkey, rev,
        |         ROW_NUMBER() OVER (PARTITION BY p_brand
        |           ORDER BY rev DESC, p_partkey ASC) AS rank
        |  FROM r
        |)
        |SELECT p_brand, rank, p_partkey, CAST(rev AS DOUBLE) / 100.0 AS revenue
        |FROM k WHERE rank <= 3 ORDER BY p_brand, rank""".stripMargin,
    "q20_profile_orders" ->
      """WITH t AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |         CAST(o_orderdate AS DATE) AS o_orderdate,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS o_totalprice_cents
        |  FROM orders
        |)
        |SELECT * FROM (
        |  SELECT 'o_orderkey' AS col_name, COUNT(*) AS n_rows, COUNT(o_orderkey) AS n_nonnull,
        |         COUNT(DISTINCT o_orderkey) AS n_distinct,
        |         CAST(MIN(o_orderkey) AS VARCHAR) AS min_value,
        |         CAST(MAX(o_orderkey) AS VARCHAR) AS max_value FROM t
        |  UNION ALL
        |  SELECT 'o_custkey', COUNT(*), COUNT(o_custkey), COUNT(DISTINCT o_custkey),
        |         CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR) FROM t
        |  UNION ALL
        |  SELECT 'o_orderstatus', COUNT(*), COUNT(o_orderstatus), COUNT(DISTINCT o_orderstatus),
        |         CAST(MIN(o_orderstatus) AS VARCHAR), CAST(MAX(o_orderstatus) AS VARCHAR) FROM t
        |  UNION ALL
        |  SELECT 'o_orderdate', COUNT(*), COUNT(o_orderdate), COUNT(DISTINCT o_orderdate),
        |         CAST(MIN(o_orderdate) AS VARCHAR), CAST(MAX(o_orderdate) AS VARCHAR) FROM t
        |  UNION ALL
        |  SELECT 'o_totalprice_cents', COUNT(*), COUNT(o_totalprice_cents),
        |         COUNT(DISTINCT o_totalprice_cents),
        |         CAST(MIN(o_totalprice_cents) AS VARCHAR), CAST(MAX(o_totalprice_cents) AS VARCHAR) FROM t
        |) ORDER BY col_name""".stripMargin,
    "q25_value_buckets" ->
      """WITH c AS (
        |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders
        |), cuts AS (
        |  SELECT quantile_cont(cents, 0.25) AS p25,
        |         quantile_cont(cents, 0.5)  AS p50,
        |         quantile_cont(cents, 0.75) AS p75
        |  FROM c
        |), b AS (
        |  SELECT cents,
        |         CAST(1 + (CASE WHEN cents > p25 THEN 1 ELSE 0 END)
        |                + (CASE WHEN cents > p50 THEN 1 ELSE 0 END)
        |                + (CASE WHEN cents > p75 THEN 1 ELSE 0 END) AS BIGINT) AS bucket
        |  FROM c, cuts
        |)
        |SELECT bucket, COUNT(*) AS n_orders,
        |       CAST(MIN(cents) AS DOUBLE) / 100.0 AS min_value,
        |       CAST(MAX(cents) AS DOUBLE) / 100.0 AS max_value,
        |       CAST(SUM(cents) AS DOUBLE) / 100.0 AS total_value
        |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin,
    "q18_value_quartiles" ->
      """WITH c AS (
        |  SELECT o_orderstatus AS status,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders
        |)
        |SELECT status,
        |       quantile_cont(cents, 0.25) / 100.0 AS p25,
        |       quantile_cont(cents, 0.5) / 100.0 AS median,
        |       quantile_cont(cents, 0.75) / 100.0 AS p75,
        |       COUNT(*) AS orders_count
        |FROM c GROUP BY status ORDER BY status""".stripMargin,
  )

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q15_rollup_sales" -> q15RollupSales _,
    "q23_cube_sales" -> q23CubeSales _,
    "q16_running_sales" -> q16RunningSales _,
    "q17_status_pivot" -> q17StatusPivot _,
    "q18_value_quartiles" -> q18ValueQuartiles _,
    "q25_value_buckets" -> q25ValueBuckets _,
    "q26_hist_quantiles" -> q26HistQuantiles _,
    "q27_cms_freq" -> q27CmsFreq _,
    "q28_hist_quantiles_by" -> q28HistQuantilesBy _,
    "q29_basket_pairs" -> q29BasketPairs _,
    "q30_rfm" -> q30Rfm _,
    "q19_kmv_distinct" -> q19KmvDistinct _,
    "q20_profile_orders" -> q20ProfileOrders _,
    "q24_profile_sketched" -> q24ProfileSketched _,
    "q21_top_per_group" -> q21TopPerGroup _,
    "q22_freq_priorities" -> q22FreqPriorities _,
    "q31_hll_distinct" -> q31HllDistinct _,
    "q32_kmv_setops" -> q32KmvSetops _,
    "q33_sales_trend" -> q33SalesTrend _,
  )
}
