package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Tables
import graft.operators.{AsOf, RangeJoin}

/** Event-stream analytics over the `events` table: tumbling-window
  * aggregation and gap-based sessionization. The same `window`/
  * `session_window` constructs run unchanged under Structured Streaming
  * (see graft.streaming.StreamOps, which reuses them with a watermark);
  * here they are driver-gated in batch against a DuckDB oracle.
  *
  * The parquet carries nanosecond timestamps, which Spark's reader
  * rejects; [[Tables.events]] reads them as BIGINT nanos and converts via
  * timestamp_micros(ns div 1000) — the oracle applies the identical
  * truncation (epoch_ns // 1000) so both engines see the same microsecond
  * instants.
  */
object EventQueries {

  /** events_hourly — tumbling 1-hour windows per event type; the body is
    * the streaming operator (StreamOps.hourlyStats) run in batch. At
    * scale this is one partial+final hash aggregate; the window start is
    * a deterministic truncation, so the shuffle key is (hour, type). */
  def eventsHourly(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamOps.hourlyStats(Tables.events(spark, dir))
      .orderBy("hour_start", "event_type")

  /** events_sliding — sliding 1-hour/15-minute windows per event type
    * (StreamOps.slidingStats in batch). The oracle reconstructs Spark's
    * window assignment from first principles: the 4 slide-aligned starts
    * S with S <= ts < S+1h are bucket15(ts) - k·15min for k ∈ 0..3. */
  def eventsSliding(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamOps.slidingStats(Tables.events(spark, dir))
      .orderBy("win_start", "event_type")

  /** events_sessionize — 30-minute-gap sessions per user via
    * session_window (the same operator Structured Streaming uses; see
    * StreamOps.sessionize). One shuffle on user_id; session merge is
    * per-key local. */
  def eventsSessionize(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamOps.sessionize(Tables.events(spark, dir))
      .orderBy("user_id", "session_start")

  private val IncidentValue = 200.0

  /** events_session_overlap — interval×interval OVERLAP join
    * (RangeJoin.intervalOverlap): every user session (the
    * events_sessionize intervals) intersecting any "incident window"
    * (a value >= 200 event's following hour), with the exact overlap
    * duration in microseconds. The grid-bucketed join — both spans
    * exploded to covered buckets, pairs emitted only in their overlap-
    * start bucket — never the BroadcastNestedLoopJoin a raw
    * inequality-only join plans to. */
  def eventsSessionOverlap(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val sessions = graft.streaming.StreamOps.sessionize(e)
      .select(col("user_id"), col("session_start"), col("session_end"))
    val incidents = e.filter(col("value") >= IncidentValue)
      .select(col("event_id").as("incident_id"), col("ts").as("inc_start"),
        (col("ts") + expr("INTERVAL 1 HOUR")).as("inc_end"))
    RangeJoin.intervalOverlap(sessions, incidents, Seq.empty,
        "session_start", "session_end", "inc_start", "inc_end")
      .withColumn("overlap_us",
        unix_micros(least(col("session_end"), col("inc_end"))) -
          unix_micros(greatest(col("session_start"), col("inc_start"))))
      .orderBy("user_id", "session_start", "incident_id")
  }

  /** events_asof_purchase — point-in-time join: every click annotated
    * with the user's latest purchase at or before the click
    * (graft.operators.AsOf: one shuffle on user_id + per-key sort; no
    * range-join explosion). The purchase side is pre-aggregated to one
    * row per (user_id, ts) — the as-of determinism precondition. */
  def eventsAsofPurchase(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select("event_id", "user_id", "ts", "value")
    val purchases = e.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts")
      .agg(max(col("event_id")).as("purchase_event_id"),
        max(col("value")).as("purchase_value"))
    AsOf.asofJoin(clicks, purchases, Seq("user_id"), "ts", "ts",
        Seq("purchase_event_id", "purchase_value"))
      .orderBy("user_id", "ts", "event_id")
  }

  /** events_purchase_window — range join: clicks landing inside any
    * purchase's ±30-minute window, aggregated per window
    * (graft.operators.RangeJoin: interval-bucketed equi-join, never the
    * BroadcastNestedLoopJoin a raw BETWEEN join plans to). Window sums
    * run in DECIMAL(18,2) so partition order can't perturb the double. */
  def eventsPurchaseWindow(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"), col("value").as("click_value"))
    val windows = e.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts")
      .agg(max(col("event_id")).as("purchase_event_id"))
      .select(col("user_id"), col("purchase_event_id"),
        (col("ts") - expr("INTERVAL '30' MINUTE")).as("win_start"),
        (col("ts") + expr("INTERVAL '30' MINUTE")).as("win_end"))
    RangeJoin.pointInInterval(clicks, windows, Seq("user_id"),
        "click_ts", "win_start", "win_end", bucketSeconds = 1800)
      .groupBy("user_id", "purchase_event_id", "win_start")
      .agg(count(lit(1)).as("n_clicks"),
        sum(col("click_value").cast("decimal(18,2)")).cast("double").as("click_value"))
      .orderBy("user_id", "win_start", "purchase_event_id")
  }

  /** events_sql_topk — top-5 users by total value per event type, written
    * in SQL TEXT against the registered `graft_topk` aggregate: this
    * gates the SQL-registration path itself (a SQL-first user's view of
    * the bounded top-k), not just the Column API. Totals aggregate in
    * exact cents; ties break (total DESC, user ASC) — the same order the
    * oracle's ROW_NUMBER spells out. */
  def eventsSqlTopk(spark: SparkSession, dir: String): DataFrame = {
    graft.expressions.TopKByScore.register(spark)
    Tables.events(spark, dir).createOrReplaceTempView("graft_events_sql")
    spark.sql("""
      WITH s AS (
        SELECT event_type, user_id,
               SUM(CAST(value AS DECIMAL(18,2))) AS total
        FROM graft_events_sql
        WHERE user_id IS NOT NULL
        GROUP BY event_type, user_id
      ), k AS (
        SELECT event_type,
               graft_topk(CAST(total * 100 AS DOUBLE), user_id, 5) AS top
        FROM s WHERE total IS NOT NULL GROUP BY event_type
      )
      SELECT event_type, CAST(pos + 1 AS BIGINT) AS rank, t.id AS user_id,
             CAST(CAST(t.score AS BIGINT) AS DOUBLE) / 100.0 AS total_value
      FROM k LATERAL VIEW posexplode(top) x AS pos, t
      ORDER BY event_type, rank""")
  }

  /** events_funnel — per-user conversion funnel view → click → purchase:
    * first view, first click at-or-after that view, first purchase
    * at-or-after that click, and how deep the user got (1–3). The
    * sequential dependency (each stage's window opens at the previous
    * stage's timestamp) makes this three aggregates + three joins, ALL
    * keyed on user_id: the first shuffle's hash partitioning is reused
    * by every later join and aggregate (Exchange reuse — no re-shuffle),
    * so at 100 TB the cost is one user_id shuffle of each event subset,
    * never an event-level self-join. */
  def eventsFunnel(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).filter(col("user_id").isNotNull)
    def ofType(t: String) = e.filter(col("event_type") === t).select("user_id", "ts")
    val v = ofType("view").groupBy("user_id").agg(min("ts").as("first_view"))
    val c = ofType("click").join(v, "user_id")
      .filter(col("ts") >= col("first_view"))
      .groupBy("user_id").agg(min("ts").as("first_click"))
    val p = ofType("purchase").join(c, "user_id")
      .filter(col("ts") >= col("first_click"))
      .groupBy("user_id").agg(min("ts").as("first_purchase"))
    v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .select(col("user_id"), col("first_view"), col("first_click"), col("first_purchase"),
        (lit(1) + when(col("first_click").isNotNull, 1).otherwise(0)
          + when(col("first_purchase").isNotNull, 1).otherwise(0)).cast("long").as("funnel_stage"))
      .orderBy("user_id")
  }

  /** events_retention — day-over-day retention: per activity day, how
    * many distinct users were active and how many of them returned the
    * next day (exact integer ppm rate — no float drift). One (day, user)
    * distinct shuffle; the next-day check is a self semi-join on the SAME
    * (day, user) key (the next-day side re-keys day-1), so it
    * co-partitions with the distinct — the classic cohort-retention plan
    * that never leaves the (day, user) partitioning. */
  def eventsRetention(spark: SparkSession, dir: String): DataFrame = {
    val ud = Tables.events(spark, dir).filter(col("user_id").isNotNull)
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
    // activity on day d+1, re-keyed to day d: semi-joining `ud` against
    // this marks exactly the day-d rows whose user returned on d+1
    val nextDay = ud.select(date_sub(col("day"), 1).as("day"), col("user_id"))
    val active = ud.groupBy("day").agg(count(lit(1)).as("n_active"))
    val retained = ud.join(nextDay, Seq("day", "user_id"), "left_semi")
      .groupBy("day").agg(count(lit(1)).as("n_retained"))
    active.join(retained, Seq("day"), "left")
      .select(col("day"), col("n_active"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"))
      .withColumn("retention_ppm", expr("n_retained * 1000000 div n_active"))
      .orderBy("day")
  }

  /** events_attribution — the stream-stream attribution join
    * (StreamOps.attributePurchases) run in batch: every purchase joined
    * to the same user's clicks within the trailing 30 minutes. The BODY
    * is the streaming operator — withWatermark is a no-op in batch, the
    * join tree is identical — so this gate pins the join's values while
    * StreamingSpec pins the watermark/state semantics of the same code.
    * At scale: equi-join on user_id with the range predicates evaluated
    * post-match — one co-keyed shuffle, state GC'd by watermark in the
    * streaming run. */
  def eventsAttribution(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).filter(col("user_id").isNotNull)
    val clicks = e.filter(col("event_type") === "click")
      .select("user_id", "ts", "event_id")
    val purchases = e.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id", "value")
    graft.streaming.StreamOps.attributePurchases(clicks, purchases)
      .orderBy("user_id", "purchase_id", "click_id")
  }

  /** events_gaps — per-user inter-event gap profile via lag(): exact
    * microsecond gaps between consecutive events (ties broken by
    * event_id), aggregated to count/total/max/min per user. The explicit
    * ranking-window coverage (§2.5): one shuffle on user_id + per-key
    * sort, same scale shape as sessionize; all arithmetic in integer
    * micros so no float drift. */
  def eventsGaps(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("__prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .filter(col("__prev_us").isNotNull)
      .withColumn("gap_us", unix_micros(col("ts")) - col("__prev_us"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("gap_us")).as("total_gap_us"),
        max(col("gap_us")).as("max_gap_us"),
        min(col("gap_us")).as("min_gap_us"))
      .orderBy("user_id")
  }

  /** events_pattern — ordered-PATTERN detection (the MATCH_RECOGNIZE /
    * Flink-CEP primitive, relationally): occurrences of
    * `view → purchase` within 1 hour on the same user with NO `click`
    * strictly between them, matched skip-till-next (each anchoring view
    * takes its EARLIEST qualifying purchase). The scalable batch form
    * of a sequence pattern is three co-keyed joins, never a per-user
    * event array or a state machine: (1) A⋈B equi-join on user_id with
    * the time window as a residual predicate; (2) the negation is an
    * ANTI join of the (A,B) pairs against C rows falling inside each
    * pair's open interval — same user_id key, so all three legs reuse
    * ONE hash partitioning (no re-shuffle, the funnel discipline);
    * (3) skip-till-next is a per-anchor window over the bounded match
    * set (≤ matches rows, never events). At 100 TB nothing here holds
    * a user's history in memory — Flink's CEP state machine is the
    * STREAMING form of this exact join tree. */
  def eventsPattern(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(spark, dir).filter(col("user_id").isNotNull)
    def ofType(t: String) = e.filter(col("event_type") === t)
      .select(col("user_id"), col("event_id"), col("ts"))
    val a = ofType("view").select(col("user_id"),
      col("event_id").as("a_id"), col("ts").as("a_ts"))
    val b = ofType("purchase").select(col("user_id"),
      col("event_id").as("b_id"), col("ts").as("b_ts"))
    val c = ofType("click").select(col("user_id"),
      col("ts").as("c_ts"))
    val pairs = a.join(b, Seq("user_id"))
      .filter(col("b_ts") > col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr("INTERVAL 1 HOUR"))
    val clean = pairs.join(c,
      pairs("user_id") === c("user_id") &&
        col("c_ts") > col("a_ts") && col("c_ts") < col("b_ts"),
      "left_anti")
    val w = Window.partitionBy("a_id").orderBy(col("b_ts"), col("b_id"))
    clean.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("user_id"), col("a_id"), col("a_ts"), col("b_id"), col("b_ts"),
        (unix_micros(col("b_ts")) - unix_micros(col("a_ts"))).as("gap_us"))
      .orderBy("user_id", "a_id")
  }

  /** events_paths — top user-journey prefixes: each user's first 5
    * events (by ts, event_id — a total order, so the path string is
    * deterministic) joined into an `a>b>c` path, counted across users,
    * top 20. The per-user prefix is bounded BEFORE the fold (row_number
    * ≤ 5 over the user window, then collect_list of ≤5 structs), so a
    * hot user costs 5 rows in the aggregate, never an unbounded
    * in-memory array — and the window's hash partitioning on user_id is
    * reused by the groupBy (one shuffle end to end). The path family
    * (markov funnels, drop-off analysis) is the event-analytics staple
    * the funnel/retention/attribution gates don't cover: it preserves
    * ORDER within the journey. */
  def eventsPaths(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(spark, dir)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 5)
      .groupBy("user_id")
      .agg(array_sort(collect_list(struct(col("ts"), col("event_id"),
        col("event_type")))).as("steps"))
      .select(array_join(expr("transform(steps, x -> x.event_type)"), ">")
        .as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_users"))
      .orderBy(desc("n_users"), col("path")).limit(20)
  }

  /** events_gapfill — DENSIFIED per-type hourly series: the hourly
    * rollup left-joined onto the full (hour × type) grid so silent
    * hours surface as explicit zeros — what every downstream
    * forecaster/alerter needs (a missing row and a zero row are
    * different facts). The grid derives from ONE bounded 1-row
    * min/max aggregate exploded into a sequence — O(hours) rows
    * (wall-clock-bounded: a decade is ~88k rows) crossed with the
    * distinct types (broadcast), never a row-driven blowup; the fact
    * side stays one partial+final hash aggregate. */
  def eventsGapfill(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(date_trunc("hour", col("ts")).as("hour_start"),
        col("event_type"), col("value"))
    val agg = e.groupBy("hour_start", "event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
    val hours = e.agg(min(col("hour_start")).as("t0"), max(col("hour_start")).as("t1"))
      .select(explode(expr("sequence(t0, t1, interval 1 hour)")).as("hour_start"))
    val types = e.select(col("event_type")).distinct()
    hours.crossJoin(broadcast(types))
      .join(agg, Seq("hour_start", "event_type"), "left")
      .select(col("hour_start"), col("event_type"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        coalesce(col("value_cents"), lit(0L)).as("value_cents"))
      .orderBy("hour_start", "event_type")
  }

  /** events_anomaly — rolling z-score ANOMALY detection on the
    * densified hourly series: each hour's event count is tested against
    * the trailing 24 FULL hours' mean/variance (the densified frame
    * makes "24 rows" = "24 hours"; silent hours count as real zeros —
    * exactly why [[eventsGapfill]] exists). The z-test is EXACT
    * integer algebra — z² > k² cross-multiplied to
    * (n·x − S)² > k²·(n·SS − S²) with S/SS the window sum/sum-of-
    * squares — so no engine's sqrt, mean, or variance kernel touches
    * the verdict; a constant window (variance 0) flags ANY deviation.
    * Warm-up rows (frame < 24 hours) report their partial sums but
    * never flag. Scale shape: the window partitions by event_type over
    * a wall-clock-bounded series (~88k rows/decade/type), after the
    * O(data) work already collapsed into the hourly aggregate. */
  def eventsAnomaly(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy("hour_start")
      .rowsBetween(-24, -1)
    val dev = col("win_n") * col("n_events") - col("win_sum")
    eventsGapfill(spark, dir)
      .select(col("hour_start"), col("event_type"), col("n_events"),
        count(lit(1)).over(w).as("win_n"),
        sum(col("n_events")).over(w).as("win_sum"),
        sum(col("n_events") * col("n_events")).over(w).as("win_sumsq"))
      .withColumn("is_anomaly",
        when(col("win_n") === 24 && dev * dev >
            lit(9L) * (col("win_n") * col("win_sumsq") - col("win_sum") * col("win_sum")),
          1L).otherwise(0L))
      .orderBy("hour_start", "event_type")
  }

  /** events_attribution_weighted — MULTI-TOUCH credit assignment over
    * the attribution join: every click in a purchase's 30-minute
    * horizon gets LINEAR credit (equal split) and POSITION-BASED
    * (U-shape) credit — 40%/40% to first/last touch, the middle 20%
    * split across interior touches; solo touch takes all, a pair splits
    * evenly. All credit arithmetic is EXACT integers (weights in parts-
    * per-million, linear shares in value-micros via integer division)
    * so the gate is bit-stable at any scale; the ranking window
    * partitions by purchase — bounded by the horizon's touches, never a
    * global sort. Last-touch/first-touch models fall out as
    * touch_rank = n/1 filters downstream. */
  def eventsAttributionWeighted(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.events(spark, dir).filter(col("user_id").isNotNull)
    val clicks = e.filter(col("event_type") === "click")
      .select("user_id", "ts", "event_id")
    val purchases = e.filter(col("event_type") === "purchase")
      .select("user_id", "ts", "event_id", "value")
    val byPurchase = Window.partitionBy("purchase_id")
    val ranked = Window.partitionBy("purchase_id").orderBy("click_ts", "click_id")
    graft.streaming.StreamOps.attributePurchases(clicks, purchases)
      .withColumn("touch_rank", row_number().over(ranked).cast("long"))
      .withColumn("n_touches", count(lit(1)).over(byPurchase))
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .withColumn("u_ppm",
        when(col("n_touches") === 1, lit(1000000L))
          .when(col("n_touches") === 2, lit(500000L))
          .when(col("touch_rank") === 1 || col("touch_rank") === col("n_touches"),
            lit(400000L))
          .otherwise(expr("200000L div (n_touches - 2)")))
      .withColumn("linear_micros", expr("(cents * 1000000L) div n_touches"))
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        col("n_touches"), col("touch_rank"), col("cents"),
        col("u_ppm"), col("linear_micros"))
      .orderBy("user_id", "purchase_id", "click_id")
  }

  val oracle: Map[String, String] = Map(
    "events_attribution_weighted" ->
      """WITH e AS (
        |  SELECT user_id, event_type, event_id, value,
        |         make_timestamp(epoch_ns(ts) // 1000) AS ts
        |  FROM events WHERE user_id IS NOT NULL
        |), c AS (
        |  SELECT user_id, ts AS click_ts, event_id AS click_id FROM e
        |  WHERE event_type = 'click'
        |), p AS (
        |  SELECT user_id, ts AS purchase_ts, event_id AS purchase_id, value FROM e
        |  WHERE event_type = 'purchase'
        |), j AS (
        |  SELECT p.user_id, p.purchase_id, c.click_id, c.click_ts, p.value
        |  FROM p JOIN c ON c.user_id = p.user_id
        |    AND c.click_ts <= p.purchase_ts
        |    AND c.click_ts >= p.purchase_ts - INTERVAL 30 MINUTE
        |), r AS (
        |  SELECT *,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY purchase_id
        |      ORDER BY click_ts, click_id) AS BIGINT) AS touch_rank,
        |    CAST(COUNT(*) OVER (PARTITION BY purchase_id) AS BIGINT) AS n_touches,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM j
        |)
        |SELECT user_id, purchase_id, click_id, n_touches, touch_rank, cents,
        |  CAST(CASE WHEN n_touches = 1 THEN 1000000
        |            WHEN n_touches = 2 THEN 500000
        |            WHEN touch_rank = 1 OR touch_rank = n_touches THEN 400000
        |            ELSE 200000 // (n_touches - 2) END AS BIGINT) AS u_ppm,
        |  (cents * 1000000) // n_touches AS linear_micros
        |FROM r ORDER BY user_id, purchase_id, click_id""".stripMargin,
    "events_pattern" ->
      """WITH e AS (SELECT * FROM events WHERE user_id IS NOT NULL),
        |p AS (
        |  SELECT a.user_id, a.event_id AS a_id, a.ts AS a_ts,
        |         b.event_id AS b_id, b.ts AS b_ts
        |  FROM e a JOIN e b ON a.user_id = b.user_id
        |  WHERE a.event_type = 'view' AND b.event_type = 'purchase'
        |    AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
        |    AND NOT EXISTS (
        |      SELECT 1 FROM e c
        |      WHERE c.user_id = a.user_id AND c.event_type = 'click'
        |        AND c.ts > a.ts AND c.ts < b.ts)
        |), r AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY a_id
        |    ORDER BY b_ts, b_id) AS rn FROM p
        |)
        |SELECT user_id, a_id, a_ts, b_id, b_ts,
        |       CAST(epoch_ns(b_ts) // 1000 - epoch_ns(a_ts) // 1000 AS BIGINT) AS gap_us
        |FROM r WHERE rn = 1 ORDER BY user_id, a_id""".stripMargin,
    "events_paths" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) // 1000 AS us, event_id, event_type
        |  FROM events WHERE user_id IS NOT NULL
        |), r AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |    ORDER BY us, event_id) AS rn
        |  FROM e
        |), p AS (
        |  SELECT user_id,
        |         string_agg(event_type, '>' ORDER BY us, event_id) AS path
        |  FROM r WHERE rn <= 5 GROUP BY 1
        |)
        |SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
        |FROM p GROUP BY 1
        |ORDER BY n_users DESC, path LIMIT 20""".stripMargin,
    "events_gapfill" ->
      """WITH e AS (
        |  SELECT time_bucket(INTERVAL '1 hour',
        |           make_timestamp(epoch_ns(ts) // 1000)) AS hour_start,
        |         event_type, value
        |  FROM events
        |), a AS (
        |  SELECT hour_start, event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        |         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |  FROM e GROUP BY 1, 2
        |), h AS (
        |  SELECT unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS hour_start
        |  FROM (SELECT MIN(hour_start) AS t0, MAX(hour_start) AS t1 FROM e)
        |), ty AS (SELECT DISTINCT event_type FROM e)
        |SELECT h.hour_start, ty.event_type,
        |       COALESCE(a.n_events, 0) AS n_events,
        |       COALESCE(a.value_cents, 0) AS value_cents
        |FROM h CROSS JOIN ty
        |LEFT JOIN a ON a.hour_start = h.hour_start AND a.event_type = ty.event_type
        |ORDER BY 1, 2""".stripMargin,
    "events_anomaly" ->
      """WITH e AS (
        |  SELECT time_bucket(INTERVAL '1 hour',
        |           make_timestamp(epoch_ns(ts) // 1000)) AS hour_start,
        |         event_type, value
        |  FROM events
        |), a AS (
        |  SELECT hour_start, event_type, CAST(COUNT(*) AS BIGINT) AS n_events
        |  FROM e GROUP BY 1, 2
        |), h AS (
        |  SELECT unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS hour_start
        |  FROM (SELECT MIN(hour_start) AS t0, MAX(hour_start) AS t1 FROM e)
        |), ty AS (SELECT DISTINCT event_type FROM e),
        |g AS (
        |  SELECT h.hour_start, ty.event_type,
        |         COALESCE(a.n_events, 0) AS n_events
        |  FROM h CROSS JOIN ty
        |  LEFT JOIN a ON a.hour_start = h.hour_start AND a.event_type = ty.event_type
        |), w AS (
        |  SELECT hour_start, event_type, n_events,
        |         CAST(COUNT(*) OVER win AS BIGINT) AS win_n,
        |         CAST(SUM(n_events) OVER win AS BIGINT) AS win_sum,
        |         CAST(SUM(n_events * n_events) OVER win AS BIGINT) AS win_sumsq
        |  FROM g
        |  WINDOW win AS (PARTITION BY event_type ORDER BY hour_start
        |                 ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
        |)
        |SELECT hour_start, event_type, n_events, win_n, win_sum, win_sumsq,
        |       CAST(CASE WHEN win_n = 24
        |                  AND (win_n * n_events - win_sum) * (win_n * n_events - win_sum)
        |                      > 9 * (win_n * win_sumsq - win_sum * win_sum)
        |                 THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
        |FROM w ORDER BY 1, 2""".stripMargin,
    "events_attribution" ->
      """WITH e AS (
        |  SELECT user_id, event_type, event_id, value,
        |         make_timestamp(epoch_ns(ts) // 1000) AS ts
        |  FROM events WHERE user_id IS NOT NULL
        |), c AS (
        |  SELECT user_id, ts AS click_ts, event_id AS click_id FROM e
        |  WHERE event_type = 'click'
        |), p AS (
        |  SELECT user_id, ts AS purchase_ts, event_id AS purchase_id, value FROM e
        |  WHERE event_type = 'purchase'
        |)
        |SELECT p.user_id, p.purchase_id, p.purchase_ts, c.click_id, c.click_ts, p.value
        |FROM p JOIN c ON c.user_id = p.user_id
        |  AND c.click_ts <= p.purchase_ts
        |  AND c.click_ts >= p.purchase_ts - INTERVAL 30 MINUTE
        |ORDER BY p.user_id, purchase_id, click_id""".stripMargin,
    "events_funnel" ->
      """WITH e AS (
        |  SELECT user_id, event_type, make_timestamp(epoch_ns(ts) // 1000) AS ts
        |  FROM events WHERE user_id IS NOT NULL
        |), v AS (
        |  SELECT user_id, MIN(ts) AS first_view FROM e WHERE event_type = 'view' GROUP BY 1
        |), c AS (
        |  SELECT e.user_id, MIN(e.ts) AS first_click
        |  FROM e JOIN v ON v.user_id = e.user_id
        |  WHERE e.event_type = 'click' AND e.ts >= v.first_view GROUP BY 1
        |), p AS (
        |  SELECT e.user_id, MIN(e.ts) AS first_purchase
        |  FROM e JOIN c ON c.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= c.first_click GROUP BY 1
        |)
        |SELECT v.user_id, v.first_view, c.first_click, p.first_purchase,
        |       CAST(1 + (CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END)
        |              + (CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS funnel_stage
        |FROM v LEFT JOIN c ON c.user_id = v.user_id
        |       LEFT JOIN p ON p.user_id = v.user_id
        |ORDER BY v.user_id""".stripMargin,
    "events_retention" ->
      """WITH ud AS (
        |  SELECT DISTINCT CAST(make_timestamp(epoch_ns(ts) // 1000) AS DATE) AS day, user_id
        |  FROM events WHERE user_id IS NOT NULL
        |), act AS (
        |  SELECT day, COUNT(*) AS n_active FROM ud GROUP BY 1
        |), ret AS (
        |  SELECT a.day, COUNT(*) AS n_retained
        |  FROM ud a JOIN ud b ON b.user_id = a.user_id AND b.day = a.day + 1
        |  GROUP BY 1
        |)
        |SELECT act.day, act.n_active,
        |       COALESCE(ret.n_retained, CAST(0 AS BIGINT)) AS n_retained,
        |       (COALESCE(ret.n_retained, CAST(0 AS BIGINT)) * 1000000) // act.n_active AS retention_ppm
        |FROM act LEFT JOIN ret ON ret.day = act.day
        |ORDER BY act.day""".stripMargin,
    "events_gaps" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) // 1000 AS us, event_id
        |  FROM events WHERE user_id IS NOT NULL
        |), g AS (
        |  SELECT user_id,
        |         us - lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS gap_us
        |  FROM e
        |)
        |SELECT user_id, COUNT(*) AS n_gaps,
        |       CAST(SUM(gap_us) AS BIGINT) AS total_gap_us,
        |       MAX(gap_us) AS max_gap_us, MIN(gap_us) AS min_gap_us
        |FROM g WHERE gap_us IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "events_purchase_window" ->
      """WITH e AS (
        |  SELECT event_id, user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts,
        |         event_type, value
        |  FROM events
        |), c AS (
        |  SELECT user_id, ts AS click_ts, value FROM e WHERE event_type = 'click'
        |), p AS (
        |  SELECT user_id, MAX(event_id) AS purchase_event_id,
        |         ts - INTERVAL '30 minutes' AS win_start,
        |         ts + INTERVAL '30 minutes' AS win_end
        |  FROM e WHERE event_type = 'purchase' GROUP BY user_id, ts
        |)
        |SELECT p.user_id, p.purchase_event_id, p.win_start,
        |       COUNT(*) AS n_clicks,
        |       CAST(SUM(CAST(c.value AS DECIMAL(18,2))) AS DOUBLE) AS click_value
        |FROM p JOIN c ON c.user_id = p.user_id
        |             AND c.click_ts >= p.win_start AND c.click_ts < p.win_end
        |GROUP BY 1, 2, 3
        |ORDER BY 1, 3, 2""".stripMargin,
    "events_asof_purchase" ->
      """WITH e AS (
        |  SELECT event_id, user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts,
        |         event_type, value
        |  FROM events
        |), c AS (
        |  SELECT event_id, user_id, ts, value FROM e WHERE event_type = 'click'
        |), p AS (
        |  SELECT user_id, ts, MAX(event_id) AS purchase_event_id,
        |         MAX(value) AS purchase_value
        |  FROM e WHERE event_type = 'purchase' GROUP BY 1, 2
        |)
        |SELECT c.event_id, c.user_id, c.ts, c.value,
        |       p.ts AS asof_ts, p.purchase_event_id, p.purchase_value
        |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND p.ts <= c.ts
        |ORDER BY c.user_id, c.ts, c.event_id""".stripMargin,
    "events_hourly" ->
      """SELECT time_bucket(INTERVAL '1 hour', make_timestamp(epoch_ns(ts) // 1000)) AS hour_start,
        |       event_type, COUNT(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin,
    "events_sql_topk" ->
      """WITH s AS (
        |  SELECT event_type, user_id, SUM(CAST(value AS DECIMAL(18,2))) AS total
        |  FROM events WHERE user_id IS NOT NULL
        |  GROUP BY event_type, user_id
        |), k AS (
        |  SELECT event_type, user_id, total,
        |         ROW_NUMBER() OVER (PARTITION BY event_type
        |           ORDER BY total DESC, user_id ASC) AS rank
        |  FROM s WHERE total IS NOT NULL
        |)
        |SELECT event_type, rank, user_id,
        |       CAST(CAST(total * 100 AS BIGINT) AS DOUBLE) / 100.0 AS total_value
        |FROM k WHERE rank <= 5 ORDER BY event_type, rank""".stripMargin,
    "events_sliding" ->
      """WITH e AS (
        |  SELECT event_type, value, make_timestamp(epoch_ns(ts) // 1000) AS ts FROM events
        |)
        |SELECT time_bucket(INTERVAL '15 minutes', e.ts) - t.k * INTERVAL '15 minutes' AS win_start,
        |       e.event_type, COUNT(*) AS n_events,
        |       CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM e CROSS JOIN range(4) t(k)
        |GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,
    // gaps-and-islands: a session breaks when the gap is >= 30 min
    // (session_window's end bound is exclusive: an event exactly at
    // last_ts + gap starts a new session).
    "events_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts, value, event_id FROM events
        |), m AS (
        |  SELECT *, CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |                   OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |                      >= INTERVAL '30 minutes'
        |                 THEN 1 ELSE 0 END AS brk
        |  FROM e
        |), s AS (
        |  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                           ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m
        |)
        |SELECT user_id, MIN(ts) AS session_start,
        |       MAX(ts) + INTERVAL '30 minutes' AS session_end,
        |       COUNT(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin,
    "events_session_overlap" ->
      """WITH e AS (
        |  SELECT user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts, value, event_id FROM events
        |), m AS (
        |  SELECT *, CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
        |                   OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |                      >= INTERVAL '30 minutes'
        |                 THEN 1 ELSE 0 END AS brk
        |  FROM e
        |), s AS (
        |  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                           ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m
        |), sess AS (
        |  SELECT user_id, MIN(ts) AS session_start,
        |         MAX(ts) + INTERVAL '30 minutes' AS session_end
        |  FROM s GROUP BY user_id, sid
        |), inc AS (
        |  SELECT event_id AS incident_id, ts AS inc_start,
        |         ts + INTERVAL '1 hour' AS inc_end
        |  FROM e WHERE value >= 200
        |)
        |SELECT se.user_id, se.session_start, se.session_end,
        |       i.incident_id, i.inc_start, i.inc_end,
        |       epoch_us(LEAST(se.session_end, i.inc_end))
        |         - epoch_us(GREATEST(se.session_start, i.inc_start)) AS overlap_us
        |FROM sess se JOIN inc i
        |  ON se.session_start < i.inc_end AND i.inc_start < se.session_end
        |ORDER BY se.user_id, se.session_start, i.incident_id""".stripMargin,
  )

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_funnel" -> eventsFunnel _,
    "events_retention" -> eventsRetention _,
    "events_gaps" -> eventsGaps _,
    "events_hourly" -> eventsHourly _,
    "events_sliding" -> eventsSliding _,
    "events_sql_topk" -> eventsSqlTopk _,
    "events_sessionize" -> eventsSessionize _,
    "events_session_overlap" -> eventsSessionOverlap _,
    "events_asof_purchase" -> eventsAsofPurchase _,
    "events_purchase_window" -> eventsPurchaseWindow _,
    "events_attribution" -> eventsAttribution _,
    "events_paths" -> eventsPaths _,
    "events_pattern" -> eventsPattern _,
    "events_gapfill" -> eventsGapfill _,
    "events_anomaly" -> eventsAnomaly _,
    "events_attribution_weighted" -> eventsAttributionWeighted _,
  )
}
