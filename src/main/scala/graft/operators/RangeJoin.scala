package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range join — match each point row to every interval row with
  * `start <= point < end` (half-open, so adjacent windows never
  * double-claim a boundary point) sharing the equi `keys`. The other
  * time-series primitive Spark's join operators don't express
  * efficiently: a naive `ON p.ts BETWEEN i.start AND i.end` non-equi
  * join plans as BroadcastNestedLoopJoin (or a per-key cartesian) —
  * O(|points|·|intervals|) comparisons, the classic 100 TB cliff.
  *
  * Implementation is interval BUCKETING: time is cut into fixed
  * `bucketSeconds` buckets; every interval is exploded into the buckets
  * it covers, every point maps to exactly ONE bucket, and the join is a
  * plain equi-join on (keys, bucket) followed by the residual range
  * filter. Each qualifying (point, interval) pair meets in exactly one
  * bucket — the point's — so no distinct is needed and the output is
  * duplicate-free by construction.
  *
  * Scale shape: one shuffle on (keys, bucket) — hash-partitioned,
  * AQE-splittable, skew-salvageable like any equi-join. The only knob is
  * `bucketSeconds`: an interval spanning `n` buckets is replicated
  * `n` times, so set the bucket near the TYPICAL interval length
  * (replication ≈ len/bucket + 1 ≈ 2). Too-small buckets inflate the
  * interval side; too-large buckets inflate the residual filter's input.
  * Both degrade linearly, not quadratically — there is no setting that
  * reproduces the nested-loop cliff.
  */
object RangeJoin {

  private val Reserved = Seq("__bkt", "__p_us", "__s_us", "__e_us")

  /** Exact floor-division of epoch-microseconds into bucket ids. pmod is
    * always non-negative, so the numerator is an exact multiple of `w`
    * and truncating `div` equals floor even for pre-1970 timestamps —
    * and the DuckDB oracle can spell the identical arithmetic. */
  private def bucketIdSql(usCol: String, w: Long): String =
    s"($usCol - pmod($usCol, ${w}L)) div ${w}L"

  /** Inner point-in-interval join. Output columns: `keys`, then the
    * points side's other columns, then the intervals side's other
    * columns (non-key names must be disjoint — pre-alias collisions).
    * NULL timestamps/bounds never match (SQL comparison semantics);
    * empty intervals (`end <= start`) match nothing, consistent with
    * the half-open contract. `keys` may be empty for a pure range join
    * (the bucket is then the whole join key — only sensible when one
    * side is small or intervals are short). */
  def pointInInterval(points: DataFrame, intervals: DataFrame, keys: Seq[String],
      pointTs: String, startTs: String, endTs: String,
      bucketSeconds: Long = 3600): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be positive, got $bucketSeconds")
    require(points.columns.intersect(Reserved).isEmpty &&
      intervals.columns.intersect(Reserved).isEmpty,
      s"pointInInterval: column names ${Reserved.mkString("/")} are reserved")
    val shared = points.columns.intersect(intervals.columns).filterNot(keys.contains)
    require(shared.isEmpty,
      s"pointInInterval: non-key columns shared by both sides: ${shared.mkString(", ")} — alias one side")
    val w = bucketSeconds * 1000000L

    val p = points
      .withColumn("__p_us", unix_micros(col(pointTs)))
      .withColumn("__bkt", expr(bucketIdSql("__p_us", w)))
    // half-open [start, end): the last covered bucket holds end - 1µs
    val i = intervals
      .filter(col(endTs) > col(startTs))
      .withColumn("__s_us", unix_micros(col(startTs)))
      .withColumn("__e_us", unix_micros(col(endTs)))
      .withColumn("__bkt",
        explode(expr(s"sequence(${bucketIdSql("__s_us", w)}, ${bucketIdSql("(__e_us - 1L)", w)})")))

    val pointCols = points.columns.filterNot(keys.contains)
    val intervalCols = intervals.columns.filterNot(keys.contains)
    p.join(i, keys :+ "__bkt")
      .filter(col("__s_us") <= col("__p_us") && col("__p_us") < col("__e_us"))
      .select((keys ++ pointCols ++ intervalCols).map(col): _*)
  }

  private val ReservedOverlap = Seq("__bkt", "__as_us", "__ae_us", "__bs_us", "__be_us")

  /** Inner interval×interval OVERLAP join: every (left, right) pair of
    * HALF-OPEN intervals with a non-empty intersection —
    * `leftStart < rightEnd AND rightStart < leftEnd` — sharing the equi
    * `keys`. The third time primitive next to [[pointInInterval]] and
    * the as-of join; a raw inequality-only join plans as
    * BroadcastNestedLoopJoin, the same 100 TB cliff.
    *
    * Same grid-bucket scheme, with one twist: BOTH sides explode into
    * the buckets they cover, so a qualifying pair meets in EVERY bucket
    * both spans touch — emission is therefore restricted to the single
    * bucket containing the overlap's START, `max(leftStart, rightStart)`
    * (which every overlapping pair's two spans both cover by
    * definition), making the output duplicate-free by construction with
    * no distinct. Replication is len/bucket + 1 per side; the join
    * stays a (keys, bucket) equi-join — AQE-splittable, skew-
    * salvageable, never quadratic. Empty intervals match nothing; NULL
    * bounds never match. Output: `keys`, left's other columns, right's
    * other columns (non-key names must be disjoint). */
  def intervalOverlap(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftStart: String, leftEnd: String, rightStart: String, rightEnd: String,
      bucketSeconds: Long = 3600): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be positive, got $bucketSeconds")
    require(left.columns.intersect(ReservedOverlap).isEmpty &&
      right.columns.intersect(ReservedOverlap).isEmpty,
      s"intervalOverlap: column names ${ReservedOverlap.mkString("/")} are reserved")
    val shared = left.columns.intersect(right.columns).filterNot(keys.contains)
    require(shared.isEmpty,
      s"intervalOverlap: non-key columns shared by both sides: ${shared.mkString(", ")} — alias one side")
    val w = bucketSeconds * 1000000L

    def exploded(df: DataFrame, startTs: String, endTs: String,
        sOut: String, eOut: String): DataFrame = df
      .filter(col(endTs) > col(startTs))
      .withColumn(sOut, unix_micros(col(startTs)))
      .withColumn(eOut, unix_micros(col(endTs)))
      .withColumn("__bkt",
        explode(expr(s"sequence(${bucketIdSql(sOut, w)}, ${bucketIdSql(s"($eOut - 1L)", w)})")))

    val a = exploded(left, leftStart, leftEnd, "__as_us", "__ae_us")
    val b = exploded(right, rightStart, rightEnd, "__bs_us", "__be_us")
    val leftCols = left.columns.filterNot(keys.contains)
    val rightCols = right.columns.filterNot(keys.contains)
    a.join(b, keys :+ "__bkt")
      .filter(col("__as_us") < col("__be_us") && col("__bs_us") < col("__ae_us"))
      // exactly one emitting bucket per pair: the overlap start's
      .filter(col("__bkt") ===
        expr(bucketIdSql("greatest(__as_us, __bs_us)", w)))
      .select((keys ++ leftCols ++ rightCols).map(col): _*)
  }
}
