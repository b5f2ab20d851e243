package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the time-series primitive Spark's join
  * operators don't express directly: for each left row, attach the
  * single right row with the greatest `rightTs <= leftTs` among rows
  * sharing the join keys (LEFT semantics: unmatched left rows keep NULL
  * payload).
  *
  * Implementation is the sort-merge carry-forward, NOT a range join:
  * both sides are tagged and unioned, one window per key ordered by
  * (ts, side) carries the last-seen right payload forward onto every
  * left row. Cost is ONE shuffle on the keys + a per-key sort — the
  * plan that survives 100 TB. The tempting alternatives don't: a
  * non-equi `l.ts >= r.ts` join explodes to O(|L|·|R|) per key before
  * aggregation, and `r.ts BETWEEN l.ts - delta AND l.ts` range tricks
  * miss matches older than delta.
  */
object AsOf {

  /** `payload` names the right columns to attach; the matched right
    * timestamp is attached as `asof_ts`. The right side must be unique
    * per (keys, rightTs) — with duplicates, which right row wins is
    * nondeterministic (pre-aggregate the right side to make it so).
    * Ties `rightTs == leftTs` match (inclusive, as in SQL ASOF JOIN).
    * NULL semantics follow SQL ASOF JOIN: a right row with a NULL key
    * or NULL `rightTs` matches nothing (dropped before the union — the
    * window would otherwise group NULL keys together and carry a
    * NULLS-FIRST NULL-ts payload onto every left row of its partition);
    * a left row with a NULL key or NULL `leftTs` keeps NULL payload
    * (it sorts before every surviving right row in its partition, or
    * shares a partition no right row survives into). */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val reserved = Seq("__ts", "__side", "__r", "__m")
    require(left.columns.intersect(reserved).isEmpty &&
      right.columns.intersect(reserved).isEmpty,
      s"asofJoin: column names ${reserved.mkString("/")} are reserved")
    require(payload.nonEmpty, "asofJoin: no payload columns requested")
    // right rows collapse to a single struct so the carry-forward is
    // row-atomic: a NULL INSIDE a matched payload must not fall through
    // to an older row's value, which per-column last(ignoreNulls) would do
    val r = right
      .filter((keys :+ rightTs).map(col(_).isNotNull).reduce(_ && _))
      .select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__ts"),
        lit(0).as("__side"),
        struct(col(rightTs).as("asof_ts") +: payload.map(col): _*).as("__r")): _*)
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(col) ++
        (col("__m.asof_ts").as("asof_ts") +: payload.map(p => col(s"__m.$p").as(p))): _*)
  }
}
