package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative DATA-QUALITY EXPECTATIONS — the audit layer every
  * production pipeline bolts onto its loads (the reference validates
  * implicitly via NOT-NULL drops, FK splits, and CHECK-style clamps,
  * `/root/reference/etl_sales_analytics.py:171-207`; this surfaces the
  * same contracts as a queryable REPORT instead of silent row drops).
  * Each expectation evaluates to one report row:
  *
  *   (table_name, check_name, violations, total, pass)
  *
  * so a load gate is `WHERE pass = 0` and a quality dashboard is the
  * report table over time. Three check families, each with the cheapest
  * scale shape that answers it:
  *
  *  - [[rowChecks]]: any per-row predicate (not-null, range, regex,
  *    freshness vs a literal) — ALL checks fold into ONE partial+final
  *    aggregate over ONE scan, however many there are (conditional
  *    sums), then unpivot to rows via a bounded `stack`.
  *  - [[uniqueCheck]]: duplicate key tuples beyond the first —
  *    count − countDistinct(key) in one aggregate (no self-join,
  *    no window).
  *  - [[fkCheck]]: fact keys missing from a dimension — a left-anti
  *    join counted; NULL fact keys are NOT violations (SQL FK
  *    semantics — use a rowCheck for NOT NULL).
  *
  * Violations COUNT, never sample rows: the report stays bounded at
  * any scale (a violating-row sample is one `filter(pred).limit(n)`
  * away when debugging). `pass` is BIGINT 0/1 for portability.
  */
object Expectations {

  private val ReportCols = Seq("table_name", "check_name", "violations", "total", "pass")

  private def finish(df: DataFrame): DataFrame =
    df.withColumn("pass", when(col("violations") === 0L, 1L).otherwise(0L))
      .select(ReportCols.map(col): _*)

  /** All row-level checks in one scan: `checks` maps check name → the
    * VIOLATION predicate (true = row violates). */
  def rowChecks(df: DataFrame, tableName: String,
      checks: Seq[(String, Column)]): DataFrame = {
    require(checks.nonEmpty, "expectations rowChecks: no checks given")
    val aggs = checks.zipWithIndex.map { case ((_, pred), i) =>
      sum(when(pred, 1L).otherwise(0L)).as(s"__v_$i")
    } :+ count(lit(1)).as("total")
    val one = df.agg(aggs.head, aggs.tail: _*)
    // sum over 0 rows is NULL: an empty table has 0 violations
    val stackArgs = checks.zipWithIndex.map { case ((name, _), i) =>
      s"'${name.replace("'", "''")}', coalesce(__v_$i, 0L)"
    }.mkString(", ")
    finish(one.select(lit(tableName).as("table_name"),
      expr(s"stack(${checks.size}, $stackArgs) AS (check_name, violations)"),
      col("total")))
  }

  /** Key-uniqueness check: violations = rows beyond the first per
    * duplicated key tuple (0 ⇔ the key is a candidate key). */
  def uniqueCheck(df: DataFrame, tableName: String, keyCols: Seq[String],
      checkName: String): DataFrame = {
    require(keyCols.nonEmpty, "expectations uniqueCheck: no key columns")
    finish(df.agg(
      (count(lit(1)) - countDistinct(struct(keyCols.map(col): _*))).as("violations"),
      count(lit(1)).as("total"))
      .select(lit(tableName).as("table_name"), lit(checkName).as("check_name"),
        col("violations"), col("total")))
  }

  /** Referential-integrity check: fact rows whose non-NULL `factKey`
    * has no match in `dim.dimKey`. The dim side ships as a broadcast
    * when dimension-sized; the anti join is the exact complement of the
    * FK-retention semi-join ([[Transform.fkSplit]]). */
  def fkCheck(fact: DataFrame, tableName: String, factKey: String,
      dim: DataFrame, dimKey: String, checkName: String): DataFrame = {
    val total = fact.agg(count(lit(1)).as("total"))
    val bad = fact.filter(col(factKey).isNotNull)
      .join(dim.select(col(dimKey).as(factKey)), Seq(factKey), "left_anti")
      .agg(count(lit(1)).as("violations"))
    finish(bad.crossJoin(total)
      .select(lit(tableName).as("table_name"), lit(checkName).as("check_name"),
        col("violations"), col("total")))
  }

  /** Union several report frames into one audit table, stably ordered. */
  def report(frames: Seq[DataFrame]): DataFrame = {
    require(frames.nonEmpty, "expectations report: no frames")
    frames.reduce(_.unionByName(_)).orderBy("table_name", "check_name")
  }
}
