package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality profiling: per-column row/null/distinct counts and value
  * ranges in ONE aggregation pass — the "what did we just load" check an
  * ETL runs after ingest (the reference eyeballs this with per-table
  * TOP-100 SELECTs; a 100 TB table needs the summary, not the rows).
  *
  * Scale shape: a single global aggregate (partial → final, no groups).
  * The exact `countDistinct`s plan as one Expand (×ncols row growth)
  * feeding a hash aggregate — fine for a profile's handful of columns.
  * For very wide tables or routine monitoring swap the exact counts for
  * the KMV sketch ([[Sketch.kmvDistinct]]): one pass, no Expand, bounded
  * error.
  */
object Profile {

  /** One row per profiled column: `col_name, n_rows, n_nonnull,
    * n_distinct, min_value, max_value`. Min/max are computed in the
    * column's native type (so numeric columns don't compare as text) and
    * rendered as strings only for the uniform output schema. NULLs are
    * excluded from `n_distinct` and min/max, matching SQL aggregate
    * semantics. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    cols.foreach(c => require(df.columns.contains(c), s"no such column: $c"))
    val aggs =
      count(lit(1)).as("__n") +:
      cols.flatMap(c => Seq(
        count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c")))
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        col(s"__nn_$c").as("n_nonnull"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))): _*)).as("p"))
      .select("p.*")
  }

  /** [[profile]]'s wide-table form: `n_distinct` becomes the KMV
    * estimate `est_distinct` (EXACT whenever a column holds fewer than
    * `k` distinct values — estimation only starts where exactness
    * ends). One pass, NO Expand and NO dedup exchange: each column
    * carries a bounded [[graft.expressions.KmvSketch]] buffer (≤ k
    * longs per column per partition to the shuffle), so profiling a
    * 1000-column 100 TB table costs one scan plus a constant-size
    * aggregate — the exact form's Expand multiplies the scan by ncols
    * and its COUNT(DISTINCT)s shuffle every distinct value. */
  def profileSketched(df: DataFrame, cols: Seq[String], k: Int = 256): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    require(k >= 2 && k <= 32768, s"k must be in 2..32768, got $k")
    cols.foreach(c => require(df.columns.contains(c), s"no such column: $c"))
    val aggs =
      count(lit(1)).as("__n") +:
      cols.flatMap(c => Seq(
        count(col(c)).as(s"__nn_$c"),
        graft.expressions.KmvSketch(Sketch.hash48(col(c)), k).as(s"__mins_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c")))
    val withEst = df.agg(aggs.head, aggs.tail: _*)
    val est = cols.map { c =>
      val n = size(col(s"__mins_$c"))
      when(n < k, n.cast("long"))
        .otherwise(expr(s"${(k - 1).toLong * Sketch.HashSpace}L div __kth_$c"))
        .as(s"__est_$c")
    }
    withEst
      .select(col("*") +: cols.map(c =>
        get(col(s"__mins_$c"), lit(k - 1)).as(s"__kth_$c")): _*)
      .select(col("*") +: est: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        col(s"__nn_$c").as("n_nonnull"),
        col(s"__est_$c").as("est_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))): _*)).as("p"))
      .select("p.*")
  }
}
