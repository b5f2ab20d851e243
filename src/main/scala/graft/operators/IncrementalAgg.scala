package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of a pre-aggregated table (a materialized
  * rollup): keep per-group additive STATE — row count + exact integer
  * cent sums — and fold each new batch of facts into it, so refreshing
  * the rollup costs O(batch + touched groups) instead of re-scanning the
  * fact table. At 100 TB the fact scan is the thing you can only afford
  * once; every downstream dashboard aggregate should be maintained from
  * deltas.
  *
  * The state is a commutative monoid (counts and sums add; the cent
  * space keeps addition exact and order-independent), which is what
  * makes `merge` correct regardless of how the history was batched —
  * `state(a ∪ b)` = `merge(state(a), state(b))` row-for-row. Insert-only
  * by design: deletes/updates need retractable state (pair each sum with
  * a sign) or a keyed MERGE ([[Upsert]]); min/max are deliberately NOT
  * in the state because they cannot be maintained under retraction.
  */
object IncrementalAgg {

  private def cents(c: String) = expr(s"CAST(round($c * 100) AS BIGINT)")

  /** Aggregate a batch of fact rows into additive state: one row per
    * group with `n_rows` and an exact `<m>_cents` sum per measure. */
  def state(facts: DataFrame, keys: Seq[String], measures: Seq[String]): DataFrame = {
    require(keys.nonEmpty && measures.nonEmpty, "need grouping keys and measures")
    facts.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        measures.map(m => sum(cents(m)).as(s"${m}_cents")): _*)
  }

  /** Fold state tables together (prior state + one per new batch). Cost
    * is O(Σ state rows) — the states shuffle on the group keys, never
    * the facts. */
  def merge(keys: Seq[String], measures: Seq[String])(states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "need at least one state table")
    states.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(sum("n_rows").as("n_rows"),
        measures.map(m => sum(s"${m}_cents").as(s"${m}_cents")): _*)
  }

  /** Render state for consumption: cent sums back to dollars (exact —
    * the division is the only floating step, applied once per group). */
  def finish(state: DataFrame, keys: Seq[String], measures: Seq[String]): DataFrame =
    state.select((keys.map(col) :+ col("n_rows")) ++
      measures.map(m =>
        (col(s"${m}_cents").cast("double") / 100.0).as(s"${m}_sum")): _*)
}
