package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table diff — classify every key of two versions of a table as
  * inserted / deleted / updated / unchanged: the reconciliation
  * primitive behind CDC validation, snapshot comparison (pairs with
  * [[graft.sources.Snapshot]] time travel — "what changed between
  * version 3 and 7?"), and migration sign-off ("did the rewrite change
  * anything?") at 100 TB.
  *
  * One full-outer join on the keys; change classification is a
  * NULL-safe struct comparison (`<=>`) of the non-key columns —
  * codegen'd column ops, no UDF, and struct equality treats NULL fields
  * as equal so a NULL→NULL column is "unchanged" while NULL→value is
  * "updated" (asserted in DiffSpec). At scale this is the minimal
  * possible plan: each side shuffles once on the key — or not at all
  * when both sides share a bucketed layout ([[graft.sources.Warehouse]]
  * `writeBucketed`) — and the comparison is per-row.
  */
object Diff {

  /** One row per key present in either version: key columns +
    * `change_type` ∈ inserted | deleted | updated | unchanged (w.r.t.
    * `oldDf` → `newDf`). `includeUnchanged = false` (the default)
    * drops unchanged keys — at scale the interesting set is the delta,
    * which is usually orders of magnitude smaller than the table.
    * Both frames must carry the same columns; keys must be unique per
    * frame (a duplicated key would cross-join its copies). */
  def tableDiff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
      includeUnchanged: Boolean = false): DataFrame = {
    require(keys.nonEmpty, "tableDiff: no key columns given")
    require(oldDf.columns.sorted.sameElements(newDf.columns.sorted),
      s"tableDiff: column sets differ: ${oldDf.columns.sorted.mkString(",")} vs " +
        newDf.columns.sorted.mkString(","))
    val valueCols = oldDf.columns.filterNot(keys.contains).toSeq
    require(valueCols.nonEmpty, "tableDiff: no non-key columns to compare")
    def packed(df: DataFrame, as: String) =
      df.select(keys.map(col) :+ struct(valueCols.map(col): _*).as(as): _*)
    val joined = packed(oldDf, "__old")
      .join(packed(newDf, "__new"), keys, "full_outer")
    val changeType: Column =
      when(col("__old").isNull, "inserted")
        .when(col("__new").isNull, "deleted")
        .when(col("__old") <=> col("__new"), "unchanged")
        .otherwise("updated")
    val out = joined.select(keys.map(col) :+ changeType.as("change_type"): _*)
    if (includeUnchanged) out else out.filter(col("change_type") =!= "unchanged")
  }
}
