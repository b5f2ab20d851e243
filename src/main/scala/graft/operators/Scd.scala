package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TYPE-2 SLOWLY-CHANGING DIMENSIONS: keep every historical version of
  * a dimension row as (key, attrs, valid_from, valid_to, is_current) —
  * the warehouse-native answer to "what did this customer's record say
  * when the order shipped", and the one MERGE shape the reference's
  * update-in-place upserts (etl_sales_analytics.py:226-283) cannot
  * express: M1-M5 overwrite matched rows, SCD2 closes them and opens a
  * new version.
  *
  * The apply is DELTA-SCOPED: only keys present in the batch have their
  * version chains rebuilt (one semi-join splits touched from untouched
  * history; untouched rows pass through BYTE-identical), so a batch of
  * b change events against a 100 TB dimension costs O(b + touched
  * versions) after the split — the window runs per key over a handful
  * of versions, never over the dimension. Consecutive no-change events
  * are suppressed (standard SCD2 hygiene: a version that repeats the
  * previous attributes is noise, not history) — and because suppression
  * is consecutive-duplicate removal over the per-key timeline, applying
  * batches incrementally reproduces the from-scratch build bit-for-bit,
  * which is exactly what the etl_scd2 gate pins.
  */
object Scd {

  /** Rebuild the version chains of `current ∪ batch` for the batch's
    * keys only. `current` holds (keys, attrs, validFrom, valid_to,
    * is_current); `batch` holds change events (keys, attrs, validFrom).
    * (key, validFrom) must be unique across the union — pre-dedupe
    * event streams that can carry several same-instant events
    * ([[Transform.dedupeKeepLast]] is the tool). */
  def scd2Apply(current: DataFrame, batch: DataFrame, keys: Seq[String],
      attrs: Seq[String], validFrom: String): DataFrame = {
    require(keys.nonEmpty && attrs.nonEmpty, "need key and attribute columns")
    val versionCols = (keys :+ validFrom) ++ attrs
    val touchedKeys = batch.select(keys.map(col): _*).distinct()
    val untouched = current.join(touchedKeys, keys, "left_anti")
    val touchedHist = current.join(touchedKeys, keys, "left_semi")
      .select(versionCols.map(col): _*)
    val rebuilt = buildChains(
      touchedHist.unionByName(batch.select(versionCols.map(col): _*)),
      keys, attrs, validFrom)
    untouched.select(rebuilt.columns.map(col): _*).unionByName(rebuilt)
  }

  /** From-scratch build: every event row becomes a candidate version,
    * no-change events suppressed, validity ranges derived. Equivalent
    * to folding [[scd2Apply]] over any batching of the same events. */
  def scd2Build(events: DataFrame, keys: Seq[String], attrs: Seq[String],
      validFrom: String): DataFrame =
    buildChains(events.select(((keys :+ validFrom) ++ attrs).map(col): _*),
      keys, attrs, validFrom)

  private def buildChains(versions: DataFrame, keys: Seq[String],
      attrs: Seq[String], validFrom: String): DataFrame = {
    val byKey = Window.partitionBy(keys.map(col): _*).orderBy(col(validFrom))
    val sameAsPrev: Column = attrs.map(a =>
      col(a) <=> lag(col(a), 1).over(byKey)).reduce(_ && _)
    val isFirst: Column = lag(col(validFrom), 1).over(byKey).isNull
    versions
      .withColumn("__keep", isFirst || !sameAsPrev)
      .filter(col("__keep")).drop("__keep")
      // second window pass AFTER suppression so a dropped no-change
      // event never truncates its predecessor's validity
      .withColumn("valid_to", lead(col(validFrom), 1).over(byKey))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
