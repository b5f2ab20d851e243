package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Generic MERGE-style upsert — the reference's signature capability
  * (4 T-SQL MERGE statements, etl_sales_analytics.py:226-283; M1–M5 in
  * SURVEY.md §2.11).
  *
  * Semantics (exactly the reference's MERGE shape):
  *  - key match      → stage row replaces target row (UPDATE all columns)
  *  - stage-only key → INSERT
  *  - target-only    → row kept unchanged (no NOT-MATCHED-BY-SOURCE branch
  *                     → never deletes)
  * Idempotent: upsert(upsert(t, s), s) == upsert(t, s).
  *
  * Implementation: one full-outer join on the keys + per-column
  * `coalesce(stage, target)` — a single shuffle (or broadcast when the
  * stage side is small), which is the set-based plan the reference's
  * staging+MERGE pattern was designed to get from SQL Server. A NULL
  * inside a matched stage row must still win over the target value, so
  * matching is decided on a key-presence marker, not value coalescing.
  */
object Upsert {

  /** Pure DataFrame→DataFrame upsert. `stage` must be unique on `keys`
    * (dedupe first — the reference stages already-deduped data). */
  def upsert(target: DataFrame, stage: DataFrame, keys: Seq[String]): DataFrame = {
    val dataCols = target.columns.filterNot(keys.contains)
    val s = stage.select(
      (keys.map(col) :+ lit(true).as("__in_stage")) ++
        dataCols.map(c => col(c).as(s"__s_$c")): _*)
    target.join(s, keys, "full_outer")
      .select(keys.map(col) ++ dataCols.map { c =>
        when(col("__in_stage"), col(s"__s_$c")).otherwise(col(c)).as(c)
      }: _*)
  }

  /** Upsert against a parquet "table" directory with write-temp-then-swap
    * — the batch-engine approximation of the reference's transactional
    * MERGE (SURVEY.md §7.5: vanilla Spark has no multi-table
    * transactions). Returns the post-merge row count. */
  def upsertParquet(spark: SparkSession, tablePath: String, stage: DataFrame,
      keys: Seq[String]): Long = {
    val exists = new java.io.File(tablePath).exists()
    val merged =
      if (exists) upsert(spark.read.parquet(tablePath), stage, keys)
      else stage
    val tmp = tablePath + ".tmp"
    merged.write.mode(SaveMode.Overwrite).parquet(tmp)
    val dir = new java.io.File(tablePath)
    if (exists) {
      val old = new java.io.File(tablePath + ".old")
      deleteRecursively(old)
      dir.renameTo(old)
      new java.io.File(tmp).renameTo(dir)
      deleteRecursively(old)
    } else new java.io.File(tmp).renameTo(dir)
    spark.read.parquet(tablePath).count()
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    if (f.exists) f.delete()
  }
}
