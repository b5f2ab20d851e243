package graft.operators

import java.io.IOException

import org.apache.hadoop.fs.{FileSystem, Path}
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

  /** Per-branch MERGE telemetry, matching the reference's printouts
    * (inserted / updated per MERGE, etl_sales_analytics.py:241-283).
    * `total` is the post-merge table rowcount. */
  case class MergeStats(inserted: Long, updated: Long, total: Long)

  /** Upsert against a parquet "table" directory with write-temp-then-swap
    * — the batch-engine approximation of the reference's transactional
    * MERGE (SURVEY.md §7.5: vanilla Spark has no multi-table
    * transactions). The swap goes through Hadoop's FileSystem with every
    * rename checked and rolled back on failure, so it works on any
    * cluster filesystem (HDFS/S3A/local) and can never delete the only
    * surviving copy of the table.
    *
    * Returns [[MergeStats]]. Because `stage` is unique on `keys` (the
    * MERGE precondition), every stage row either inserts or updates, so
    * inserted = total_after − total_before and updated = |stage| −
    * inserted — exact per-branch counts from three cheap counts (parquet
    * counts are metadata-only), with no second pass over the join. */
  def upsertParquet(spark: SparkSession, tablePath: String, stage: DataFrame,
      keys: Seq[String]): MergeStats = {
    val live = new Path(tablePath)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val existed = fs.exists(live)
    val before = if (existed) spark.read.parquet(tablePath).count() else 0L
    val staged = stage.count()
    val merged =
      if (existed) upsert(spark.read.parquet(tablePath), stage, keys)
      else stage
    val tmp = new Path(tablePath + ".tmp")
    merged.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    swapInto(fs, tmp, live)
    val total = spark.read.parquet(tablePath).count()
    val inserted = total - before
    MergeStats(inserted, staged - inserted, total)
  }

  /** Checked two-phase swap: live → live.old, tmp → live. Any failed
    * rename aborts with the previous table restored; the .old backup is
    * dropped only after the new data is installed. (On object stores the
    * rename is a copy, not atomic — a table format is the real fix; this
    * is the strongest guarantee a plain-directory warehouse offers.) */
  private[graft] def swapInto(fs: FileSystem, tmp: Path, live: Path): Unit = {
    if (!fs.exists(tmp))
      throw new IOException(s"upsert swap: staged data missing at $tmp; table untouched")
    val old = new Path(live.toString + ".old")
    if (fs.exists(old) && !fs.delete(old, true))
      throw new IOException(s"upsert swap: cannot clear stale backup $old; table untouched")
    val existed = fs.exists(live)
    if (existed && !fs.rename(live, old))
      throw new IOException(s"upsert swap: cannot move $live aside; table untouched")
    if (!fs.rename(tmp, live)) {
      if (existed && !fs.rename(old, live))
        throw new IOException(
          s"upsert swap: install failed AND rollback failed — previous table preserved at $old")
      throw new IOException(s"upsert swap: cannot install $tmp at $live; previous table restored")
    }
    if (existed && !fs.delete(old, true))
      System.err.println(s"[WARN] upsert swap: new table installed but backup $old not removed")
  }
}
