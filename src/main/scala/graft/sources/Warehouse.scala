package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Catalog DDL for the parquet warehouse — the reference's idempotent
  * `IF OBJECT_ID(...) IS NULL CREATE TABLE` block (`ensure_tables`,
  * etl_sales_analytics.py:64-116) re-expressed as Spark catalog
  * statements over external parquet locations. Like the reference
  * (which gates DDL behind MSSQL_CREATE_DDL=1), registration is an
  * optional layer over the path-addressed tables the pipeline writes.
  */
object Warehouse {

  /** Idempotent CREATE TABLE IF NOT EXISTS on an external parquet
    * location. A pre-existing registration wins (reference semantics:
    * the object-id probe skips creation). */
  def ensureTable(spark: SparkSession, table: String, path: String,
      schema: StructType): Unit =
    spark.sql(
      s"CREATE TABLE IF NOT EXISTS $table (${schema.toDDL}) " +
        s"USING parquet LOCATION '$path'")

  /** DROP TABLE IF EXISTS — `drop_stage_tables`
    * (etl_sales_analytics.py:285-293). Metadata-only for external
    * tables: the parquet files stay. */
  def dropTable(spark: SparkSession, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $table")

  /** Row-count probe per table (`print_counts`,
    * etl_sales_analytics.py:295-299). */
  def tableCounts(spark: SparkSession, tables: Seq[String]): Map[String, Long] =
    tables.map(t => t -> spark.table(t).count()).toMap

  /** Bucketed external-table write: pays the shuffle ONCE at write time
    * (hash-bucketed and sorted by `keys`), after which every equi-join
    * or aggregation between same-bucketed tables on those keys plans
    * with no Exchange — the co-location strategy for fact⋈fact joins
    * repeated across a 100 TB warehouse's query mix. WarehouseSpec
    * asserts the exchange-free plan. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      keys: Seq[String], nBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(nBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Hive-style partitioned write — the coarsest and cheapest pruning
    * layer of a 100 TB warehouse (typically `dt=`/region): a predicate
    * on a partition column eliminates whole DIRECTORIES at planning
    * time (the scan's PartitionFilters — zero I/O, not even footers are
    * read), before bucketing ([[writeBucketed]]) or Z-order
    * ([[writeZOrdered]]) prune within what's left. Partition columns
    * must be low-cardinality: each value is a directory, and a
    * high-cardinality partition key is the classic small-files failure.
    * `maxRecordsPerFile` bounds the other failure mode (one giant file
    * per partition). */
  def writePartitioned(df: DataFrame, path: String, partCols: Seq[String],
      maxRecordsPerFile: Long = 0L): Unit = {
    require(partCols.nonEmpty, "need at least one partition column")
    df.write.mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partCols: _*)
      .parquet(path)
  }

  /** Small-files compaction — the maintenance pass every long-lived
    * warehouse table needs: streaming upserts, partitioned appends, and
    * per-batch writes accrete files far below the scan-efficient size,
    * and a 100 TB table with millions of tiny files bottlenecks on
    * listing + open() long before row throughput matters. Rewrites the
    * table into ceil(bytes / targetFileBytes) files and swaps them in
    * with the same checked two-phase rename as the MERGE path (crash
    * leaves either the old or the new table, never a mix). Returns
    * (filesBefore, filesAfter). Content is preserved row-for-row; file-
    * internal order is not (parquet tables carry no order contract). */
  def compact(spark: SparkSession, path: String, targetFileBytes: Long): (Int, Int) = {
    require(targetFileBytes > 0, s"targetFileBytes must be positive, got $targetFileBytes")
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p).filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val totalBytes = files.map(_.getLen).sum
    val nOut = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    val tmp = new org.apache.hadoop.fs.Path(path + ".compact")
    fs.delete(tmp, true)
    spark.read.parquet(path).repartition(nOut)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    graft.operators.Upsert.swapInto(fs, tmp, p)
    (files.length, nOut)
  }

  /** Z-ORDER clustered write: multi-dimensional data clustering so that
    * selective predicates on ANY of `cols` skip most files via parquet
    * min/max footer stats. A single-column sort gives perfect skipping
    * on that column and none on the others; interleaving the bits of
    * per-column quantile codes (the Z-/Morton curve) makes every file
    * cover ≈ a hypercube — each of d clustered dimensions spans roughly
    * a numFiles^(-1/d) fraction of its range per file, so a point or
    * short-range predicate on any one dimension prunes all but
    * ≈ numFiles^(1-1/d) files at the scan's PushedFilters stage.
    *
    * Codes come from APPROXIMATE per-column quantiles (a driver-side
    * sketch — the same mechanism as range-partition sampling, constant
    * cost at any scale) so skewed columns still spread over the full
    * code space; the z-value sort itself is a range-partitioned exchange,
    * Spark's ordinary 100 TB sort shape. `bits` per dimension (default 8
    * → 256 levels) bounds sketch size; beyond ~3-4 dims the curve's
    * locality — like any space-filling curve's — dilutes. */
  def writeZOrdered(df: DataFrame, path: String, cols: Seq[String],
      numFiles: Int, bits: Int = 8): Unit = {
    require(cols.nonEmpty, "need at least one clustering column")
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    require(bits > 0 && bits * cols.size <= 62,
      s"bits*cols must fit a long, got $bits*${cols.size}")
    df.withColumn("__z", zValue(df, cols, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** The Morton interleave of per-column quantile codes (see
    * [[writeZOrdered]]); exposed for layout tests. All bit arithmetic is
    * built-in integer expressions — fully codegen'd, no UDF. */
  private[graft] def zValue(df: DataFrame, cols: Seq[String], bits: Int): Column = {
    val levels = 1 << bits
    val probes = (1 until levels).map(_.toDouble / levels).toArray
    val d = cols.size
    val interleaved = cols.zipWithIndex.map { case (c, ci) =>
      // quantile code: how many of the level boundaries lie at or below
      // this value (0..levels-1); NULLs sort first (code 0).
      val bounds = df.stat.approxQuantile(c, probes, 0.001)
      val code = coalesce(
        aggregate(
          lit(bounds),
          lit(0),
          (acc, b) => acc + when(b <= col(c).cast("double"), 1).otherwise(0)),
        lit(0))
      // spread code's bits to positions ci, ci+d, ci+2d, ...
      (0 until bits).map(i =>
        shiftleft(shiftright(code, i).bitwiseAND(lit(1)).cast("long"), i * d + ci))
        .reduce((a, b) => a.bitwiseOR(b))
    }
    interleaved.reduce((a, b) => a.bitwiseOR(b))
  }
}
