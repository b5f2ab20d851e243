package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
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
}
