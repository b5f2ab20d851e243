package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Loaders for the harness testdata tables (see /root/repo/TESTDATA.md).
  *
  * Each table is a single parquet file under `dir`. Reads are plain
  * `spark.read.parquet` so Catalyst's parquet source handles column
  * pruning and filter pushdown — at 100 TB these scans are the dominant
  * cost and must stay declarative (no collect, no schema inference pass).
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  /** Some testdata generations write `events.ts` as TIMESTAMP(NANOS) —
    * which Spark's parquet reader rejects outright (PARQUET_TYPE_ILLEGAL)
    * unless read as BIGINT via the legacy conf — while others write plain
    * microsecond timestamps (read back as TIMESTAMP_NTZ). Normalize both
    * to a session-TZ TIMESTAMP at microsecond precision: nanos convert by
    * integer division (never a double divide, which would lose precision
    * above 2^53 ns); NTZ casts 1:1 under the UTC session timezone. */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    val norm = df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("timestamp_micros(ts div 1000)")
      case _ => expr("CAST(ts AS TIMESTAMP)")
    }
    df.withColumn("ts", norm)
  }

  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(load(spark, dir, "events"))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Session-unique scratch dir for queries that materialize an
    * intermediate file layout (JSONL/ORC round-trips, DPP fact tables).
    * Keyed by the Spark applicationId so two concurrent runs over the
    * SAME dataset dir never race on one path (mode=overwrite would let
    * one run read the other's half-rewritten files). */
  def scratchDir(spark: SparkSession, kind: String, dir: String): String =
    s"/tmp/graft_$kind/${spark.sparkContext.applicationId}/" +
      dir.replaceAll("[^A-Za-z0-9.]", "_")
}
