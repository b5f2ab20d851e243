package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  def events(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
