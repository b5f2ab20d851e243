package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Schemas
import graft.operators.{Transform, Upsert}
import graft.sources.CsvExtract

/** End-to-end ETL pipeline — the Spark-native equivalent of the
  * reference's `main` (etl_sales_analytics.py:302-333):
  * extract (schema-pinned CSV) → transform (coerce, drop-null-keys,
  * keep-last dedupe, FK split with reject sinks) → load (MERGE-style
  * upsert into a parquet warehouse) → verify counts.
  *
  * The reference's SQL-Server staging tables disappear: staging is just
  * the in-flight DataFrame; the MERGE is [[Upsert.upsertParquet]]'s
  * full-outer-join algorithm. Re-running on the same inputs is a no-op
  * (idempotent, as the reference claims in README.md:5).
  */
object Pipeline {

  case class Result(counts: Map[String, Long], rejectCounts: Map[String, Long])

  /** Run the pipeline: `dataDir` holds customers/products/orders/
    * order_details CSVs (reference layout); warehouse + rejects are
    * written under `outDir`. */
  def run(spark: SparkSession, dataDir: String, outDir: String): Result = {
    // -- extract (S1-S2): schema-pinned, trimmed, coerce-to-NULL
    val customers = CsvExtract.loadCsvExact(spark, s"$dataDir/customers.csv", Schemas.customer)
    val products  = CsvExtract.loadCsvExact(spark, s"$dataDir/products.csv", Schemas.product)
    val orders    = CsvExtract.loadCsvExact(spark, s"$dataDir/orders.csv", Schemas.orders)
    val details   = CsvExtract.loadCsvExact(spark, s"$dataDir/order_details.csv", Schemas.orderDetail)

    // -- transform: NOT-NULL PK filter + keep-last dedupe. "Last" means
    // file order, as in pandas keep="last" (etl_sales_analytics.py:183-186).
    // The ordinal is reconstructed from scan metadata so it SURVIVES
    // SPLIT FILES: (file, block offset, row-in-partition). Blocks of one
    // file sort by their byte offset and rows within a block are emitted
    // in file order, so the triple is totally ordered by file position —
    // monotonically_increasing_id alone is only partition-ordered and
    // breaks silently the moment a file splits into >1 partition.
    def withFileOrdinal(df: DataFrame): DataFrame =
      try df
        .withColumn("__f", col("_metadata.file_path"))
        .withColumn("__b", col("_metadata.file_block_start"))
        .withColumn("__r", pmod(monotonically_increasing_id(), lit(1L << 33)))
      catch { case _: org.apache.spark.sql.AnalysisException =>
        // missing-file degradation path: an in-memory empty frame has no
        // scan metadata; any ordinal is vacuously correct on zero rows.
        df.withColumn("__f", lit(""))
          .withColumn("__b", lit(0L))
          .withColumn("__r", monotonically_increasing_id())
      }

    def clean(df: DataFrame, keys: Seq[String]): DataFrame =
      Transform.dedupeKeepLast(
        Transform.dropNullKeys(withFileOrdinal(df), keys),
        keys, Seq(col("__f"), col("__b"), col("__r")))
        .drop("__f", "__b", "__r")

    val cust = clean(customers, Seq("CustomerID"))
    val prod = clean(products, Seq("ProductID"))
    // reference drops orders with NULL OrderID *or* NULL CustomerID
    // before dedupe (dropna subset, etl_sales_analytics.py:183-185) —
    // such rows vanish rather than landing in the reject CSV.
    val ord0 = clean(orders, Seq("OrderID", "CustomerID"))
    val det0 = clean(details, Seq("OrderID", "ProductID"))

    // -- FK integrity (J5/J6): violations → reject CSVs, like
    // data/rejects/*.csv in the reference.
    val (ordValid, ordRej) = Transform.fkSplit(ord0, cust, Seq("CustomerID"), Seq("CustomerID"))
    val (detV1, detRej1) = Transform.fkSplit(det0, ordValid, Seq("OrderID"), Seq("OrderID"))
    val (detValid, detRej2) = Transform.fkSplit(detV1, prod, Seq("ProductID"), Seq("ProductID"))
    val detRej = detRej1.unionByName(detRej2)
    CsvExtract.writeRejects(ordRej, s"$outDir/rejects/orders")
    CsvExtract.writeRejects(detRej, s"$outDir/rejects/order_details")

    // -- load (M1-M5): MERGE-style upsert per table, with the reference's
    // per-branch telemetry (inserted/updated per MERGE,
    // etl_sales_analytics.py:241-283).
    val merges = Map(
      "customer" -> Upsert.upsertParquet(spark, s"$outDir/warehouse/customer", cust, Seq("CustomerID")),
      "product" -> Upsert.upsertParquet(spark, s"$outDir/warehouse/product", prod, Seq("ProductID")),
      "orders" -> Upsert.upsertParquet(spark, s"$outDir/warehouse/orders", ordValid, Seq("OrderID")),
      "order_details" -> Upsert.upsertParquet(spark, s"$outDir/warehouse/order_details", detValid,
        Seq("OrderID", "ProductID")))

    val rejects = Map(
      "orders" -> ordRej.count(),
      "order_details" -> detRej.count())
    merges.foreach { case (t, m) =>
      println(s"[MERGE] $t: inserted=${m.inserted} updated=${m.updated} total=${m.total}")
    }
    Result(merges.map { case (t, m) => t -> m.total }, rejects)
  }
}
