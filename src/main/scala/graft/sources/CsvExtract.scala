package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-pinned CSV extraction (reference S1–S3).
  *
  * Reproduces `load_csv_exact` (etl_sales_analytics.py:46-61): the declared
  * schema is an allowlist — extra CSV columns are dropped, missing columns
  * materialize as typed NULLs, columns come out in declared order, string
  * columns are trimmed, and a missing FILE degrades to an empty typed
  * DataFrame with a warning instead of failing the pipeline.
  *
  * Everything is read as string first and coerced with `try_cast`-style
  * expressions so unparseable values become NULL (pandas
  * `errors="coerce"`, etl_sales_analytics.py:164,169,178) rather than
  * erroring — Spark's PERMISSIVE CSV mode would silently null the whole
  * row, which is NOT the reference's per-cell semantics.
  *
  * Scale: the read is a plain distributed CSV scan; coercion expressions
  * are codegen'd per-row ops. Nothing here collects or repartitions.
  */
object CsvExtract {

  /** Read `path` keeping ONLY `schema`'s columns, coercing per-cell to the
    * declared types (parse failure → NULL, never an error). */
  def loadCsvExact(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    // Hadoop FileSystem, not java.io.File: the guard must see
    // hdfs://-s3a://-style paths on a real cluster, where a local-disk
    // check would report every input as missing.
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) {
      System.err.println(s"[WARN] missing input file: $path — empty table")
      return spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
    val raw = spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .csv(path) // all columns StringType
    val present = raw.columns.toSet
    val cols = schema.fields.map { f =>
      val base =
        if (present.contains(f.name)) trim(col(f.name))
        else lit(null).cast(StringType)
      coerce(base, f.dataType).as(f.name)
    }
    raw.select(cols.toSeq: _*)
  }

  /** Per-cell lenient coercion: parse-or-NULL for every declared type.
    * Every branch must stay NULL-on-failure under Spark 4's default ANSI
    * mode — raw to_timestamp/to_date throw CAST_INVALID_INPUT there, so
    * temporal types go through the try_* variants. */
  private def coerce(c: org.apache.spark.sql.Column, dt: DataType): org.apache.spark.sql.Column =
    dt match {
      case StringType => c
      case _: DecimalType | IntegerType | LongType | DoubleType | FloatType =>
        c.try_cast(dt)
      case TimestampType =>
        // date-only strings (data/orders.csv) or full timestamps
        coalesce(try_to_timestamp(c), try_to_timestamp(c, lit("yyyy-MM-dd")))
      case DateType => c.try_cast(DateType)
      case other => c.try_cast(other)
    }

  /** Reject sink (S3): header CSV, overwrite, one directory per entity —
    * the audit trail the reference writes under data/rejects/
    * (etl_sales_analytics.py:189-205). */
  def writeRejects(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(dir)
}
