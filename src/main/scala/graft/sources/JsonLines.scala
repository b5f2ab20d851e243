package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-pinned JSONL (newline-delimited JSON) ingestion — the de-facto
  * interchange format of document corpora (one JSON object per line:
  * Common Crawl derivatives, HF datasets exports, model-output dumps).
  * Extends the reference's CSV contract (`load_csv_exact`,
  * /root/reference/etl_sales_analytics.py:46-61) to JSONL with the same
  * allowlist semantics: declared columns only, missing fields surface as
  * typed NULLs, missing FILE degrades to an empty typed frame.
  *
  * Corrupt lines (truncated writes, interleaved logs — routine in
  * crawl-scale corpora) don't poison the load: each line is parsed with
  * `from_json` in PERMISSIVE mode over a plain text scan, so a malformed
  * line becomes a row whose declared columns are NULL and whose
  * [[CorruptCol]] carries the raw text. [[splitCorrupt]] splits the
  * audit frame off (the JSONL analogue of the CSV reject sink).
  *
  * Parsing over `spark.read.text` rather than `spark.read.json` is
  * deliberate: the native JSON source forbids any query whose pruned
  * schema is only the corrupt-record column (QUERY_ONLY_CORRUPT_RECORD_
  * COLUMN — e.g. counting rejects), steering callers toward caching the
  * corpus. With an explicit text scan + from_json both split sides are
  * plain filters over one pass — nothing needs to be cached or
  * re-scanned, at any scale.
  *
  * Scale: a text scan is splittable by line — executors read byte
  * ranges in parallel; Jackson parsing is per-row, no shuffle, and the
  * declared schema means NO schema-inference pre-pass over the data
  * (which on 100 TB would double the scan count).
  */
object JsonLines {

  val CorruptCol = "_corrupt_record"

  /** Read `path` as JSONL pinned to `schema` (+ the corrupt-line capture
    * column). Extra JSON fields are dropped, missing ones are NULL;
    * a malformed line (bad JSON, or a field that can't coerce to its
    * declared type) yields one row with every declared column NULL and
    * the raw line in [[CorruptCol]]. A missing file degrades to an
    * empty typed frame with a warning, like CsvExtract. */
  def loadJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"loadJsonl: declared schema must not contain $CorruptCol")
    val withCapture = StructType(schema.fields :+ StructField(CorruptCol, StringType))
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) {
      System.err.println(s"[WARN] missing input file: $path — empty table")
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], withCapture)
    }
    val parsed = spark.read.text(path)
      .select(col("value"), from_json(col("value"), withCapture, Map(
        "mode" -> "PERMISSIVE",
        "columnNameOfCorruptRecord" -> CorruptCol)).as("__r"))
    parsed.select(
      schema.fields.map(f => col(s"__r.${f.name}")) :+
        // from_json's capture field only covers per-FIELD coercion
        // failures; a line that isn't JSON at all parses to a NULL
        // struct, so fall back to the raw line when the struct is null.
        when(col("__r").isNull, col("value"))
          .otherwise(col(s"__r.$CorruptCol")).as(CorruptCol): _*)
  }

  /** Split a [[loadJsonl]] frame into (clean rows without the capture
    * column, corrupt rows as their raw line). Both sides are plain
    * filters over the same single text scan. */
  def splitCorrupt(df: DataFrame): (DataFrame, DataFrame) = {
    val corrupt: Column = col(CorruptCol)
    (df.filter(corrupt.isNull).drop(CorruptCol),
      df.filter(corrupt.isNotNull).select(corrupt.as("raw_line")))
  }
}
