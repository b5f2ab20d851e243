package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Training-data curation primitives: deterministic sampling and global
  * pseudo-random shuffling — the two "take a reproducible subset / feed
  * examples in a decorrelated order" operations every LLM data pipeline
  * runs over its corpus before training.
  *
  * Both are keyed on md5 of the row's id rendered as a string, so the
  * SAME rows are selected (and the SAME order produced) on any engine,
  * any partitioning, any run — reproducibility is the contract that
  * makes ablations comparable. `rand()`-based sampling can't offer that
  * (per-task seeds shift with partitioning), and a global `ORDER BY
  * rand()` isn't even re-runnable.
  */
object Sampling {

  /** Uniform hex-hash key for `id` — md5 of its canonical string form. */
  private def hashKey(id: Column): Column = md5(id.cast("string").cast("binary"))

  /** Deterministic ~(threshold/256) sample: keeps rows whose md5(id)
    * starts below the 2-hex-digit threshold. Pure per-row filter — no
    * shuffle, pushes down past column pruning, trivially scales; and the
    * sample is STABLE: re-runs, other engines, and later pipeline stages
    * all agree on membership, so derived artifacts can be joined back.
    * `threshold` of 32 keeps ~32/256 = 12.5%. */
  def hashSample(df: DataFrame, idCol: String, threshold: Int): DataFrame = {
    require(threshold >= 0 && threshold <= 256,
      s"threshold must be in 0..256 (of 256 hash buckets), got $threshold")
    // 256 formats as 3 hex digits and would compare lexicographically
    // BELOW most 2-digit prefixes — keep-everything must skip the filter
    if (threshold == 256) df
    else df.filter(substring(hashKey(col(idCol)), 1, 2) < lit(f"$threshold%02x"))
  }

  /** Global deterministic shuffle with batch assignment: orders the
    * dataset by md5(id) (a reproducible pseudo-random permutation),
    * assigns a contiguous 0-based `shuffle_idx`, and groups every
    * `batchSize` consecutive rows into a `batch` — the exact frame a
    * training loader consumes.
    *
    * Scale shape: the sort is a RANGE-partitioned exchange (every
    * partition gets a key interval — this is how Spark sorts 100 TB;
    * no single-partition window, which is the tempting-but-wrong
    * `row_number() OVER (ORDER BY ...)` plan). The contiguous index
    * comes from `zipWithIndex` over the sorted partitions: one extra
    * O(partitions) pass to collect per-partition counts, then each row's
    * index is partition-offset + position — never a global bottleneck.
    */
  def shuffleBatches(df: DataFrame, idCol: String, batchSize: Long): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    val spark = df.sparkSession
    val sorted = df
      .withColumn("shuffle_key", hashKey(col(idCol)))
      .orderBy("shuffle_key")
    val schema = sorted.schema.add("shuffle_idx", LongType, nullable = false)
    val indexed = sorted.rdd.zipWithIndex()
      .map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    spark.createDataFrame(indexed, schema)
      .withColumn("batch", expr(s"shuffle_idx div $batchSize"))
  }
}
