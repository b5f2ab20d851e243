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

  /** Stratified deterministic sample: per-stratum keep rates out of 256
    * hash buckets (e.g. `Map("en" -> 64)` keeps ~25% of English docs),
    * `defaultThreshold` for unlisted strata. This is how a training-mix
    * is rebalanced — oversample rare languages/sources, downsample the
    * dominant one — while keeping every property of [[hashSample]]:
    * membership is a pure per-row predicate on md5(id) (no shuffle, no
    * per-stratum pass, scales to any number of strata in ONE scan), and
    * the strata thresholds are NESTED — raising a threshold only ADDS
    * rows, so mix ablations share their common subset.
    *
    * The first hash byte is compared numerically (not as hex text) so
    * threshold 256 ("keep all") needs no lexicographic special case. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      thresholds: Map[String, Int], defaultThreshold: Int): DataFrame = {
    (thresholds.values.toSeq :+ defaultThreshold).foreach(t =>
      require(t >= 0 && t <= 256, s"thresholds must be in 0..256, got $t"))
    val thr = thresholds.foldLeft(lit(defaultThreshold)) {
      case (acc, (stratum, t)) => when(col(strataCol) === stratum, lit(t)).otherwise(acc)
    }
    val bucket = conv(substring(hashKey(col(idCol)), 1, 2), 16, 10).cast("int")
    df.filter(bucket < thr)
  }

  /** Deterministic disjoint corpus SPLITS (train/val/test): each row is
    * labeled by where its md5(id) bucket (0..255) falls among the
    * cumulative split widths — e.g. `Seq("train" -> 240, "val" -> 8,
    * "test" -> 8)` sends ~93.75% / ~3.125% / ~3.125%. Same contract
    * family as [[hashSample]]: a pure per-row expression (no shuffle,
    * one scan, any engine agrees), splits are EXHAUSTIVE and DISJOINT
    * by construction, and membership is stable across runs/engines/
    * repartitioning — the property that keeps eval sets leak-free as
    * the corpus regenerates. Widths must sum to 256. Appends
    * `splitCol`; also note bucket order is fixed, so widening train at
    * val's expense MOVES only boundary buckets (ablations stay
    * comparable). */
  def splitCorpus(df: DataFrame, idCol: String, splits: Seq[(String, Int)],
      splitCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "splitCorpus: at least one split required")
    require(splits.map(_._2).forall(_ > 0), s"split widths must be positive: $splits")
    require(splits.map(_._2).sum == 256,
      s"split widths must sum to 256 (got ${splits.map(_._2).sum}): $splits")
    require(splits.map(_._1).distinct.size == splits.size, s"duplicate split names: $splits")
    val bucket = conv(substring(hashKey(col(idCol)), 1, 2), 16, 10).cast("int")
    val cumulative = splits.scanLeft(0)(_ + _._2).tail
    val label = splits.zip(cumulative).init.foldRight(
        lit(splits.last._1): Column) {
      case (((name, _), upper), acc) => when(bucket < upper, lit(name)).otherwise(acc)
    }
    df.withColumn(splitCol, label)
  }

  /** Per-row WEIGHTED Bernoulli sampling: keep a row iff its salted
    * md5-uniform draw u ∈ [0, 2³²) falls below weight·2³² — so the keep
    * probability IS the row's own weight (clamped to [0,1]), varying
    * continuously per row where [[stratifiedSample]] can only rate whole
    * strata. This is soft quality filtering — keep probability rising
    * with a quality score instead of a hard threshold — and importance
    * resampling of a training mix.
    *
    * The draw is SALTED ("~w") so membership is independent of the
    * unsalted md5(id) draws of [[hashSample]]/[[splitCorpus]] — a
    * weighted thinning applied inside a train split stays unbiased.
    * Same scale/determinism contract as the others: a pure per-row
    * predicate (no shuffle, one scan, pushdown-eligible); u is an exact
    * 32-bit integer, weight·2³² one IEEE multiply, the compare exact —
    * any engine agrees on membership. */
  def weightedSample(df: DataFrame, idCol: String, weight: Column): DataFrame = {
    val u = conv(substring(
        md5(concat(col(idCol).cast("string"), lit("~w")).cast("binary")), 1, 8), 16, 10)
      .cast("long")
    val w = least(greatest(weight.cast("double"), lit(0.0)), lit(1.0))
    df.filter(u.cast("double") < w * lit(4294967296.0))
  }

  /** TEMPERATURE-flattened domain MIXTURE sampling — the multilingual /
    * multi-domain pretraining mix rule (mC4, XLM-R): sample domain d
    * with probability ∝ n_d^α, α < 1 flattening head domains toward the
    * tail so low-resource domains keep a larger share of the final mix.
    * α is FIXED at 1/2: the per-domain keep rate is then
    * `largestKeep · sqrt(n_max / n_d)` (capped at 1), a chain of one
    * IEEE divide, one sqrt, and one multiply — ALL correctly-rounded
    * operations, so any engine derives the bit-identical rate. A free
    * α would need pow(), whose last-ulp behavior is libm-dependent and
    * breaks cross-engine gating. `largestKeep` is the head domain's
    * keep rate (the mix's overall thinning knob); every other domain
    * keeps proportionally more, up to 1.
    *
    * Scale shape: ONE map-side-combined count over the corpus produces
    * the (≤ domains)-row rate table; the corpus then takes a BROADCAST
    * equi-join on the domain column plus a pure per-row salted-md5
    * Bernoulli predicate (the [[weightedSample]] construction, salt
    * "~t" for independence from the other samplers) — no corpus
    * shuffle at any scale. Appends n_domain and keep_rate. */
  def mixtureSample(df: DataFrame, idCol: String, domainCol: String,
      largestKeep: Double = 1.0): DataFrame = {
    require(largestKeep > 0.0 && largestKeep <= 1.0,
      s"largestKeep must be in (0,1], got $largestKeep")
    val counts = df.groupBy(col(domainCol)).agg(count(lit(1)).as("__nd"))
    val nmax = counts.agg(max(col("__nd")).as("__nmax"))
    val rates = counts.crossJoin(broadcast(nmax))
      .select(col(domainCol), col("__nd").as("n_domain"),
        least(lit(1.0), lit(largestKeep) *
          sqrt(col("__nmax").cast("double") / col("__nd").cast("double")))
          .as("keep_rate"))
    val u = conv(substring(
        md5(concat(col(idCol).cast("string"), lit("~t")).cast("binary")), 1, 8), 16, 10)
      .cast("long")
    df.join(broadcast(rates), Seq(domainCol))
      .filter(u.cast("double") < col("keep_rate") * lit(4294967296.0))
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

  /** Sequence packing (concat-and-chunk): documents are laid out in the
    * deterministic md5(id) shuffle order, token counts are prefix-summed,
    * and each document is assigned to the fixed-`budget` training
    * sequence its first token lands in (`seq_id = token_start div
    * budget`) — the document→shard map a "pack to 2048/4096/8192 tokens"
    * pretraining loader consumes. A document straddling a boundary
    * belongs to the sequence where it STARTS (assignment stays per-doc
    * and engine-portable; the loader handles the intra-doc split).
    *
    * Scale shape: the global prefix sum is NOT a single-partition
    * window. It is the classic two-pass distributed scan —
    *   1. range-partitioned sort by `pack_key` (how Spark sorts 100 TB);
    *   2. one O(partitions) job collects per-partition token totals,
    *      whose scan gives each partition its global starting offset;
    *   3. a map over the sorted partitions emits offset + local running
    *      sum. The second pass re-reads the sort's SHUFFLE FILES (Spark
    *      reuses the exchange across the two jobs), not the source.
    * Output adds `pack_key`, `token_start` (exclusive global prefix) and
    * `seq_id`. `tokenCol` must be non-negative. */
  def packSequences(df: DataFrame, idCol: String, tokenCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = df.sparkSession
    val sorted = df
      .withColumn("pack_key", hashKey(col(idCol)))
      .withColumn("__tok", col(tokenCol).cast(LongType))
      .orderBy("pack_key")
    val rdd = sorted.rdd
    val tokIdx = sorted.schema.fieldIndex("__tok")
    val partSums = rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var s = 0L
        it.foreach { r =>
          val t = r.getLong(tokIdx)
          require(t >= 0, s"negative token count $t in $tokenCol")
          s += t
        }
        Iterator((pid, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = spark.sparkContext.broadcast(partSums.scanLeft(0L)(_ + _))
    val schema = sorted.schema
      .add("token_start", LongType, nullable = false)
      .add("seq_id", LongType, nullable = false)
    val packed = rdd.mapPartitionsWithIndex { (pid, it) =>
      var cum = offsets.value(pid)
      it.map { r =>
        val start = cum
        cum += r.getLong(tokIdx)
        Row.fromSeq(r.toSeq :+ start :+ (start / budget))
      }
    }
    spark.createDataFrame(packed, schema).drop("__tok")
  }
}
