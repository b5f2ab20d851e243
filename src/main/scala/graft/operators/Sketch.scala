package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distinct-count sketching — the cardinality primitive of corpus
  * curation ("how many distinct URLs / users / shingles?") at sizes
  * where exact COUNT(DISTINCT) is a full shuffle of every distinct
  * value.
  *
  * The sketch is KMV (k-minimum-values, Bar-Yossef et al., RANDOM'02):
  * hash every value uniformly, keep only the k smallest hashes; if the
  * k-th smallest normalized hash is U, the estimate is (k-1)/U. Error
  * is ~1/sqrt(k) (k=256 → ~6%). Unlike HLL, whose per-engine hash and
  * register layout make results engine-private, KMV over md5 is
  * engine-PORTABLE: the same rows give bit-identical sketches and
  * estimates in Spark and the DuckDB oracle — the property every other
  * operator in this engine gates on. ([[hllDistinct]] below rebuilds
  * HLL itself on the same md5 hash so IT is portable too — the two
  * sketches trade k·64-bit buffers for m·6-bit registers.)
  *
  * Scale shape: the k-min DISTINCT set is an associative, bounded merge
  * (union → keep k smallest), run as a [[graft.expressions.KmvSketch]]
  * partial aggregate whose buffer dedups internally — each map task
  * ships at most k hashes per group to the shuffle; neither the value
  * set nor a dedup exchange ever materializes. Arithmetic is exact:
  * 48-bit hashes ((k-1)·2^48 fits a Long) and integer division for the
  * estimate, so partitioning cannot perturb a single bit.
  */
object Sketch {

  private val HashBits = 48
  private[operators] val HashSpace = 1L << HashBits

  /** 48-bit uniform hash of a value's canonical string form (12 hex
    * chars of md5, parsed as an integer). */
  private[operators] def hash48(c: Column): Column =
    conv(substring(md5(c.cast("string").cast("binary")), 1, 12), 16, 10).cast("long")

  /** KMV distinct-count estimate of `keyCol`, optionally per group.
    * Output: groupCols ++ (n_kept, kth_min_hash, est_distinct) — one row
    * per group (one total when `groupCols` is empty). Groups holding
    * fewer than k distinct values report their EXACT count (the sketch
    * saw every hash) with a NULL kth_min_hash; estimation only starts
    * where exactness ends. NULL keys are ignored, as in COUNT(DISTINCT).
    */
  def kmvDistinct(df: DataFrame, keyCol: String, groupCols: Seq[String] = Seq.empty,
      k: Int = 256): DataFrame = {
    require(k >= 2 && k <= 32768, s"k must be in 2..32768, got $k")
    val grp = groupCols.map(col)
    // NO distinct pre-shuffle: KMV is defined over the distinct hash
    // set, and graft.expressions.KmvSketch dedups INSIDE its bounded
    // buffer — each map partition ships at most k longs per group, and
    // nothing value-set-sized ever reaches an exchange (the previous
    // shape paid COUNT(DISTINCT)'s dedup exchange first).
    val hashes = df.filter(col(keyCol).isNotNull)
      .select(grp :+ hash48(col(keyCol)).as("__h"): _*)
    val top = hashes.groupBy(grp: _*)
      .agg(graft.expressions.KmvSketch(col("__h"), k).as("__mins"))
    // Materialize the k-th hash as a real column: expr() resolves against
    // the frame's schema, so the divisor must exist there by name.
    val ranked = top
      .withColumn("__n", size(col("__mins")))
      .withColumn("__kth", get(col("__mins"), lit(k - 1)))
    ranked.select(grp ++ Seq(
      col("__n").cast("long").as("n_kept"),
      col("__kth").as("kth_min_hash"),
      // Both operands are positive, so Spark's truncating `div` and the
      // oracle's flooring `//` agree exactly.
      when(col("__n") < k, col("__n").cast("long"))
        .otherwise(expr(s"${(k - 1).toLong * HashSpace}L div __kth"))
        .as("est_distinct")): _*)
  }

  /** HYPERLOGLOG distinct-count estimate (Flajolet et al., AofA'07) —
    * the CONSTANT-memory complement to [[kmvDistinct]]: where KMV holds
    * k 64-bit hashes per group (k=256 → 2 KiB), HLL holds m = 2^p
    * max-registers per group (p=10 → 1024 small ints) whose accuracy
    * ~1.04/sqrt(m) (~3.3% at p=10) does NOT degrade as cardinality
    * grows past the buffer — the sketch of choice when millions of
    * groups each need a distinct count in one pass.
    *
    * Engine-portable by construction, unlike every stock HLL: the hash
    * is the same 48-bit md5 prefix as KMV, the register index is the
    * top p bits, the rank is leading-zeros-plus-one of the remaining
    * (48−p) bits via `bin()` string length (identical in Spark and
    * DuckDB, no float log), and the estimator is pure BIGINT:
    *
    *   S        = Σ_j 2^(40 − M[j])        (M[j] = 0 for never-set)
    *   est_raw  = (m² · 2^40) div S        (harmonic mean, scaled)
    *   est      = (est_raw · α_ppm) div 10^6
    *
    * with α_ppm the standard bias constant 0.7213/(1+1.079/m) in parts
    * per million — two positive truncating divisions both engines
    * perform identically. No low-range linear-counting switch (that
    * needs ln): below ~m distincts prefer kmvDistinct, which is EXACT
    * there; `n_zero_regs` is emitted so a caller can see the regime.
    * est_raw·α_ppm stays in Long for any input a 48-bit hash can
    * produce (all-registers-saturated needs ~2^40 distincts, beyond
    * the hash space's birthday bound).
    *
    * Scale shape: one scan → partial-aggregated max per (group,
    * register) — at most m rows per group reach the shuffle, constant
    * like KMV's k — then a per-group fold of ≤m rows. Register maxes
    * are idempotent/commutative, so the sketch is MERGEABLE: the
    * register-wise max of two sketches IS the sketch of the union
    * (spec-asserted), the property that lets per-day sketches roll up
    * to months without re-scanning. NULL keys ignored as in
    * COUNT(DISTINCT). Output: groupCols ++ (n_regs_set, n_zero_regs,
    * est_distinct). */
  def hllDistinct(df: DataFrame, keyCol: String, groupCols: Seq[String] = Seq.empty,
      p: Int = 10): DataFrame = {
    require(p >= 4 && p <= 14, s"p must be in 4..14, got $p")
    val m = 1L << p
    val remBits = HashBits - p
    val remSpace = 1L << remBits
    // α_ppm = round(1e6 · 0.7213/(1 + 1.079/m)); integer-rounded ONCE
    // here so Spark and the oracle share the literal, not a float path.
    val alphaPpm = math.round(1e6 * 0.7213 / (1.0 + 1.079 / m))
    val grp = groupCols.map(col)
    val h = hash48(col(keyCol))
    // bucket/remainder by bit ops (exact; a double `/` would be a
    // rounding hazard), rank via bin()-length — no float anywhere.
    val regs = df.filter(col(keyCol).isNotNull)
      .select(grp ++ Seq(
        shiftright(h, remBits).as("__bucket"),
        h.bitwiseAND(lit(remSpace - 1)).as("__rem")): _*)
      .select(grp ++ Seq(col("__bucket"),
        when(col("__rem") === 0L, lit(remBits + 1))
          .otherwise(lit(remBits + 1) - length(bin(col("__rem"))))
          .cast("int").as("__rho")): _*)
      .groupBy(grp :+ col("__bucket"): _*)
      .agg(max(col("__rho")).as("__m"))
    val q = remBits + 2 // scale exponent: 2^(q−rho) ≥ 2 for any set register
    regs.groupBy(grp: _*)
      .agg(count(lit(1)).as("__set"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $q - __m)")).as("__sset"))
      .withColumn("__s",
        (lit(m) - col("__set")) * lit(1L << q) + col("__sset"))
      .select(grp ++ Seq(
        col("__set").as("n_regs_set"),
        (lit(m) - col("__set")).as("n_zero_regs"),
        expr(s"(${m * m}L * ${1L << q}L div __s) * ${alphaPpm}L div 1000000L")
          .as("est_distinct")): _*)
  }

  /** KMV SET-OPERATION estimates — union, intersection, and Jaccard of
    * two key sets from their k-min sketches (Beyer et al., SIGMOD'07):
    * the "how much do these two cohorts overlap?" question answered
    * without ever shuffling either distinct set. The union's k-min
    * sketch is exactly the k smallest of the two sketches' union (KMV's
    * mergeability), so est_union is the plain KMV estimate over it; the
    * Jaccard estimator is the fraction of the union's k-mins that lie
    * in BOTH sides' sketches, and est_intersect = J · est_union — all
    * in BIGINT (jaccard_ppm carries J in parts per million; positive
    * truncating division, identical in both engines).
    *
    * Scale shape: each side folds to ONE ≤k-hash row via the bounded
    * [[graft.expressions.KmvSketch]] partial aggregate (nothing
    * value-set-sized reaches an exchange); the set algebra then runs on
    * two k-length arrays with higher-order functions on a 1×1 cross
    * join — constant work regardless of input size. Sides smaller than
    * k are handled by the same formula (their sketch IS the distinct
    * hash set, estimates exact). Output one row: (n_a, n_b, n_union_kept,
    * kth_min_union, est_union, jaccard_ppm, est_intersect). */
  def kmvSetOps(a: DataFrame, b: DataFrame, keyCol: String, k: Int = 256): DataFrame = {
    require(k >= 2 && k <= 32768, s"k must be in 2..32768, got $k")
    def mins(df: DataFrame, as: String): DataFrame =
      df.filter(col(keyCol).isNotNull)
        .select(hash48(col(keyCol)).as("__h"))
        .agg(graft.expressions.KmvSketch(col("__h"), k).as(as))
    val joined = mins(a, "__ma").crossJoin(mins(b, "__mb"))
      .withColumn("__u",
        slice(array_sort(array_distinct(concat(col("__ma"), col("__mb")))), 1, k))
    val nU = size(col("__u")).cast("long")
    val kth = get(col("__u"), lit(k - 1))
    val estU = when(nU < k, nU)
      .otherwise(expr(s"${(k - 1).toLong * HashSpace}L div element_at(__u, $k)"))
    val inter = size(filter(col("__u"),
      x => array_contains(col("__ma"), x) && array_contains(col("__mb"), x))).cast("long")
    // integer `div` throughout (Spark's `/` on longs is a double divide)
    joined
      .withColumn("__est_u", estU)
      .withColumn("__inter", inter)
      .select(
        size(col("__ma")).cast("long").as("n_a"),
        size(col("__mb")).cast("long").as("n_b"),
        nU.as("n_union_kept"),
        kth.as("kth_min_union"),
        col("__est_u").as("est_union"),
        when(nU === 0L, 0L)
          .otherwise(expr("__inter * 1000000L div size(__u)")).as("jaccard_ppm"),
        when(nU === 0L, 0L)
          .otherwise(expr("__inter * __est_u div size(__u)")).as("est_intersect"))
  }

  /** COUNT-MIN SKETCH frequency estimation (Cormode & Muthukrishnan
    * 2005): d hash rows × w buckets of counters; a key's estimate is the
    * MIN of its d bucket counters — always ≥ the true count, within
    * εN (ε≈e/w) with probability 1−δ (δ≈e^−d). The mergeable
    * frequency complement to FreqItems' Misra-Gries top-k: MG answers
    * "which keys are heavy", CMS answers "how often is THIS key" for any
    * key, after one pass.
    *
    * Scale shape: building the sketch is one explode to d rows per input
    * and a map-side-combined count into ≤ d·w cells — the sketch frame is
    * CONSTANT-sized regardless of input (that's the point), broadcast to
    * the probe join. Hashes are md5-derived (salted per row index), so —
    * like KMV and unlike HLL/CMS implementations keyed on engine-private
    * hashes — any engine reproduces the identical sketch, counters and
    * all. Returns (probe key, est_count) for each DISTINCT probe key —
    * the grouped estimate collapses duplicate probe rows. */
  def cmsFreq(df: DataFrame, keyCol: String, probes: DataFrame,
      d: Int = 4, w: Int = 512): DataFrame = {
    require(d >= 1 && d <= 16, s"d must be in 1..16, got $d")
    require(w >= 2 && w <= (1 << 20), s"w must be in 2..2^20, got $w")
    def bucket(key: Column, i: Int): Column =
      pmod(conv(substring(
          md5(concat(key.cast("string"), lit(s"~cms$i"))
            .cast("binary")), 1, 12), 16, 10).cast("long"), lit(w.toLong))
    val cells = df.filter(col(keyCol).isNotNull)
      .select(posexplode(array((0 until d).map(i =>
        bucket(col(keyCol), i)): _*)))
      .withColumnsRenamed(Map("pos" -> "__row", "col" -> "__bucket"))
      .groupBy(col("__row"), col("__bucket"))
      .agg(count(lit(1)).as("__cnt"))
    val probed = probes.select(col(keyCol))
      .select(col(keyCol), posexplode(array((0 until d).map(i =>
        bucket(col(keyCol), i)): _*)))
      .withColumnsRenamed(Map("pos" -> "__row", "col" -> "__bucket"))
    probed.join(broadcast(cells), Seq("__row", "__bucket"), "left_outer")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("__cnt"), lit(0L))).as("est_count"))
  }

  /** Fixed-bin equal-width HISTOGRAM quantile sketch — the
    * bounded-memory, MERGEABLE approximate-percentile path with full
    * oracle parity. Where q18's exact `percentile` holds O(distinct
    * values) per group and `approx_percentile`'s t-digest is
    * engine-private (no cross-engine gate possible), an equal-width
    * histogram is `bins` long counters per partition, map-side combined
    * into one ≤bins-row frame — the sketch a 100 TB scan can afford AND
    * any engine reproduces bit-for-bit.
    *
    * Estimate: target rank ⌈p·N⌉ lands in the first bin whose cumulative
    * count reaches it; linear interpolation inside the bin, all from
    * integer counts and edges (`div` bin assignment — exact in any
    * BIGINT engine), with the float ops in pinned order. Error bound is
    * the bin width (range/bins) — tighten with more bins, each costing
    * one long per partition. Input must be an integer column (cents);
    * output (quantile, est) in input units, one row per prob. */
  def histQuantiles(df: DataFrame, valueCol: Column, bins: Int,
      probs: Seq[Double]): DataFrame =
    histQuantilesBy(df, Seq.empty, valueCol, bins, probs)

  /** Per-GROUP histogram quantiles — the same sketch with every stage
    * keyed on `groupCols`: each group gets its own min/max, bin edges,
    * cumulative counts, and interpolated estimates, still in ONE scan
    * plus small-frame reshaping. This is the "p99 latency per tenant /
    * value percentiles per segment" query a global quantile can't
    * answer; memory stays `bins` counters per group per partition. The
    * per-group stats row broadcasts back onto the scan (groups are
    * assumed dimension-sized). Output: groupCols ++ (quantile, est). */
  def histQuantilesBy(df: DataFrame, groupCols: Seq[String], valueCol: Column,
      bins: Int, probs: Seq[Double]): DataFrame = {
    require(bins >= 1 && bins <= 100000, s"bins must be in 1..100000, got $bins")
    require(probs.nonEmpty && probs.forall(p => p > 0.0 && p <= 1.0),
      s"probs must be in (0, 1]: $probs")
    import org.apache.spark.sql.expressions.Window
    val grp = groupCols.map(col)
    val base = df.select(grp :+ valueCol.cast("long").as("__v"): _*)
    val stats = base.groupBy(grp: _*).agg(min(col("__v")).as("__mn"),
      max(col("__v")).as("__mx"), count(lit(1)).as("__n"))
    def withStats(d: DataFrame): DataFrame =
      if (groupCols.isEmpty) d.crossJoin(broadcast(stats))
      else d.join(broadcast(stats), groupCols)
    val counts = withStats(base)
      .select(grp ++ Seq(
        ((col("__v") - col("__mn")) * lit(bins.toLong)).as("__num"),
        (col("__mx") - col("__mn") + lit(1L)).as("__den")): _*)
      .selectExpr(groupCols :+ "__num div __den AS bin": _*)
      .groupBy(grp :+ col("bin"): _*).agg(count(lit(1)).as("cnt"))
    // ≤bins rows PER GROUP from here on — windows and joins are
    // dimension-sized, never data-sized
    val cum = withStats(counts
      .withColumn("cum",
        sum(col("cnt")).over(Window.partitionBy(grp: _*).orderBy("bin"))))
    import df.sparkSession.implicits._
    val cand = probs.toDF("quantile").crossJoin(cum)
      .withColumn("target", ceil(col("quantile") * col("__n").cast("double")).cast("long"))
      .filter(col("cum") >= col("target"))
    val width = (col("__mx") - col("__mn") + lit(1L)).cast("double") / lit(bins.toDouble)
    val est = col("__mn").cast("double") + col("bin").cast("double") * width +
      ((col("target") - (col("cum") - col("cnt"))).cast("double") /
        col("cnt").cast("double")) * width
    cand
      .withColumn("__rn", row_number().over(
        Window.partitionBy(grp :+ col("quantile"): _*).orderBy("bin")))
      .filter(col("__rn") === 1)
      .select(grp ++ Seq(col("quantile"), est.as("est")): _*)
  }

  /** Two-sample Kolmogorov-Smirnov DRIFT statistic over binned ECDFs —
    * the "did the incoming batch change distribution vs the corpus?"
    * monitor every continuously-ingesting pipeline runs (feature drift,
    * corpus-version drift, A/B skew). KS = max |F_a(x) − F_b(x)|; here
    * F is evaluated at the `bins` shared equal-width bin edges (derived
    * from the UNION's min/max — the [[histQuantilesBy]] binning, exact
    * `div`), which bounds the statistic's error by the probability mass
    * of one bin — the sketch-grade KS, same trade as L75's quantiles.
    *
    * EXACT integer determinism: the distance is computed cross-
    * multiplied — `d_scaled = max |cum_a·n_b − cum_b·n_a|` over bins —
    * so no division touches the comparison; `ks = d_scaled/(n_a·n_b)`
    * is one pinned double op pair at the end. Scale shape: one scan of
    * each side (union, map-side-combined bin counts), then everything
    * is ≤bins rows — the cumulative window and the argmax run on a
    * dimension-sized frame. Returns ONE row: (n_a, n_b, d_scaled,
    * drift_bin, ks); drift_bin = the lowest bin attaining the max (where
    * the ECDFs diverge most). Empty sides propagate NULL rather than a
    * 0/0; BOTH sides empty still returns the one row (all NULLs) — the
    * output is seeded from the always-one-row stats aggregate. */
  def ksDrift(a: DataFrame, b: DataFrame, valueCol: Column, bins: Int): DataFrame = {
    require(bins >= 1 && bins <= 100000, s"bins must be in 1..100000, got $bins")
    import org.apache.spark.sql.expressions.Window
    val av = a.select(valueCol.cast("long").as("__v"),
      lit(1L).as("__ia"), lit(0L).as("__ib"))
    val bv = b.select(valueCol.cast("long").as("__v"),
      lit(0L).as("__ia"), lit(1L).as("__ib"))
    val u = av.unionByName(bv)
    val stats = u.agg(min(col("__v")).as("__mn"), max(col("__v")).as("__mx"),
      sum(col("__ia")).as("__na"), sum(col("__ib")).as("__nb"))
    val counts = u.crossJoin(broadcast(stats))
      .select(((col("__v") - col("__mn")) * lit(bins.toLong)).as("__num"),
        (col("__mx") - col("__mn") + lit(1L)).as("__den"),
        col("__ia"), col("__ib"))
      .selectExpr("__num div __den AS bin", "__ia", "__ib")
      .groupBy(col("bin"))
      .agg(sum(col("__ia")).as("__ca"), sum(col("__ib")).as("__cb"))
    // ≤bins rows from here — the windows are dimension-sized
    val best = counts
      .withColumn("__cuma", sum(col("__ca")).over(Window.orderBy("bin")))
      .withColumn("__cumb", sum(col("__cb")).over(Window.orderBy("bin")))
      .crossJoin(broadcast(stats))
      .withColumn("__ds", abs(col("__cuma") * col("__nb") - col("__cumb") * col("__na")))
      .withColumn("__rn", row_number().over(Window.orderBy(col("__ds").desc, col("bin"))))
      .filter(col("__rn") === 1)
      .select(col("__ds"), col("bin"))
    // seed the output from the stats row (always exactly 1 row, even on
    // empty input where every aggregate is NULL) so BOTH-empty inputs
    // yield the documented one row of NULLs instead of zero rows
    stats.join(best, lit(true), "left_outer")
      .select(col("__na").as("n_a"), col("__nb").as("n_b"),
        col("__ds").as("d_scaled"), col("bin").as("drift_bin"),
        when(col("__na") > 0 && col("__nb") > 0,
          col("__ds").cast("double") /
            (col("__na").cast("double") * col("__nb").cast("double"))).as("ks"))
  }
}
