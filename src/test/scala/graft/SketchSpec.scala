package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketch

class SketchSpec extends SparkSpec {
  import sqlImplicits._

  test("exact below k: small groups report their true distinct count") {
    val df = Seq(
      ("a", 1L), ("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 7L), ("b", 7L)
    ).toDF("g", "v")
    val rows = Sketch.kmvDistinct(df, "v", Seq("g"), k = 256)
      .orderBy("g").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a", 3L), ("b", 1L)))
    // below k the sketch saw everything: estimate IS the exact count and
    // there is no k-th hash
    rows.foreach { r =>
      assert(r.getAs[Long]("est_distinct") == r.getAs[Long]("n_kept"))
      assert(r.isNullAt(r.fieldIndex("kth_min_hash")))
    }
  }

  test("estimate above k: within ~3/sqrt(k) of the true cardinality") {
    val n = 20000
    val df = (1 to n).map(_.toLong).toDF("v")
    val r = Sketch.kmvDistinct(df, "v", k = 256).collect().head
    assert(r.getAs[Long]("n_kept") == 256L)
    assert(!r.isNullAt(r.fieldIndex("kth_min_hash")))
    val est = r.getAs[Long]("est_distinct").toDouble
    // 1/sqrt(256) ≈ 6.25% standard error; 3 sigma ≈ 19%
    assert(math.abs(est - n) / n < 0.19, s"estimate $est too far from $n")
  }

  test("NULL keys are ignored and duplicates don't perturb the sketch") {
    val base = (1 to 5000).map(i => Option((i % 1000).toLong))
    val df = (base ++ Seq(None, None)).toDF("v")
    val withNulls = Sketch.kmvDistinct(df, "v", k = 64).collect().head
    val clean = Sketch.kmvDistinct(
      (1 to 1000).map(_.toLong).toDF("v"), "v", k = 64).collect().head
    assert(withNulls.getAs[Long]("kth_min_hash") == clean.getAs[Long]("kth_min_hash"))
    assert(withNulls.getAs[Long]("est_distinct") == clean.getAs[Long]("est_distinct"))
  }

  test("partition-invariant: 1-partition and 32-partition runs agree exactly") {
    val df = (1 to 8000).map(i => (i % 7).toString -> i.toLong).toDF("g", "v")
    def run(parts: Int) =
      Sketch.kmvDistinct(df.repartition(parts), "v", Seq("g"), k = 128)
        .orderBy("g").collect().map(_.toSeq).toSeq
    assert(run(1) == run(32))
  }

  test("cmsFreq: one-sided estimates, exact when sparse, absent keys report 0") {
    import org.apache.spark.sql.functions.col
    // 10 distinct keys in a 4×512 sketch: collisions are possible but
    // estimates are NEVER below truth (one-sided by construction)
    val data = (1 to 1000).map(i => Tuple1((i % 10).toLong)).toDF("k")
    val probes = (0L to 12L).map(Tuple1(_)).toDF("k")
    val got = Sketch.cmsFreq(data, "k", probes, d = 4, w = 512)
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("est_count")).toMap
    val truth = (0L to 12L).map(k => k -> (if (k < 10) 100L else 0L)).toMap
    (0L to 12L).foreach(k => assert(got(k) >= truth(k), s"key $k: ${got(k)} < ${truth(k)}"))
    // with 10 keys in 2048 cells, all 4 rows collision-free is near
    // certain for SOME row — and min picks it: exact here
    assert(got.filterKeys(_ < 10).forall(_._2 == 100L), got)
    assert(got(11L) == 0L && got(12L) == 0L)
    // every probe key reports, even the never-seen ones
    assert(got.keySet == (0L to 12L).toSet)
  }

  test("cmsFreq: partition-invariant and validates parameters") {
    import org.apache.spark.sql.functions.col
    val data = (1 to 5000).map(i => Tuple1((i % 37).toLong)).toDF("k")
    val probes = (0L until 37L).map(Tuple1(_)).toDF("k")
    def run(parts: Int) =
      Sketch.cmsFreq(data.repartition(parts), "k", probes, d = 3, w = 64)
        .orderBy("k").collect().map(_.toSeq).toSeq
    assert(run(1) == run(32))
    intercept[IllegalArgumentException](Sketch.cmsFreq(data, "k", probes, d = 0))
    intercept[IllegalArgumentException](Sketch.cmsFreq(data, "k", probes, w = 1))
  }

  test("histQuantilesBy: per-group sketches equal the single-group sketch per group") {
    import org.apache.spark.sql.functions.col
    // wildly different ranges per group — a shared-edge histogram would
    // answer garbage for the small group; per-group edges must not
    val data = ((1L to 100L).map(("a", _)) ++ (10000L to 10100L).map(("b", _)))
      .toDF("g", "v")
    val by = Sketch.histQuantilesBy(data, Seq("g"), col("v"), bins = 16, probs = Seq(0.5, 0.9))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    for (g <- Seq("a", "b")) {
      val solo = Sketch.histQuantiles(data.filter(col("g") === g), col("v"),
          bins = 16, probs = Seq(0.5, 0.9))
        .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
      assert(by((g, 0.5)) == solo(0.5) && by((g, 0.9)) == solo(0.9),
        s"group $g: ${by.filterKeys(_._1 == g)} vs $solo")
    }
    assert(math.abs(by(("a", 0.5)) - 50.0) <= 100.0 / 16)
    assert(math.abs(by(("b", 0.5)) - 10050.0) <= 101.0 / 16)
  }

  test("histQuantiles: uniform data — estimates within a bin width of truth") {
    import org.apache.spark.sql.functions.col
    val vals = (1L to 10000L).map(Tuple1(_)).toDF("v")
    val got = Sketch.histQuantiles(vals, col("v"), bins = 100, probs = Seq(0.5, 0.9, 0.99))
      .collect().map(r => r.getAs[Double]("quantile") -> r.getAs[Double]("est")).toMap
    val binWidth = 10000.0 / 100
    assert(math.abs(got(0.5) - 5000.0) <= binWidth, s"p50 ${got(0.5)}")
    assert(math.abs(got(0.9) - 9000.0) <= binWidth, s"p90 ${got(0.9)}")
    assert(math.abs(got(0.99) - 9900.0) <= binWidth, s"p99 ${got(0.99)}")
    // estimates are monotone in p
    assert(got(0.5) < got(0.9) && got(0.9) < got(0.99))
  }

  test("histQuantiles: single-bin degenerate, skew, partition independence, validation") {
    import org.apache.spark.sql.functions.col
    // all-equal values: every quantile is that value (+ intra-bin lerp
    // stays inside the 1-wide value range)
    val const = Seq.fill(50)(Tuple1(42L)).toDF("v")
    Sketch.histQuantiles(const, col("v"), bins = 8, probs = Seq(0.5, 1.0))
      .collect().foreach(r => assert(math.abs(r.getAs[Double]("est") - 42.0) <= 1.0))
    // heavy skew: 99 zeros and one large value — p50 stays near 0
    val skew = (Seq.fill(99)(0L) :+ 1000000L).map(Tuple1(_)).toDF("v")
    val p50 = Sketch.histQuantiles(skew, col("v"), bins = 32, probs = Seq(0.5))
      .collect().head.getAs[Double]("est")
    assert(p50 < 1000000.0 / 32)
    // partitioning cannot perturb a bit
    val vals = (1L to 5000L).map(Tuple1(_)).toDF("v")
    def run(df: org.apache.spark.sql.DataFrame) =
      Sketch.histQuantiles(df, col("v"), bins = 32, probs = Seq(0.25, 0.75))
        .orderBy("quantile").collect().map(_.toSeq).toSeq
    assert(run(vals) == run(vals.repartition(17)))
    intercept[IllegalArgumentException](
      Sketch.histQuantiles(vals, col("v"), bins = 0, probs = Seq(0.5)))
    intercept[IllegalArgumentException](
      Sketch.histQuantiles(vals, col("v"), bins = 8, probs = Seq(0.0)))
  }

  test("ksDrift: 0 for identical samples, 1 for disjoint, detects a shift") {
    def ks(a: Seq[Long], b: Seq[Long]): (Long, Double) = {
      val row = Sketch.ksDrift(a.map(Tuple1(_)).toDF("v"), b.map(Tuple1(_)).toDF("v"),
        col("v"), bins = 32).collect().head
      (row.getAs[Long]("d_scaled"), row.getAs[Double]("ks"))
    }
    // identical samples: ECDFs agree at every bin edge
    val xs = (1L to 100L)
    assert(ks(xs, xs) == ((0L, 0.0)))
    // disjoint supports: at the gap the scaled distance is n_a * n_b
    val (d, k) = ks(1L to 50L, 1000L to 1049L)
    assert(d == 50L * 50L && k == 1.0)
    // a clear location shift is detected with a large statistic
    val (_, kShift) = ks(1L to 100L, 61L to 160L)
    assert(kShift > 0.5 && kShift < 1.0)
    // partitioning cannot perturb a bit
    val a = (1L to 3000L).map(Tuple1(_)).toDF("v")
    val b = (1500L to 4500L).map(Tuple1(_)).toDF("v")
    val one = Sketch.ksDrift(a, b, col("v"), 64).collect().head.toSeq
    val two = Sketch.ksDrift(a.repartition(13), b.repartition(7), col("v"), 64)
      .collect().head.toSeq
    assert(one == two)
    // empty side: NULL ks, not a 0/0 crash
    val empty = Seq.empty[Long].map(Tuple1(_)).toDF("v")
    val row = Sketch.ksDrift(a, empty, col("v"), 8).collect()
    assert(row.length == 1 && row.head.isNullAt(row.head.fieldIndex("ks")))
    // BOTH sides empty: still one row, every field NULL (not zero rows)
    val both = Sketch.ksDrift(empty, empty, col("v"), 8).collect()
    assert(both.length == 1 &&
      Seq("n_a", "n_b", "d_scaled", "drift_bin", "ks")
        .forall(f => both.head.isNullAt(both.head.fieldIndex(f))))
  }

  test("hllDistinct: estimate within ~3σ, duplicates/NULLs ignored") {
    val n = 50000
    val dupes = (1 to n).map(_.toLong) ++ (1 to n / 2).map(_.toLong)
    val df = (dupes.map(Option(_)) ++ Seq(None, None)).toDF("v")
    val r = Sketch.hllDistinct(df, "v", p = 10).collect().head
    val est = r.getAs[Long]("est_distinct").toDouble
    // 1.04/sqrt(1024) ≈ 3.25% standard error; 3σ ≈ 10%
    assert(math.abs(est - n) / n < 0.10, s"estimate $est too far from $n")
    // duplicates cannot move a max-register: clean run matches exactly
    val clean = Sketch.hllDistinct((1 to n).map(_.toLong).toDF("v"), "v", p = 10)
      .collect().head
    assert(r.toSeq == clean.toSeq)
  }

  test("hllDistinct: partition-invariant and MERGEABLE (union = max of registers)") {
    val df = (1 to 30000).map(i => (i % 3).toString -> i.toLong).toDF("g", "v")
    def run(parts: Int) =
      Sketch.hllDistinct(df.repartition(parts), "v", Seq("g"), p = 8)
        .orderBy("g").collect().map(_.toSeq).toSeq
    assert(run(1) == run(32))
    // mergeability: the union's sketch equals the sketch of the union —
    // split the corpus in half, union the halves as frames, and the
    // estimate matches the whole-corpus run bit-for-bit (register maxes
    // are idempotent/commutative, so HLL(A ∪ B) = HLL rows of A ++ B)
    val whole = (1 to 40000).map(_.toLong).toDF("v")
    val a = whole.filter(col("v") % 2 === 0)
    val b = whole.filter(col("v") % 2 === 1)
    val merged = Sketch.hllDistinct(a.unionByName(b), "v", p = 10).collect().head
    val direct = Sketch.hllDistinct(whole, "v", p = 10).collect().head
    assert(merged.toSeq == direct.toSeq)
  }

  test("kmvSetOps: exact below k; estimates track true overlap above k") {
    // sides smaller than k: the sketches ARE the distinct hash sets —
    // union/intersection estimates are exact
    val a = (1L to 60L).map(Tuple1(_)).toDF("v")
    val b = (41L to 100L).map(Tuple1(_)).toDF("v")
    val r = Sketch.kmvSetOps(a, b, "v", k = 256).collect().head
    assert(r.getAs[Long]("n_a") == 60L && r.getAs[Long]("n_b") == 60L)
    assert(r.getAs[Long]("est_union") == 100L)
    assert(r.getAs[Long]("est_intersect") == 20L)
    assert(r.getAs[Long]("jaccard_ppm") == 20L * 1000000L / 100L)
    // above k: within a loose 3σ band of the true values
    val bigA = (1L to 20000L).map(Tuple1(_)).toDF("v")
    val bigB = (10001L to 30000L).map(Tuple1(_)).toDF("v")
    val br = Sketch.kmvSetOps(bigA, bigB, "v", k = 256).collect().head
    val estU = br.getAs[Long]("est_union").toDouble
    val estI = br.getAs[Long]("est_intersect").toDouble
    assert(math.abs(estU - 30000) / 30000 < 0.19, s"union $estU")
    assert(math.abs(estI - 10000) / 10000 < 0.45, s"intersect $estI")
    // partition-invariance
    val one = Sketch.kmvSetOps(bigA.repartition(1), bigB.repartition(1), "v", 256)
      .collect().head.toSeq
    val many = Sketch.kmvSetOps(bigA.repartition(17), bigB.repartition(5), "v", 256)
      .collect().head.toSeq
    assert(one == many)
  }
}
