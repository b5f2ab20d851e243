package graft

import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.functions._

import graft.operators.Ann

class AnnSpec extends SparkSpec {
  import sqlImplicits._

  // axis-aligned unit-ish vectors with a known neighborhood structure
  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f, 0.0f)),  // closest to 0
    (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (3L, Array(0.0f, 0.95f, 0.05f, 0.0f)), // closest to 2
    (4L, Array(0.0f, 0.0f, 1.0f, 0.0f)),
    (5L, Array(-1.0f, 0.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("knnBrute ranks the known nearest neighbor first") {
    val rows = Ann.knnBrute(vecs, "vec_id", "embedding", col("vec_id") < 1, k = 3)
      .orderBy("rank").collect()
    assert(rows.map(_.getAs[Long]("neighbor_id")).head == 1L)
    val sims = rows.map(_.getAs[Double]("cosine_sim"))
    assert(sims.head > 0.99 && sims.sameElements(sims.sorted.reverse))
  }

  test("cosineQ is exact on quantized integers: orthogonal=0, opposite=-1") {
    val got = Ann.knnBrute(vecs, "vec_id", "embedding", col("vec_id") < 1, k = 5)
      .collect().map(r => r.getAs[Long]("neighbor_id") -> r.getAs[Double]("cosine_sim")).toMap
    assert(got(4L) == 0.0)
    assert(got(5L) == -1.0)
  }

  test("knnLsh restricts to same-bucket candidates with an equi-join plan") {
    val planes = Ann.hashPlanes(2, 4)
    val out = Ann.knnLsh(vecs, "vec_id", "embedding", planes, col("vec_id") < 2, k = 3)
    val plan = out.queryExecution.executedPlan
    assert(plan.collect { case c: CartesianProductExec => c }.isEmpty)
    // every returned neighbor really shares the probe's bucket
    val bucketOf = vecs.select(col("vec_id"),
        Ann.lshBucket(Ann.quantize(col("embedding")), planes).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.collect().foreach { r =>
      assert(bucketOf(r.getAs[Long]("probe_id")) == bucketOf(r.getAs[Long]("neighbor_id")))
    }
  }

  test("multi-probe LSH recall is a superset of single-bucket LSH") {
    val planes = Ann.hashPlanes(2, 4)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id"))).toSet
    val single = pairs(Ann.knnLsh(vecs, "vec_id", "embedding", planes, col("vec_id") < 2, k = 5))
    val multi = pairs(Ann.knnLshMultiProbe(vecs, "vec_id", "embedding", planes, col("vec_id") < 2, k = 5))
    assert(single.subsetOf(multi))
    assert(multi.size >= single.size)
  }

  test("IVF recall vs brute force rises monotonically in nProbe to exhaustive") {
    // the quality metric an ANN deployment actually tracks: of the true
    // (brute-force) top-k pairs, how many does IVF reproduce? The
    // ABSOLUTE recall at small nProbe is a property of the data and
    // codebook (measured 0.35 at nProbe=2 on this synthetic set — the
    // label-derived centroids are a coarse quantizer); the operator's
    // CONTRACT is the curve: recall never falls as nProbe grows, and
    // probing every list reproduces brute force exactly.
    val dir = "/root/testdata/sf0.001"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val k = 10
    val probes = col("vec_id") < 50
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id"))).toSet
    val truth = pairSet(Ann.knnBrute(emb, "vec_id", "embedding", probes, k))
    val codebook = Ann.ivfCodebook(emb, "label", "embedding")
    val nlist = codebook.select("cb_label").distinct().count().toInt
    def recallAt(nProbe: Int) = {
      val got = pairSet(Ann.knnIvf(emb, "vec_id", "embedding", codebook, probes, k, nProbe))
      truth.intersect(got).size.toDouble / truth.size
    }
    val curve = Seq(1, 2, nlist / 2, nlist).map(recallAt)
    assert(curve.sliding(2).forall { case Seq(a, b) => b >= a },
      s"recall must be monotone in nProbe, got $curve")
    assert(curve.head > 0.0 && curve.last == 1.0,
      s"nProbe=nlist must reproduce brute force, curve=$curve")
  }

  test("hashPlanes is deterministic and engine-independent") {
    val a = Ann.hashPlanes(4, 64)
    val b = Ann.hashPlanes(4, 64)
    assert(a.flatten.toSeq == b.flatten.toSeq)
    assert(a.flatten.forall(v => v >= -(1L << 31) && v < (1L << 31)))
  }

  test("nearDupPairs finds the high-cosine pair and orders ids") {
    val planes = Ann.hashPlanes(1, 4) // single plane: 2 buckets, high recall
    val pairs = Ann.nearDupPairs(vecs, "vec_id", "embedding", planes, threshold = 0.9)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((0L, 1L)) || pairs.contains((2L, 3L)))
    assert(pairs.forall { case (a, b) => a < b })
  }

  test("nearDupPairsBanded: superset of any single table, one row per pair, exact verify") {
    val all = Ann.hashPlanes(4, 4)
    val tables = all.grouped(2).toArray // 2 tables x 2 planes
    val banded = Ann.nearDupPairsBanded(vecs, "vec_id", "embedding", tables, threshold = 0.9)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSeq
    // a pair sharing buckets in BOTH tables must still emit exactly once
    assert(banded.distinct == banded, "duplicate pair rows")
    assert(banded.forall { case (a, b) => a < b })
    // the banded front is a superset of each single table's front
    tables.foreach { planes =>
      val single = Ann.nearDupPairs(vecs, "vec_id", "embedding", planes, threshold = 0.9)
        .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
      assert(single.subsetOf(banded.toSet),
        s"single-table pairs not contained in banded result")
    }
    // every surviving pair truly clears the exact-cosine threshold:
    // with the 2-bucket tables the known high-cosine pairs are in
    val pairSet = banded.toSet
    assert(pairSet.contains((0L, 1L)) || pairSet.contains((2L, 3L)))
  }

  test("knnIvf assigns to nearest centroid lists and finds in-list neighbors") {
    val labeled = Seq(
      (0L, 0, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, 0, Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (2L, 1, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, 1, Array(0.0f, 0.95f, 0.05f, 0.0f)),
      (4L, 2, Array(0.0f, 0.0f, 1.0f, 0.0f)),
      (5L, 2, Array(0.0f, 0.0f, 0.9f, 0.1f))
    ).toDF("vec_id", "label", "embedding")
    val codebook = Ann.ivfCodebook(labeled, "label", "embedding")
    assert(codebook.count() == 3 * 4)
    // nProbe=1: probe 0 must find its own-cluster neighbor 1 first
    val got = Ann.knnIvf(labeled, "vec_id", "embedding", codebook,
        col("vec_id") < 1, k = 2, nProbe = 1)
      .orderBy("rank").collect()
    assert(got.head.getAs[Long]("neighbor_id") == 1L)
    // all results stay within the probed list (cluster 0)
    assert(got.forall(r => Set(1L)(r.getAs[Long]("neighbor_id"))))
    // nProbe=3 widens the search to every list: more neighbors reachable
    val wide = Ann.knnIvf(labeled, "vec_id", "embedding", codebook,
        col("vec_id") < 1, k = 5, nProbe = 3)
    assert(wide.count() == 5)
  }

  test("knnLshFiltered: neighbors obey the metadata predicate, probes exempt") {
    val labeled = Seq(
      (0L, 1, Array(1.0f, 0.0f, 0.0f, 0.0f)),   // probe with ODD label
      (1L, 0, Array(0.99f, 0.01f, 0.0f, 0.0f)), // even: searchable
      (2L, 1, Array(0.98f, 0.02f, 0.0f, 0.0f)), // odd: must never appear
      (3L, 0, Array(0.97f, 0.03f, 0.0f, 0.0f))  // even: searchable
    ).toDF("vec_id", "label", "embedding")
    val planes = Ann.hashPlanes(nPlanes = 2, dim = 4)
    val got = Ann.knnLshFiltered(labeled, "vec_id", "embedding", planes,
        col("vec_id") === 0, col("label") % 2 === 0, k = 3)
      .collect()
    assert(got.nonEmpty, "probe found no even-label neighbors in its bucket")
    assert(got.forall(r => Set(1L, 3L)(r.getAs[Long]("neighbor_id"))),
      s"odd-label neighbor leaked: ${got.map(_.getAs[Long]("neighbor_id")).toSeq}")
    // unfiltered search over the same planes CAN see the odd doc —
    // proving the filter (not the buckets) excluded it
    val open = Ann.knnLsh(labeled, "vec_id", "embedding", planes,
        col("vec_id") === 0, k = 3)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    assert(open.contains(2L), s"bucket layout should admit doc 2: $open")
  }

  test("rrfFuse: dual-list ids outrank single-list ids, ties break by id") {
    val kw = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("doc_id", "rank")
    val vec = Seq((2L, 1L), (4L, 2L)).toDF("doc_id", "rank")
    val got = Ann.rrfFuse(kw, vec, "doc_id", k = 10)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("rrf_score"))
    // doc 2 appears in BOTH lists → highest fused score
    assert(got.head._1 == 2L)
    assert(got.head._2 == 1.0 / 62 + 1.0 / 61)
    // single-list ids carry exactly their own term
    val m = got.toMap
    assert(m(1L) == 1.0 / 61 && m(4L) == 1.0 / 62 && m(3L) == 1.0 / 63)
    // doc 1 (kw rank 1) and doc 4 (vec rank 2): 1/61 > 1/62
    assert(got.map(_._1).toSeq == Seq(2L, 1L, 4L, 3L))
    // k cuts the fused list
    assert(Ann.rrfFuse(kw, vec, "doc_id", k = 2).count() == 2L)
  }

  test("kmeans converges to the true groups and exact integer centroids") {
    // two tight groups; init = 2 lowest ids, one in each group
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f)),
      (4L, Array(0.95f, 0.0f)),
      (1L, Array(0.0f, 1.0f)),
      (3L, Array(0.1f, 0.9f)),
      (5L, Array(0.0f, 0.95f))
    ).toDF("vec_id", "embedding")
    val got = Ann.kmeans(vecs, "vec_id", "embedding", k = 2, iters = 3)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("cluster"), r.getAs[Long]("dist2"))).toMap
    // evens (near e_x) → cluster 0 (init = vec 0), odds → cluster 1
    assert(Seq(0L, 2L, 4L).forall(got(_)._1 == 0L))
    assert(Seq(1L, 3L, 5L).forall(got(_)._1 == 1L))
    // dist2 is the exact integer L2 to the FINAL centroid: centroid 0 =
    // floor-avg of q-vectors [(1000,0),(900,100),(950,0)] = (950, 33)
    assert(got(0L)._2 == (1000 - 950) * (1000 - 950) + (0 - 33) * (0 - 33))
    // stability: one more iteration changes nothing
    val more = Ann.kmeans(vecs, "vec_id", "embedding", k = 2, iters = 4)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("cluster"), r.getAs[Long]("dist2"))).toMap
    assert(more == got)
  }

  test("kmeans: a cluster that loses all members keeps its previous centroid") {
    // ids 0 and 1 carry IDENTICAL vectors → init c0 = c1; every point
    // ties to both and the tie rule sends all to cluster 0, so cluster 1
    // is empty from round 1 and must keep (not NaN/drop) its centroid.
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.9f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = Ann.kmeans(vecs, "vec_id", "embedding", k = 2, iters = 1)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster")).toMap
    // round 1: all → cluster 0 (tie rule), cluster 1 empty, keeps (1000,0);
    // cluster 0 moves to the mean (966,0). Final assignment: the two
    // exact-(1000,0) points win BACK to the kept centroid 1 (d2=0) — which
    // could only happen if the empty cluster retained its vector.
    assert(got == Map(0L -> 1L, 1L -> 1L, 2L -> 0L), s"got $got")
  }

  test("centroids: per-label exact means over quantized elements") {
    val labeled = Seq(
      (0, Array(1.0f, 3.0f)),
      (0, Array(3.0f, 5.0f)),
      (1, Array(10.0f, 20.0f))
    ).toDF("label", "embedding")
    val got = Ann.centroids(labeled, "label", "embedding")
      .collect().map(r => (r.getAs[Int]("label"), r.getAs[Long]("dim_idx")) -> r.getAs[Double]("centroid"))
      .toMap
    assert(got((0, 0L)) == 2.0 && got((0, 1L)) == 4.0)
    assert(got((1, 0L)) == 10.0 && got((1, 1L)) == 20.0)
  }

  test("mmrDiversify: near-duplicate top hits are diversified, rank 1 = argmax rel") {
    // probe 0; candidates: 1 and 2 nearly identical (both very relevant),
    // 3 less relevant but orthogonal to them
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.98f, 0.01f, 0.0f)),
      (2L, Array(0.97f, 0.02f, 0.0f)),
      (3L, Array(0.5f, 0.0f, 0.86f))
    ).toDF("vec_id", "embedding")
    val out = Ann.mmrDiversify(vecs, "vec_id", "embedding",
        col("vec_id") === 0L, c = 3, k = 2)
      .orderBy("mmr_rank").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("neighbor_id") == 1L) // pure relevance argmax
    // plain top-2 would take 2 (rel ~0.999); MMR penalizes its ~1.0
    // similarity to the already-picked 1 and takes the orthogonal 3
    assert(out(1).getAs[Long]("neighbor_id") == 3L)
    // selection is deterministic and exhausts at the candidate count
    val all = Ann.mmrDiversify(vecs, "vec_id", "embedding",
      col("vec_id") === 0L, c = 3, k = 5)
    assert(all.count() == 3)
    val rerun = Ann.mmrDiversify(vecs, "vec_id", "embedding",
        col("vec_id") === 0L, c = 3, k = 2)
      .orderBy("mmr_rank").collect()
    assert(rerun.map(_.toSeq).toSeq == out.map(_.toSeq).toSeq)
  }

  test("clusterSample: per-cluster quota, hash-deterministic, stable reruns") {
    // two tight groups of 4; quota m=2 must keep exactly 2 per cluster
    val vecs = (0L to 3L).map(i => (i, Array(1.0f, i.toFloat * 0.01f))) ++
      (4L to 7L).map(i => (i, Array(0.0f, 1.0f + i.toFloat * 0.01f)))
    val df = vecs.toDF("vec_id", "embedding")
    val a = Ann.clusterSample(df, "vec_id", "embedding", k = 2, iters = 2, m = 2)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cluster"),
        r.getAs[Long]("sample_rank")))
    assert(a.length == 4)
    assert(a.groupBy(_._2).forall { case (_, rows) =>
      rows.length == 2 && rows.map(_._3).sorted.toSeq == Seq(1L, 2L) })
    // deterministic: a rerun selects the identical members in identical order
    val b = Ann.clusterSample(df, "vec_id", "embedding", k = 2, iters = 2, m = 2)
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cluster"),
        r.getAs[Long]("sample_rank")))
    assert(a.toSet == b.toSet)
    // quota above the cluster size keeps everything
    assert(Ann.clusterSample(df, "vec_id", "embedding", k = 2, iters = 2, m = 10)
      .count() == 8L)
  }

  test("semDedup: drops higher-id near-dups within a cluster, keeps exemplars") {
    // two tight groups; 1 ≈ 0 (cosine ~1) and 3 ≈ 2; 4 is alone
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.999f, 0.001f, 0.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 0.999f, 0.001f, 0.0f)),
      (4L, Array(0.0f, 0.0f, 1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Ann.semDedup(vecs, "vec_id", "embedding", k = 3, iters = 2, threshold = 0.95)
    try {
      val rows = out.collect().map(r =>
        r.getAs[Long]("vec_id") -> (r.getAs[Long]("cluster"), r.getAs[Boolean]("kept"))).toMap
      // every input row comes back exactly once
      assert(rows.keySet == Set(0L, 1L, 2L, 3L, 4L))
      // the lower-id exemplar of each near-dup pair survives, the mate drops
      assert(rows(0L)._2 && !rows(1L)._2)
      assert(rows(2L)._2 && !rows(3L)._2)
      assert(rows(4L)._2)
      // dup decisions are intra-cluster by construction
      assert(rows(0L)._1 == rows(1L)._1 && rows(2L)._1 == rows(3L)._1)
    } finally graft.operators.Curate.release(out)
  }

  test("semDedup: below-threshold cluster mates all survive") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.8f, 0.6f)), // cosine 0.8 to id 0
      (2L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val out = Ann.semDedup(vecs, "vec_id", "embedding", k = 1, iters = 1, threshold = 0.9)
    try assert(out.collect().forall(_.getAs[Boolean]("kept")))
    finally graft.operators.Curate.release(out)
  }

  test("knnPq: exhaustive codebook (k=N) reproduces exact squared-L2 ranking") {
    // with one centroid per vector after training, codes are exact and
    // ADC distance equals the true quantized L2
    val pq = Ann.pqCodebooks(vecs, "vec_id", "embedding", dim = 4, m = 2, k = 6, iters = 1)
    try {
      val got = Ann.knnPq(vecs, "vec_id", "embedding", pq, dim = 4, m = 2,
        col("vec_id") === 0, k = 5).orderBy("rank").collect()
      assert(got.length == 5)
      // true quantized squared L2 from vec 0 to every other id
      val q = vecs.collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding")
          .map(x => Math.round(x.toDouble * 1000)).toArray).toMap
      def l2(a: Array[Long], b: Array[Long]) = a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
      val want = (1L to 5L).map(i => i -> l2(q(0L), q(i))).sortBy(p => (p._2, p._1))
      assert(got.map(r => r.getAs[Long]("neighbor_id") -> r.getAs[Long]("adc_dist2")).toSeq == want)
    } finally graft.operators.NearDup.freeCheckpoint(pq)
  }

  test("knnPq: an exact duplicate attains the minimum ADC distance") {
    // id 6 duplicates id 0 exactly, so its codes are 0's own nearest
    // centroids per subspace — the smallest ADC distance ANY candidate
    // can attain (candidates sharing those codes tie; lower id ranks
    // first, which is why rank 1 need not be id 6 itself)
    val withDup = vecs.unionAll(Seq((6L, Array(1.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding"))
    val pq = Ann.pqCodebooks(withDup, "vec_id", "embedding", dim = 4, m = 2, k = 2, iters = 1)
    try {
      val got = Ann.knnPq(withDup, "vec_id", "embedding", pq, dim = 4, m = 2,
          col("vec_id") === 0, k = 6).orderBy("rank").collect()
      val dists = got.map(r => r.getAs[Long]("neighbor_id") -> r.getAs[Long]("adc_dist2")).toMap
      assert(dists(6L) == dists.values.min)
      assert(got.head.getAs[Long]("adc_dist2") == dists(6L))
      // ranks follow (dist asc, id asc)
      val ordered = got.map(r => (r.getAs[Long]("adc_dist2"), r.getAs[Long]("neighbor_id")))
      assert(ordered.sameElements(ordered.sorted))
    } finally graft.operators.NearDup.freeCheckpoint(pq)
  }

  test("knnIvfPq: candidates come only from the probe's nProbe nearest lists") {
    // three well-separated labeled clusters; with nProbe=1 a probe must
    // only ever see its own list's members
    val labeled = Seq(
      (0L, 0, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, 0, Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (2L, 1, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, 1, Array(0.0f, 0.95f, 0.05f, 0.0f)),
      (4L, 2, Array(0.0f, 0.0f, 1.0f, 0.0f)),
      (5L, 2, Array(0.0f, 0.0f, 0.9f, 0.1f))
    ).toDF("vec_id", "label", "embedding")
    val coarse = Ann.ivfCodebook(labeled, "label", "embedding")
    val got = Ann.knnIvfPq(labeled, "vec_id", "embedding", coarse,
        dim = 4, m = 2, k = 2, iters = 1, col("vec_id") < 1, topK = 5, nProbe = 1)
      .collect()
    try {
      assert(got.map(_.getAs[Long]("neighbor_id")).toSet == Set(1L),
        "nProbe=1 must restrict candidates to the probe's own inverted list")
      // nProbe = nlist reaches every list
      val wide = Ann.knnIvfPq(labeled, "vec_id", "embedding", coarse,
        dim = 4, m = 2, k = 2, iters = 1, col("vec_id") < 1, topK = 5, nProbe = 3)
      assert(wide.count() == 5)
    } finally ()
  }

  test("knnIvfPq: an exact duplicate attains the minimum ADC distance") {
    // id 6 duplicates id 0: same coarse list, identical residual, so its
    // codes are 0's residual's own nearest centroids per subspace — the
    // smallest ADC any same-list candidate can attain
    val labeled = Seq(
      (0L, 0, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, 0, Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (2L, 1, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (3L, 1, Array(0.0f, 0.95f, 0.05f, 0.0f)),
      (6L, 0, Array(1.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "label", "embedding")
    val coarse = Ann.ivfCodebook(labeled, "label", "embedding")
    val got = Ann.knnIvfPq(labeled, "vec_id", "embedding", coarse,
        dim = 4, m = 2, k = 2, iters = 1, col("vec_id") === 0, topK = 5, nProbe = 2)
      .orderBy("rank").collect()
    val dists = got.map(r => r.getAs[Long]("neighbor_id") -> r.getAs[Long]("adc_dist2")).toMap
    assert(dists(6L) == dists.values.min)
    // ranks follow (dist asc, id asc)
    val ordered = got.map(r => (r.getAs[Long]("adc_dist2"), r.getAs[Long]("neighbor_id")))
    assert(ordered.sameElements(ordered.sorted))
  }

  test("knnIvfPq: validation — m must divide dim, nProbe positive") {
    val labeled = vecs.withColumn("label", (col("vec_id") % 2).cast("int"))
    val coarse = Ann.ivfCodebook(labeled, "label", "embedding")
    intercept[IllegalArgumentException] {
      Ann.knnIvfPq(labeled, "vec_id", "embedding", coarse,
        dim = 4, m = 3, k = 2, iters = 1, col("vec_id") < 1, topK = 3, nProbe = 1)
    }
    intercept[IllegalArgumentException] {
      Ann.knnIvfPq(labeled, "vec_id", "embedding", coarse,
        dim = 4, m = 2, k = 2, iters = 1, col("vec_id") < 1, topK = 3, nProbe = 0)
    }
  }

  test("pqCodebooks: m·k rows, one codebook per subspace; m must divide dim") {
    val pq = Ann.pqCodebooks(vecs, "vec_id", "embedding", dim = 4, m = 2, k = 2, iters = 0)
    try {
      val rows = pq.collect()
      assert(rows.length == 4)
      assert(rows.map(_.getAs[Long]("subspace")).toSet == Set(0L, 1L))
      assert(rows.forall(_.getAs[scala.collection.Seq[Long]]("__cv").length == 2))
    } finally graft.operators.NearDup.freeCheckpoint(pq)
    intercept[IllegalArgumentException] {
      Ann.pqCodebooks(vecs, "vec_id", "embedding", dim = 4, m = 3, k = 2, iters = 0)
    }
  }

  test("sq8Train: per-dim min/max over the quantized collection") {
    val mm = Ann.sq8Train(vecs, "embedding").orderBy("dim_idx").collect()
    assert(mm.length == 4)
    // dim 0 spans quantize(-1.0)= -1000 .. quantize(1.0)= 1000
    assert(mm(0).getAs[Long]("vmin") == -1000L && mm(0).getAs[Long]("vmax") == 1000L)
    // dim 3 is constantly 0 — degenerate span
    assert(mm(3).getAs[Long]("vmin") == 0L && mm(3).getAs[Long]("vmax") == 0L)
  }

  test("knnSq8: exhaustive refine equals knnBrute exactly (codes only gate stage 1)") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("probe_id", "rank").collect()
        .map(r => (r.getAs[Long]("probe_id"), r.getAs[Long]("neighbor_id"),
          r.getAs[Double]("cosine_sim"), r.getAs[Long]("rank"))).toSeq
    // refine·k >= collection size ⇒ stage 1 keeps every candidate and the
    // exact re-rank IS the brute-force answer, bit for bit
    val sq = rows(Ann.knnSq8(vecs, "vec_id", "embedding", col("vec_id") < 2, k = 3, refine = 2))
    val brute = rows(Ann.knnBrute(vecs, "vec_id", "embedding", col("vec_id") < 2, k = 3))
    assert(sq == brute)
  }

  test("knnSq8: k rows per probe, rank follows exact cosine desc, no self-match") {
    val got = Ann.knnSq8(vecs, "vec_id", "embedding", col("vec_id") < 2, k = 2, refine = 1)
      .orderBy("probe_id", "rank").collect()
    assert(got.length == 4)
    got.groupBy(_.getAs[Long]("probe_id")).foreach { case (p, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L))
      assert(rs.forall(_.getAs[Long]("neighbor_id") != p))
      val sims = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("cosine_sim"))
      assert(sims.sameElements(sims.sorted.reverse))
    }
  }

  test("knnSq8: partition-independent (repartitioned input is bit-identical)") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("probe_id", "rank").collect().map(_.toSeq).toSeq
    val a = rows(Ann.knnSq8(vecs, "vec_id", "embedding", col("vec_id") < 2, k = 3, refine = 2))
    val b = rows(Ann.knnSq8(vecs.repartition(7), "vec_id", "embedding",
      col("vec_id") < 2, k = 3, refine = 2))
    assert(a == b)
    intercept[IllegalArgumentException] {
      Ann.knnSq8(vecs, "vec_id", "embedding", col("vec_id") < 1, k = 2, refine = 0)
    }
  }

  test("knnBq: deep refine recovers brute force; dims pack beyond one word") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("probe_id", "rank").collect().map(_.toSeq).toSeq
    // refine spanning the whole collection ⇒ the exact re-rank IS brute
    val bq = rows(Ann.knnBq(vecs, "vec_id", "embedding", col("vec_id") < 2, k = 3, refine = 2))
    val brute = rows(Ann.knnBrute(vecs, "vec_id", "embedding", col("vec_id") < 2, k = 3))
    assert(bq == brute)
    // partition-invariance
    val re = rows(Ann.knnBq(vecs.repartition(5), "vec_id", "embedding",
      col("vec_id") < 2, k = 3, refine = 2))
    assert(re == bq)
    // >32 dims: the ragged second word packs via the coalesced zip tail;
    // a 40-dim one-hot corpus still ranks its known neighbor first
    val wide = Seq.tabulate(6) { i =>
      (i.toLong, Array.tabulate(40)(d =>
        if (d == (i % 3) * 13) 1.0f else if (d == 39 && i >= 3) 0.2f else 0.0f))
    }.toDF("vec_id", "embedding")
    val got = Ann.knnBq(wide, "vec_id", "embedding", col("vec_id") === 0L, k = 1, refine = 6)
      .collect()
    assert(got.length == 1 && got.head.getAs[Long]("neighbor_id") == 3L)
  }

  test("randomProject: exact integer JL sums; knnBruteQ searches the sketch") {
    // hand-check one projected coordinate: y_j = Σ_d round(1000·x_d)·s(j,d)
    val signs = Ann.signPlanes(2, 4)
    val proj = Ann.randomProject(vecs, "vec_id", "embedding", dimOut = 2, dimIn = 4)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Seq[Long]]("rp")).toMap
    val q1 = Array(900L, 100L, 0L, 0L) // quantize of vec 1
    (0 until 2).foreach { j =>
      val want = (0 until 4).map(d => q1(d) * signs(j)(d)).sum
      assert(proj(1L)(j) == want, s"dim $j")
    }
    // a projection at full rank (dimOut >= dimIn) with ±1 rows can still
    // collapse directions; what MUST hold is partition invariance and
    // that the sketch search is the brute search of the projected space
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("probe_id", "rank").collect().map(_.toSeq).toSeq
    val p8 = Ann.randomProject(vecs, "vec_id", "embedding", dimOut = 8, dimIn = 4)
    val a = rows(Ann.knnBruteQ(p8, "vec_id", "rp", col("vec_id") < 2, k = 3))
    val b = rows(Ann.knnBruteQ(
      Ann.randomProject(vecs.repartition(5), "vec_id", "embedding", 8, 4),
      "vec_id", "rp", col("vec_id") < 2, k = 3))
    assert(a == b && a.nonEmpty)
    // at generous output width the sketch preserves THIS corpus's
    // nearest-neighbor structure: 0's best neighbor stays 1
    assert(a.head(1) == 1L)
  }
}
