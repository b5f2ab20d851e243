package graft

import graft.operators.NearDup

class NearDupSpec extends SparkSpec {
  import sqlImplicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    // near-dup of 1: one word changed
    (2L, "the quick brown fox jumps over the lazy cat near the river bank today"),
    // exact dup of 1 modulo punctuation/case
    (3L, "The QUICK brown fox... jumps over the lazy dog near the river bank today!"),
    (4L, "completely different content about distributed query engines and shuffles"),
    (5L, "another unrelated document mentioning vectors embeddings and analytics")
  ).toDF("doc_id", "text")

  test("exactDupGroups groups normalization-equal docs under min id") {
    val groups = NearDup.exactDupGroups(docs, "doc_id", "text")
      .collect().map(r => (r.getAs[Long]("canonical_id"), r.getAs[Long]("n_docs"))).toMap
    assert(groups(1L) == 2L) // docs 1 and 3
    assert(groups(2L) == 1L && groups(4L) == 1L && groups(5L) == 1L)
  }

  test("minhashPairs finds near-dups and exact-dups, not unrelated docs") {
    val pairs = NearDup.minhashPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r.getAs[Double]("jaccard"))
      .toMap
    assert(pairs((1L, 3L)) == 1.0) // identical shingle sets
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) > 0.5) // near-dup
    assert(!pairs.keySet.exists { case (a, b) => Set(a, b).intersect(Set(4L, 5L)).nonEmpty })
  }

  test("containmentPairs: a quoted subset scores ~1.0 containment, low jaccard") {
    // doc 11 is the first third of doc 10: every shingle of 11 is in 10,
    // so containment on the short side = 1.0 while jaccard is diluted
    val long = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega"
    val short = "alpha beta gamma delta epsilon zeta eta theta"
    val cdocs = Seq((10L, long), (11L, short)).toDF("doc_id", "text")
    val got = NearDup.containmentPairs(cdocs, "doc_id", "text")
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Double]("containment_a"), r.getAs[Double]("containment_b"),
        r.getAs[Double]("jaccard")))
    assert(got.length == 1)
    val (a, b, ca, cb, j) = got.head
    assert(a == 10L && b == 11L)
    assert(cb == 1.0, s"short side fully contained, got $cb")   // |A∩B|/|B|
    assert(ca < 0.5 && j < 0.5, s"long side diluted: ca=$ca j=$j")
    // threshold keeps the pair via its GREATER side
    assert(NearDup.containmentPairs(cdocs, "doc_id", "text", minContainment = 0.9)
      .count() == 1L)
    // ... and drops it when neither side reaches an impossible bar
    assert(NearDup.containmentPairs(cdocs, "doc_id", "text", minContainment = 1.01)
      .count() == 0L)
  }

  test("dedupeAgainst drops exact and near corpus-dups, keeps fresh batch docs") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "completely different content about distributed query engines and shuffles")
    ).toDF("doc_id", "text")
    val batch = Seq(
      // exact dup of corpus 1 modulo case/punctuation → exact-fingerprint drop
      (10L, "The QUICK brown fox jumps over the lazy dog near the river bank today!"),
      // near-dup of corpus 1 (one word changed) → verified-jaccard drop
      (11L, "the quick brown fox jumps over the lazy cat near the river bank today"),
      // fresh content → survives
      (12L, "a genuinely novel document about streaming watermarks and state stores"),
      // batch-INTERNAL dup of 12 → ALSO survives (cross-corpus gate only)
      (13L, "a genuinely novel document about streaming watermarks and state stores")
    ).toDF("doc_id", "text")
    val kept = NearDup.dedupeAgainst(corpus, batch, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(12L, 13L), s"got $kept")
    // empty corpus: everything survives
    assert(NearDup.dedupeAgainst(corpus.limit(0), batch, "doc_id", "text")
      .count() == 4L)
  }

  test("minhash pair pipeline plan is banded: no cartesian, no nested-loop join") {
    // Assert on the pre-checkpoint pipeline: minhashPairs itself returns a
    // localCheckpoint'd frame whose executedPlan is just a block scan, so
    // asserting there would be vacuously green even with a cartesian join.
    val df = NearDup.verifiedJaccardPairs(docs, "doc_id", "text", 3, 12, 6)
    df.collect() // let AQE finalize before reading the plan
    val plan = df.queryExecution.executedPlan.toString
    // sanity: the tree actually contains joins (guards against this test
    // going vacuous again if the builder ever checkpoints internally)
    assert(plan.contains("Join"), s"expected joins in plan:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian product in plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested-loop join in plan:\n$plan")
  }

  test("editDistancePairs verifies LSH candidates by character edits") {
    val pairs = NearDup.editDistancePairs(docs, "doc_id", "text", maxDist = 10)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r.getAs[Long]("edit_distance"))
      .toMap
    // 1 vs 3: normalization-identical → distance 0
    assert(pairs((1L, 3L)) == 0L)
    // 1 vs 2: "dog" → "cat" = 3 substitutions on normalized text
    assert(pairs((1L, 2L)) == 3L)
    // unrelated docs never become candidates, let alone verified pairs
    assert(!pairs.keySet.exists { case (a, b) => Set(a, b).intersect(Set(4L, 5L)).nonEmpty })
    // a tight threshold drops the 3-edit pair but keeps the 0-edit one
    val tight = NearDup.editDistancePairs(docs, "doc_id", "text", maxDist = 2)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(tight == Set((1L, 3L)))
  }

  test("simhash: identical token sets agree; near-dups land within 3/16 bits") {
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val sh = NearDup.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(sh(1L) == sh(3L))
    assert(hamming(sh(1L), sh(2L)) <= 3)
    assert(sh.values.forall(v => v >= 0 && v < (1L << 16)))
  }

  test("winnowing: shared >= w+k-1 token run guarantees a shared fingerprint") {
    val a = (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa")
    // doc 2 embeds doc 1's 10-token run inside different surroundings
    val b = (2L, "prefix words here alpha beta gamma delta epsilon zeta eta theta iota kappa suffix tail")
    val c = (3L, "entirely different vocabulary with no overlap at all whatsoever present")
    val fp = NearDup.winnowFingerprints(Seq(a, b, c).toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(fp(1L).intersect(fp(2L)).nonEmpty) // shared run (10 >= 4+3-1=6)
    assert(fp(1L).intersect(fp(3L)).isEmpty)
    // too-short docs emit nothing rather than erroring
    val short = NearDup.winnowFingerprints(
      Seq((9L, "one two three")).toDF("doc_id", "text"), "doc_id", "text")
    assert(short.count() == 0)
  }

  test("winnowPairs: a lifted run pairs its docs; boilerplate over maxDf is cut") {
    val lifted = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val wdocs = Seq(
      (1L, lifted),
      (2L, s"prefix words here $lifted suffix tail material beyond"),
      (3L, "entirely different vocabulary with no overlap at all whatsoever present today")
    ).toDF("doc_id", "text")
    val pairs = NearDup.winnowPairs(wdocs, "doc_id", "text", minShared = 1L)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        (r.getAs[Long]("shared"), r.getAs[Double]("overlap"))).toMap
    assert(pairs.contains((1L, 2L))) // the local-copy match
    assert(!pairs.keySet.exists { case (a, b) => a == 3L || b == 3L })
    // doc 1 is entirely inside doc 2, so the short side's containment is high
    assert(pairs((1L, 2L))._2 > 0.5)

    // a line every doc shares is boilerplate: with maxDf below the doc
    // count its fingerprints pair nothing
    val boiler = "this footer appears in every single document of the corpus always"
    val bdocs = Seq(4L, 5L, 6L).map(i => (i, boiler)).toDF("doc_id", "text")
    assert(NearDup.winnowPairs(bdocs, "doc_id", "text",
      maxDf = 2, minShared = 1L).count() == 0)
    // raising maxDf to the doc count lets the identical docs pair fully
    val full = NearDup.winnowPairs(bdocs, "doc_id", "text",
      maxDf = 3, minShared = 1L).collect()
    assert(full.length == 3 && full.forall(_.getAs[Double]("overlap") == 1.0))
  }

  test("connectedComponents labels each component by its minimum id") {
    // chain 1-2-3-4 (diameter 3), pair 7-8, self-loop 9-9
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (7L, 8L), (9L, 9L))
      .toDF("src", "dst")
    val cc = NearDup.connectedComponents(edges, "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 7L -> 7L, 8L -> 7L, 9L -> 9L))
  }

  test("connectedComponents throws when maxIter is below the diameter") {
    val chain = (1L to 6L).sliding(2).map(s => (s.head, s.last)).toSeq.toDF("src", "dst")
    intercept[IllegalStateException](
      NearDup.connectedComponents(chain, "src", "dst", maxIter = 2).collect())
    // and converges with enough rounds
    val cc = NearDup.connectedComponents(chain, "src", "dst", maxIter = 10)
    assert(cc.collect().map(_.getLong(1)).forall(_ == 1L))
  }

  test("dupClusters groups transitive near-dups under the min doc id") {
    val clusters = NearDup.dupClusters(docs, "doc_id", "text", minJaccard = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // docs 1, 2, 3 are mutual near-dups; 4 and 5 have no qualifying pair
    assert(clusters == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("keepBestByScore keeps the highest-scoring cluster member, singletons keep") {
    import org.apache.spark.sql.functions.{col, length}
    // score = text length: doc 3 (punctuated variant) is the longest of
    // the {1,2,3} near-dup cluster, so it survives instead of min-id 1
    val out = NearDup.keepBestByScore(docs, "doc_id", "text",
        length(col("text")).cast("double"), minJaccard = 0.5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L))
    // cluster of {1,2,3} labeled by min id 1; 4 and 5 are singletons
    assert(Seq(1L, 2L, 3L).map(out(_)._1).forall(_ == 1L))
    assert(out(4L)._1 == 4L && out(5L)._1 == 5L)
    assert(out.filter(_._2._3).keySet == Set(3L, 4L, 5L))
    // tie-break: equal scores keep the LOWEST id
    val ties = NearDup.keepBestByScore(docs, "doc_id", "text",
        org.apache.spark.sql.functions.lit(1.0), minJaccard = 0.5)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(ties.filter(_._2).keySet == Set(1L, 4L, 5L))
  }

  test("simhashPairs: banded buckets find close fingerprints, verify Hamming") {
    val pairs = NearDup.simhashPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("hamming")).toMap
    assert(pairs((1L, 3L)) == 0L) // identical token sets
    assert(pairs.get((1L, 2L)).exists(_ <= 3L)) // near-dup within 3 bits
    assert(!pairs.keySet.exists { case (a, b) => Set(a, b).intersect(Set(4L, 5L)).nonEmpty })
    // band layout is candidate generation only: a non-dividing band
    // count (unequal widths) must produce the IDENTICAL lossless pair set
    val unequal = NearDup.simhashPairs(docs, "doc_id", "text", bands = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("hamming")).toMap
    assert(unequal == pairs)
    intercept[IllegalArgumentException](
      NearDup.simhashPairs(docs, "doc_id", "text", bits = 16, bands = 17))
    intercept[IllegalArgumentException](
      NearDup.simhashPairs(docs, "doc_id", "text", maxHamming = 4))
  }

  test("simhashPairsCombo: identical pair set to contiguous banding, validated params") {
    // banding generates candidates only — the exact Hamming filter
    // decides membership, so the Manku combination layout must produce
    // the IDENTICAL pair set as the minimal contiguous layout
    val contiguous = NearDup.simhashPairs(docs, "doc_id", "text",
        bits = 64, bands = 6, maxHamming = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("hamming")).toMap
    val combo = NearDup.simhashPairsCombo(docs, "doc_id", "text",
        bits = 64, blocks = 8, maxHamming = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("hamming")).toMap
    assert(combo == contiguous)
    // uneven block widths (64 bits / 7 blocks) stay lossless too
    val uneven = NearDup.simhashPairsCombo(docs, "doc_id", "text",
        bits = 64, blocks = 7, maxHamming = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("hamming")).toMap
    assert(uneven == contiguous)
    intercept[IllegalArgumentException]( // maxHamming must be < blocks
      NearDup.simhashPairsCombo(docs, "doc_id", "text", blocks = 5, maxHamming = 5))
    intercept[IllegalArgumentException]( // combination explosion guard
      NearDup.simhashPairsCombo(docs, "doc_id", "text", bits = 64, blocks = 24,
        maxHamming = 12))
  }

  test("simhash rejects out-of-range bit widths") {
    intercept[IllegalArgumentException](NearDup.simhash(docs, "doc_id", "text", bits = 0))
    intercept[IllegalArgumentException](NearDup.simhash(docs, "doc_id", "text", bits = 65))
  }

  test("simhash 64-bit low word is exactly the 32-bit fingerprint") {
    // bits < 32 draw the same md5(token) votes in both widths, so the
    // 64-bit fingerprint's low 32 bits must reproduce the 32-bit value —
    // widening never perturbs existing bits (the scale knob is additive)
    val s32 = NearDup.simhash(docs, "doc_id", "text", bits = 32)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("simhash")).toMap
    val s64 = NearDup.simhash(docs, "doc_id", "text", bits = 64)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("simhash")).toMap
    assert(s64.keySet == s32.keySet)
    assert(s64.forall { case (id, v) => (v & 0xFFFFFFFFL) == s32(id) })
  }

  test("noveltyScores: copies score 0, novel docs 1, short docs report zeros") {
    val docs = Seq(
      (0L, "alpha beta gamma delta"),   // shares everything with 1
      (1L, "alpha beta gamma delta"),
      (2L, "one two three four five"),  // all shingles unique
      (3L, "alpha beta gamma epsilon"), // mixes shared + unique
      (4L, "hi")                        // too short for a 3-gram
    ).toDF("doc_id", "text")
    val got = NearDup.noveltyScores(docs, "doc_id", "text", n = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_shingles"), r.getAs[Long]("n_unique"), r.getAs[Double]("novelty")))
      .toMap
    assert(got.keySet == Set(0L, 1L, 2L, 3L, 4L))
    assert(got(0L) == ((2L, 0L, 0.0)) && got(1L) == ((2L, 0L, 0.0)))
    assert(got(2L) == ((3L, 3L, 1.0)))
    // doc 3: "alpha beta gamma" shared with 0/1; "beta gamma epsilon"
    // unique → novelty 1/2
    assert(got(3L) == ((2L, 1L, 0.5)))
    assert(got(4L) == ((0L, 0L, 0.0)))
    // partition independence
    val re = NearDup.noveltyScores(docs.repartition(7), "doc_id", "text", n = 3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("novelty")).toMap
    assert(re == got.view.mapValues(_._3).toMap)
  }

  test("jaccardJoinExact is COMPLETE and exact vs a brute-force all-pairs join") {
    // a corpus engineered with graded similarity: mutated replicas at
    // several distances plus unrelated noise — enough diversity that a
    // buggy prefix bound or size filter would actually drop a pair
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron")
    val rng = new scala.util.Random(42)
    val base = (0 until 30).map { i =>
      (i.toLong, Seq.fill(12)(words(rng.nextInt(words.length))).mkString(" "))
    }
    val mutated = (0 until 30).map { i =>
      val toks = base(i)._2.split(" ")
      val k = rng.nextInt(6) // 0..5 token substitutions
      val mut = toks.zipWithIndex.map { case (t, j) =>
        if (j < k) words(rng.nextInt(words.length)) else t
      }
      (100L + i, mut.mkString(" "))
    }
    val corpus = (base ++ mutated).toDF("doc_id", "text")
    val got = NearDup.jaccardJoinExact(corpus, "doc_id", "text",
        shingleN = 3, tauNum = 1L, tauDen = 2L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // brute force: distinct 3-shingle sets, all pairs, exact threshold
    def shingles(t: String): Set[String] = {
      val toks = t.toLowerCase.replaceAll("[^a-z0-9 ]", "")
        .replaceAll(" +", " ").trim.split(" ").filter(_.nonEmpty)
      if (toks.length < 3) Set.empty
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val sets = (base ++ mutated).map { case (id, t) => id -> shingles(t) }
    val want = (for {
      (ia, sa) <- sets; (ib, sb) <- sets
      if ia < ib && sa.nonEmpty && sb.nonEmpty
      inter = (sa & sb).size.toLong
      uni = (sa | sb).size.toLong
      if inter * 2 >= uni // jaccard >= 1/2 exactly
    } yield (ia, ib) -> (inter, uni)).toMap
    assert(got == want, s"got ${got.size} pairs, want ${want.size}")
    assert(want.nonEmpty, "test corpus produced no qualifying pairs — not a real check")
    // partition-invariance
    val re = NearDup.jaccardJoinExact(corpus.repartition(13), "doc_id", "text",
        shingleN = 3, tauNum = 1L, tauDen = 2L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(re == want)

    // PRODUCTION SIZING (the doc_jaccard_join_scaled configuration):
    // τ = 4/5 with the minShingles = 8 min-length cut — completeness
    // holds at any rational τ by the same pigeonhole argument, and the
    // cut must drop BOTH a short doc's candidacy and its verify rows
    val gotScaled = NearDup.jaccardJoinExact(corpus, "doc_id", "text",
        shingleN = 3, tauNum = 4L, tauDen = 5L, minShingles = 8L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val wantScaled = (for {
      (ia, sa) <- sets; (ib, sb) <- sets
      if ia < ib && sa.size >= 8 && sb.size >= 8
      inter = (sa & sb).size.toLong
      uni = (sa | sb).size.toLong
      if inter * 5 >= uni * 4 // jaccard >= 4/5 exactly
    } yield (ia, ib) -> (inter, uni)).toMap
    assert(gotScaled == wantScaled,
      s"got ${gotScaled.size} pairs at tau=4/5, want ${wantScaled.size}")
    assert(wantScaled.nonEmpty,
      "scaled test corpus produced no qualifying pairs — not a real check")
    assert(wantScaled.size < want.size,
      "tau=4/5 must be strictly more selective than the tau=1/2 anchor here")
  }
}
