package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import sqlImplicits._

  private val rows = (1L to 1000L).map(i => (i, s"payload-$i")).toDF("id", "v")

  test("hashSample is deterministic, partition-independent, and ~threshold/256") {
    val a = Sampling.hashSample(rows, "id", threshold = 32)
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(rows.repartition(13), "id", threshold = 32)
      .collect().map(_.getLong(0)).toSet
    assert(a == b, "sample membership must not depend on partitioning")
    // 32/256 = 12.5% nominal; binomial(1000, .125) stays well inside [80, 170]
    assert(a.size > 80 && a.size < 170, s"sample size ${a.size} implausible for 12.5%")
    // bounds behave: 0 keeps nothing, 256 keeps everything
    assert(Sampling.hashSample(rows, "id", 0).count() == 0)
    assert(Sampling.hashSample(rows, "id", 256).count() == 1000)
    intercept[IllegalArgumentException](Sampling.hashSample(rows, "id", 257))
  }

  private val strat = (1L to 900L)
    .map(i => (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "zh" else "fr"))
    .toDF("id", "lang")

  test("stratifiedSample: per-stratum thresholds, nesting, keep-all edge") {
    val out = Sampling.stratifiedSample(strat, "id", "lang",
      thresholds = Map("en" -> 64, "zh" -> 256), defaultThreshold = 128)
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // zh hits the 256 keep-all edge: every zh row survives
    assert(byLang("zh") == 300)
    // en at 64/256 (~25% of 300) and fr at the 128/256 default (~50%)
    assert(byLang("en") > 40 && byLang("en") < 110, s"en=${byLang("en")}")
    assert(byLang("fr") > 110 && byLang("fr") < 190, s"fr=${byLang("fr")}")
    // membership is partition-independent
    val again = Sampling.stratifiedSample(strat.repartition(11), "id", "lang",
      Map("en" -> 64, "zh" -> 256), 128).collect().map(_.getLong(0)).toSet
    assert(again == out.collect().map(_.getLong(0)).toSet)
    // thresholds NEST: raising en's rate only ADDS rows
    val enLow = Sampling.stratifiedSample(strat, "id", "lang", Map("en" -> 64), 0)
      .collect().map(_.getLong(0)).toSet
    val enHigh = Sampling.stratifiedSample(strat, "id", "lang", Map("en" -> 128), 0)
      .collect().map(_.getLong(0)).toSet
    assert(enLow.subsetOf(enHigh))
    // a stratum sample agrees with the flat hashSample at the same rate
    val flat = Sampling.hashSample(strat.filter(col("lang") === "en"), "id", 64)
      .collect().map(_.getLong(0)).toSet
    assert(enLow == flat)
    intercept[IllegalArgumentException](
      Sampling.stratifiedSample(strat, "id", "lang", Map("en" -> 300), 0))
  }

  test("mixtureSample: sqrt-flattened rates, head at largestKeep, partition-independent") {
    // 600 en / 150 zh / 150 fr: en is the head domain (rate = largestKeep),
    // zh and fr keep sqrt(600/150) = 2x en's rate
    val mix = (1L to 900L)
      .map(i => (i, if (i % 2 == 0) "en" else if (i % 4 == 1) "zh" else "fr"))
      .toDF("id", "lang")
    val out = Sampling.mixtureSample(mix, "id", "lang", largestKeep = 0.4)
    val rates = out.select("lang", "n_domain", "keep_rate").distinct()
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rates("en") == (450L, 0.4))
    assert(rates("zh")._1 == 225L && rates("fr")._1 == 225L)
    assert(math.abs(rates("zh")._2 - 0.4 * math.sqrt(2.0)) < 1e-15)
    // realized keeps are binomial around n_d * rate
    val kept = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("en") > 120 && kept("en") < 240, s"en=${kept("en")}")
    assert(kept("zh") > 80 && kept("zh") < 175, s"zh=${kept("zh")}")
    // membership is partition-independent and rerun-deterministic
    val again = Sampling.mixtureSample(mix.repartition(7), "id", "lang", 0.4)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == out.select("id").collect().map(_.getLong(0)).toSet)
    // a single domain caps at rate=largestKeep; rate 1.0 keeps everything
    val one = Sampling.mixtureSample(mix.filter(col("lang") === "en"), "id", "lang", 1.0)
    assert(one.count() == 450)
    intercept[IllegalArgumentException](Sampling.mixtureSample(mix, "id", "lang", 0.0))
  }

  test("splitCorpus: exhaustive disjoint splits, stable, nested with hashSample") {
    val docs = spark.range(0, 2000).toDF("id")
    val split = Sampling.splitCorpus(docs, "id",
      Seq("train" -> 240, "val" -> 8, "test" -> 8))
    val byLabel = split.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // exhaustive: every row labeled, exactly one label per row
    assert(byLabel.values.sum == 2000L)
    assert(byLabel.keySet == Set("train", "val", "test"))
    // roughly proportional (train ~93.75%)
    assert(byLabel("train") > 1700L && byLabel("val") < 150L && byLabel("test") < 150L)
    // stable across repartitioning
    val again = Sampling.splitCorpus(docs.repartition(13), "id",
        Seq("train" -> 240, "val" -> 8, "test" -> 8))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val first = split.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again == first)
    // bucket-order nesting: the train split contains hashSample(threshold<=240)
    val sampled = Sampling.hashSample(docs, "id", 64).collect().map(_.getLong(0)).toSet
    assert(sampled.forall(id => first(id) == "train"))
    intercept[IllegalArgumentException](
      Sampling.splitCorpus(docs, "id", Seq("a" -> 100, "b" -> 100)))
    intercept[IllegalArgumentException](
      Sampling.splitCorpus(docs, "id", Seq("a" -> 256, "a" -> 0)))
  }

  test("shuffleBatches: contiguous index, md5 order, full batches, stable") {
    val out = Sampling.shuffleBatches(rows, "id", batchSize = 64)
      .orderBy("shuffle_idx").collect()
    assert(out.length == 1000)
    assert(out.map(_.getAs[Long]("shuffle_idx")).toSeq == (0L until 1000L))
    // order is exactly ascending md5(id)
    val keys = out.map(_.getAs[String]("shuffle_key")).toSeq
    assert(keys == keys.sorted)
    // batch = idx / 64; all but the last batch are full
    val sizes = out.groupBy(_.getAs[Long]("batch")).view.mapValues(_.length).toMap
    assert(sizes.size == 16 && sizes(15L) == 1000 - 15 * 64)
    assert((0L to 14L).forall(sizes(_) == 64))
    // re-running over a different partitioning yields the identical permutation
    val again = Sampling.shuffleBatches(rows.repartition(7), "id", batchSize = 64)
      .orderBy("shuffle_idx").collect().map(_.getLong(0)).toSeq
    assert(again == out.map(_.getLong(0)).toSeq)
  }

  private val docs = (1L to 500L).map(i => (i, 1L + (i * 7) % 120))
    .toDF("id", "tok")

  test("packSequences: exact distributed prefix sum and bin assignment") {
    val out = Sampling.packSequences(docs, "id", "tok", budget = 512)
      .orderBy("token_start").collect()
    assert(out.length == 500)
    // reference computation: single-threaded prefix sum in md5(id) order
    val local = docs.collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, _) =>
        java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString }
    var cum = 0L
    val expected = local.map { case (id, t) =>
      val start = cum; cum += t; (id, start, start / 512)
    }
    val got = out.map(r => (r.getAs[Long]("id"),
      r.getAs[Long]("token_start"), r.getAs[Long]("seq_id"))).toSeq
    assert(got == expected.toSeq)
    // seq_id is exactly token_start div budget and non-decreasing
    assert(out.forall(r => r.getAs[Long]("seq_id") == r.getAs[Long]("token_start") / 512))
  }

  test("packSequences is partition-independent and validates input") {
    val a = Sampling.packSequences(docs, "id", "tok", 512)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("seq_id"))).toSet
    val b = Sampling.packSequences(docs.repartition(13), "id", "tok", 512)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("seq_id"))).toSet
    assert(a == b)
    intercept[IllegalArgumentException](
      Sampling.packSequences(docs, "id", "tok", 0))
    val neg = Seq((1L, -5L)).toDF("id", "tok")
    intercept[org.apache.spark.SparkException](
      Sampling.packSequences(neg, "id", "tok", 512).collect())
    // empty input packs to an empty result, not an error
    assert(Sampling.packSequences(docs.filter(lit(false)), "id", "tok", 512)
      .count() == 0)
  }

  test("weightedSample: keep probability is the row's weight — edges, monotone, stable") {
    val rows = (0L until 400L).map(i => (i, i.toDouble / 400.0)).toDF("id", "w")
    // weight 1 keeps everything, weight 0 nothing; out-of-range clamps
    assert(Sampling.weightedSample(rows, "id", lit(1.0)).count() == 400)
    assert(Sampling.weightedSample(rows, "id", lit(0.0)).count() == 0)
    assert(Sampling.weightedSample(rows, "id", lit(7.5)).count() == 400)
    assert(Sampling.weightedSample(rows, "id", lit(-3.0)).count() == 0)
    // monotone: raising every weight only ADDS members (same salted draw)
    def ids(w: org.apache.spark.sql.Column) =
      Sampling.weightedSample(rows, "id", w).collect().map(_.getLong(0)).toSet
    val low = ids(col("w") * 0.5)
    val high = ids(col("w"))
    assert(low.subsetOf(high) && high.size > low.size)
    // per-row weights actually bite: ~half kept with uniform 0..1 weights
    assert(high.size > 120 && high.size < 280, s"kept ${high.size} of 400")
    // stable across partitionings
    assert(ids(col("w")) ==
      Sampling.weightedSample(rows.repartition(17), "id", col("w"))
        .collect().map(_.getLong(0)).toSet)
  }
}
