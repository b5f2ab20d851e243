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
}
