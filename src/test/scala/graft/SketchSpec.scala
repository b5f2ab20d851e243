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
}
