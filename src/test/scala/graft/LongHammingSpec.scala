package graft

import org.apache.spark.sql.functions._

import graft.expressions.LongHamming

class LongHammingSpec extends SparkSpec {
  import sqlImplicits._

  private def hofHam(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y)).cast("long")),
      lit(0L), (acc, x) => acc + x)

  test("matches the HOF formulation on randomized code words") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)(
      (Array.fill(4)(rnd.nextLong()), Array.fill(4)(rnd.nextLong())))
    val df = rows.toDF("a", "b")
    val got = df.select(
      LongHamming(col("a"), col("b")).as("fast"),
      hofHam(col("a"), col("b")).as("ref")).collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("identical codes distance 0; NULL input NULL; empty arrays 0") {
    val df = Seq(
      (Some(Array(5L, -9L)), Some(Array(5L, -9L))),
      (Some(Array(1L, 2L)), None: Option[Array[Long]]),
      (Some(Array.empty[Long]), Some(Array.empty[Long]))
    ).toDF("a", "b")
    val rows = df.select(LongHamming(col("a"), col("b"))).collect()
    assert(rows(0).getLong(0) == 0L)
    assert(rows(1).isNullAt(0))
    assert(rows(2).getLong(0) == 0L)
  }

  test("participates in whole-stage codegen") {
    val df = spark.range(100)
      .select(
        transform(sequence(lit(0L), lit(3L)), i => i + col("id")).as("a"),
        transform(sequence(lit(0L), lit(3L)), i => i * lit(3L)).as("b"))
      .select(LongHamming(col("a"), col("b")).as("d"), col("a"), col("b"))
    val rows = df.collect()
    rows.foreach { r =>
      val a = r.getAs[scala.collection.Seq[Long]]("a")
      val b = r.getAs[scala.collection.Seq[Long]]("b")
      assert(r.getAs[Long]("d") ==
        a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y).toLong }.sum)
    }
    val planStr = df.queryExecution.executedPlan.toString
    val line = planStr.linesIterator.find(_.contains("graft_hamming")).get
    assert(line.trim.startsWith("*("))
  }

  test("rejects non-ARRAY<BIGINT> inputs; SQL registration works") {
    val df = Seq((Array("x"), Array(1L))).toDF("a", "b")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(LongHamming(col("a"), col("b"))).collect()
    }
    LongHamming.register(spark)
    val r = spark.sql("SELECT graft_hamming(array(0L, -1L), array(0L, 0L)) AS d")
      .collect().head.getLong(0)
    assert(r == 64L)
  }
}
