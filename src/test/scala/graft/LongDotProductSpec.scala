package graft

import org.apache.spark.sql.functions._

import graft.expressions.LongDotProduct

class LongDotProductSpec extends SparkSpec {
  import sqlImplicits._

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  test("matches the HOF formulation on randomized arrays") {
    val rnd = new scala.util.Random(11)
    val rows = Seq.fill(200)(
      (Array.fill(64)(rnd.nextLong(4001) - 2000), Array.fill(64)(rnd.nextLong(4001) - 2000)))
    val df = rows.toDF("a", "b")
    val got = df.select(
      LongDotProduct(col("a"), col("b")).as("fast"),
      hofDot(col("a"), col("b")).as("ref")).collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("NULL array input yields NULL; empty arrays yield 0") {
    val df = Seq(
      (Some(Array(1L, 2L)), None: Option[Array[Long]]),
      (Some(Array.empty[Long]), Some(Array.empty[Long]))
    ).toDF("a", "b")
    val rows = df.select(LongDotProduct(col("a"), col("b"))).collect()
    assert(rows(0).isNullAt(0))
    assert(rows(1).getLong(0) == 0L)
  }

  test("participates in whole-stage codegen (no codegen-fallback subtree)") {
    // range → project is a codegen'd stage (a local one-row scan never is)
    val df = spark.range(100)
      .select(
        transform(sequence(lit(0L), lit(7L)), i => i + col("id")).as("a"),
        transform(sequence(lit(0L), lit(7L)), i => i * lit(2L)).as("b"))
      .select(LongDotProduct(col("a"), col("b")).as("d"), col("a"), col("b"))
    val rows = df.collect()
    assert(rows.length == 100)
    rows.foreach { r =>
      val a = r.getAs[scala.collection.Seq[Long]]("a")
      val b = r.getAs[scala.collection.Seq[Long]]("b")
      assert(r.getAs[Long]("d") == a.zip(b).map { case (x, y) => x * y }.sum)
    }
    // the "*(n)" prefix marks a WholeStageCodegen stage; the project
    // evaluating graft_dotq must carry it (the HOF transform project,
    // by contrast, renders without one — HOFs block codegen)
    val planStr = df.queryExecution.executedPlan.toString
    val dotLine = planStr.linesIterator.find(_.contains("graft_dotq")).get
    assert(dotLine.trim.startsWith("*("))
  }

  test("rejects non-ARRAY<BIGINT> inputs at analysis") {
    val df = Seq((Array(1.0, 2.0), Array(1L, 2L))).toDF("a", "b")
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(LongDotProduct(col("a"), col("b"))).collect()
    }
  }

  test("SQL registration: graft_dotq callable from spark.sql") {
    LongDotProduct.register(spark)
    val r = spark.sql("SELECT graft_dotq(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d")
      .collect().head.getLong(0)
    assert(r == 32L)
  }
}
