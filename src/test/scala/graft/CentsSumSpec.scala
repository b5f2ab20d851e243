package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.expressions.CentsSum

class CentsSumSpec extends SparkSpec {
  import sqlImplicits._

  test("typed aggregation matches the DECIMAL(18,2) dsum contract exactly") {
    val rnd = new scala.util.Random(3)
    val values = Seq.fill(5000)(math.round(rnd.nextDouble() * 100000) / 100.0)
    val ds = values.toDS().repartition(11) // partial/merge across partitions
    val typed = ds.select(CentsSum.toColumn).collect().head
    val decimal = values.toDF("v")
      .agg(sum(col("v").cast(DecimalType(18, 2))).cast("double"))
      .collect().head.getDouble(0)
    assert(typed == decimal)
  }

  test("per-group typed aggregation is exact and order-independent") {
    val rows = Seq((1L, 0.1), (1L, 0.2), (2L, 1.11), (2L, 2.22), (2L, 3.33))
    val a = rows.toDS().groupByKey(_._1).mapValues(_._2).agg(CentsSum.toColumn)
      .collect().toMap
    val b = rows.reverse.toDS().repartition(5)
      .groupByKey(_._1).mapValues(_._2).agg(CentsSum.toColumn)
      .collect().toMap
    assert(a == Map(1L -> 0.3, 2L -> 6.66))
    assert(a == b)
  }

  test("udaf registration exposes it to DataFrames and SQL") {
    val f = udaf(CentsSum)
    val got = Seq(0.1, 0.2, 0.3).toDF("v").agg(f(col("v"))).collect().head.getDouble(0)
    assert(got == 0.6) // double sum would give 0.6000000000000001
  }
}
