package graft.expressions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed exact money sum — the Dataset-API counterpart of the DataFrame
  * path's DECIMAL(18,2) `dsum` contract: 2-dp values accumulate in cent
  * space (Long), so the sum is exact and order-independent regardless of
  * partitioning, and a single final division produces the double.
  *
  * Use as a TypedColumn in typed aggregations
  * (`ds.groupByKey(...).agg(CentsSum.toColumn)`) or register for
  * DataFrames/SQL via `functions.udaf(CentsSum)`. Inputs are assumed
  * 2-dp-generated doubles (money); each is rounded to the nearest cent
  * on entry, matching the decimal cast's behavior.
  */
object CentsSum extends Aggregator[Double, Long, Double] {
  override def zero: Long = 0L
  override def reduce(cents: Long, value: Double): Long =
    cents + math.round(value * 100)
  override def merge(a: Long, b: Long): Long = a + b
  override def finish(cents: Long): Double = cents / 100.0
  override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
