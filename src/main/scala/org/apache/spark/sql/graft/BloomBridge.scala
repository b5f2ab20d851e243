package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.BinaryType

/** Bridge to Spark's Bloom-filter Catalyst expressions. They are fully
  * implemented in catalyst (they power AQE's injected runtime filters)
  * but deliberately absent from the public FunctionRegistry, so an
  * extension library has to surface them itself — same pattern as
  * [[ColumnBridge]].
  */
object BloomBridge {

  /** Aggregate a LONG column into a serialized Bloom filter (binary).
    * Returns SQL NULL on empty input. */
  def bloomAgg(child: Column, estimatedNumItems: Long, numBits: Long): Column =
    ColumnBridge.column(
      new BloomFilterAggregate(ColumnBridge.expression(child),
        Literal(estimatedNumItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe of a LONG value against a Bloom filter captured as
    * a plan literal — constant-foldable, as BloomFilterMightContain
    * requires (it rejects non-constant, non-subquery filter operands). */
  def mightContain(bloom: Array[Byte], value: Column): Column =
    ColumnBridge.column(
      BloomFilterMightContain(Literal(bloom, BinaryType), ColumnBridge.expression(value)))
}
