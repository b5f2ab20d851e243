package graft.expressions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items summary as a TypedImperativeAggregate:
  * tracks at most `capacity` candidate items per group with counters;
  * when a new item arrives at a full summary, ALL counters decrement by
  * one (shedding one occurrence of `capacity` distinct items at once).
  *
  * Guarantees (the classic MG bounds, preserved under Spark's
  * partial→merge aggregation because MG summaries merge by counter
  * addition + re-decrement):
  *  - reported_count ∈ [true_count − n/(capacity+1), true_count];
  *  - every item with true_count > n/(capacity+1) IS in the summary;
  *  - if a group holds ≤ capacity distinct items, counts are EXACT.
  *
  * This is the "which keys are hot?" primitive at 100 TB: the summary is
  * O(capacity) per group regardless of input size, map-side partials
  * ship ≤ capacity counters per partition — and its output is what
  * chooses salt factors for [[graft.operators.Salt]] or flags skewed
  * join keys, at the cost of one scan and no second shuffle.
  *
  * Output: ARRAY<STRUCT<item: STRING, est_count: LONG>> ordered by
  * est_count DESC, item ASC — a deterministic total order for any input
  * order (counter maps are order-insensitive: same multiset of inputs →
  * same counters).
  */
case class FreqItems(
    itemExpr: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with ImplicitCastInputTypes {

  require(capacity > 0, s"capacity must be positive, got $capacity")

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  /** The MG step: add, or decrement-all when full. Decrementing removes
    * exhausted counters, freeing a slot for a later item. */
  private def offer(buf: mutable.HashMap[String, Long], item: String, n: Long): Unit = {
    val cur = buf.getOrElse(item, 0L)
    if (cur > 0L || buf.size < capacity) buf.update(item, cur + n)
    else {
      // decrement all counters by min(n, smallest counter) repeatedly is
      // the multi-weight generalization; for weight n, shed d = min over
      // the would-be (capacity+1) counters including the new item at n.
      val d = math.min(n, buf.values.min)
      val dead = buf.iterator.collect { case (k, v) if v <= d => k }.toList
      buf.mapValuesInPlace((_, v) => v - d)
      dead.foreach(buf.remove)
      if (n > d) buf.update(item, n - d)
    }
  }

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = itemExpr.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
      other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (item, n) => offer(buf, item, n) }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val best = buf.toArray.sortWith { (a, b) =>
      a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)
    }
    new GenericArrayData(best.map { case (item, n) =>
      InternalRow(UTF8String.fromString(item), n)
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val items = buf.toArray
    val bytes = items.map { case (k, _) => k.getBytes(StandardCharsets.UTF_8) }
    val bb = ByteBuffer.allocate(4 + bytes.map(_.length + 12).sum)
    bb.putInt(items.length)
    items.indices.foreach { j =>
      bb.putInt(bytes(j).length)
      bb.put(bytes(j))
      bb.putLong(items(j)._2)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf.update(new String(arr, StandardCharsets.UTF_8), bb.getLong)
      j += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType), StructField("est_count", LongType))))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(itemExpr)
  override def prettyName: String = "graft_freq_items"

  override def withNewMutableAggBufferOffset(offset: Int): FreqItems =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): FreqItems =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqItems =
    copy(itemExpr = newChildren(0))
}

object FreqItems {
  /** Column-API entry point: Misra-Gries top items of a string column. */
  def apply(item: Column, capacity: Int): Column =
    ColumnBridge.column(
      FreqItems(ColumnBridge.expression(item), capacity).toAggregateExpression())

  private[expressions] val ident =
    new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_freq_items")
  private[expressions] def info =
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[FreqItems].getName, "graft_freq_items")
  // The analyzer wraps a bare AggregateFunction from a registry builder
  // into its AggregateExpression — return the function itself.
  private[expressions] val builder
      : org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder = { exprs =>
    require(exprs.length == 2, "graft_freq_items(item, capacity) takes 2 arguments")
    require(exprs(1).foldable, "capacity must be a literal")
    FreqItems(exprs.head, exprs(1).eval().asInstanceOf[Number].intValue)
  }

  /** Make `graft_freq_items` callable from SQL text in a live session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    ColumnBridge.registerFunction(spark, ident, info, builder)
}
