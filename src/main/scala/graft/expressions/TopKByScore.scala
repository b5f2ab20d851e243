package graft.expressions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded per-group top-k as a TypedImperativeAggregate: keeps the k
  * best (score DESC, id ASC on ties) pairs in a size-k heap.
  *
  * This is the aggregation-shaped alternative to the row_number window
  * for "top-k per group": a window must shuffle EVERY candidate row to
  * its group's partition before ranking, while this aggregate runs in
  * partial mode on the map side — each upstream partition contributes at
  * most k candidates per group to the shuffle. For ANN top-k joins
  * (groups = probes, candidates = bucket mates) at 100 TB the shuffle
  * shrinks from |candidates| to ≤ k·partitions per probe.
  *
  * Deterministic for any input order: the (score desc, id asc) order is
  * total, so partial/merge/final always select the same k. Output:
  * ARRAY<STRUCT<score: DOUBLE, id: BIGINT>> best-first.
  */
case class TopKByScore(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]]
  with ImplicitCastInputTypes {

  require(k > 0, s"k must be positive, got $k")

  // Analysis-time type enforcement: without this a wrong-typed score/id
  // passes analysis and ClassCastExceptions in executors at runtime.
  // Covariant override: the parent signature names AbstractDataType, which
  // is private[sql]; Seq is covariant so Seq[DataType] overrides it legally
  // without naming the unreachable type.
  override def inputTypes: Seq[DataType] = Seq(DoubleType, LongType)

  // dequeue order = WORST first: lower score first, higher id on ties.
  // Double.compare, not primitive <: it gives the NaN-greatest total
  // order Spark's sort uses (a raw `>` treats NaN as tied with
  // everything, diverging from the row_number-window baseline).
  private def worstFirst: Ordering[(Double, Long)] =
    Ordering.fromLessThan[(Double, Long)] { (a, b) =>
      val c = java.lang.Double.compare(a._1, b._1)
      c > 0 || (c == 0 && a._2 < b._2)
    }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](worstFirst)

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null) {
      buf.enqueue((s.asInstanceOf[Double], i.asInstanceOf[Long]))
      if (buf.size > k) buf.dequeue()
    }
    buf
  }

  override def merge(buf: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach { e => buf.enqueue(e); if (buf.size > k) buf.dequeue() }
    buf
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    // best-first with the same NaN-greatest total order as the heap
    // (sortBy on -score would send NaN last instead of first)
    val best = buf.toArray.sortWith { (a, b) =>
      val c = java.lang.Double.compare(a._1, b._1)
      c > 0 || (c == 0 && a._2 < b._2)
    }
    new GenericArrayData(best.map { case (s, i) => InternalRow(s, i) })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) { buf.enqueue((bb.getDouble, bb.getLong)); j += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType), StructField("id", LongType))))
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def prettyName: String = "graft_topk_by_score"

  override def withNewMutableAggBufferOffset(offset: Int): TopKByScore =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKByScore =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}

object TopKByScore {
  /** Column-API entry point: aggregate (score: double, id: long) pairs
    * into the group's top-k, best-first. */
  def apply(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKByScore(ColumnBridge.expression(score), ColumnBridge.expression(id), k)
        .toAggregateExpression())

  private[expressions] val ident =
    new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_topk")
  private[expressions] def info =
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[TopKByScore].getName, "graft_topk")
  private[expressions] val builder
      : org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder = { exprs =>
    require(exprs.length == 3, "graft_topk(score, id, k) takes 3 arguments")
    require(exprs(2).foldable, "k must be a literal")
    TopKByScore(exprs.head, exprs(1), exprs(2).eval().asInstanceOf[Number].intValue)
  }

  /** Make `graft_topk` callable from SQL text in a live session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    ColumnBridge.registerFunction(spark, ident, info, builder)
}
