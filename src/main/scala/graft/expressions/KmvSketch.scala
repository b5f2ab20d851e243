package graft.expressions

import java.nio.ByteBuffer
import java.util.{TreeSet => JTreeSet}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-count sketch as a
  * TypedImperativeAggregate: keeps the k smallest DISTINCT hash values
  * per group — dedup happens INSIDE the buffer (a bounded sorted set),
  * so unlike a top-k heap no duplicate hash can occupy two slots and no
  * `distinct()` pre-shuffle is needed. That is the whole scale win over
  * the previous sketch shape: COUNT(DISTINCT)'s dedup exchange ships
  * every distinct value; this partial aggregate ships AT MOST k longs
  * per group per partition, full stop.
  *
  * The buffer set is an exact, associative, commutative bounded-union
  * monoid (union → keep k smallest), so partial/merge/final reach the
  * same set for any partitioning — bit-reproducible, like every
  * aggregate in this engine. Output: ARRAY<BIGINT> of the ≤k distinct
  * mins ascending; callers derive `n_kept = size` and the k-th min for
  * the (k-1)·2^48/kth estimate (see graft.operators.Sketch).
  */
case class KmvSketch(
    hashExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[JTreeSet[java.lang.Long]]
  with ImplicitCastInputTypes {

  require(k > 0, s"k must be positive, got $k")

  // Covariant override — AbstractDataType is private[sql] (see TopKByScore).
  override def inputTypes: Seq[DataType] = Seq(LongType)

  override def createAggregationBuffer(): JTreeSet[java.lang.Long] =
    new JTreeSet[java.lang.Long]()

  private def insert(buf: JTreeSet[java.lang.Long], h: Long): Unit = {
    // skip values already above the current k-th min: O(log k) peek
    // keeps the hot path allocation-free once the buffer is full
    if (buf.size < k) { buf.add(h); () }
    else if (h < buf.last()) {
      if (buf.add(h)) { buf.remove(buf.last()); () }
    }
  }

  override def update(buf: JTreeSet[java.lang.Long], input: InternalRow): JTreeSet[java.lang.Long] = {
    val h = hashExpr.eval(input)
    if (h != null) insert(buf, h.asInstanceOf[Long])
    buf
  }

  override def merge(buf: JTreeSet[java.lang.Long],
      other: JTreeSet[java.lang.Long]): JTreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: JTreeSet[java.lang.Long]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next().longValue(); j += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: JTreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): JTreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) { buf.add(bb.getLong); j += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(hashExpr)
  override def prettyName: String = "graft_kmv"

  override def withNewMutableAggBufferOffset(offset: Int): KmvSketch =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvSketch =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(hashExpr = newChildren(0))
}

object KmvSketch {
  /** Column-API entry point: the group's ≤k smallest distinct hashes,
    * ascending. */
  def apply(hash: Column, k: Int): Column =
    ColumnBridge.column(
      KmvSketch(ColumnBridge.expression(hash), k).toAggregateExpression())

  private[expressions] val ident =
    new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_kmv")
  private[expressions] def info =
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[KmvSketch].getName, "graft_kmv")
  private[expressions] val builder
      : org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder = { exprs =>
    require(exprs.length == 2, "graft_kmv(hash, k) takes 2 arguments")
    require(exprs(1).foldable, "k must be a literal")
    KmvSketch(exprs.head, exprs(1).eval().asInstanceOf[Number].intValue)
  }

  /** Make `graft_kmv` callable from SQL text in a live session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    ColumnBridge.registerFunction(spark, ident, info, builder)
}
