package graft.expressions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.{Column, SparkSession}

/** Summed Hamming distance of two ARRAY<BIGINT> code-word columns —
  * Σ bit_count(a_i ^ b_i) — as a native Catalyst expression with
  * whole-stage codegen: the scoring kernel of the binary-quantized ANN
  * scan ([[graft.operators.Ann.knnBq]]).
  *
  * The composable alternative — aggregate(zip_with(a, b, bit_count∘xor),
  * 0, _+_) — is semantically identical but runs through the higher-
  * order-function interpreter, allocating the zipped array and boxing
  * every lambda step PER CANDIDATE PAIR; this is the innermost loop of
  * the compressed scan (probes × collection pairs), exactly where the
  * interpreter tax compounds. Generated code is Long.bitCount over a
  * primitive loop (HotSpot emits POPCNT).
  *
  * Preconditions mirror [[LongDotProduct]]: equal-length arrays with no
  * null elements (packed code words by construction); on length mismatch
  * the common prefix is used; NULL array input → NULL result.
  */
case class LongHamming(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hamming"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += java.lang.Long.bitCount(x.getLong(i) ^ y.getLong(i)); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh locals: see LongDotProduct — unbraced inlining would
      // redeclare fixed names when two instances share a function
      val n = ctx.freshName("hamN")
      val s = ctx.freshName("hamS")
      val i = ctx.freshName("hamI")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongHamming =
    copy(left = newLeft, right = newRight)
}

object LongHamming {
  private[graft] val ident = new FunctionIdentifier("graft_hamming")
  private[graft] def info = new ExpressionInfo(classOf[LongHamming].getName, "graft_hamming")
  private[graft] val builder: FunctionBuilder = { exprs =>
    require(exprs.length == 2, s"graft_hamming expects 2 arguments, got ${exprs.length}")
    LongHamming(exprs.head, exprs(1))
  }

  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      LongHamming(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Make `graft_hamming` callable from SQL text in an existing session. */
  def register(spark: SparkSession): Unit =
    ColumnBridge.registerFunction(spark, ident, info, builder)
}
