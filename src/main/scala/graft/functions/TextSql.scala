package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import org.apache.spark.sql.graft.ColumnBridge

/** SQL-text registration of the [[Text]] analysis surface — the same
  * parity story the views and `graft_topk` already have: a SQL-first
  * user writes `SELECT graft_quality(text) FROM corpus` and gets the
  * exact Column-API expression tree (each builder converts argument
  * expressions to Columns, applies the [[Text]] function, and unwraps —
  * so the SQL path and the Scala path are the same tree by
  * construction, codegen'd built-ins and all; there is no UDF anywhere).
  */
object TextSql {

  private def fn1(name: String, f: Column => Column)
      : (FunctionIdentifier, ExpressionInfo, FunctionBuilder) = (
    new FunctionIdentifier(name),
    new ExpressionInfo(Text.getClass.getName, name),
    { exprs =>
      require(exprs.length == 1, s"$name expects 1 argument, got ${exprs.length}")
      // catalystExpression, not expression: the result lands in an
      // already-built SQL plan, so the DSL nodes must convert NOW
      ColumnBridge.catalystExpression(f(ColumnBridge.column(exprs.head)))
    })

  /** Every registered (identifier, info, builder) triple — shared by
    * [[register]] and graft.expressions.GraftExtensions. */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, FunctionBuilder)] = Seq(
    fn1("graft_normalize", Text.normalize),
    fn1("graft_tokens", Text.tokens),
    fn1("graft_token_count", Text.tokenCount(_).cast("long")),
    fn1("graft_quality", Text.qualityScore),
    fn1("graft_lang_id", Text.langId),
    fn1("graft_fingerprint", Text.fingerprint),
    fn1("graft_redact", Text.redact))

  /** Make the text surface callable from SQL text in an existing session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (ident, info, builder) =>
      ColumnBridge.registerFunction(spark, ident, info, builder)
    }
}
