package graft.plans

import graft.functions.Fuzzy
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** F3 as a native Catalyst expression (SURVEY.md §4 "custom Catalyst
  * work"): token-sort fuzzy ratio with whole-stage-codegen support.
  *
  * Versus the equivalent Scala UDF: no `ScalaUDF` conversion wrappers
  * (UTF8String→String→UTF8String per row is kept, but the call is a
  * direct static invoke inlined into the generated code), Catalyst
  * sees proper null semantics (`nullIntolerant` — null in → null out,
  * so filters on the result can prune early), and constant arguments
  * fold at plan time.
  */
case class TokenSortRatio(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"token_sort_ratio expects (string, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "token_sort_ratio"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    TokenSortRatio.compute(
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.plans.TokenSortRatio.compute($l, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TokenSortRatio =
    copy(left = newLeft, right = newRight)
}

object TokenSortRatio {
  /** Static kernel the generated code calls directly. */
  def compute(l: UTF8String, r: UTF8String): Int =
    Fuzzy.tokenSortRatio(l.toString, r.toString)
}
