package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the native graft
  * expressions so `SELECT token_sort_ratio(a, b)` resolves to the
  * codegen'd Expression (not a UDF). Enable with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("token_sort_ratio"),
      new ExpressionInfo(classOf[TokenSortRatio].getName, "token_sort_ratio"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "token_sort_ratio expects exactly 2 arguments")
        TokenSortRatio(children.head, children(1))
      }))
  }
}
