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
    ext.injectFunction((
      FunctionIdentifier("md5_bucket"),
      new ExpressionInfo(classOf[Md5Bucket].getName, "md5_bucket"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          "md5_bucket expects (salt, token, buckets)")
        val buckets = children(2) match {
          case e if e.foldable &&
              e.dataType == org.apache.spark.sql.types.IntegerType =>
            e.eval() match {
              // a foldable CAST(NULL AS INT) evaluates to null — raise
              // the same analysis-time error, not an NPE on unboxing
              case null => throw new IllegalArgumentException(
                s"md5_bucket buckets must be an int literal, got $e (null)")
              case v => v.asInstanceOf[Int]
            }
          case other => throw new IllegalArgumentException(
            s"md5_bucket buckets must be an int literal, got $other")
        }
        Md5Bucket(children.head, children(1), buckets)
      }))
  }
}
