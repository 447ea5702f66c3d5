package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

/** Shared `$"col"` string-interpolator syntax for query modules, so query
  * code reads like idiomatic Spark without needing a SparkSession's
  * `implicits` in scope at definition site.
  */
object syntax {
  implicit class ColCtx(val sc: StringContext) extends AnyVal {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }
}
