package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge for the graft native expressions.
  *
  * Spark 4 made the classic `ExpressionUtils` (and the Column
  * constructor) `private[sql]` behind the Connect-era ColumnNode
  * indirection; library code that builds a Catalyst Expression
  * directly (e.g. [[graft.plans.Md5Bucket]] in a DataFrame pipeline,
  * without the SQL-registration detour) needs this one-hop forwarder
  * in the `org.apache.spark.sql` package — the standard extension-
  * library bridge pattern. No Spark internals are reimplemented here;
  * both calls delegate to the supported classic conversion.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
