package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the LATEST right row of the same
  * key with `right.ts <= left.ts` — the standard event-alignment
  * operator (feature lookup at example time) that Spark lacks as a
  * built-in. Beyond the reference surface; pipeline-brief addition.
  *
  * Implemented as union + ordered carry-forward, NOT a range-condition
  * join: a theta join on `r.ts <= l.ts` plans BroadcastNestedLoopJoin
  * (quadratic per key, codegen-disabled), while this shape is ONE
  * shuffle by key and a single ordered window pass — right rows sort
  * before left rows at equal ts (inclusive semantics, matching DuckDB
  * `ASOF JOIN ... ON r.ts <= l.ts`), and `last(..., ignoreNulls)`
  * carries each right value forward to the left rows that follow.
  * O(1) window state per row; skewed keys cost a sort, never a
  * cross product.
  *
  * Contract: `right` must be unique per (key, ts) — pre-aggregate if
  * not. The matched right row travels as ONE struct, so asof_ts and
  * every asof_<col> always come from the SAME right row (a right row
  * with a null value matches with that null, exactly like SQL ASOF) —
  * never a Frankenstein pairing of fields from different rows. Left
  * rows before any right row get null matches (left-join semantics).
  */
object AsOfJoin {

  /** @param rightVals right-side value columns to align; emitted as
    *                  `asof_<name>`, plus `asof_ts` = matched right ts */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
           rightVals: Seq[String]): DataFrame = {
    val reserved = Seq("_r", "_side")
    val clash = reserved.filter(c =>
      left.columns.contains(c) || right.columns.contains(c))
    require(clash.isEmpty,
      s"AsOfJoin: input contains reserved working column(s) ${clash.mkString(", ")}; rename before joining")
    val leftPayload = left.columns.filterNot(c => c == keyCol || c == tsCol)
    val tsType = left.schema(tsCol).dataType

    val rSide = leftPayload.foldLeft(
        right.select(col(keyCol), col(tsCol).cast(tsType).as(tsCol),
          struct((col(tsCol).cast(tsType).as("ts")) +:
                 rightVals.map(c => col(c).as(c)): _*).as("_r"))
          .withColumn("_side", lit(0))) {
      (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val rType = rSide.schema("_r").dataType
    val lSide = left.withColumn("_side", lit(1))
      .withColumn("_r", lit(null).cast(rType))

    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lSide.unionByName(rSide)
      .withColumn("_r", last(col("_r"), ignoreNulls = true).over(w))
    val out = carried.filter(col("_side") === 1)
      .withColumn("asof_ts", col("_r").getField("ts"))
    rightVals.foldLeft(out) { (df, c) =>
        df.withColumn(s"asof_$c", col("_r").getField(c))
      }
      .drop("_side", "_r")
  }
}
