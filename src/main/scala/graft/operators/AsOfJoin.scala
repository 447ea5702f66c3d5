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
  * not — and right values must be non-null (a null right value reads
  * as "no match" to the carry). Left rows before any right row get
  * null matches (left-join semantics).
  */
object AsOfJoin {

  /** @param rightVals right-side value columns to align; emitted as
    *                  `asof_<name>`, plus `asof_ts` = matched right ts */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
           rightVals: Seq[String]): DataFrame = {
    val leftPayload = left.columns.filterNot(c => c == keyCol || c == tsCol)
    val tsType = left.schema(tsCol).dataType

    val lSide = rightVals.foldLeft(
        left.withColumn("_side", lit(1))
            .withColumn("_r_ts", lit(null).cast(tsType))) {
      (df, c) => df.withColumn(s"_r_$c", lit(null).cast(right.schema(c).dataType))
    }

    val rSide = leftPayload.foldLeft(
        rightVals.foldLeft(
            right.select((Seq(keyCol, tsCol) ++ rightVals).map(col): _*)
              .withColumn("_side", lit(0))
              .withColumn("_r_ts", col(tsCol).cast(tsType))) {
          (df, c) => df.withColumnRenamed(c, s"_r_$c")
        }) {
      (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }

    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = ("_r_ts" +: rightVals.map(c => s"_r_$c"))
      .foldLeft(lSide.unionByName(rSide)) {
        (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
      }
    val out = carried.filter(col("_side") === 1).drop("_side")
    rightVals.foldLeft(out.withColumnRenamed("_r_ts", "asof_ts")) {
      (df, c) => df.withColumnRenamed(s"_r_$c", s"asof_$c")
    }
  }
}
