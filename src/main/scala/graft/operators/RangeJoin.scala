package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyless range join (point ∈ [start, end]) via BUCKETIZED equi-join:
  * Spark plans a bare `ts BETWEEN start AND end` condition as
  * BroadcastNestedLoopJoin — quadratic work, codegen disabled. Here
  * each interval explodes into the coarse buckets it overlaps, each
  * point maps to its one bucket, and the join is a plain hash
  * equi-join on bucket id with the exact BETWEEN as a post-filter —
  * shuffle-linear in points + interval-bucket spans. Beyond the
  * reference surface; pipeline-brief addition (event windows,
  * campaign attribution).
  *
  * Pick `bucketWidth` near the typical interval length: wider buckets
  * mean fewer interval replicas but more false candidates for the
  * post-filter; hot buckets fall to AQE skew handling.
  */
object RangeJoin {

  /** @param points    (pointCols..., tsCol)
    * @param intervals (ivCols..., startCol, endCol), start <= end
    * @return points ⋈ the intervals containing them (inner join,
    *         point dropped when no interval matches)
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      tsCol: String, startCol: String, endCol: String,
                      bucketWidth: Long): DataFrame = {
    val p = points.withColumn("_bucket",
      floor(col(tsCol).cast("long") / bucketWidth))
    val iv = intervals.withColumn("_bucket",
      explode(sequence(floor(col(startCol).cast("long") / bucketWidth),
                       floor(col(endCol).cast("long") / bucketWidth))))
    p.join(iv, Seq("_bucket"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("_bucket")
  }
}
