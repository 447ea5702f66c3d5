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

  /** @param points    (pointCols..., tsCol), ts >= 0
    * @param intervals (ivCols..., startCol, endCol), 0 <= start <= end
    * @return points ⋈ the intervals containing them (inner join,
    *         point dropped when no interval matches)
    *
    * Bucket ids use INTEGER division — `long / long` in Column algebra
    * promotes to double, and ns-epoch values (~1.7e18) exceed 2^53, so
    * float flooring could shift a boundary point into the wrong bucket
    * and silently drop its match. Non-negative domain keeps truncating
    * division equal to floor division.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      tsCol: String, startCol: String, endCol: String,
                      bucketWidth: Long): DataFrame = {
    require(!points.columns.contains("_bucket") &&
            !intervals.columns.contains("_bucket"),
      "RangeJoin: input contains reserved working column '_bucket'; rename before joining")
    def bucketOf(c: String) =
      expr(s"CAST(`$c` AS BIGINT) DIV ${bucketWidth}L")
    val p = points.withColumn("_bucket", bucketOf(tsCol))
    val iv = intervals.withColumn("_bucket",
      explode(sequence(bucketOf(startCol), bucketOf(endCol))))
    p.join(iv, Seq("_bucket"))
      .filter(col(tsCol) >= col(startCol) && col(tsCol) <= col(endCol))
      .drop("_bucket")
  }
}
