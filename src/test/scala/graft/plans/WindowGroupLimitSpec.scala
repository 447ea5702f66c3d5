package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The top-k window queries (W2/W3/W4 shape: row_number + rank filter)
  * rely on Catalyst's WindowGroupLimit pushdown: a PARTIAL group-limit
  * runs map-side before the shuffle, so each partition ships at most k
  * rows per group instead of its full slice — the difference between a
  * bounded and an unbounded shuffle at 100 TB. This pins the plan shape
  * (BucketingSpec-style) so a query-shape or Spark change that breaks
  * the pushdown fails a test instead of silently regressing the bench.
  */
class WindowGroupLimitSpec extends SparkSpec {
  import spark.implicits._

  test("row_number rank=1 filter plans partial+final WindowGroupLimit") {
    // spark.range, not a LocalRelation — local inputs get evaluated
    // away at optimize time and no Window node would survive
    val df = spark.range(1000)
      .select(($"id" % 10).as("k"), $"id".as("v"))
    val top = df
      .withColumn("rn",
        row_number().over(Window.partitionBy($"k").orderBy($"v".desc)))
      .filter($"rn" === 1)
    assert(top.count() == 10)
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
    assert(plan.contains("Partial") && plan.contains("Final"), plan)
  }
}
