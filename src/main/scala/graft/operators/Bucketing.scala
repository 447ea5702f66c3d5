package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers (100 TB posture, SURVEY.md §7: "bucketing for
  * co-located joins"). Writing both sides of a recurring join bucketed
  * by the join key removes the per-query shuffle: the sort-merge join
  * reads co-located buckets directly (no Exchange in the plan),
  * which at cluster scale converts an all-to-all network stage per
  * query into a one-time write-side cost. Verified in BucketingSpec by
  * asserting the joined plan is Exchange-free.
  */
object Bucketing {

  /** Persist `df` as a bucketed managed table (overwrites). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int = 8): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two previously-bucketed tables on their bucket key. With
    * equal bucket counts Spark plans a shuffle-free sort-merge join. */
  def coLocatedJoin(spark: SparkSession, leftTable: String,
                    rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Every physical node of the executed plan, with AQE wrappers,
    * materialized query stages, and reused exchanges resolved to the
    * real operators beneath — so plan-shape assertions walk the actual
    * tree rather than substring-matching the plan string (range
    * partitioning, reused exchanges, and node renames all count). A
    * reused exchange contributes its referenced ORIGINAL subtree again,
    * so node-TYPE detection (windows, joins) sees through reuse;
    * [[shuffleCount]] dedupes those originals by identity. */
  def physicalNodes(df: DataFrame)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      // ReusedExchangeExec is a LEAF wrapping the original exchange —
      // recurse into the referenced exchange or a reused shuffle would
      // go undetected (only its original elsewhere in the tree is seen).
      case r: ReusedExchangeExec => walk(r.child)
      case other => other +: other.children.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
  }

  /** Number of DISTINCT shuffle exchanges in the executed plan.
    * Distinct by reference identity: a ReusedExchangeExec resolves to
    * the same original node, so Catalyst deciding to REUSE a shuffle (a
    * pure win — the data moves once) cannot read as an extra shuffle
    * and fail a plan-shape assertion. */
  def shuffleCount(df: DataFrame): Int = {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[AnyRef, java.lang.Boolean]())
    physicalNodes(df).foreach {
      case s: ShuffleExchangeLike => seen.add(s)
      case _ => ()
    }
    seen.size
  }

  /** True when the executed plan contains no shuffle exchange node —
    * the property bucketing buys. */
  def isExchangeFree(df: DataFrame): Boolean = shuffleCount(df) == 0
}
