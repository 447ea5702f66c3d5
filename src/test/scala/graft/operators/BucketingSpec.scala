package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    // warehouse.dir is static; tables land in ./spark-warehouse
    // (gitignored) and are dropped in the finally block
    val facts = (1L to 1000L).map(i => (i % 100, s"f$i")).toDF("k", "payload")
    val dims = (0L until 100L).map(i => (i, s"d$i")).toDF("k", "dim")
    Bucketing.writeBucketed(facts, "b_facts", "k")
    Bucketing.writeBucketed(dims, "b_dims", "k")
    // disable broadcast so the join would otherwise shuffle both sides
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.coLocatedJoin(spark, "b_facts", "b_dims", "k")
      assert(Bucketing.isExchangeFree(joined),
        joined.queryExecution.executedPlan.toString)
      assert(joined.count() == 1000)
      // same join on the unbucketed frames DOES shuffle — the contrast
      val shuffled = facts.join(dims, "k")
      assert(!Bucketing.isExchangeFree(shuffled))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_facts")
      spark.sql("DROP TABLE IF EXISTS b_dims")
    }
  }

  test("a reused shuffle exchange still counts as a shuffle") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // self-join of one aggregation: AQE materializes the grouped side
      // once and wires the second consumer through ReusedExchangeExec —
      // the walk must see the shuffle through the reuse leaf too
      val grouped = spark.range(1000)
        .select(($"id" % 10).as("k")).groupBy($"k").count()
      val joined = grouped.as("a").join(grouped.as("b"), "k")
      assert(joined.count() == 10)
      assert(!Bucketing.isExchangeFree(joined),
        joined.queryExecution.executedPlan.toString)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
}
