package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property test: the distributed closure equals a local all-paths
  * reference on random small graphs. Fewer iterations than usual —
  * each case runs 6 Spark jobs.
  */
class ClosurePropertySpec extends SparkSpec {
  import spark.implicits._

  private val levels = 4
  private val threshold = 0.4

  /** Local reference: hop-bounded max-product DP over the bidirectional
    * graph with prefix pruning — independent of the Spark code. */
  private def localClosure(edges: Seq[(Long, Long, Double)],
                           seeds: Seq[Long]): Map[(Long, Long), Double] = {
    val bi = edges ++ edges.map { case (s, d, w) => (d, s, w) }
    val best = scala.collection.mutable.Map[(Long, Long), Double]()
    seeds.foreach(s => best((s, s)) = 1.0)
    var frontier: Map[(Long, Long), Double] = seeds.map(s => (s, s) -> 1.0).toMap
    for (_ <- 1 to levels) {
      val next = scala.collection.mutable.Map[(Long, Long), Double]()
      for (((seed, node), str) <- frontier; (s, d, w) <- bi if s == node) {
        val ns = str * w
        if (ns > threshold && ns > next.getOrElse((seed, d), 0.0))
          next((seed, d)) = ns
      }
      next.foreach { case (k, v) =>
        if (v > best.getOrElse(k, 0.0)) best(k) = v
      }
      frontier = next.toMap
    }
    best.toMap
  }

  test("property: distributed closure = local all-paths reference") {
    val edgeGen = for {
      s <- Gen.choose(0L, 5L)
      d <- Gen.choose(0L, 5L) if d != s
      w <- Gen.choose(50, 99).map(_ / 100.0)
    } yield (s, d, w)
    val graphGen = Gen.listOfN(6, edgeGen)
    val prop = Prop.forAll(graphGen) { edges =>
      val seeds = Seq(0L, 3L)
      val expected = localClosure(edges, seeds)
        .map { case (k, v) => k -> (math.rint(v * 1e9) / 1e9) }
      val actual = EquivalencyClosure.closure(
          edges.toDF("src", "dst", "strength"), seeds.toDF("seed"),
          levels, threshold)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> (math.rint(r.getDouble(2) * 1e9) / 1e9))
        .toMap
      actual == expected
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(result.passed, result.status.toString)
  }

  test("hub skew: AQE splits the skewed level join, results unchanged") {
    // j9 is the operator most exposed to celebrity-identifier skew at
    // 100x: one hub owning most edges concentrates one join partition.
    // Pin that the closure's level-join SHAPE lets AQE's skew-join
    // engage (a replan into a broadcast/partitioning-reusing form that
    // suppresses it fails here) and that the split changes nothing.
    val hub = (1 to 3000).map(i => (0L, i.toLong, 0.9))
    val rest = (3001 to 3999).map(i => (i.toLong, i.toLong + 1, 0.9))
    val edges = (hub ++ rest).toDF("src", "dst", "strength")
    val bi = edges.unionByName(
      edges.select($"dst".as("src"), $"src".as("dst"), $"strength"))
    val nodes = (0L to 4000L).toDF("seed")
      .select($"seed", $"seed".as("node"),
              org.apache.spark.sql.functions.lit(1.0).as("strength"))
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    def runStep() = {
      val out = EquivalencyClosure.step(nodes, bi, 0.0)
      val rows = out.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      (out, rows)
    }
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "3KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "3KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val (skewed, skewedRows) = runStep()
      val smj = Bucketing.physicalNodes(skewed).collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }
      assert(smj.nonEmpty && smj.exists(_.isSkewJoin),
        skewed.queryExecution.executedPlan.toString)
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val (_, plainRows) = runStep()
      assert(skewedRows == plainRows && skewedRows.nonEmpty)
      // every hub neighbor reached through the hub at 0.9
      assert(skewedRows.contains((0L, 1L, 0.9)))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("hub skew: per-level partition balance is measured — AQE bounds " +
       "any task's join input; without it one task owns the hub") {
    // The closure's Scaladoc argues AQE absorbs celebrity-identifier
    // skew; this measures the per-LEVEL task balance with a listener:
    // per-task shuffle-read records of the level-join stages. With the
    // skew split enabled no task reads more than a bounded slice of
    // the hub's rows; with it disabled a single task reads the whole
    // hub partition — the contrast that makes the posture measured,
    // not asserted.
    val hub = (1 to 3000).map(i => (0L, i.toLong, 0.9))
    val rest = (3001 to 3999).map(i => (i.toLong, i.toLong + 1, 0.9))
    val edges = (hub ++ rest).toDF("src", "dst", "strength")
    val bi = edges.unionByName(
      edges.select($"dst".as("src"), $"src".as("dst"), $"strength"))
    val nodes = (0L to 4000L).toDF("seed")
      .select($"seed", $"seed".as("node"),
              org.apache.spark.sql.functions.lit(1.0).as("strength"))
    val reads =
      scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null) reads.synchronized {
          reads += ((te.stageId,
            te.taskMetrics.shuffleReadMetrics.recordsRead)): Unit
        }
    }
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    // per-task reads of the LEVEL-JOIN stage alone: the stage reading
    // both exchanged inputs is the one whose task reads sum to at
    // least the join's total input (frontier 4001 + bi 7998 rows,
    // plus any skew-split duplication) — the downstream agg/count
    // stages read far less (grouped rows)
    def measure(): Seq[Long] = {
      reads.synchronized(reads.clear())
      EquivalencyClosure.step(nodes, bi, 0.0).count(): Unit
      Thread.sleep(1000) // the listener bus drains asynchronously
      reads.synchronized(reads.toSeq)
        .groupBy(_._1).values.map(_.map(_._2).filter(_ > 0))
        .filter(_.sum >= 11000L)
        .minByOption(_.sum) // the join stage, not a wider downstream sum
        .getOrElse(Seq.empty)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "3KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "3KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val balanced = measure()
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val lopsided = measure()
      // without the split one task owns the hub partition (~3000 hub
      // rows + its hash share + the frontier side)
      assert(lopsided.max >= 3000L,
        s"without the split one task must own the hub partition " +
          s"(max=${lopsided.max}) — otherwise this test measures nothing")
      // with the split the join runs MORE tasks and the heaviest one
      // reads a strictly bounded fraction of the unsplit hub task —
      // split granularity is per-mapper shuffle blocks, so the bound
      // is relative, not an absolute slice size
      assert(balanced.size > lopsided.size,
        s"the hub partition must split across more tasks: " +
          s"${balanced.size} vs ${lopsided.size}")
      assert(balanced.nonEmpty && balanced.max < (lopsided.max * 3) / 4,
        s"AQE skew split must bound per-task join input: " +
          s"max=${balanced.max} vs unsplit max=${lopsided.max}")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
