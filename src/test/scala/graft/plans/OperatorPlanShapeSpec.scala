package graft.plans

import graft.SparkSpec
import graft.operators.{AsOfJoin, Bucketing, RangeJoin, Sampling, Sessionize}
import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

/** Pins the physical-plan shapes the round-4/5 operator scaladocs
  * claim (BucketingSpec-style): a Catalyst or query-shape change that
  * re-plans one of these into its quadratic/serialized alternative
  * fails a test instead of silently regressing the 100 TB posture.
  * Assertions walk the real executed-plan tree via
  * Bucketing.physicalNodes, not the plan string.
  */
class OperatorPlanShapeSpec extends SparkSpec {
  import spark.implicits._

  test("threshold sample is a pure map-side filter: no exchange, no window") {
    val df = spark.range(10000)
      .select($"id".as("doc_id"), ($"id" % 7).cast("string").as("lang"))
    val sampled = Sampling.stratifiedThreshold(df, Seq("lang"), "doc_id", 0.2)
    sampled.count()
    assert(Bucketing.shuffleCount(sampled) == 0,
      sampled.queryExecution.executedPlan.toString)
    assert(!Bucketing.physicalNodes(sampled).exists(_.isInstanceOf[WindowExec]),
      sampled.queryExecution.executedPlan.toString)
  }

  test("as-of join: one exchange, no nested-loop join") {
    val left = spark.range(1000)
      .select(($"id" % 10).as("key"), ($"id" * 3).as("ts"), $"id".as("event_id"))
    val right = spark.range(300)
      .select(($"id" % 10).as("key"), ($"id" * 11).as("ts"), ($"id" * 2).as("v"))
    val joined = AsOfJoin.asOf(left, right, "key", "ts", Seq("v"))
    joined.count()
    val nodes = Bucketing.physicalNodes(joined)
    assert(!nodes.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      joined.queryExecution.executedPlan.toString)
    assert(Bucketing.shuffleCount(joined) == 1,
      joined.queryExecution.executedPlan.toString)
  }

  test("range join plans a hash equi-join on _bucket, never nested-loop") {
    val points = spark.range(5000)
      .select($"id".as("event_id"), ($"id" * 97).as("ts"))
    val intervals = spark.range(20)
      .select($"id".as("window_id"), ($"id" * 20000).as("w_start"),
              ($"id" * 20000 + 5000).as("w_end"))
    val joined = RangeJoin.pointInInterval(
      points, intervals, "ts", "w_start", "w_end", bucketWidth = 1000L)
    joined.count()
    val nodes = Bucketing.physicalNodes(joined)
    assert(!nodes.exists(n => n.isInstanceOf[BroadcastNestedLoopJoinExec]
                           || n.isInstanceOf[CartesianProductExec]),
      joined.queryExecution.executedPlan.toString)
    val joins = nodes.collect { case j: BaseJoinExec => j }
    assert(joins.nonEmpty)
    assert(joins.forall(j => j.leftKeys.nonEmpty &&
             (j.leftKeys ++ j.rightKeys).exists(_.toString.contains("_bucket"))),
      joins.map(j => s"${j.nodeName}: ${j.leftKeys} = ${j.rightKeys}").mkString("; "))
  }

  test("f3/m5 banded similarity joins: band explode present, never a cross join") {
    val env = graft.Env(spark, "/root/testdata/sf0.001")
    for (df <- Seq(graft.queries.Functions.f3BlockedSimilarity(env),
                   graft.queries.ScoringQueries.m5EquivStrength(env))) {
      df.count()
      val nodes = Bucketing.physicalNodes(df)
      assert(!nodes.exists(n => n.isInstanceOf[BroadcastNestedLoopJoinExec]
                             || n.isInstanceOf[CartesianProductExec]),
        df.queryExecution.executedPlan.toString)
      // the length-band sub-blocking shape: rows explode into
      // {band, band−1} buckets before the cell groupBy
      assert(nodes.exists(_.isInstanceOf[org.apache.spark.sql.execution.GenerateExec]),
        df.queryExecution.executedPlan.toString)
      // one bounded shuffle per groupBy + the output sort — a replan
      // into a join-based pair expansion would add exchanges
      assert(Bucketing.shuffleCount(df) <= 4,
        df.queryExecution.executedPlan.toString)
    }
  }

  test("keyset pagination: no window, cursor pushed to the scan, top-k only") {
    val env = graft.Env(spark, "/root/testdata/sf0.001")
    val page = graft.queries.Windows.w1PageKeyset(env)
    page.count()
    val nodes = Bucketing.physicalNodes(page)
    assert(!nodes.exists(_.isInstanceOf[WindowExec]),
      page.queryExecution.executedPlan.toString)
    assert(nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.TakeOrderedAndProjectExec]),
      page.queryExecution.executedPlan.toString)
    // the cursor predicate reaches the parquet scan
    assert(page.queryExecution.executedPlan.toString.contains("PushedFilters")
      && page.queryExecution.executedPlan.toString
           .contains("GreaterThan(o_orderkey"),
      page.queryExecution.executedPlan.toString)
  }

  test("weighted priority sample: per-partition top-k heaps, no global sort") {
    val df = spark.range(1, 5000)
      .select($"id".as("doc_id"), ($"id" % 97 + 1).as("w"))
    val out = graft.operators.Sampling.weightedPriority(df, "doc_id", "w", 25)
    out.count()
    val plan = out.queryExecution.executedPlan
    assert(Bucketing.physicalNodes(out).exists(
      _.isInstanceOf[org.apache.spark.sql.execution.TakeOrderedAndProjectExec]),
      plan.toString)
    assert(Bucketing.shuffleCount(out) == 0, plan.toString)
  }

  test("datacard cube: margins come from Expand + one aggregate shuffle") {
    val env = graft.Env(spark, "/root/testdata/sf0.001")
    val card = graft.queries.CorpusQueries.corpusDatacard(env)
    card.count()
    val plan = card.queryExecution.executedPlan
    assert(plan.toString.contains("Expand"), plan.toString)
    // one exchange for the aggregate, one for the final presentation
    // sort — no join, no window, no per-margin rescan
    assert(Bucketing.shuffleCount(card) <= 2, plan.toString)
    assert(!Bucketing.physicalNodes(card).exists(_.isInstanceOf[WindowExec]),
      plan.toString)
  }

  test("chunkWindows is a zero-shuffle narrow map") {
    val docs = spark.range(500)
      .select($"id".as("doc_id"),
        concat_ws(" ", (0 to 90).map(i => lit("w" + i)): _*).as("text"))
    val chunks = graft.operators.Boilerplate.chunkWindows(
      docs, "doc_id", "text", window = 64, overlap = 16)
    chunks.count()
    assert(Bucketing.shuffleCount(chunks) == 0,
      chunks.queryExecution.executedPlan.toString)
  }

  test("withScalars sites plan broadcast-hash, never nested-loop/cartesian") {
    // the scalar attach in bm25 / boilerplate / feed totals must stay a
    // BroadcastHashJoin (inside codegen) — a literal key would fold
    // back into BroadcastNestedLoopJoin
    val docs = spark.range(300)
      .select($"id".as("doc_id"),
        concat_ws(" ", (0 to 40).map(i => lit("t" + i)): _*).as("text"))
    val out = graft.operators.Bm25.topK(docs, "doc_id", "text",
      Seq("q" -> Seq("t1", "t7")), k = 5)
    out.count()
    val nodes = Bucketing.physicalNodes(out)
    assert(!nodes.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]) &&
           !nodes.exists(_.isInstanceOf[CartesianProductExec]),
      out.queryExecution.executedPlan.toString)
    val scrub = graft.operators.Boilerplate.scrub(docs, "doc_id", "text")
    scrub.count()
    val sn = Bucketing.physicalNodes(scrub)
    assert(!sn.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]) &&
           !sn.exists(_.isInstanceOf[CartesianProductExec]),
      scrub.queryExecution.executedPlan.toString)
  }

  test("semDedup: pair scan stays within cells — no cross join, bounded shape") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = graft.operators.VectorSearch.semDedup(emb, 0.3)
    out.count()
    val nodes = Bucketing.physicalNodes(out)
    assert(!nodes.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]) &&
           !nodes.exists(_.isInstanceOf[CartesianProductExec]),
      out.queryExecution.executedPlan.toString)
  }

  test("sq8TopK: one chunk-blocked scan join, broadcast-hash re-rank joins") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    import spark.implicits._
    val q = emb.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qe"))
    val out = graft.operators.VectorSearch.sq8TopK(emb, q, k = 5)
    out.count()
    val nodes = Bucketing.physicalNodes(out)
    // the dense scan is the chunk-blocked crossJoin against queryChunks
    // (inherently |Q|·|V| work, per-task memory bounded by the chunk
    // row) — exactly ONE such node; a second would mean a raw
    // uncollected-query path regressed into an all-pairs join
    val dense = nodes.count(n => n.isInstanceOf[BroadcastNestedLoopJoinExec]
                             || n.isInstanceOf[CartesianProductExec])
    assert(dense == 1, out.queryExecution.executedPlan.toString)
    // the candidate set joins back to the vector table and the
    // distributed queries broadcast-side (two broadcast-hash joins)
    assert(nodes.count(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]) >= 2,
      out.queryExecution.executedPlan.toString)
  }

  test("lsh/ivf topK: distributed query side — equi-join on bucket/cell, no collect") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    import spark.implicits._
    val q = emb.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qe"))
    for ((out, key) <- Seq(
           graft.operators.VectorSearch.lshTopK(emb, q, k = 5) -> "bkt",
           graft.operators.VectorSearch.ivfTopK(emb, q, k = 5) -> "cell")) {
      out.count()
      val nodes = Bucketing.physicalNodes(out)
      // candidate pairing is a hash EQUI-join on the probe key — never
      // a nested loop / cartesian, so a corpus-proportional query set
      // shuffles instead of collecting
      assert(!nodes.exists(n => n.isInstanceOf[BroadcastNestedLoopJoinExec]
                             || n.isInstanceOf[CartesianProductExec]),
        out.queryExecution.executedPlan.toString)
      val joins = nodes.collect { case j: BaseJoinExec => j }
      assert(joins.exists(j =>
          (j.leftKeys ++ j.rightKeys).exists(_.toString.contains(key))),
        joins.map(j => s"${j.nodeName}: ${j.leftKeys} = ${j.rightKeys}")
          .mkString("; "))
    }
  }

  test("substring dedup: shuffled-hash join-back on the window key, never broadcast") {
    import spark.implicits._
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec}
    val docs = (0L until 60L).map(i =>
      (i, ("w" + (i % 7)) * 30)).toDF("doc_id", "text")
    val spans = graft.operators.SubstringDedup
      .removalSpans(docs, "doc_id", "text", 40)
    spans.count()
    val nodes = Bucketing.physicalNodes(spans)
    // the duplicated-window set is corpus-scale at 100 TB: the
    // join-back must be the hinted SHUFFLE_HASH on g, never a
    // broadcast (and never a nested loop)
    assert(nodes.exists(_.isInstanceOf[ShuffledHashJoinExec]),
      spans.queryExecution.executedPlan.toString)
    assert(!nodes.exists(n => n.isInstanceOf[BroadcastHashJoinExec]
                           || n.isInstanceOf[BroadcastNestedLoopJoinExec]
                           || n.isInstanceOf[CartesianProductExec]),
      spans.queryExecution.executedPlan.toString)
  }

  test("nb classify: model pairing is a shuffled-hash equi-join on the word key") {
    import spark.implicits._
    import org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
    val docs = (0L until 40L).map(i =>
      (i, "c" + (i % 3), s"tok${i % 5} tok${i % 7} tok${i % 3}"))
      .toDF("doc_id", "cls", "text")
    val out = graft.operators.NaiveBayes.classify(docs, "doc_id", "cls",
      "text", graft.operators.NaiveBayes.train(docs, "cls", "text"),
      graft.operators.NaiveBayes.priors(docs, "cls"))
    out.count()
    val nodes = Bucketing.physicalNodes(out)
    val shj = nodes.collect { case j: ShuffledHashJoinExec => j }
    // the vocab×classes model is vocabulary-bounded but NOT
    // broadcast-safe at 100 TB — the hinted shuffled-hash join on
    // `word` is the pinned shape
    assert(shj.exists(j => (j.leftKeys ++ j.rightKeys)
        .exists(_.toString.contains("word"))),
      out.queryExecution.executedPlan.toString)
  }

  test("queryChunks: bounded rows, valid queries only, no driver collect needed") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    import spark.implicits._
    val q = emb.select($"vec_id".as("qid"), $"embedding".as("qe"))
    val chunks = graft.operators.VectorSearch.queryChunks(q, dim = 64,
      chunkSize = 64)
    val rows = chunks.selectExpr("size(qids) AS n", "size(nqs) AS m",
      "size(qflat) AS f").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getInt(0)
      assert(n >= 1 && n <= 64, s"chunk of $n queries exceeds chunkSize")
      assert(r.getInt(1) == n && r.getInt(2) == n * 64,
        "chunk arrays out of step")
    }
    val total = rows.map(_.getInt(0)).sum
    assert(total == q.count(), "every valid query appears in exactly one chunk")
  }

  test("sessionize: one exchange, one shared sort for both windows") {
    val events = spark.range(2000)
      .select(($"id" % 20).as("user_id"), ($"id" * 1000000L).as("ts"),
              $"id".as("event_id"), ($"id" % 50).cast("double").as("value"))
    val sessions = Sessionize.sessionize(events, gapNs = 50L * 1000000L)
    sessions.count()
    assert(Bucketing.shuffleCount(sessions) == 1,
      sessions.queryExecution.executedPlan.toString)
    val sorts = Bucketing.physicalNodes(sessions).count(_.isInstanceOf[SortExec])
    assert(sorts == 1, sessions.queryExecution.executedPlan.toString)
  }
}
