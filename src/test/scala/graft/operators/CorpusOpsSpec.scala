package graft.operators

import graft.SparkSpec

/** Behavior specs for the round-4 pipeline operators: benchmark
  * decontamination and gap-based sessionization.
  */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("decontamination flags exactly the docs sharing a 13-gram") {
    val gram = (1 to 13).map(i => s"w$i").mkString(" ")
    val bench = Seq((100L, gram + " tail tokens here")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "prefix " + gram),                 // shares the gram
      (2L, gram.replace("w7", "x7")),         // one token differs — clean
      (3L, "totally different text entirely") // clean
    ).toDF("doc_id", "text")
    val out = Decontaminate.contaminated(train, bench, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 1L, 1L)))
  }

  test("decontamination short-doc fallback: whole-text gram still matches") {
    val bench = Seq((9L, "short eval answer")).toDF("doc_id", "text")
    val train = Seq((1L, "short eval answer"), (2L, "short eval answers"))
      .toDF("doc_id", "text")
    val out = Decontaminate.contaminated(train, bench, "doc_id", "text")
      .collect().map(_.getLong(0))
    assert(out.toSeq == Seq(1L))
  }

  test("decontamination: null text contributes no grams, matches nothing") {
    val bench = Seq((9L, null.asInstanceOf[String]), (8L, "real eval text"))
      .toDF("doc_id", "text")
    val train = Seq((1L, null.asInstanceOf[String]), (2L, "unrelated words"))
      .toDF("doc_id", "text")
    assert(Decontaminate.contaminated(train, bench, "doc_id", "text").count() == 0)
  }

  test("decontamination shuffle fallback: same results, no broadcast") {
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec}
    val gram = (1 to 13).map(i => s"t$i").mkString(" ")
    val bench = Seq((100L, gram + " more"), (101L, "other bench text"))
      .toDF("doc_id", "text")
    val train = Seq((1L, "pre " + gram), (2L, "clean doc"), (3L, gram))
      .toDF("doc_id", "text")
    val bcast = Decontaminate.contaminated(train, bench, "doc_id", "text")
    // threshold 0 forces the over-broadcast-limit path
    val shuffled = Decontaminate.contaminated(train, bench, "doc_id", "text",
      maxBroadcastBenchGrams = 0L)
    val a = bcast.orderBy("doc_id").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val b = shuffled.orderBy("doc_id").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(a == b && a.nonEmpty)
    val nodes = Bucketing.physicalNodes(shuffled)
    assert(!nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      shuffled.queryExecution.executedPlan.toString)
    assert(nodes.exists(_.isInstanceOf[ShuffledHashJoinExec]),
      shuffled.queryExecution.executedPlan.toString)
    assert(Bucketing.physicalNodes(bcast)
             .exists(_.isInstanceOf[BroadcastHashJoinExec]),
      bcast.queryExecution.executedPlan.toString)
  }

  test("decontamination sizes the broadcast by gram volume, not doc count") {
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec}
    // TWO bench docs — any doc-count heuristic broadcasts — but each is
    // huge, so the gram-volume bound must take the shuffled path
    val big = (1 to 3000).map(i => s"tok$i").mkString(" ")
    val bench = Seq((100L, big), (101L, big + " tail")).toDF("doc_id", "text")
    val train = Seq((1L, big.split(" ").take(13).mkString(" ")), (2L, "clean"))
      .toDF("doc_id", "text")
    val out = Decontaminate.contaminated(train, bench, "doc_id", "text",
      maxBroadcastBenchGrams = 1000L)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == Seq((1L, 1L, 2L))) // doc 1's 13-gram is in both bench docs
    val nodes = Bucketing.physicalNodes(out)
    assert(!nodes.exists(_.isInstanceOf[BroadcastHashJoinExec]),
      out.queryExecution.executedPlan.toString)
    assert(nodes.exists(_.isInstanceOf[ShuffledHashJoinExec]),
      out.queryExecution.executedPlan.toString)
  }

  test("bloom-prefiltered decontamination equals the exact form on real data") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val bench = docs.filter($"doc_id" % 5 === 0)
    val train = docs.filter($"doc_id" % 5 =!= 0)
    val exact = Decontaminate.contaminated(train, bench, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val bloom = Decontaminate.contaminatedBloom(train, bench, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(bloom == exact)
    assert(exact.nonEmpty, "fixture has no planted contamination")
  }

  test("bloom prefilter kills false positives in the verify join") {
    // a deliberately tiny/overloaded filter (expected items far above
    // actual, fpp loose) still yields the exact result — correctness
    // never depends on the filter's precision, only its no-false-
    // negative guarantee
    val gram = (1 to 13).map(i => s"b$i").mkString(" ")
    val bench = Seq((100L, gram + " more tokens")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "pre " + gram), (2L, "clean document"), (3L, "other clean text"))
      .toDF("doc_id", "text")
    val out = Decontaminate.contaminatedBloom(train, bench, "doc_id", "text",
        fpp = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 1L, 1L)))
  }

  test("asOf picks the latest right row at or before each left ts") {
    val left = Seq((1L, 10L, "p1"), (1L, 20L, "p2"), (2L, 5L, "p3"))
      .toDF("key", "ts", "tag")
    val right = Seq((1L, 8L, 1.0), (1L, 15L, 2.0), (1L, 20L, 3.0))
      .toDF("key", "ts", "v")
    val out = AsOfJoin.asOf(left, right, "key", "ts", Seq("v"))
      .orderBy("key", "ts")
      .collect()
      .map(r => (r.getAs[String]("tag"),
                 Option(r.getAs[java.lang.Long]("asof_ts")).map(_.toLong),
                 Option(r.getAs[java.lang.Double]("asof_v")).map(_.toDouble)))
    assert(out.toSeq == Seq(
      ("p1", Some(8L), Some(1.0)),   // strictly before
      ("p2", Some(20L), Some(3.0)),  // equal ts is inclusive
      ("p3", None, None)))           // no right rows for key 2
  }

  test("packSequences: greedy first-fit; oversized doc takes its own bin") {
    val docs = Seq((1L, 400L), (2L, 500L), (3L, 200L), (4L, 1200L), (5L, 100L))
      .toDF("doc_id", "n_tokens")
    val out = SequencePack.packSequences(docs, "doc_id", "n_tokens",
        shards = 1, capacity = 1000L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    // 400+500 fill bin 1; 200 opens bin 2; 1200 > capacity gets bin 3
    // alone; 100 cannot join the overfull bin 3 so opens bin 4
    assert(out.toSeq == Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 3L), (5L, 4L)))
  }

  test("pointInInterval matches exactly, across bucket boundaries") {
    val points = Seq((1L, 5L), (2L, 10L), (3L, 25L), (4L, 99L))
      .toDF("pid", "ts")
    // interval B spans multiple width-10 buckets; C matches nothing
    val intervals = Seq(("A", 4L, 6L), ("B", 8L, 27L), ("C", 50L, 60L))
      .toDF("iv", "start", "end")
    val out = RangeJoin.pointInInterval(points, intervals,
        "ts", "start", "end", bucketWidth = 10L)
      .select("pid", "iv").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((1L, "A"), (2L, "B"), (3L, "B")))
  }

  test("asOf: a null right VALUE matches as (ts, null), never a field mix") {
    val left = Seq((1L, 12L, "p")).toDF("key", "ts", "tag")
    val right = Seq((1L, 5L, java.lang.Double.valueOf(2.0)),
                    (1L, 10L, null.asInstanceOf[java.lang.Double]))
      .toDF("key", "ts", "v")
    val r = AsOfJoin.asOf(left, right, "key", "ts", Seq("v")).head()
    // the matched row IS (10, null) — not ts=10 paired with v=2.0
    assert(r.getAs[Long]("asof_ts") == 10L && r.isNullAt(r.fieldIndex("asof_v")))
  }

  test("sessionize splits on gaps > threshold and aggregates per session") {
    val m = 60L * 1000 * 1000 * 1000 // one minute in ns
    val events = Seq(
      // user 1: events at t=0,10m,50m → sessions {0,10m} and {50m}
      (1L, 0L, 1L, 1.5), (1L, 10 * m, 2L, 2.0), (1L, 50 * m, 3L, 4.0),
      // user 2: single event
      (2L, 5 * m, 4L, 7.25)
    ).toDF("user_id", "ts", "event_id", "value")
    val out = Sessionize.sessionize(events, gapNs = 30 * m)
      .orderBy("user_id", "session_idx")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getDouble(5)))
    assert(out.toSeq == Seq(
      (1L, 1L, 0L, 10 * m, 2L, 3.5),
      (1L, 2L, 50 * m, 50 * m, 1L, 4.0),
      (2L, 1L, 5 * m, 5 * m, 1L, 7.25)))
  }

  test("sessionize: a gap of exactly the threshold does NOT split") {
    val m = 60L * 1000 * 1000 * 1000
    val events = Seq((1L, 0L, 1L, 1.0), (1L, 30 * m, 2L, 1.0))
      .toDF("user_id", "ts", "event_id", "value")
    val out = Sessionize.sessionize(events, gapNs = 30 * m).collect()
    assert(out.length == 1 && out.head.getLong(4) == 2L)
  }
}
