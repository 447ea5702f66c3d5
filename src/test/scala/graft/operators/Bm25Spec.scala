package graft.operators

import graft.SparkSpec

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  /** The operator's per-(query,doc) summation contract: each term
    * score quantized to micro-units, longs summed, one final divide. */
  private def qsum(per: Seq[Double]): Double =
    per.map(s => math.floor(s * 1e6).toLong).sum.toDouble / 1e6

  /** The operator's formula, replayed scalar-side in the same
    * association order. */
  private def score(tf: Long, dl: Long, df: Long, n: Long, avgdl: Double,
                    k1: Double = 1.2, b: Double = 0.75): Double = {
    val idf = (n - df + 0.5) / (df + 0.5)
    idf * (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * (dl / avgdl)))
  }

  test("single-term query: exact scores, shorter doc ranks first") {
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "apple")).toDF("doc_id", "text")
    val got = Bm25.topK(docs, "doc_id", "text", Seq("q" -> Seq("apple")), k = 10)
      .orderBy("rank").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    val avgdl = 6.0 / 3
    val s1 = qsum(Seq(score(tf = 2, dl = 3, df = 2, n = 3, avgdl = avgdl)))
    val s3 = qsum(Seq(score(tf = 1, dl = 1, df = 2, n = 3, avgdl = avgdl)))
    // BM25 length normalization: the short exact-hit doc outranks the
    // longer double-hit doc
    assert(s3 > s1)
    assert(got.toSeq == Seq((1, 3L, s3), (2, 1L, s1)))
  }

  test("multi-term scores sum per matched term; k caps the output") {
    val docs = Seq(
      (1L, "red blue"),
      (2L, "red red blue green"),
      (3L, "green green"),
      (4L, "unrelated words")).toDF("doc_id", "text")
    val all = Bm25.topK(docs, "doc_id", "text",
        Seq("q" -> Seq("red", "blue", "green")), k = 10)
      .collect().map(r => (r.getLong(2), r.getDouble(3))).toMap
    assert(all.keySet == Set(1L, 2L, 3L)) // doc 4 matches nothing
    val avgdl = 10.0 / 4
    // replay the quantized-long summation explicitly for doc 2
    val terms2 = Seq(
      "blue" -> score(1, 4, 2, 4, avgdl),
      "green" -> score(1, 4, 2, 4, avgdl),
      "red" -> score(2, 4, 2, 4, avgdl))
    val summed2 = qsum(terms2.map(_._2))
    assert(all(2L) == summed2)
    val top1 = Bm25.topK(docs, "doc_id", "text",
        Seq("q" -> Seq("red", "blue", "green")), k = 1)
      .collect()
    assert(top1.length == 1 && top1.head.getInt(1) == 1)
  }

  test("persisted index: term filter pushed to scan; serve and append bit-equal inline") {
    val docs = Seq(
      (1L, "red blue red fast"),
      (2L, "red blue green fast scan"),
      (3L, "green green table"),
      (4L, "red table scan value")).toDF("doc_id", "text")
    val queries = Seq("q1" -> Seq("red", "table"), "q2" -> Seq("green"))
    val inline = Bm25.topK(docs, "doc_id", "text", queries, k = 3)
      .orderBy("qid", "rank").collect().toSeq
    val dirA = java.nio.file.Files
      .createTempDirectory("graft_bm25_idx").toString
    val dirB = java.nio.file.Files
      .createTempDirectory("graft_bm25_app").toString
    try {
      Bm25.writeIndex(docs, "doc_id", "text", dirA)
      val served = Bm25.serve(spark, dirA, queries, k = 3)
      assert(served.orderBy("qid", "rank").collect().toSeq == inline)
      // the query-term filter reaches the postings parquet scan
      val plan = served.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters") && plan.contains("In(term"),
        plan)
      // incremental build: postings append + additive df/stats merge
      // is EXACT, so it reproduces the full build bit for bit
      Bm25.writeIndex(docs.filter($"doc_id" =!= 4L), "doc_id", "text",
        dirB)
      Bm25.appendIndex(spark, dirB, docs.filter($"doc_id" === 4L),
        "doc_id", "text")
      val incr = Bm25.serve(spark, dirB, queries, k = 3)
        .orderBy("qid", "rank").collect().toSeq
      assert(incr == inline)
      assert(inline.nonEmpty)
      // appends COMPOSE: a second disjoint increment (here re-split
      // doc 3 out of the base then re-appended) still equals the full
      // build — the property the streamed per-micro-batch ingest
      // (t14) relies on under arbitrary batch slicing
      val dirC = java.nio.file.Files
        .createTempDirectory("graft_bm25_two").toString
      try {
        Bm25.writeIndex(docs.filter($"doc_id" < 3L), "doc_id", "text",
          dirC)
        Bm25.appendIndex(spark, dirC, docs.filter($"doc_id" === 3L),
          "doc_id", "text")
        Bm25.appendIndex(spark, dirC, docs.filter($"doc_id" === 4L),
          "doc_id", "text")
        assert(Bm25.serve(spark, dirC, queries, k = 3)
          .orderBy("qid", "rank").collect().toSeq == inline)
      } finally {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
        }
        rm(new java.io.File(dirC))
      }
      // the append left TWO postings segments under the manifest;
      // compaction rewrites them into ONE term-sorted segment and the
      // serve stays bit-equal (pure reorganization)
      assert(IndexCommit.tablePaths(spark, dirB, "postings").size == 2)
      Bm25.compactIndex(spark, dirB)
      assert(IndexCommit.tablePaths(spark, dirB, "postings").size == 1)
      val compacted = Bm25.serve(spark, dirB, queries, k = 3)
        .orderBy("qid", "rank").collect().toSeq
      assert(compacted == inline)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(dirA)); rm(new java.io.File(dirB))
    }
  }

  test("health card: segment/tombstone debt flips the flag; compaction " +
       "quiets it") {
    val docs = Seq(
      (1L, "red blue red"), (2L, "red green"), (3L, "blue table"),
      (4L, "green scan"), (5L, "table value red"), (6L, "blue scan"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_health").toString
    try {
      Bm25.writeIndex(docs.filter($"doc_id" <= 2L), "doc_id", "text", dir)
      Bm25.appendIndex(spark, dir, docs.filter($"doc_id" === 3L ||
        $"doc_id" === 4L), "doc_id", "text")
      Bm25.appendIndex(spark, dir, docs.filter($"doc_id" >= 5L),
        "doc_id", "text")
      Bm25.deleteDocs(spark, dir, Seq(2L).toDF("doc_id"))
      val pre = Bm25.healthCard(spark, dir, maxSegments = 3)
        .collect().map(r => r.getString(0) ->
          (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4),
           r.getBoolean(5))).toMap
      // postings: 3 build/append segments; rows = distinct (doc, term)
      // over ALL six docs (doc 2's rows masked, not dropped)
      assert(pre("postings") == (3, 13L, 1L, 5L, true))
      // df: base + 2 append deltas + the delete's negative delta; the
      // delta rows are each slice's distinct terms (3+4+5+2)
      assert(pre("df") == (4, 14L, 1L, 5L, true))
      assert(pre("stats") == (1, 1L, 1L, 5L, true))
      assert(pre("tombstones") == (1, 1L, 1L, 5L, true))
      // masked fraction alone can flip it too: 1/6 > 0.1 even under a
      // generous segment budget
      assert(Bm25.healthCard(spark, dir, maxSegments = 100)
        .select("compact_recommended").head().getBoolean(0))
      Bm25.compactIndex(spark, dir)
      val post = Bm25.healthCard(spark, dir, maxSegments = 3)
        .collect().map(r => r.getString(0) ->
          (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4),
           r.getBoolean(5))).toMap
      assert(post.keySet == Set("postings", "df", "stats"))
      // doc 2's two postings rows and its 'green' df contribution are
      // physically gone; 'red' df down to docs 1/5
      assert(post("postings") == (1, 11L, 0L, 5L, false))
      assert(post("df") == (1, 6L, 0L, 5L, false))
      assert(post("stats") == (1, 1L, 0L, 5L, false))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
  }
}
