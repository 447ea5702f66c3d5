package graft.operators

import graft.SparkSpec

class BoilerplateSpec extends SparkSpec {
  import spark.implicits._

  test("scrub removes exactly the positions covered by hot bigrams") {
    // 3 docs, frac 0.6 → df threshold ceil(1.8) = 2: only "a b" (df=2)
    // is boilerplate
    val docs = Seq(
      (1L, "a b c a b"), // starts 0 and 3 are hot → covers {0,1,3,4}
      (2L, "a b x"),     // start 0 hot → covers {0,1}
      (3L, "p q r")      // clean
    ).toDF("doc_id", "text")
    val got = Boilerplate.scrub(docs, "doc_id", "text", n = 2, minDfFrac = 0.6)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (1L, 5, 4, "c"),
      (2L, 3, 2, "x"),
      (3L, 3, 0, "p q r")))
  }

  test("overlapping hot grams cover the union of their positions") {
    // both "x y" and "y z" hot (df=2 ≥ ceil(0.6·2)=2): doc 1 loses the
    // whole run, not 2·n double-counted tokens
    val docs = Seq(
      (1L, "x y z tail"),
      (2L, "x y pad y z")
    ).toDF("doc_id", "text")
    val got = Boilerplate.scrub(docs, "doc_id", "text", n = 2, minDfFrac = 0.6)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (1L, 4, 3, "tail"),
      (2L, 5, 4, "pad")))
  }

  test("docs shorter than n pass through untouched") {
    val docs = Seq((1L, "solo"), (2L, "solo"), (3L, "a b"), (4L, "a b"))
      .toDF("doc_id", "text")
    val got = Boilerplate.scrub(docs, "doc_id", "text", n = 2, minDfFrac = 0.5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (1L, 1, 0, "solo"), (2L, 1, 0, "solo"),
      (3L, 2, 2, ""), (4L, 2, 2, "")))
  }

  test("chunkWindows: stride/overlap cover every token, no overlap-only tail") {
    val text10 = (1 to 10).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, text10)).toDF("doc_id", "text")
    // window 4, overlap 1 → stride 3 → chunks start 0,3,6 cover 1..10?
    // starts 0,3,6: [t1..t4][t4..t7][t7..t10] = ceil((10-1)/3) = 3 chunks
    val got = Boilerplate.chunkWindows(docs, "doc_id", "text", window = 4,
        overlap = 1)
      .orderBy("chunk_idx").collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (0, 4, "t1 t2 t3 t4"),
      (1, 4, "t4 t5 t6 t7"),
      (2, 4, "t7 t8 t9 t10")))
  }

  test("chunkWindows: short docs yield one whole-doc chunk; boundaries exact") {
    val docs = Seq(
      (1L, "a b"),                                // len < overlap
      (2L, (1 to 4).map("w" + _).mkString(" ")),  // len == window
      (3L, (1 to 5).map("w" + _).mkString(" "))   // len == window + 1
    ).toDF("doc_id", "text")
    val got = Boilerplate.chunkWindows(docs, "doc_id", "text", window = 4,
        overlap = 2)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (1L, 0, 2, "a b"),
      (2L, 0, 4, "w1 w2 w3 w4"),
      (3L, 0, 4, "w1 w2 w3 w4"),
      (3L, 1, 3, "w3 w4 w5")))
  }

  test("hot set stays within the pigeonhole bound on real data") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Boilerplate.scrub(docs, "doc_id", "text").collect()
    assert(out.length == docs.count())
    // every removal is consistent: n_removed ≤ n_tokens and the rebuilt
    // text has exactly n_tokens − n_removed tokens
    out.foreach { r =>
      val (nt, nr, txt) = (r.getInt(1), r.getInt(2), r.getString(3))
      assert(nr >= 0 && nr <= nt)
      val kept = if (txt.isEmpty) 0 else txt.split(" ").length
      assert(kept == nt - nr, s"doc ${r.getLong(0)}")
    }
  }

  test("lineDedup keeps only the first global occurrence of each line") {
    // span 2 → lines: doc1 = [a b][c d][a b]  (3rd repeats 1st in-doc)
    //                 doc2 = [a b][x y]       (line 0 loses to doc1)
    //                 doc3 = [c d]            (loses to doc1 line 1)
    //                 doc4 = [z]              (short doc, unique)
    val docs = Seq(
      (1L, "a b c d a b"),
      (2L, "a b x y"),
      (3L, "c d"),
      (4L, "z")
    ).toDF("doc_id", "text")
    val got = Boilerplate.lineDedup(docs, "doc_id", "text", span = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(got.toSeq == Seq(
      (1L, 3, 1, "a b c d"),
      (2L, 2, 1, "x y"),
      (3L, 1, 1, ""),
      (4L, 1, 0, "z")))
  }

  test("scrub of a fully-covered doc yields '' (never NULL)") {
    // both docs are the same single bigram → df 2 ≥ ceil(0.06·2) = 1:
    // every position covered, scrubbed text must be the EMPTY STRING
    // (the defined semantic; DuckDB's array_to_string([]) is NULL, so
    // the oracle coalesces — this pins the engine side)
    val docs = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    val out = Boilerplate.scrub(docs, "doc_id", "text", n = 2,
        minDfFrac = 0.06)
      .orderBy("doc_id").collect()
    assert(out.forall(r => r.getInt(2) == 2 && r.getString(3) == ""),
      out.mkString(","))
  }

  test("lineDedup plans the skew-immune shape: agg keeper, no line window") {
    val docs = Seq((1L, "a b c d"), (2L, "a b x y")).toDF("doc_id", "text")
    val out = Boilerplate.lineDedup(docs, "doc_id", "text", span = 2)
    out.count()
    // no WindowExec anywhere (the window form would serialize hot
    // lines); keeper selection must stay a partial-aggregable groupBy
    val nodes = Bucketing.physicalNodes(out)
    assert(!nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
      out.queryExecution.executedPlan.toString)
  }
}
