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
}
