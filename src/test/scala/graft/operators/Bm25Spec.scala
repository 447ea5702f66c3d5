package graft.operators

import graft.SparkSpec

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

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
    val s1 = round6(score(tf = 2, dl = 3, df = 2, n = 3, avgdl = avgdl))
    val s3 = round6(score(tf = 1, dl = 1, df = 2, n = 3, avgdl = avgdl))
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
    // replay the term-sorted fold explicitly for doc 2
    val terms2 = Seq(
      "blue" -> score(1, 4, 2, 4, avgdl),
      "green" -> score(1, 4, 2, 4, avgdl),
      "red" -> score(2, 4, 2, 4, avgdl))
    val folded2 = round6(terms2.sortBy(_._1).map(_._2).foldLeft(0.0)(_ + _))
    assert(all(2L) == folded2)
    val top1 = Bm25.topK(docs, "doc_id", "text",
        Seq("q" -> Seq("red", "blue", "green")), k = 1)
      .collect()
    assert(top1.length == 1 && top1.head.getInt(1) == 1)
  }
}
