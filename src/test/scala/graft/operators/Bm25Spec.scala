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
}
