package graft.operators

import graft.SparkSpec

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private def md5b(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(2)

  private def r4(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  test("weights replay the smoothed bucket-ratio ln-fold exactly") {
    val rows = Seq(
      (1L, "cat dog", true),
      (2L, "cat dog", false),
      (3L, "xyz qqq", false))
    val docs = rows.toDF("doc_id", "text", "t")

    def grams(text: String): Seq[String] = {
      val s = text.split(" ", -1).toSeq
      s ++ s.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
    }
    val all = rows.flatMap { case (_, tx, _) => grams(tx).map(md5b) }
    val tgt = rows.filter(_._3).flatMap { case (_, tx, _) => grams(tx).map(md5b) }
    val cr = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ct = tgt.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (totT, totR) = (tgt.size.toLong, all.size.toLong)
    def expected(text: String): Double = r4(
      grams(text).map { g =>
        val b = md5b(g)
        math.log(((ct.getOrElse(b, 0L) + 1).toDouble / (totT + 256).toDouble)
          / ((cr(b) + 1).toDouble / (totR + 256).toDouble))
      }.sum)

    val got = Dsir.importanceWeights(docs, "doc_id", "text", $"t" === true)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getInt(2), r.getDouble(3)))
    assert(got.map(_._3).toSeq == Seq(3, 3, 3)) // 2 unigrams + 1 bigram
    assert(got(0)._4 == expected("cat dog"))
    assert(got(1)._4 == expected("cat dog"))
    assert(got(2)._4 == expected("xyz qqq"))
    // same text scores the same either side of the membership flag;
    // the off-distribution doc scores strictly lower
    assert(got(0)._4 == got(1)._4 && got(2)._4 < got(0)._4)
  }

  test("single-token doc contributes no bigram; empty text still scores") {
    val docs = Seq((1L, "solo", true), (2L, "", false))
      .toDF("doc_id", "text", "t")
    val got = Dsir.importanceWeights(docs, "doc_id", "text", $"t")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(2)))
    // split("", " ") = [""] → one (empty-string) unigram — consistent
    // with the DuckDB oracle's string_split
    assert(got.toSeq == Seq((1L, 1), (2L, 1)))
  }
}
