package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests for the round-8 corpus operators against local
  * brute-force references independent of the Spark plans: chunking
  * must tile documents exactly, the boilerplate scrub must equal a
  * straight-line recomputation, and BM25 must equal the scalar
  * formula replayed in the same fold order — for any input shape,
  * including the tiny/degenerate docs the parquet corpus never has.
  */
class Round8PropertySpec extends SparkSpec {
  import spark.implicits._

  private val word: Gen[String] = Gen.oneOf(
    "a", "b", "c", "dd", "eee", "tok", "zz")
  private def docGen(maxLen: Int): Gen[String] =
    Gen.chooseNum(1, maxLen).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" ")))

  test("property: chunkWindows tiles every doc exactly (cover + overlap)") {
    val gen = for {
      docs <- Gen.listOfN(6, docGen(40))
      window <- Gen.chooseNum(2, 12)
      overlap <- Gen.chooseNum(0, 10) if overlap < window
    } yield (docs, window, overlap)
    val prop = Prop.forAll(gen) { case (docs, window, overlap) =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = Boilerplate.chunkWindows(df, "doc_id", "text", window, overlap)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
        .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
      val stride = window - overlap
      docs.zipWithIndex.forall { case (t, i) =>
        val toks = t.split(" ", -1)
        val chunks = got(i.toLong)
        // chunk k = toks[k·stride, k·stride + window)
        val shapeOk = chunks.forall { case (_, k, n, ct) =>
          val exp = toks.slice(k * stride, k * stride + window)
          n == exp.length && ct == exp.mkString(" ")
        }
        // contiguous indices from 0, full coverage, no overlap-only tail
        val ks = chunks.map(_._2)
        val covered = chunks.map { case (_, k, n, _) => k * stride + n }.max
        shapeOk && ks.sameElements(ks.indices) &&
          covered == toks.length &&
          (chunks.length == 1 ||
            chunks.last._2 * stride + overlap < toks.length)
      }
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(r.passed, r.status.toString)
  }

  test("property: boilerplate scrub = straight-line recomputation") {
    val gen = for {
      docs <- Gen.listOfN(8, docGen(12))
      frac <- Gen.oneOf(0.2, 0.4, 0.6)
    } yield (docs, frac)
    val prop = Prop.forAll(gen) { case (docs, frac) =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = Boilerplate.scrub(df, "doc_id", "text", n = 2, minDfFrac = frac)
        .collect()
        .map(r => (r.getLong(0), (r.getInt(1), r.getInt(2), r.getString(3))))
        .toMap
      // reference: df per bigram over distinct docs, hot = df >= ceil
      val tokss = docs.map(_.split(" ", -1))
      val grams = tokss.map(ts => ts.sliding(2).filter(_.length == 2)
        .map(_.mkString(" ")).toVector)
      val dfm = grams.flatMap(_.distinct).groupBy(identity).view
        .mapValues(_.size).toMap
      val th = math.ceil(frac * docs.length)
      docs.indices.forall { i =>
        val toks = tokss(i)
        val covered = grams(i).zipWithIndex.collect {
          case (g, p) if dfm(g) >= th => Seq(p, p + 1)
        }.flatten.toSet
        val kept = toks.indices.filterNot(covered).map(toks)
        got(i.toLong) == ((toks.length, covered.size, kept.mkString(" ")))
      }
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(r.passed, r.status.toString)
  }

  test("property: semDedup = brute-force in-cell scan on planted clusters") {
    def round6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val vecGen: Gen[Array[Float]] = Gen.listOfN(8,
      Gen.chooseNum(-5, 5).map(_.toFloat)).map(_.toArray)
    val gen = for {
      base <- Gen.listOfN(10, vecGen)
      cells <- Gen.listOfN(10, Gen.chooseNum(0, 2))
    } yield base.zip(cells)
    val prop = Prop.forAll(gen) { rows =>
      val parts = rows.zipWithIndex.map { case ((e, c), i) => (i.toLong, c, e) }
      val df = parts.map { case (id, c, e) => (id, c, e.toSeq) }
        .toDF("vec_id", "label", "embedding")
      val got = VectorSearch.semDedup(df, 0.9, dim = 8)
        .collect()
        .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getBoolean(3))))
        .toMap
      def cos(a: Array[Float], b: Array[Float]): Double = {
        def dot(x: Array[Float], y: Array[Float]) =
          x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
        dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
      }
      parts.forall { case (id, c, e) =>
        val nDups = parts.count { case (id2, c2, e2) =>
          id2 < id && c2 == c && {
            val raw = cos(e2, e)
            // zero vectors yield NaN — never a pair (kernel guard)
            !raw.isNaN && raw >= 0.9 - 1e-6 && round6(raw) >= 0.9
          }
        }.toLong
        got(id) == ((c, nDups, nDups == 0))
      }
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(r.passed, r.status.toString)
  }

  test("property: bm25 topK = scalar formula under quantized-long summation") {
    val gen = for {
      docs <- Gen.listOfN(7, docGen(15))
      terms <- Gen.someOf(Seq("a", "b", "tok", "zz")).map(_.toList)
      if terms.nonEmpty
    } yield (docs, terms)
    val prop = Prop.forAll(gen) { case (docs, terms) =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = Bm25.topK(df, "doc_id", "text", Seq("q" -> terms), k = 100)
        .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
        .sortBy(_._1).toList
      val tokss = docs.map(_.split(" ", -1))
      val n = docs.length.toLong
      val avgdl = tokss.map(_.length).sum.toDouble / n
      val dfm = terms.map(t =>
        t -> tokss.count(_.contains(t)).toLong).toMap
      val scores = docs.indices.flatMap { i =>
        val toks = tokss(i)
        val per = terms.sorted.flatMap { t =>
          val tf = toks.count(_ == t).toLong
          if (tf == 0 || dfm(t) == 0) None
          else {
            val idf = (n - dfm(t) + 0.5) / (dfm(t) + 0.5)
            Some(idf * (tf * (1.2 + 1.0)) /
              (tf + 1.2 * ((1.0 - 0.75) + 0.75 * (toks.length / avgdl))))
          }
        }
        if (per.isEmpty) None
        else Some(i.toLong ->
          per.map(s => math.floor(s * 1e6).toLong).sum.toDouble / 1e6)
      }
      val expected = scores.sortBy { case (id, s) => (-s, id) }
        .zipWithIndex.map { case ((id, s), r) => (r + 1, id, s) }.toList
      got == expected
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(r.passed, r.status.toString)
  }
}
