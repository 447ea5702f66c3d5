package graft.queries

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests for the banded similarity joins: the geometric
  * length-band sub-blocking + bucket dedup rule + exact-dup grouping
  * must emit EXACTLY the all-pairs result — once each — for any input,
  * including the shapes the TPC-H oracle data never produces (empty
  * names, single-char names, extreme length gaps spanning many bands,
  * heavy duplication). The reference is a local brute-force loop over
  * all key pairs, independent of the Spark plan.
  */
class FunctionsPropertySpec extends SparkSpec {
  import spark.implicits._

  /** Spark's split(col, " ")(0): Java split with -1 limit keeps
    * leading/trailing empties. */
  private def tok0(s: String): String = s.split(" ", -1)(0)

  private def ratioOf(na: String, nb: String): Int =
    if (na == nb) 100
    else {
      val maxLen = math.max(na.length, nb.length)
      val lev = graft.functions.Fuzzy.levenshtein(na, nb)
      java.math.BigDecimal.valueOf(100.0 * (1.0 - lev.toDouble / maxLen))
        .setScale(0, java.math.RoundingMode.HALF_UP).intValue()
    }

  // names engineered for collisions: shared first tokens, near-misses
  // at the ratio-80 boundary, length spreads crossing band boundaries,
  // and supplementary-plane characters (U+1D552, 2 UTF-16 units each)
  // where code-point length and the kernel's String.length diverge —
  // the banding must measure the length the kernel measures
  private val astral = "𝕒" * 10
  private val nameGen: Gen[String] = for {
    base <- Gen.oneOf("alpha bay", "alpha bays", "alpha b", "b", "",
                      "alpha bay green olive", "alpha", " lead",
                      "t " + astral)
    suffix <- Gen.oneOf("", "x", "xx", " tail", "yyyyyyyyyyyyyyyy",
                        "aaaaa")
  } yield base + suffix

  private val tableGen: Gen[List[(String, String)]] =
    Gen.listOfN(14, for {
      name <- nameGen
      brand <- Gen.oneOf("B1", "B2")
    } yield (name, brand))

  test("property: banded f3 = brute-force all-pairs reference") {
    val prop = Prop.forAll(tableGen) { rows =>
      val parts = rows.zipWithIndex.map { case ((n, b), i) =>
        (i.toLong + 1, n, b)
      }
      val expected = (for {
        a <- parts; b <- parts
        if a._1 < b._1 && a._3 == b._3 && tok0(a._2) == tok0(b._2)
        r = ratioOf(a._2, b._2) if r >= 80
      } yield (a._1, b._1, a._2, b._2, r)).sorted
      val actual = Functions.f3Banded(
          parts.toDF("p_partkey", "p_name", "p_brand"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
                   r.getString(3), r.getInt(4)))
        .toList.sorted
      actual == expected
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(result.passed, result.status.toString)
  }

  private def strengthOf(na: String, nb: String,
                         sa: Seq[Long], sb: Seq[Long]): Double = {
    val ts =
      if (na == nb) 1.0
      else {
        val maxLen = math.max(na.length, nb.length)
        1.0 - graft.functions.Fuzzy.levenshtein(na, nb).toDouble / maxLen
      }
    val inter = sa.toSet.intersect(sb.toSet).size
    val union = sa.toSet.union(sb.toSet).size
    val as = inter.toDouble / union
    java.math.BigDecimal.valueOf(ts * 0.8 + as * 0.2)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  test("property: banded m5 = brute-force reference (incl. missing sups)") {
    val supsGen = Gen.someOf(1L to 6L).map(_.toList.sorted)
    val gen = for {
      rows <- tableGen
      sups <- Gen.listOfN(rows.length, Gen.option(supsGen))
    } yield (rows, sups)
    val prop = Prop.forAll(gen) { case (rows, sups) =>
      val parts = rows.zipWithIndex.map { case ((n, b), i) =>
        (i.toLong + 1, n, b)
      }
      // keys with None or empty sups never join (inner join on sups)
      val supsByKey = parts.map(_._1).zip(sups)
        .collect { case (k, Some(s)) if s.nonEmpty => k -> s }.toMap
      val joined = parts.filter(p => supsByKey.contains(p._1))
      val expected = (for {
        a <- joined; b <- joined
        if a._1 < b._1 && a._3 == b._3 && tok0(a._2) == tok0(b._2)
        s = strengthOf(a._2, b._2, supsByKey(a._1), supsByKey(b._1))
        if s > 0.5
      } yield (a._1, b._1, s)).sorted
      val actual = ScoringQueries.m5Banded(
          parts.toDF("p_partkey", "p_name", "p_brand"),
          supsByKey.toSeq.toDF("l_partkey", "sups"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toList.sorted
      actual == expected
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(result.passed, result.status.toString)
  }
}
