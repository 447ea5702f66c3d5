package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CanonicalizeSpec extends SparkSpec {
  import spark.implicits._

  private val contributors = Seq(
    ("Ursula Le Guin", "Le Guin, Ursula"),
    ("Charles Baxter", "Baxter, Charles"),
    ("Chuck Baxters", "Baxters, Chuck"))
    .toDF("display_name", "sort_name")

  private def run(requests: (Long, String)*) =
    Canonicalize.canonicalizeSortNames(
        requests.toDF("request_id", "display_name"), contributors,
        name => substring(name, 1, 4))
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(2), r.getString(3)))).toMap

  test("exact match wins and reports method=exact") {
    val out = run(1L -> "Charles Baxter")
    assert(out(1L) == ("Baxter, Charles", "exact"))
  }

  test("fuzzy stage resolves near-misses within the block") {
    val out = run(2L -> "Charlos Baxter") // 1 edit from Charles Baxter
    assert(out(2L) == ("Baxter, Charles", "fuzzy"))
  }

  test("heuristic fallback for unmatched names") {
    val out = run(3L -> "Toni Morrison")
    assert(out(3L) == ("Morrison, Toni", "heuristic"))
  }

  test("cascade resolves each request independently") {
    val out = run(1L -> "Ursula Le Guin", 2L -> "Ursulo Le Guin",
                  3L -> "Someone Quite Else")
    assert(out(1L)._2 == "exact")
    assert(out(2L)._2 == "fuzzy")
    assert(out(3L)._2 == "heuristic")
    assert(out(3L)._1 == "Else, Someone Quite")
  }
}
