package graft.operators

import graft.SparkSpec

class UnimaxSpec extends SparkSpec {
  import spark.implicits._

  private def alloc(rows: Seq[(String, Long)], maxEpochs: Int = 2) =
    Unimax.epochAllocation(rows.toDF("src", "n"), "src", "n", maxEpochs)
      .orderBy("key").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getDouble(4)))

  test("skewed supplies: small domains fully capped, big ones waterlined") {
    // supplies 10/20/1000, budget = 1030, caps 20/40/2000.
    // Greedy replay: smallest cap 20 ≤ 1030/3 → full; next 40 ≤
    // (1010)/2 → full; remainder 970 to the big one (< its 2000 cap).
    val got = alloc(Seq(("a", 10L), ("b", 20L), ("c", 1000L)))
    assert(got.toSeq == Seq(
      ("a", 10L, 20L, 2.0), ("b", 20L, 40L, 2.0), ("c", 1000L, 970L, 0.97)))
  }

  test("uniform supplies: equal shares, remainder spread deterministically") {
    val got = alloc(Seq(("a", 100L), ("b", 100L), ("c", 100L), ("d", 101L)))
    // budget 401, no one fully capped (cap 200 > 401/4); share 100
    // each + 1 extra to the first in (cap, key) order
    assert(got.map(_._3).sum == 401L)
    assert(got.map(_._3).toSeq == Seq(101L, 100L, 100L, 100L))
  }

  test("conservation: sum of allocations equals the budget when caps allow") {
    val rows = Seq(("a", 7L), ("b", 13L), ("c", 29L), ("d", 101L), ("e", 3L))
    val got = alloc(rows)
    val budget = rows.map(_._2).sum
    assert(got.map(_._3).sum == budget)
    // every allocation respects its cap
    assert(got.forall { case (_, s, a, _) => a <= 2 * s })
  }
}
