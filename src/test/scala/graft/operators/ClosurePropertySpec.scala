package graft.operators

import graft.SparkSpec
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property test: the distributed closure equals a local all-paths
  * reference on random small graphs. Fewer iterations than usual —
  * each case runs 6 Spark jobs.
  */
class ClosurePropertySpec extends SparkSpec {
  import spark.implicits._

  private val levels = 4
  private val threshold = 0.4

  /** Local reference: hop-bounded max-product DP over the bidirectional
    * graph with prefix pruning — independent of the Spark code. */
  private def localClosure(edges: Seq[(Long, Long, Double)],
                           seeds: Seq[Long]): Map[(Long, Long), Double] = {
    val bi = edges ++ edges.map { case (s, d, w) => (d, s, w) }
    val best = scala.collection.mutable.Map[(Long, Long), Double]()
    seeds.foreach(s => best((s, s)) = 1.0)
    var frontier: Map[(Long, Long), Double] = seeds.map(s => (s, s) -> 1.0).toMap
    for (_ <- 1 to levels) {
      val next = scala.collection.mutable.Map[(Long, Long), Double]()
      for (((seed, node), str) <- frontier; (s, d, w) <- bi if s == node) {
        val ns = str * w
        if (ns > threshold && ns > next.getOrElse((seed, d), 0.0))
          next((seed, d)) = ns
      }
      next.foreach { case (k, v) =>
        if (v > best.getOrElse(k, 0.0)) best(k) = v
      }
      frontier = next.toMap
    }
    best.toMap
  }

  test("property: distributed closure = local all-paths reference") {
    val edgeGen = for {
      s <- Gen.choose(0L, 5L)
      d <- Gen.choose(0L, 5L) if d != s
      w <- Gen.choose(50, 99).map(_ / 100.0)
    } yield (s, d, w)
    val graphGen = Gen.listOfN(6, edgeGen)
    val prop = Prop.forAll(graphGen) { edges =>
      val seeds = Seq(0L, 3L)
      val expected = localClosure(edges, seeds)
        .map { case (k, v) => k -> (math.rint(v * 1e9) / 1e9) }
      val actual = EquivalencyClosure.closure(
          edges.toDF("src", "dst", "strength"), seeds.toDF("seed"),
          levels, threshold)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> (math.rint(r.getDouble(2) * 1e9) / 1e9))
        .toMap
      actual == expected
    }
    val result = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(result.passed, result.status.toString)
  }
}
