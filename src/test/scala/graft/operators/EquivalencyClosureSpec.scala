package graft.operators

import graft.SparkSpec

class EquivalencyClosureSpec extends SparkSpec {
  import spark.implicits._

  private def result(edges: Seq[(Long, Long, Double)], seeds: Seq[Long],
                     levels: Int = 6, threshold: Double = 0.5) =
    EquivalencyClosure.closure(
      edges.toDF("src", "dst", "strength"),
      seeds.toDF("seed"), levels, threshold)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), math.rint(r.getDouble(2) * 1e9) / 1e9))
      .toSet

  test("single edge, both directions") {
    val r = result(Seq((1L, 2L, 0.9)), Seq(1L, 2L))
    assert(r == Set((1L, 1L, 1.0), (1L, 2L, 0.9), (2L, 2L, 1.0), (2L, 1L, 0.9)))
  }

  test("strength multiplies along the path and the gate prunes") {
    // 1 -0.9- 2 -0.8- 3 -0.7- 4 : 1→3 = 0.72, 1→4 = 0.504 > 0.5 stays;
    // with threshold 0.6, 1→4 (0.504) and 3-hop returns are pruned.
    val edges = Seq((1L, 2L, 0.9), (2L, 3L, 0.8), (3L, 4L, 0.7))
    val r = result(edges, Seq(1L), threshold = 0.6)
    assert(r.map(t => (t._2, t._3)) ==
      Set((1L, 1.0), (2L, 0.9), (3L, 0.72)))
  }

  test("max strength wins when two paths reach the same node") {
    // 1→4 directly at 0.6; 1→2→3→4 at 0.9*0.9*0.9 = 0.729 — the longer
    // path is stronger and must win.
    val edges = Seq((1L, 4L, 0.6), (1L, 2L, 0.9), (2L, 3L, 0.9), (3L, 4L, 0.9))
    val r = result(edges, Seq(1L))
    assert(r.contains((1L, 4L, 0.729)))
  }

  test("level bound stops traversal") {
    // chain of 4 strong edges, levels=2 → nodes beyond 2 hops unreachable
    val edges = Seq((1L, 2L, 0.99), (2L, 3L, 0.99), (3L, 4L, 0.99), (4L, 5L, 0.99))
    val r = result(edges, Seq(1L), levels = 2)
    assert(r.map(_._2) == Set(1L, 2L, 3L))
  }

  test("disconnected seed yields only itself") {
    val r = result(Seq((1L, 2L, 0.9)), Seq(7L))
    assert(r == Set((7L, 7L, 1.0)))
  }
}
