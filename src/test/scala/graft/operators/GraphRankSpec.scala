package graft.operators

import graft.SparkSpec

class GraphRankSpec extends SparkSpec {
  import spark.implicits._

  /** Scalar replay of the exact-integer iteration. */
  private def reference(edges: Seq[(Long, Long)], iters: Int,
                        unit: Long = 1000000000000L): Map[Long, Long] = {
    val w = edges.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val outw = w.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.length.toLong
    val base = ((unit * 3L) / 20L) / n
    var r = nodes.map(_ -> unit / n).toMap
    for (_ <- 1 to iters) {
      val s = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      for (((a, b), m) <- w) s(b) += (r(a) / outw(a)) * m
      r = nodes.map(v => v -> (base + (s(v) * 17L) / 20L)).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    GraphRank.pageRank(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("uniform cycle is a fixed point of the integer iteration") {
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val got = run(cycle, 3)
    assert(got == Map(1L -> 333333333333L, 2L -> 333333333333L,
                      3L -> 333333333333L))
  }

  test("hub, dangling node, and multi-edges match the scalar replay") {
    val edges = Seq(
      (2L, 1L), (3L, 1L), (4L, 1L),       // star into 1 (1 is dangling)
      (2L, 3L), (2L, 3L),                 // parallel edges as weight
      (3L, 4L), (4L, 2L))
    for (iters <- Seq(1, 3, 5))
      assert(run(edges, iters) == reference(edges, iters), s"iters=$iters")
  }

  test("mass never exceeds the unit and ranks are positive") {
    val edges = (1L to 40L).map(i => (i, i * 7 % 40 + 1))
    val got = run(edges, 3)
    assert(got.values.forall(_ > 0))
    assert(got.values.sum <= 1000000000000L)
  }

  test("guards: iteration bounds and empty graph") {
    intercept[IllegalArgumentException] {
      GraphRank.pageRank(Seq((1L, 2L)).toDF("src", "dst"), "src", "dst", 0) }
    intercept[IllegalArgumentException] {
      GraphRank.pageRank(
        Seq.empty[(Long, Long)].toDF("src", "dst"), "src", "dst", 3) }
  }
}
