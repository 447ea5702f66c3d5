package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over an edge list — the canonical iterative distributed
  * computation (power iteration), in EXACT INTEGER arithmetic so a
  * fixed-iteration run is bit-identical across engines and partition
  * orders:
  *
  *  - ranks live in micro-units of `unit` (default 10⁻¹² of total
  *    mass): init r = unit div N;
  *  - an edge a→b with multiplicity w contributes (r(a) div out(a))·w
  *    where out(a) = Σ multiplicities — integral division, exact;
  *  - damping 0.85 is applied as the RATIONAL 17/20:
  *    r' = ((unit·3 div 20) div N) + (Σ contribs · 17) div 20.
  *
  * Every operation is integer division/multiplication/summation —
  * associative and engine-portable, so partial aggregation reorders
  * freely and a SQL oracle replays the whole iteration unrolled. The
  * classic floating PageRank needs a tolerance; this one needs ==.
  * Rounding dust (≤ 1 micro-unit per div) and dangling-node mass
  * evaporate instead of redistributing — the standard edge-list
  * simplification, identical in both engines.
  *
  * Scale shape: per iteration one broadcast-or-shuffle join of ranks
  * onto edges plus one map-side-combinable sum by dst — the shape
  * that holds on a billion-edge graph (ranks and out-degrees are
  * node-sized; edges never re-shuffle once bucketed by src). Ranks
  * are lazily checkpointed per sweep so iteration k doesn't replay
  * k−1 plans (the [[EquivalencyClosure]] discipline). The node COUNT
  * is the one driver-side scalar (it sizes the init literal — the
  * documented tiny-side contract).
  */
object GraphRank {

  /** @param edges  directed edge list; parallel edges act as weights.
    * @return (node, rank_mu, rank): rank_mu exact in `unit`ths,
    *         rank = rank_mu / unit for display.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int = 3,
               unit: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1 && iterations <= 20,
      s"GraphRank: iterations must be in [1, 20], got $iterations")
    val e = edges
      .groupBy(col(srcCol).cast("long").as("src"),
               col(dstCol).cast("long").as("dst"))
      .agg(count(lit(1)).as("w"))
      .localCheckpoint(eager = false)
    val outw = e.groupBy(col("src")).agg(sum(col("w")).as("outw"))
      .localCheckpoint(eager = false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(eager = false)
    val n = nodes.count()
    require(n > 0, "GraphRank: empty graph")
    val base = ((unit * 3L) / 20L) / n
    var ranks = nodes.select(col("node"), lit(unit / n).as("r"))
    for (_ <- 1 to iterations) {
      val contrib = e.join(outw, "src")
        .join(ranks.select(col("node").as("src"), col("r")), "src")
        .select(col("dst"), expr("(r div outw) * w").as("c"))
      val summed = contrib.groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = nodes
        .join(summed.select(col("dst").as("node"), col("s")), Seq("node"),
              "left")
        .select(col("node"),
          expr(s"${base}L + (coalesce(s, cast(0 as bigint)) * 17) div 20")
            .as("r"))
        .localCheckpoint(eager = false)
    }
    ranks.select(col("node"), col("r").as("rank_mu"),
      (col("r").cast("double") / unit).as("rank"))
  }
}
