package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J9 — bounded transitive closure over a weighted equivalency graph
  * (ref `Identifier.recursively_equivalent_identifier_ids` /
  * `equivalent_identifier_ids(levels=6, threshold=...)` usage at
  * `oclc/linked_data.py:960-962`, `scripts.py:494-495`; low-strength
  * edges gated at `oclc/linked_data.py:823-827`).
  *
  * Semantics: starting from each seed, follow equivalency edges in both
  * directions for at most `levels` hops. A path's strength is the product
  * of its edge strengths; paths are pruned as soon as the running product
  * drops to `threshold` or below (strengths are ≤ 1, so the running
  * product is monotonically non-increasing and this equals pruning on
  * final strength). The result keeps, per (seed, node), the maximum
  * strength over all surviving paths.
  *
  * Implementation: level-synchronous dynamic programming (Bellman-Ford
  * shape). `frontier(k)` holds the best strength per (seed, node) over
  * paths of EXACTLY k edges — sufficient state, because the best
  * (k+1)-edge path is some best k-edge path extended by one edge. Each
  * iteration is one shuffle (join on node + groupBy); `localCheckpoint`
  * truncates lineage so 6 iterations don't stack a 6-deep plan
  * (SURVEY.md §7 hard-part 1).
  *
  * 100 TB posture: state per iteration is bounded by (seeds × reachable
  * nodes), sharded by node key across executors; celebrity/hub nodes skew
  * the join — AQE skew handling applies, and the threshold gate keeps the
  * frontier shrinking after a few levels. No driver-side iteration state
  * beyond the loop counter.
  */
object EquivalencyClosure {

  /** @param edges   (src: long, dst: long, strength: double) — directed
    *                input rows; traversal treats them as undirected.
    * @param seeds   (seed: long) one row per starting identifier.
    * @param levels  maximum number of hops (reference default 6).
    * @param threshold path strengths must stay strictly above this.
    * @return (seed, node, strength) incl. the seed itself at strength 1.0.
    */
  def closure(edges: DataFrame, seeds: DataFrame,
              levels: Int = 6, threshold: Double = 0.5): DataFrame = {
    val bi = edges.select(col("src"), col("dst"), col("strength"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst"),
                                col("strength")))

    val seed0 = seeds.select(col("seed"), col("seed").as("node"),
                             lit(1.0).as("strength"))

    var best = seed0
    var frontier = seed0
    var lvl = 0
    while (lvl < levels && !frontier.isEmpty) {
      val next = step(frontier, bi, threshold).localCheckpoint(eager = false)
      best = best.unionByName(next)
      frontier = next
      lvl += 1
    }
    best.groupBy("seed", "node").agg(max("strength").as("strength"))
  }

  /** One Bellman-Ford level: extend `frontier` by a single edge hop,
    * prune at the threshold, keep the per-(seed, node) max. Exposed at
    * package level so ClosurePropertySpec can pin the skew behavior of
    * THIS join shape (the localCheckpoint in [[closure]] truncates the
    * per-level plan out of the final tree). */
  private[graft] def step(frontier: DataFrame, bi: DataFrame,
                          threshold: Double): DataFrame =
    frontier
      .join(bi, frontier("node") === bi("src"))
      .select(frontier("seed"), bi("dst").as("node"),
              (frontier("strength") * bi("strength")).as("strength"))
      .filter(col("strength") > threshold)
      .groupBy("seed", "node").agg(max("strength").as("strength"))
}
