package graft.queries

import graft.{Env, Q}
import graft.syntax._
import graft.operators.EquivalencyClosure
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph/identity-resolution queries: the J9 equivalency closure (the
  * reference's identity-resolution core) over a deterministic synthetic
  * equivalency graph derived from the customer table.
  */
object Graph {

  /** Derived equivalency edges: every customer key links to
    * (key·3 + 7) mod N with strength 0.75 + (key mod 5)·0.05 ∈
    * [0.75, 0.95]. N = max key + 1 so the graph is closed over the
    * key space at every scale factor.
    */
  private def edges(env: Env): (DataFrame, Long) = {
    val n = env.customer.agg(max($"c_custkey")).head().getLong(0) + 1
    val e = env.customer.select(
      $"c_custkey".as("src"),
      (($"c_custkey" * 3 + 7) % n).as("dst"),
      (lit(0.75) + ($"c_custkey" % 5).cast("double") * 0.05).as("strength"))
    (e, n)
  }

  /** J9 — 6-level closure, threshold 0.5, seeds = every 100th key
    * (ref `scripts.py:494-495` levels=6; strength gate
    * `oclc/linked_data.py:823-827`). Oracle is a DuckDB recursive CTE
    * enumerating all ≤6-hop paths with the same prefix pruning.
    */
  def j9EquivClosure(env: Env): DataFrame = {
    val (e, _) = edges(env)
    val seeds = env.customer.filter($"c_custkey" % 100 === 0)
      .select($"c_custkey".as("seed"))
    EquivalencyClosure.closure(e, seeds, levels = 6, threshold = 0.5)
      .select($"seed", $"node", round($"strength", 6).as("strength"))
      .orderBy($"seed", $"node")
  }

  val entries: Seq[Q] = Seq(
    Q.sql("j9_equiv_closure", j9EquivClosure,
      """WITH RECURSIVE
        |edges AS (
        |  SELECT c_custkey AS src,
        |         (c_custkey * 3 + 7) % (SELECT max(c_custkey) + 1 FROM customer) AS dst,
        |         0.75 + (c_custkey % 5) * 0.05 AS strength
        |  FROM customer),
        |bi AS (
        |  SELECT src, dst, strength FROM edges
        |  UNION ALL
        |  SELECT dst, src, strength FROM edges),
        |paths(seed, node, strength, lvl) AS (
        |  SELECT c_custkey, c_custkey, CAST(1.0 AS DOUBLE), 0
        |  FROM customer WHERE c_custkey % 100 = 0
        |  UNION ALL
        |  SELECT p.seed, b.dst, p.strength * b.strength, p.lvl + 1
        |  FROM paths p JOIN bi b ON p.node = b.src
        |  WHERE p.lvl < 6 AND p.strength * b.strength > 0.5)
        |SELECT seed, node, round(max(strength), 6) AS strength
        |FROM paths
        |GROUP BY seed, node
        |ORDER BY seed, node""".stripMargin),
  )
}
