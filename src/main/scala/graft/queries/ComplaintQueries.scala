package graft.queries

import graft.{Env, Q}
import graft.syntax._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Complaint-report queries (ref `scripts.py:227-233` get_one over
  * Complaint by (license_pool, source, type); `scripts.py:356-365`
  * resolve_local_complaints' filter chain — pool + source + type +
  * resolved IS NULL). The complaints table is modeled
  * deterministically from lineitem (one complaint per line item,
  * pool = order), license pools from orders — the established
  * synthetic-source pattern (see SnapshotQueries).
  *
  * Scale posture: complaint rollups are plain grouped aggregates on
  * the complaint FK (one shuffle, map-side partials); the pool join
  * joins two tables pre-aggregated to pool grain.
  */
object ComplaintQueries {

  /** Synthetic complaints: (complaint_id, pool_id, source, type,
    * resolved?) — source/type/resolution from fixed moduli. */
  private def complaints(env: Env): DataFrame =
    env.lineitem.select(
      ($"l_orderkey" * 10 + $"l_linenumber").as("complaint_id"),
      $"l_orderkey".as("pool_id"),
      concat(lit("source-"), $"l_partkey" % 3).as("source"),
      concat(lit("type-"), $"l_suppkey" % 4).as("type"),
      when($"l_linenumber" % 2 === 0, concat(lit("2024-01-"),
          lpad(($"l_linenumber" % 28 + 1).cast("string"), 2, "0")))
        .otherwise(lit(null).cast("string")).as("resolved"))

  /** Complaint report (ref `scripts.py:227-233`): per (pool, source,
    * type) — the get_one('interchangeable') representative (min
    * complaint id), total and unresolved counts, joined to the pool's
    * order metadata. Top pools only (≥ 4 complaints) to keep the
    * report the reference's "needs attention" shape. */
  def complaintReport(env: Env): DataFrame = {
    val byKey = complaints(env)
      .groupBy($"pool_id", $"source", $"type")
      .agg(min($"complaint_id").as("representative_id"),
           count(lit(1)).as("n_complaints"),
           count(when($"resolved".isNull, 1)).as("n_unresolved"))
    byKey.filter($"n_complaints" >= 4)
      .join(env.orders.select($"o_orderkey".as("pool_id"), $"o_custkey"),
            "pool_id")
      .select($"pool_id", $"source", $"type", $"representative_id",
              $"n_complaints", $"n_unresolved", $"o_custkey")
      .orderBy($"pool_id", $"source", $"type")
  }

  /** Local-complaint resolution (ref `scripts.py:356-365`): the exact
    * filter chain — complaints of THE parent source/type on a pool
    * with resolved IS NULL — marked resolved with a fixed "now"
    * (deterministic stand-in for utc_now). */
  def complaintResolution(env: Env): DataFrame =
    complaints(env)
      .filter($"source" === "source-1" && $"type" === "type-2" &&
              $"resolved".isNull)
      .select($"complaint_id", $"pool_id",
              lit("2024-02-01T00:00:00Z").as("resolved"))
      .orderBy($"complaint_id")

  val entries: Seq[Q] = Seq(
    Q.sql("m9_complaint_report", complaintReport,
      """WITH c AS (
        |  SELECT l_orderkey * 10 + l_linenumber AS complaint_id,
        |    l_orderkey AS pool_id,
        |    'source-' || (l_partkey % 3) AS source,
        |    'type-' || (l_suppkey % 4) AS type,
        |    CASE WHEN l_linenumber % 2 = 0
        |         THEN '2024-01-' || lpad(CAST(l_linenumber % 28 + 1 AS VARCHAR), 2, '0')
        |         END AS resolved
        |  FROM lineitem),
        |byKey AS (
        |  SELECT pool_id, source, type,
        |    CAST(min(complaint_id) AS BIGINT) AS representative_id,
        |    CAST(count(*) AS BIGINT) AS n_complaints,
        |    CAST(count(CASE WHEN resolved IS NULL THEN 1 END) AS BIGINT)
        |      AS n_unresolved
        |  FROM c GROUP BY pool_id, source, type)
        |SELECT pool_id, source, type, representative_id,
        |       n_complaints, n_unresolved, o_custkey
        |FROM byKey JOIN orders ON pool_id = o_orderkey
        |WHERE n_complaints >= 4
        |ORDER BY pool_id, source, type""".stripMargin),

    Q.sql("m9_complaint_resolution", complaintResolution,
      """WITH c AS (
        |  SELECT l_orderkey * 10 + l_linenumber AS complaint_id,
        |    l_orderkey AS pool_id,
        |    'source-' || (l_partkey % 3) AS source,
        |    'type-' || (l_suppkey % 4) AS type,
        |    CASE WHEN l_linenumber % 2 = 0 THEN 'r' END AS resolved
        |  FROM lineitem)
        |SELECT complaint_id, pool_id, '2024-02-01T00:00:00Z' AS resolved
        |FROM c
        |WHERE source = 'source-1' AND type = 'type-2' AND resolved IS NULL
        |ORDER BY complaint_id""".stripMargin),
  )
}
