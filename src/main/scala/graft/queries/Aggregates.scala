package graft.queries

import graft.{Env, Q}
import graft.syntax._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Aggregator operators A5/A6/A8/A9 and the T2 updates-feed slice from
  * SURVEY.md §2.4/§2.9 — all single- or two-shuffle shapes with map-side
  * partial aggregation; nothing materializes unbounded state.
  */
object Aggregates {

  /** A5 most-common-1 / nested counters (ref `viaf.py:533-539`,
    * `viaf.py:613-614`): the dominant return flag per supplier = two
    * chained grouped aggs + a per-group top-1 window, ties broken
    * lexicographically. */
  def a5MostCommon(env: Env): DataFrame = {
    val counts = env.lineitem
      .groupBy($"l_suppkey", $"l_returnflag")
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy($"l_suppkey").orderBy($"cnt".desc, $"l_returnflag".asc)
    counts
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"l_suppkey", $"l_returnflag".as("top_flag"), $"cnt")
      .orderBy($"l_suppkey")
  }

  /** A6 demand rollup + popularity estimate (ref `content_cafe.py:384-423`):
    * roll order value up to (customer, year, month), then estimate
    * popularity as max(recent demand, 0.5 × lifetime max). Two grouped
    * aggs; the second reuses the first's partitioning key prefix.
    * The `× 0.5` of a 2-decimal value lands exactly on .xx5 rounding
    * ties, where double rounding is engine-dependent — so demand is
    * fixed to DECIMAL(18,2) first and the half-scale product stays in
    * exact decimal arithmetic until the final round (half-up in both
    * Spark and DuckDB), then cast back to double. */
  def a6DemandRollup(env: Env): DataFrame = {
    val monthly = env.orders
      .groupBy($"o_custkey",
               (year($"o_orderdate") * 100 + month($"o_orderdate")).as("ym"))
      .agg(sum($"o_totalprice").cast("decimal(18,2)").as("demand"))
    val zero = lit(BigDecimal(0)).cast("decimal(18,2)")
    // Round the half-scale product back to DECIMAL(18,2) BEFORE greatest:
    // mixed-scale decimal greatest promotes to DOUBLE in some engines
    // (DuckDB), reintroducing the tie.
    val half = round(
      coalesce(max($"demand"), zero) * lit(BigDecimal(0.5)).cast("decimal(2,1)"), 2)
      .cast("decimal(18,2)")
    monthly
      .groupBy($"o_custkey")
      .agg(greatest(coalesce(max(when($"ym" >= 200001, $"demand")), zero), half)
        .cast("double").as("popularity"))
      .orderBy($"o_custkey")
  }

  /** A8 percentile calibration (ref `bin/util/calculate_percentile:1-28`):
    * exact interpolated quartiles of order value per status. Uses Spark's
    * exact `percentile` (sort-based within group), not percentile_approx,
    * because the oracle (quantile_cont) is exact — at 100 TB swap to
    * percentile_approx with a documented error bound. */
  def a8Percentile(env: Env): DataFrame =
    env.orders
      .groupBy($"o_orderstatus")
      .agg(
        round(expr("percentile(o_totalprice, 0.25)"), 2).as("p25"),
        round(expr("percentile(o_totalprice, 0.50)"), 2).as("p50"),
        round(expr("percentile(o_totalprice, 0.75)"), 2).as("p75"))
      .orderBy($"o_orderstatus")

  /** A8's 100 TB form — sketch aggregates with their accuracy contract
    * gated by the oracle: HyperLogLog++ count-distinct (rsd 5%) and
    * Greenwald-Khanna approx_percentile (rank error ≤ 1/10000) over
    * lineitem, each compared in-query against the exactly-computed
    * value, emitting contract booleans the DuckDB oracle pins to TRUE
    * (plus the exact counts, which it recomputes). Both sketches are
    * deterministic for a given dataset (no RNG), so a contract breach
    * flips a boolean and hash-fails — falsifiable, not decorative.
    * At 100 TB the sketch IS the plan (fixed-size mergeable state, one
    * pass — countDistinct shuffles every distinct key; the HLL
    * shuffles 2¹⁴ buckets per group); the exact legs exist here to
    * grade it. Bounds: |HLL − exact| ≤ 15% (3 rsd); the empirical rank
    * of the approx median within [0.48, 0.52] (sketch ε plus tie
    * slack).
    */
  def a8SketchRollup(env: Env): DataFrame = {
    // sketches and the exact-distinct grader aggregate SEPARATELY: a
    // distinct aggregate alongside non-distinct ones plans through
    // Expand (row duplication + multi-phase agg), which would drag the
    // large percentile buffers through every phase — measured 20×
    // slower fused than split (40 s vs 2 s warm at sf0.1)
    val sketches = env.lineitem.groupBy($"l_returnflag").agg(
      approx_count_distinct($"l_orderkey").as("acd"),
      expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("ap50"),
      count(lit(1)).as("n_rows"))
    val exact = env.lineitem.groupBy($"l_returnflag")
      .agg(countDistinct($"l_orderkey").as("n_exact"))
    val groups = sketches.join(exact, "l_returnflag")
    val rank = env.lineitem.select($"l_returnflag", $"l_extendedprice")
      .join(broadcast(groups), "l_returnflag")
      .groupBy($"l_returnflag", $"acd", $"ap50", $"n_exact", $"n_rows")
      .agg(sum(when($"l_extendedprice" <= $"ap50", 1L).otherwise(0L)).as("n_le"))
    rank.select($"l_returnflag", $"n_exact",
        (abs($"acd" - $"n_exact") <= $"n_exact" * 0.15).as("hll_within_3sd"),
        ($"n_le".cast("double") / $"n_rows").between(0.48, 0.52)
          .as("p50_rank_ok"))
      .orderBy($"l_returnflag")
  }

  /** A9 delta counters (ref `linked_data.py:1063-1070` per-run counters):
    * event counts by type since a watermark. `ts` is ns-since-epoch long
    * (see Env); 1705276800e9 = 2024-01-15T00:00:00Z. */
  def a9DeltaCounters(env: Env): DataFrame =
    env.events
      .filter($"ts" >= lit(1705276800000000000L))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_new"))
      .orderBy($"event_type")

  /** T2 updates feed (ref `controller.py:412-489`; SURVEY §7's minimum
    * end-to-end slice): entities updated since a watermark ⋈ their
    * parent, with opensearch-style total count, first page of 35.
    * The total is computed once and broadcast; the page is TakeOrdered
    * (no global sort materialization). */
  def t2UpdatesFeed(env: Env): DataFrame = {
    val updated = env.orders
      .filter($"o_orderdate" >= lit("2000-01-01").cast("timestamp"))
    val total = updated.agg(count(lit(1)).as("total_results"))
    graft.operators.PlanHints.withScalars(
        updated.join(env.customer, $"o_custkey" === $"c_custkey"), total)
      .select($"o_orderkey",
              date_format($"o_orderdate", "yyyy-MM-dd").as("updated"),
              $"c_name", $"total_results")
      .orderBy($"o_orderkey")
      .limit(35)
  }

  val entries: Seq[Q] = Seq(
    Q.sql("a5_most_common", a5MostCommon,
      """SELECT l_suppkey, l_returnflag AS top_flag, cnt
        |FROM (
        |  SELECT l_suppkey, l_returnflag, count(*) AS cnt,
        |         row_number() OVER (PARTITION BY l_suppkey
        |                            ORDER BY count(*) DESC, l_returnflag ASC) AS rn
        |  FROM lineitem GROUP BY l_suppkey, l_returnflag)
        |WHERE rn = 1
        |ORDER BY l_suppkey""".stripMargin),

    Q.sql("a6_demand_rollup", a6DemandRollup,
      """WITH monthly AS (
        |  SELECT o_custkey,
        |         year(o_orderdate) * 100 + month(o_orderdate) AS ym,
        |         CAST(sum(o_totalprice) AS DECIMAL(18,2)) AS demand
        |  FROM orders GROUP BY 1, 2)
        |SELECT o_custkey,
        |       CAST(greatest(
        |         COALESCE(max(CASE WHEN ym >= 200001 THEN demand END),
        |                  CAST(0 AS DECIMAL(18,2))),
        |         CAST(round(COALESCE(max(demand), CAST(0 AS DECIMAL(18,2)))
        |           * CAST(0.5 AS DECIMAL(2,1)), 2) AS DECIMAL(18,2))) AS DOUBLE)
        |         AS popularity
        |FROM monthly GROUP BY o_custkey
        |ORDER BY o_custkey""".stripMargin),

    Q.sql("a8_percentile", a8Percentile,
      """SELECT o_orderstatus,
        |  round(quantile_cont(o_totalprice, 0.25), 2) AS p25,
        |  round(quantile_cont(o_totalprice, 0.50), 2) AS p50,
        |  round(quantile_cont(o_totalprice, 0.75), 2) AS p75
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin),

    Q.sql("a8_sketch_rollup", a8SketchRollup,
      """SELECT l_returnflag,
        |       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_exact,
        |       TRUE AS hll_within_3sd,
        |       TRUE AS p50_rank_ok
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin),

    Q.sql("a9_delta_counters", a9DeltaCounters,
      """SELECT event_type, count(*) AS n_new
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin),

    Q.sql("t2_updates_feed", t2UpdatesFeed,
      """WITH updated AS (
        |  SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '2000-01-01')
        |SELECT o_orderkey,
        |       strftime(o_orderdate, '%Y-%m-%d') AS updated,
        |       c_name,
        |       (SELECT count(*) FROM updated) AS total_results
        |FROM updated JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey
        |LIMIT 35""".stripMargin),
  )
}
