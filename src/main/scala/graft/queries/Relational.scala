package graft.queries

import graft.Env
import graft.syntax._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Core relational query shapes from SURVEY.md §2.2 (filters/projections),
  * §2.3 (joins), §2.4 (aggregations), re-expressed over the driver's
  * testdata tables.
  *
  * Scale notes (100 TB posture):
  *  - Filters and projections are declared first so Catalyst pushes them
  *    into the parquet scan (PushedFilters / pruned ReadSchema).
  *  - Small dims (region/nation, fixed-cardinality) are broadcast
  *    explicitly; fact-fact joins shuffle on their keys and rely on AQE
  *    for skew handling.
  *  - Float aggregates are rounded at the edge (2 decimals) so results are
  *    insensitive to partition-order summation — required for a
  *    deterministic distributed plan, and matches the oracle.
  *  - Every query ends with a deterministic ORDER BY covering a unique key
  *    (or all output columns) so the driver's hash compare is order-stable.
  *    The sort is harness determinism, not engine semantics: on a real
  *    cluster callers drop it (or Catalyst elides it under aggregates).
  */
object Relational {

  /** A1/A4-style grouped aggregation (pricing summary, ref
    * `oclc/classify.py:113-128` additive weight merge shape).
    * Map-side partial aggregation makes this a single shuffle of
    * num-groups rows per partition — scales linearly.
    */
  def q1Agg(env: Env): DataFrame =
    env.lineitem
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 2).as("sum_qty"),
        round(sum($"l_extendedprice"), 2).as("sum_base_price"),
        round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("sum_disc_price"),
        round(avg($"l_quantity"), 2).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")

  /** P1 column projection (ref `controller.py:661-663`) — verifies column
    * pruning reaches the scan (ReadSchema lists only 2 of 11 columns). */
  def p1Project(env: Env): DataFrame =
    env.lineitem
      .select($"l_orderkey", $"l_extendedprice")
      .orderBy($"l_orderkey", $"l_extendedprice")

  /** P2+P3 equality/null predicates (ref `canonicalize.py:222-227`). */
  def p2FilterEq(env: Env): DataFrame =
    env.lineitem
      .filter($"l_returnflag" === "R" && $"l_shipdate".isNotNull)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity")
      .orderBy($"l_orderkey", $"l_linenumber", $"l_quantity")

  /** P4 IN-list (ref `controller.py:1034`, `monitor.py:42`). */
  def p4InList(env: Env): DataFrame =
    env.orders
      .filter($"o_orderpriority".isin("1-URGENT", "2-HIGH"))
      .select($"o_orderkey", $"o_custkey", $"o_orderpriority")
      .orderBy($"o_orderkey")

  /** P5 conjunction/disjunction (ref `controller.py:777-780`). */
  def p5Bool(env: Env): DataFrame =
    env.lineitem
      .filter(($"l_discount" > 0.05 && $"l_quantity" < 10.0) || $"l_returnflag" === "A")
      .select($"l_orderkey", $"l_linenumber", $"l_discount", $"l_quantity", $"l_returnflag")
      .orderBy($"l_orderkey", $"l_linenumber", $"l_discount", $"l_quantity", $"l_returnflag")

  /** P6 time-range predicate (updates-feed cutoff, ref `scripts.py:624`,
    * `controller.py:435-437`). The predicate runs on native timestamps;
    * only the *output* column is string-formatted so the comparison with
    * the oracle is representation-stable across engines. */
  def p6TimeRange(env: Env): DataFrame =
    env.orders
      .filter($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
              $"o_orderdate" <  lit("1997-01-01").cast("timestamp"))
      .select($"o_orderkey", date_format($"o_orderdate", "yyyy-MM-dd").as("order_date"))
      .orderBy($"o_orderkey")

  /** J1 FK equi-join (ref `oclc/classify.py:1234-1239`). Both sides
    * shuffle on the key; at scale this is the canonical sort-merge join
    * and AQE converts to broadcast when the filtered build side is small.
    */
  def j1Join(env: Env): DataFrame =
    env.orders
      .join(env.customer, $"o_custkey" === $"c_custkey")
      .select($"o_orderkey", $"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"o_orderkey")

  /** J2 multi-way join chain (ref `overdrive.py:76-84`): revenue per
    * nation within one region. nation/region are fixed-size dims —
    * broadcast both so the only shuffle is the final groupBy. */
  def j2Multiway(env: Env): DataFrame =
    env.lineitem
      .join(env.supplier, $"l_suppkey" === $"s_suppkey")
      .join(broadcast(env.nation), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(env.region.filter($"r_name" === "ASIA")),
            $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"))
      .orderBy($"n_name")

  /** J3 self-join with alias (ref `monitor.py:76-89` — Equivalency joined
    * to Identifier on both sides): signup→purchase conversion pairs per
    * user. Same-table both sides, aliased; shuffles once on user_id.
    * Signups are collapsed to the earliest per user first, so each
    * purchase is counted at most once (a user with repeated signup events
    * must not multiply its purchases). */
  def j3SelfAlias(env: Env): DataFrame = {
    val e = env.events
    val signups   = e.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(min($"ts").as("signup_ts"))
    val purchases = e.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("purchase_ts"), $"value")
    signups.join(purchases, "user_id")
      .filter($"purchase_ts" > $"signup_ts")
      .groupBy($"user_id")
      .agg(count(lit(1)).as("conversions"), round(sum($"value"), 2).as("total_value"))
      .orderBy($"user_id")
  }

  /** J4 left anti join (ref `controller.py:661-672` metadata_needed):
    * customers who never placed a high-value order (filter on the right
    * side keeps the anti-join non-trivially selective at every SF). */
  def j4Anti(env: Env): DataFrame =
    env.customer
      .join(env.orders.filter($"o_totalprice" > 300000.0),
            $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")

  /** J5 semi-join (ref `controller.py:776-785` catalog subset). */
  def j5Semi(env: Env): DataFrame =
    env.supplier
      .join(env.lineitem.filter($"l_discount" > 0.08),
            $"s_suppkey" === $"l_suppkey", "left_semi")
      .select($"s_suppkey", $"s_name")
      .orderBy($"s_suppkey")

  /** J6 M:N membership through an edge table (ref `controller.py:496-498`):
    * distinct (supplier, part) pairs from lineitem = the edge table;
    * membership count per supplier. countDistinct gives partial distinct
    * aggregation in ONE shuffle (vs distinct()+count = two shuffles on the
    * same key). */
  def j6Membership(env: Env): DataFrame =
    env.lineitem
      .groupBy($"l_suppkey")
      .agg(countDistinct($"l_partkey").as("catalog_size"))
      .orderBy($"l_suppkey")

  /** J7 outer join + conditional agg (ref `scripts.py:676-693` backlog
    * report split by null/not-null). */
  def j7OuterAgg(env: Env): DataFrame =
    env.customer
      .join(env.orders, $"c_custkey" === $"o_custkey", "left_outer")
      .groupBy($"c_mktsegment")
      .agg(
        count($"o_orderkey").as("n_orders"),
        sum(when($"o_orderkey".isNull, 1).otherwise(0)).as("n_orderless_customers"),
        round(sum(coalesce($"o_totalprice", lit(0.0))), 2).as("total_price"))
      .orderBy($"c_mktsegment")

  /** A2 grouped count-distinct (ref `scripts.py:574-592`). */
  def a2CountDistinct(env: Env): DataFrame =
    env.orders
      .groupBy($"o_orderstatus")
      .agg(countDistinct($"o_custkey").as("n_customers"),
           count(lit(1)).as("n_orders"))
      .orderBy($"o_orderstatus")

  /** A3 multi-key grouped counts (ref `scripts.py:442-454` subjects
    * overview). */
  def a3MultiKey(env: Env): DataFrame =
    env.lineitem
      .groupBy($"l_returnflag", $"l_linestatus", year($"l_shipdate").as("ship_year"))
      .agg(count(lit(1)).as("ct"), round(sum($"l_quantity"), 2).as("qty"))
      .orderBy($"l_returnflag", $"l_linestatus", $"ship_year")

  /** A7 manual pivot / cross-tab (ref `reports/genre_classifications.py:25-45`
    * genre×source). Conditional aggregation instead of `.pivot()` so the
    * output schema is static and oracle-matchable; one shuffle. The
    * trailing `other` bucket catches unexpected lang values instead of
    * silently dropping them (scale posture: new enum values must be
    * visible). */
  def a7Pivot(env: Env): DataFrame = {
    val known = Seq("en", "es", "de", "fr", "zh")
    env.documents
      .groupBy($"source")
      .agg(
        sum(when($"lang" === "en", 1).otherwise(0)).as("en"),
        sum(when($"lang" === "es", 1).otherwise(0)).as("es"),
        sum(when($"lang" === "de", 1).otherwise(0)).as("de"),
        sum(when($"lang" === "fr", 1).otherwise(0)).as("fr"),
        sum(when($"lang" === "zh", 1).otherwise(0)).as("zh"),
        sum(when(!$"lang".isin(known: _*), 1).otherwise(0)).as("other"))
      .orderBy($"source")
  }

  /** D1 set difference via anti-join (ref `controller.py:521-532`):
    * parts never shipped at a deep discount. */
  def d1Except(env: Env): DataFrame =
    env.part
      .join(env.lineitem.filter($"l_discount" > 0.09).select($"l_partkey"),
            $"p_partkey" === $"l_partkey", "left_anti")
      .select($"p_partkey", $"p_name")
      .orderBy($"p_partkey")

  /** D3 normalize-then-dedup (ref `content_cafe.py:244-262`). */
  def d3DedupNorm(env: Env): DataFrame =
    env.documents
      .select(lower(trim($"lang")).as("lang_norm"), $"source")
      .distinct()
      .orderBy($"lang_norm", $"source")

  /** D4 union of streams + dedup (ref `linked_data.py:954-969`). */
  def d4Union(env: Env): DataFrame = {
    val highValue = env.orders.filter($"o_totalprice" > 400000.0)
      .select($"o_orderkey", $"o_custkey")
    val urgent = env.orders.filter($"o_orderpriority" === "1-URGENT")
      .select($"o_orderkey", $"o_custkey")
    highValue.unionByName(urgent).distinct()
      .orderBy($"o_orderkey")
  }
}
