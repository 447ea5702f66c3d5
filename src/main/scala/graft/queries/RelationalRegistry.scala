package graft.queries

import graft.Q

/** Registry entries + DuckDB oracles for the Relational query pack.
  * Oracle SQL mirrors each Spark plan exactly: same aliases, same
  * rounding, same ORDER BY (see `graft.Q` contract notes).
  */
object RelationalRegistry {
  val entries: Seq[Q] = Seq(
    Q.sql("q1_agg", Relational.q1Agg,
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 2) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin),

    Q.sql("p1_project", Relational.p1Project,
      """SELECT l_orderkey, l_extendedprice FROM lineitem
        |ORDER BY l_orderkey, l_extendedprice""".stripMargin),

    Q.sql("p2_filter_eq", Relational.p2FilterEq,
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_returnflag = 'R' AND l_shipdate IS NOT NULL
        |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin),

    Q.sql("p4_in_list", Relational.p4InList,
      """SELECT o_orderkey, o_custkey, o_orderpriority FROM orders
        |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        |ORDER BY o_orderkey""".stripMargin),

    Q.sql("p5_bool", Relational.p5Bool,
      """SELECT l_orderkey, l_linenumber, l_discount, l_quantity, l_returnflag
        |FROM lineitem
        |WHERE (l_discount > 0.05 AND l_quantity < 10.0) OR l_returnflag = 'A'
        |ORDER BY l_orderkey, l_linenumber, l_discount, l_quantity, l_returnflag""".stripMargin),

    Q.sql("p6_time_range", Relational.p6TimeRange,
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <  TIMESTAMP '1997-01-01'
        |ORDER BY o_orderkey""".stripMargin),

    Q.sql("j1_join", Relational.j1Join,
      """SELECT o_orderkey, c_custkey, c_name, c_mktsegment
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin),

    Q.sql("j2_multiway", Relational.j2Multiway,
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin),

    Q.sql("j3_self_alias", Relational.j3SelfAlias,
      """WITH s AS (
        |  SELECT user_id, min(ts) AS signup_ts FROM events
        |  WHERE event_type = 'signup' GROUP BY user_id
        |), p AS (
        |  SELECT user_id, ts AS purchase_ts, value FROM events
        |  WHERE event_type = 'purchase'
        |)
        |SELECT s.user_id, count(*) AS conversions,
        |       round(sum(p.value), 2) AS total_value
        |FROM s JOIN p ON s.user_id = p.user_id AND p.purchase_ts > s.signup_ts
        |GROUP BY s.user_id
        |ORDER BY s.user_id""".stripMargin),

    Q.sql("j4_anti", Relational.j4Anti,
      """SELECT c_custkey, c_name FROM customer
        |WHERE c_custkey NOT IN
        |  (SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0)
        |ORDER BY c_custkey""".stripMargin),

    Q.sql("j5_semi", Relational.j5Semi,
      """SELECT s_suppkey, s_name FROM supplier
        |WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem WHERE l_discount > 0.08)
        |ORDER BY s_suppkey""".stripMargin),

    Q.sql("j6_membership", Relational.j6Membership,
      """SELECT l_suppkey, count(DISTINCT l_partkey) AS catalog_size
        |FROM lineitem GROUP BY l_suppkey
        |ORDER BY l_suppkey""".stripMargin),

    Q.sql("j7_outer_agg", Relational.j7OuterAgg,
      """SELECT c_mktsegment,
        |  count(o_orderkey) AS n_orders,
        |  CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_orderless_customers,
        |  round(sum(COALESCE(o_totalprice, 0.0)), 2) AS total_price
        |FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin),

    Q.sql("a2_count_distinct", Relational.a2CountDistinct,
      """SELECT o_orderstatus,
        |  count(DISTINCT o_custkey) AS n_customers,
        |  count(*) AS n_orders
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin),

    Q.sql("a3_multi_key", Relational.a3MultiKey,
      """SELECT l_returnflag, l_linestatus,
        |  CAST(year(l_shipdate) AS INT) AS ship_year,
        |  count(*) AS ct,
        |  round(sum(l_quantity), 2) AS qty
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus, ship_year
        |ORDER BY l_returnflag, l_linestatus, ship_year""".stripMargin),

    Q.sql("a7_pivot", Relational.a7Pivot,
      """SELECT source,
        |  CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS en,
        |  CAST(sum(CASE WHEN lang = 'es' THEN 1 ELSE 0 END) AS BIGINT) AS es,
        |  CAST(sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS BIGINT) AS de,
        |  CAST(sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS BIGINT) AS fr,
        |  CAST(sum(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS BIGINT) AS zh,
        |  CAST(sum(CASE WHEN lang NOT IN ('en','es','de','fr','zh') THEN 1 ELSE 0 END) AS BIGINT) AS other
        |FROM documents GROUP BY source
        |ORDER BY source""".stripMargin),

    Q.sql("d1_except", Relational.d1Except,
      """SELECT p_partkey, p_name FROM part
        |WHERE p_partkey NOT IN
        |  (SELECT l_partkey FROM lineitem WHERE l_discount > 0.09)
        |ORDER BY p_partkey""".stripMargin),

    Q.sql("d3_dedup_norm", Relational.d3DedupNorm,
      """SELECT DISTINCT lower(trim(lang)) AS lang_norm, source FROM documents
        |ORDER BY lang_norm, source""".stripMargin),

    Q.sql("d4_union", Relational.d4Union,
      """SELECT DISTINCT o_orderkey, o_custkey FROM orders
        |WHERE o_totalprice > 400000.0 OR o_orderpriority = '1-URGENT'
        |ORDER BY o_orderkey""".stripMargin),
  )
}
