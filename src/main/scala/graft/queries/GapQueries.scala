package graft.queries

import graft.{Env, Q}
import graft.syntax._
import graft.functions.GraftFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Remaining SURVEY.md §2 operator coverage: the small relational
  * shapes (P7, J8, A1, D2, D5, W6) and scalar functions exposed
  * through the driver contract (F2, F5, F6, F12).
  */
object GapQueries {

  /** P7 — strength-threshold filter on equivalency edges (ref
    * `oclc/linked_data.py:823-827`: skip strength ≤ 0.7). Edge
    * derivation matches j9's graph. */
  def p7StrengthGate(env: Env): DataFrame =
    env.customer.select(
        $"c_custkey".as("src"),
        (lit(0.75) + ($"c_custkey" % 5).cast("double") * 0.05).as("strength"))
      .filter($"strength" > 0.75) // gate above the lowest (0.75) tier
      .select($"src", round($"strength", 2).as("strength"))
      .orderBy($"src")

  /** J8 — eager-load join (ref `controller.py:1028-1035` joinedload to
    * kill N+1): identifiers bulk-loaded WITH their coverage records in
    * one left join — the set-oriented default. */
  def j8EagerLoad(env: Env): DataFrame = {
    val users = env.events.select($"user_id").distinct()
    val purchases = env.events.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"value")
    users.join(purchases, Seq("user_id"), "left")
      .select($"user_id", $"event_id",
        coalesce(round($"value", 2), lit(0.0)).as("value"))
      .orderBy($"user_id", $"event_id")
  }

  /** A1 — standalone COUNT(*) (ref `controller.py:396` fast_query_count,
    * `controller.py:496-498` catalog size). */
  def a1Count(env: Env): DataFrame =
    env.lineitem.agg(count(lit(1)).as("n_rows"))

  /** D2 — matched-subset delete as an anti-join rewrite (ref
    * `controller.py:723-732`): "delete" catalog rows for a given id
    * set by rewriting the immutable edge table without them. */
  def d2SubsetDelete(env: Env): DataFrame =
    env.orders
      .join(env.customer.filter($"c_mktsegment" === "BUILDING")
              .select($"c_custkey"),
            $"o_custkey" === $"c_custkey", "left_anti")
      .select($"o_orderkey", $"o_custkey")
      .orderBy($"o_orderkey")

  /** D5 — duplicate-merge by id rewrite (ref `viaf.py:777-798`
    * merge_into: same VIAF ⇒ merge into the earliest row): users
    * sharing a synthetic viaf key collapse to the minimum user_id, and
    * the event edge table is rewritten against canonical ids. */
  def d5DupMerge(env: Env): DataFrame = {
    val users = env.events.select($"user_id").distinct()
      .withColumn("viaf", $"user_id" % 50)
    val canonical = users
      .withColumn("canonical_id",
        min($"user_id").over(Window.partitionBy($"viaf")))
      .select($"user_id", $"canonical_id")
    env.events
      .join(canonical, Seq("user_id"))
      .groupBy($"canonical_id")
      .agg(count(lit(1)).as("n_events"),
           countDistinct($"user_id").as("n_merged_users"))
      .orderBy($"canonical_id")
  }

  /** W6 — per-request cap (ref `controller.py:1111-1128`: 30 URNs per
    * authenticated request): deterministic order + hard limit. */
  def w6RequestCap(env: Env): DataFrame =
    env.customer.select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
      .limit(30)

  /** F2 — role-bracket parsing with the default-role state machine
    * through the UDF (ref `oclc/classify.py:360-529`). Three-person
    * author strings with bracketed roles by key; posexplode keeps the
    * order-dependent semantics visible. */
  def f2RoleParse(env: Env): DataFrame = {
    val authorString = when($"c_custkey" % 3 === 0,
        concat($"c_name", lit("|Second Person|Third Person [Translator]")))
      .when($"c_custkey" % 3 === 1,
        concat($"c_name", lit(" [Editor]|Second Person")))
      .otherwise(concat($"c_name", lit(" [Author]|Second Person")))
    env.customer
      .select($"c_custkey",
        posexplode(GraftFunctions.parseContributors(authorString)))
      .select($"c_custkey", $"pos",
        $"col._1".as("name"),
        concat_ws(";", $"col._4").as("roles"))
      .orderBy($"c_custkey", $"pos")
  }

  /** F5 — primary-author extraction (ref `canonicalize.py:45-86`). */
  def f5PrimaryAuthor(env: Env): DataFrame = {
    val author = when($"c_custkey" % 3 === 0,
        concat($"c_name", lit(" with Martin Dugard")))
      .when($"c_custkey" % 3 === 1, concat($"c_name", lit(" and Someone Else")))
      .otherwise($"c_name")
    env.customer
      .select($"c_custkey", author.as("raw"),
        GraftFunctions.primaryAuthor(author).as("primary_author"))
      .orderBy($"c_custkey")
  }

  /** F6 — wikipedia name → display name (ref `viaf.py:639-644`). */
  def f6WikipediaName(env: Env): DataFrame = {
    val wiki = when($"c_custkey" % 2 === 0,
        concat(regexp_replace($"c_name", "#", "_"), lit("_(Author)")))
      .otherwise(regexp_replace($"c_name", "#", "_"))
    env.customer
      .select($"c_custkey", wiki.as("wikipedia_name"),
        GraftFunctions.wikipediaToDisplay(wiki).as("display_name"))
      .orderBy($"c_custkey")
  }

  /** F12 — base64 codecs (ref `controller.py:228-230` collection
    * metadata-identifier decode, `scripts.py:642-645`). */
  def f12Base64(env: Env): DataFrame =
    env.customer
      .select($"c_custkey",
        base64($"c_name".cast("binary")).as("encoded"),
        unbase64(base64($"c_name".cast("binary"))).cast("string")
          .as("roundtrip"))
      .orderBy($"c_custkey")

  /** Referential-integrity audit over every FK edge of the schema —
    * the data-validation report a warehouse runs after ingest: orphan
    * counts per child→parent edge via left-anti joins (dims broadcast;
    * the fact-fact edges shuffle on their keys — the same plan that
    * holds at 100 TB, where a full-table EXCEPT would not). */
  def auditFkOrphans(env: Env): DataFrame = {
    def orphans(name: String, child: DataFrame, ck: String,
                parent: DataFrame, pk: String): DataFrame =
      child.select(col(ck))
        .join(parent.select(col(pk)), col(ck) === col(pk), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
        .select(lit(name).as("fk"), $"n_orphans")
    Seq(
      orphans("customer.c_nationkey->nation", env.customer, "c_nationkey",
        env.nation, "n_nationkey"),
      orphans("lineitem.l_orderkey->orders", env.lineitem, "l_orderkey",
        env.orders, "o_orderkey"),
      orphans("lineitem.l_partkey->part", env.lineitem, "l_partkey",
        env.part, "p_partkey"),
      orphans("lineitem.l_suppkey->supplier", env.lineitem, "l_suppkey",
        env.supplier, "s_suppkey"),
      orphans("nation.n_regionkey->region", env.nation, "n_regionkey",
        env.region, "r_regionkey"),
      orphans("orders.o_custkey->customer", env.orders, "o_custkey",
        env.customer, "c_custkey"),
      orphans("supplier.s_nationkey->nation", env.supplier, "s_nationkey",
        env.nation, "n_nationkey"))
      .reduce(_ unionByName _)
      .orderBy($"fk")
  }

  val entries: Seq[Q] = Seq(
    Q.sql("audit_fk_orphans", auditFkOrphans, {
      def leg(name: String, child: String, ck: String,
              parent: String, pk: String): String =
        s"""SELECT '$name' AS fk,
           |  CAST((SELECT count(*) FROM $child c
           |        WHERE NOT EXISTS (SELECT 1 FROM $parent p
           |                          WHERE p.$pk = c.$ck)) AS BIGINT)
           |    AS n_orphans""".stripMargin
      Seq(
        leg("customer.c_nationkey->nation", "customer", "c_nationkey",
          "nation", "n_nationkey"),
        leg("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
          "orders", "o_orderkey"),
        leg("lineitem.l_partkey->part", "lineitem", "l_partkey",
          "part", "p_partkey"),
        leg("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
          "supplier", "s_suppkey"),
        leg("nation.n_regionkey->region", "nation", "n_regionkey",
          "region", "r_regionkey"),
        leg("orders.o_custkey->customer", "orders", "o_custkey",
          "customer", "c_custkey"),
        leg("supplier.s_nationkey->nation", "supplier", "s_nationkey",
          "nation", "n_nationkey"))
        .mkString("", "\nUNION ALL\n", "\nORDER BY fk")
    }),

    Q.sql("p7_strength_gate", p7StrengthGate,
      """SELECT c_custkey AS src,
        |       round(0.75 + (c_custkey % 5) * 0.05, 2) AS strength
        |FROM customer
        |WHERE 0.75 + (c_custkey % 5) * 0.05 > 0.75
        |ORDER BY src""".stripMargin),

    Q.sql("j8_eager_load", j8EagerLoad,
      """WITH users AS (SELECT DISTINCT user_id FROM events),
        |p AS (SELECT user_id, event_id, value FROM events
        |      WHERE event_type = 'purchase')
        |SELECT u.user_id, p.event_id,
        |       COALESCE(round(p.value, 2), 0.0) AS value
        |FROM users u LEFT JOIN p USING (user_id)
        |ORDER BY u.user_id, p.event_id""".stripMargin),

    Q.sql("a1_count", a1Count,
      """SELECT count(*) AS n_rows FROM lineitem""".stripMargin),

    Q.sql("d2_subset_delete", d2SubsetDelete,
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_custkey NOT IN
        |  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |ORDER BY o_orderkey""".stripMargin),

    Q.sql("d5_dup_merge", d5DupMerge,
      """WITH users AS (
        |  SELECT DISTINCT user_id, user_id % 50 AS viaf FROM events),
        |canon AS (
        |  SELECT user_id, min(user_id) OVER (PARTITION BY viaf) AS canonical_id
        |  FROM users)
        |SELECT c.canonical_id,
        |       count(*) AS n_events,
        |       count(DISTINCT e.user_id) AS n_merged_users
        |FROM events e JOIN canon c USING (user_id)
        |GROUP BY c.canonical_id
        |ORDER BY c.canonical_id""".stripMargin),

    Q.sql("w6_request_cap", w6RequestCap,
      """SELECT c_custkey, c_name FROM customer
        |ORDER BY c_custkey LIMIT 30""".stripMargin),

    Q.sql("f2_role_parse", f2RoleParse,
      """WITH raw AS (
        |  SELECT c_custkey, c_custkey % 3 AS m, c_name FROM customer)
        |SELECT c_custkey, pos, name, roles FROM raw, LATERAL (
        |  SELECT * FROM (VALUES
        |    (0, CASE m WHEN 0 THEN c_name
        |               WHEN 1 THEN c_name
        |               ELSE c_name END,
        |        CASE m WHEN 0 THEN 'Primary Author'
        |               WHEN 1 THEN 'Editor'
        |               ELSE 'Author' END),
        |    (1, 'Second Person',
        |        CASE m WHEN 0 THEN 'Author'
        |               WHEN 1 THEN 'Unknown'
        |               ELSE 'Unknown' END),
        |    (2, CASE WHEN m = 0 THEN 'Third Person' END,
        |        CASE WHEN m = 0 THEN 'Translator' END)
        |  ) AS t(pos, name, roles)
        |  WHERE name IS NOT NULL) AS x
        |ORDER BY c_custkey, pos""".stripMargin),

    Q.sql("f5_primary_author", f5PrimaryAuthor,
      """SELECT c_custkey,
        |  CASE c_custkey % 3
        |    WHEN 0 THEN c_name || ' with Martin Dugard'
        |    WHEN 1 THEN c_name || ' and Someone Else'
        |    ELSE c_name END AS raw,
        |  c_name AS primary_author
        |FROM customer
        |ORDER BY c_custkey""".stripMargin),

    Q.sql("f6_wikipedia_name", f6WikipediaName,
      """SELECT c_custkey,
        |  CASE WHEN c_custkey % 2 = 0
        |       THEN replace(c_name, '#', '_') || '_(Author)'
        |       ELSE replace(c_name, '#', '_') END AS wikipedia_name,
        |  replace(replace(c_name, '#', '_'), '_', ' ') AS display_name
        |FROM customer
        |ORDER BY c_custkey""".stripMargin),

    Q.sql("f12_base64", f12Base64,
      """SELECT c_custkey,
        |       to_base64(encode(c_name)) AS encoded,
        |       c_name AS roundtrip
        |FROM customer
        |ORDER BY c_custkey""".stripMargin),
  )
}
