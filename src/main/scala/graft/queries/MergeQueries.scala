package graft.queries

import graft.{Env, Q}
import graft.syntax._
import graft.model._
import graft.operators.{Canonicalize, MetadataMerge}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Merge-engine queries (SURVEY.md §2.8). Bibliographic inputs are
  * synthesized deterministically from the TPC-H-ish tables (same
  * construction mirrored in the oracle), exercising the typed
  * Dataset[Metadata]/Dataset[Edition] path end-to-end.
  */
object MergeQueries {

  /** A4 — additive weight merge: explode name tokens as "subjects"
    * weighted by p_size, sum per token (ref `oclc/classify.py:113-128`
    * additivity; UNNEST oracle). */
  def a4WeightMerge(env: Env): DataFrame =
    env.part
      .select($"p_size", explode(split($"p_name", " ")).as("token"))
      .groupBy($"token")
      .agg(sum($"p_size").as("total_weight"), count(lit(1)).as("n_parts"))
      .orderBy($"token")

  /** M1 — policy-gated scalar merge of a metadata batch onto editions
    * (ref `Metadata.apply`, `controller.py:609-629`). */
  def m1PolicyMerge(env: Env): DataFrame = {
    implicit val editionEnc: org.apache.spark.sql.Encoder[Edition] =
      org.apache.spark.sql.Encoders.product[Edition]
    implicit val metadataEnc: org.apache.spark.sql.Encoder[Metadata] =
      org.apache.spark.sql.Encoders.product[Metadata]
    val editions = env.customer.select(
      $"c_custkey".as("editionId"),
      lit("cust").as("identifierType"),
      $"c_custkey".cast("string").as("identifier"),
      when($"c_custkey" % 3 === 0, lit(null)).otherwise($"c_name").as("title"),
      lit(null).cast("string").as("subtitle"),
      when($"c_custkey" % 2 === 0, lit(null)).otherwise(lit("en")).as("language"),
      $"c_mktsegment".as("publisher"),
      when($"c_custkey" % 7 === 0, lit(null))
        .otherwise(concat(lit("A"), $"c_custkey")).as("author"),
      lit(null).cast("string").as("sortAuthor"),
      lit(null).cast("string").as("permanentWorkId")).as[Edition]
    val metadata = env.customer
      .filter($"c_custkey" % 5 =!= 4) // some editions get no metadata
      .select(
        lit("srcA").as("dataSource"),
        struct(lit("cust").as("idType"),
               $"c_custkey".cast("string").as("identifier"))
          .as("primaryIdentifier"),
        concat(lit("T"), $"c_custkey").as("title"),
        lit(null).cast("string").as("subtitle"),
        when($"c_custkey" % 5 === 0, lit("fr")).otherwise(lit(null)).as("language"),
        lit(null).cast("string").as("publisher"),
        lit(null).cast("string").as("publishedYear"),
        typedLit(Seq.empty[IdentifierData]).as("identifiers"),
        typedLit(Seq.empty[ContributorData]).as("contributors"),
        typedLit(Seq.empty[SubjectData]).as("subjects"),
        typedLit(Seq.empty[MeasurementData]).as("measurements"),
        typedLit(Seq.empty[LinkData]).as("links")).as[Metadata]
    MetadataMerge.applyMetadata(editions, metadata,
        ReplacementPolicy(replaceScalars = true))
      .select($"editionId", $"title", $"language", $"publisher", $"author")
      .orderBy($"editionId")
  }

  /** M1 — child-list merge under a non-trivial ReplacementPolicy
    * (replaceLinks=true, identifiers additive — the wrangler posture of
    * `coverage_utils.py:20-49`): srcA's incoming links displace srcA's
    * old links for the touched identifiers while srcB's survive, and
    * equivalent identifiers union-dedup. */
  def m1ChildMerge(env: Env): DataFrame = {
    val existingLinks = env.customer.select(
      $"c_custkey".as("identifier"),
      when($"c_custkey" % 2 === 0, "srcA").otherwise("srcB").as("source"),
      lit("image").as("rel"),
      concat(lit("old/"), $"c_custkey").as("href"))
    val incoming = env.customer.filter($"c_custkey" % 5 =!= 4)
    val incomingLinks = incoming.select(
        $"c_custkey".as("identifier"), lit("srcA").as("source"),
        lit("image").as("rel"), concat(lit("new/"), $"c_custkey").as("href"))
      .unionByName(incoming.select(
        $"c_custkey".as("identifier"), lit("srcA").as("source"),
        lit("description").as("rel"),
        concat(lit("desc/"), $"c_custkey").as("href")))
    val mergedLinks = MetadataMerge.mergeChildRows(
      existingLinks, incomingLinks, replace = true)

    val existingIds = env.customer.select(
      $"c_custkey".as("identifier"), lit("id").as("source"),
      lit("isbn").as("rel"), concat(lit("i"), $"c_custkey").as("href"))
    // every 3rd gains an OWI equivalent; every 6th re-sends its ISBN
    // (must dedup, not duplicate)
    val incomingIds = env.customer.filter($"c_custkey" % 3 === 0).select(
        $"c_custkey".as("identifier"), lit("id").as("source"),
        lit("owi").as("rel"), concat(lit("w"), $"c_custkey").as("href"))
      .unionByName(env.customer.filter($"c_custkey" % 6 === 0).select(
        $"c_custkey".as("identifier"), lit("id").as("source"),
        lit("isbn").as("rel"), concat(lit("i"), $"c_custkey").as("href")))
    val mergedIds = MetadataMerge.mergeChildRows(
      existingIds, incomingIds, replace = false)

    mergedLinks.withColumn("family", lit("link"))
      .unionByName(mergedIds.withColumn("family", lit("identifier")))
      .select($"family", $"identifier", $"source", $"rel", $"href")
      .orderBy($"family", $"identifier", $"source", $"rel", $"href")
  }

  /** M4 — multi-record consolidation: orders play the role of multiple
    * OWI records per customer; contributors first-wins by order key,
    * subjects/measurements additive (ref `oclc/classify.py:97-128`). */
  def m4OwiFold(env: Env): DataFrame = {
    val meta = env.spread(env.orders).select( // see Env.spread
      lit("oclc").as("dataSource"),
      struct(lit("cust").as("idType"),
             $"o_custkey".cast("string").as("identifier")).as("primaryIdentifier"),
      // slice(arr, 1, 0) = typed empty array — keeps both branches the
      // same struct type
      when($"o_orderkey" % 3 === 0,
          slice(array(struct($"o_orderpriority".as("sortName"),
                             $"o_orderstatus".as("displayName"))), 1, 0))
        .otherwise(array(struct($"o_orderpriority".as("sortName"),
                                $"o_orderstatus".as("displayName"))))
        .as("contributors"),
      array(struct(lit("prio").as("subjectType"),
                   $"o_orderpriority".as("identifier"),
                   lit(1).as("weight"))).as("subjects"),
      array(struct($"o_orderstatus".as("quantity"),
                   $"o_totalprice".as("value"))).as("measurements"),
      $"o_orderkey".as("ord"))
    MetadataMerge.consolidate(meta, "ord")
      .select($"identifier".cast("long").as("custkey"),
        element_at($"contributors", 1).getField("sortName").as("first_author"),
        size($"subjects").as("n_subjects"),
        size($"measurements").as("n_measurements"))
      .orderBy($"custkey")
  }

  /** M6 — presentation-edition election per pool (ref
    * `oclc/linked_data.py:1141-1172`): titled+authored beats titled,
    * `[Unknown]` author counts as unauthored, lowest id wins ties. */
  def m6PresentationElection(env: Env): DataFrame = {
    val candidates = env.part.select(
      ($"p_partkey" % 100).as("pool_id"),
      $"p_partkey".as("editionId"),
      when($"p_partkey" % 5 === 0, lit(null)).otherwise($"p_name").as("title"),
      when($"p_partkey" % 7 === 0, lit(null))
        .when($"p_partkey" % 11 === 0, lit(MetadataMerge.UnknownAuthor))
        .otherwise($"p_brand").as("author"))
    MetadataMerge.electPresentationEdition(candidates)
      .select($"pool_id", $"editionId", $"title", $"author")
      .orderBy($"pool_id")
  }

  /** M7 — canonicalization cascade over a synthesized contributor DB:
    * exact → blocked fuzzy (≥60, best-ratio/shortest/lexicographic) →
    * heuristic display→sort fallback (ref `canonicalize.py:88-193`). */
  def m7Canonicalize(env: Env): DataFrame = {
    val contributors = env.customer.select(
      $"c_name".as("display_name"),
      concat(lit("S#"), $"c_custkey").as("sort_name"))
    val requests = env.customer.select(
      $"c_custkey".as("request_id"),
      when($"c_custkey" % 4 === 0, $"c_name")
        .when($"c_custkey" % 4 === 1,
          concat(substring($"c_name", 1, 8), lit("X"), substring($"c_name", 10, 99)))
        .when($"c_custkey" % 4 === 2,
          concat(lit("Pat Q "), substring($"c_name", -4, 4)))
        .otherwise(concat(lit("Solo"), $"c_custkey")).as("display_name"))
    Canonicalize.canonicalizeSortNames(requests, contributors,
        name => substring(name, -4, 4))
      .orderBy($"request_id")
  }

  val entries: Seq[Q] = Seq(
    Q.sql("a4_weight_merge", a4WeightMerge,
      """SELECT t.token,
        |       CAST(sum(p_size) AS BIGINT) AS total_weight,
        |       count(*) AS n_parts
        |FROM part, unnest(string_split(p_name, ' ')) AS t(token)
        |GROUP BY t.token
        |ORDER BY t.token""".stripMargin),

    Q.sql("m1_policy_merge", m1PolicyMerge,
      """WITH ed AS (
        |  SELECT c_custkey AS editionId,
        |    CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE c_name END AS title,
        |    CASE WHEN c_custkey % 2 = 0 THEN NULL ELSE 'en' END AS language,
        |    c_mktsegment AS publisher,
        |    CASE WHEN c_custkey % 7 = 0 THEN NULL
        |         ELSE 'A' || c_custkey END AS author
        |  FROM customer),
        |md AS (
        |  SELECT c_custkey AS mkey, 'T' || c_custkey AS m_title,
        |    CASE WHEN c_custkey % 5 = 0 THEN 'fr' END AS m_language
        |  FROM customer WHERE c_custkey % 5 <> 4)
        |SELECT editionId,
        |  COALESCE(m_title, title) AS title,
        |  COALESCE(m_language, language) AS language,
        |  publisher, author
        |FROM ed LEFT JOIN md ON editionId = mkey
        |ORDER BY editionId""".stripMargin),

    Q.sql("m1_child_merge", m1ChildMerge,
      """WITH existing AS (
        |  SELECT c_custkey AS identifier,
        |    CASE WHEN c_custkey % 2 = 0 THEN 'srcA' ELSE 'srcB' END AS source,
        |    'image' AS rel, 'old/' || c_custkey AS href
        |  FROM customer),
        |incoming AS (
        |  SELECT c_custkey AS identifier, 'srcA' AS source, 'image' AS rel,
        |         'new/' || c_custkey AS href
        |  FROM customer WHERE c_custkey % 5 <> 4
        |  UNION ALL
        |  SELECT c_custkey, 'srcA', 'description', 'desc/' || c_custkey
        |  FROM customer WHERE c_custkey % 5 <> 4),
        |links AS (
        |  SELECT DISTINCT * FROM (
        |    SELECT e.* FROM existing e
        |    WHERE NOT EXISTS (SELECT 1 FROM incoming i
        |      WHERE i.identifier = e.identifier AND i.source = e.source)
        |    UNION ALL
        |    SELECT * FROM incoming)),
        |eids AS (
        |  SELECT c_custkey AS identifier, 'id' AS source, 'isbn' AS rel,
        |         'i' || c_custkey AS href
        |  FROM customer),
        |iids AS (
        |  SELECT c_custkey AS identifier, 'id' AS source, 'owi' AS rel,
        |         'w' || c_custkey AS href
        |  FROM customer WHERE c_custkey % 3 = 0
        |  UNION ALL
        |  SELECT c_custkey, 'id', 'isbn', 'i' || c_custkey
        |  FROM customer WHERE c_custkey % 6 = 0),
        |ids AS (
        |  SELECT DISTINCT * FROM
        |    (SELECT * FROM eids UNION ALL SELECT * FROM iids))
        |SELECT 'link' AS family, identifier, source, rel, href FROM links
        |UNION ALL
        |SELECT 'identifier', identifier, source, rel, href FROM ids
        |ORDER BY family, identifier, source, rel, href""".stripMargin),

    Q.sql("m4_owi_fold", m4OwiFold,
      """SELECT o_custkey AS custkey,
        |  arg_min(o_orderpriority, o_orderkey)
        |    FILTER (WHERE o_orderkey % 3 <> 0) AS first_author,
        |  CAST(count(DISTINCT o_orderpriority) AS INT) AS n_subjects,
        |  CAST(count(DISTINCT o_orderstatus) AS INT) AS n_measurements
        |FROM orders
        |GROUP BY o_custkey
        |ORDER BY custkey""".stripMargin),

    Q.sql("m6_presentation_election", m6PresentationElection,
      """WITH cand AS (
        |  SELECT p_partkey % 100 AS pool_id, p_partkey AS editionId,
        |    CASE WHEN p_partkey % 5 = 0 THEN NULL ELSE p_name END AS title,
        |    CASE WHEN p_partkey % 7 = 0 THEN NULL
        |         WHEN p_partkey % 11 = 0 THEN '[Unknown]'
        |         ELSE p_brand END AS author
        |  FROM part),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY pool_id ORDER BY
        |    CASE WHEN author IS NOT NULL AND author <> '[Unknown]'
        |         THEN 1 ELSE 0 END DESC,
        |    CASE WHEN title IS NOT NULL THEN 1 ELSE 0 END DESC,
        |    editionId ASC) AS rn
        |  FROM cand WHERE title IS NOT NULL)
        |SELECT pool_id, editionId, title, author
        |FROM ranked WHERE rn = 1
        |ORDER BY pool_id""".stripMargin),

    Q.sql("m7_canonicalize", m7Canonicalize,
      """WITH contrib AS (
        |  SELECT display_name, min(sort_name) AS sort_name FROM (
        |    SELECT c_name AS display_name, 'S#' || c_custkey AS sort_name
        |    FROM customer)
        |  GROUP BY display_name),
        |req AS (
        |  SELECT c_custkey AS request_id,
        |    CASE c_custkey % 4
        |      WHEN 0 THEN c_name
        |      WHEN 1 THEN substr(c_name, 1, 8) || 'X' || substr(c_name, 10)
        |      WHEN 2 THEN 'Pat Q ' || right(c_name, 4)
        |      ELSE 'Solo' || c_custkey END AS display_name
        |  FROM customer),
        |ex AS (
        |  SELECT r.request_id, r.display_name, c.sort_name AS exact_sort
        |  FROM req r LEFT JOIN contrib c USING (display_name)),
        |unres AS (
        |  SELECT request_id, display_name, right(display_name, 4) AS blk
        |  FROM ex WHERE exact_sort IS NULL),
        |cblk AS (
        |  SELECT display_name AS cand_name, sort_name AS cand_sort,
        |         right(display_name, 4) AS blk
        |  FROM contrib),
        |fzc AS (
        |  SELECT u.request_id, c.cand_name, c.cand_sort,
        |    CAST(round(100.0 * (1.0 - CAST(levenshtein(u.display_name, c.cand_name)
        |      AS DOUBLE) / greatest(length(u.display_name), length(c.cand_name))))
        |      AS INT) AS ratio
        |  FROM unres u JOIN cblk c USING (blk)),
        |fz AS (
        |  SELECT request_id, cand_sort AS fuzzy_sort FROM (
        |    SELECT *, row_number() OVER (PARTITION BY request_id
        |      ORDER BY ratio DESC, length(cand_name) ASC, cand_name ASC) AS rn
        |    FROM fzc WHERE ratio >= 60)
        |  WHERE rn = 1)
        |SELECT e.request_id, e.display_name,
        |  COALESCE(e.exact_sort, f.fuzzy_sort,
        |    CASE WHEN e.display_name NOT LIKE '% %' THEN e.display_name
        |         ELSE string_split(e.display_name, ' ')[len(string_split(e.display_name, ' '))]
        |              || ', ' ||
        |              array_to_string(list_slice(string_split(e.display_name, ' '), 1,
        |                len(string_split(e.display_name, ' ')) - 1), ' ')
        |    END) AS sort_name,
        |  CASE WHEN e.exact_sort IS NOT NULL THEN 'exact'
        |       WHEN f.fuzzy_sort IS NOT NULL THEN 'fuzzy'
        |       ELSE 'heuristic' END AS method
        |FROM ex e LEFT JOIN fz f USING (request_id)
        |ORDER BY e.request_id""".stripMargin),
  )
}
