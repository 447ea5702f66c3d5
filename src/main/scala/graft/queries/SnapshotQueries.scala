package graft.queries

import graft.{Env, Q}
import graft.syntax._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot-maintenance queries: the ISBN→OCLC-Number redirect map that
  * routes JSON-LD graph fetches (ref `oclc/linked_data.py:248-265`
  * oclc_number_for_isbn) and the TTL-based snapshot refresh selection
  * (ref `Representation.get` with `REPRESENTATION_MAX_AGE` = 6 months,
  * `viaf.py:828-841`). Both are pure relational passes over snapshot
  * tables — the engine never blocks on the network; a fetcher job
  * consumes the emitted work lists out-of-band.
  */
object SnapshotQueries {

  /** The reference's redirect-destination pattern
    * (`linked_data.py:98`). */
  val OclcNumberPattern = "^http://[^/]*worldcat.org/.*oclc/([0-9]+)$"

  /** S4 completion — ISBN→OCLC redirect resolution feeding the graph
    * fetch: a no-redirect snapshot holds each ISBN lookup's Location
    * header; rows resolve to an OCLC number ('ok'), fail with
    * 'no-location' (`linked_data.py:252-255`) or 'bad-redirect'
    * (`:258-261`), and resolved numbers join the JSON-LD work table the
    * way `oclc_works_for_isbn` chains lookups. */
  def s4IsbnRedirect(env: Env): DataFrame = {
    val k = $"p_partkey"
    val location =
      when(k % 7 === 0, lit(null).cast("string"))
        .when(k % 5 === 0,
          concat(lit("http://www.worldcat.org/title/-/oclc/"), k * 3))
        .when(k % 11 === 0, concat(lit("http://elsewhere.org/oclc/"), k * 3))
        .otherwise(concat(lit("http://www.worldcat.org/oclc/"), k * 3))
    val redirects = env.part.select(
      concat(lit("i"), k).as("isbn"), k.as("pk"), location.as("location"))
    val resolved = redirects.select(
      $"isbn", $"pk", $"location",
      when($"location".isNull, "no-location")
        .when(!$"location".rlike(OclcNumberPattern), "bad-redirect")
        .otherwise("ok").as("status"),
      when($"location".rlike(OclcNumberPattern),
        regexp_extract($"location", OclcNumberPattern, 1).cast("long"))
        .as("oclc_number"))
    // the graph table the resolved numbers route into (s4's role)
    val works = env.part.select(
      (k * 3).as("w_oclc"), concat(lit("Work "), k).as("work_name"))
    resolved.join(works, $"oclc_number" === $"w_oclc", "left")
      .select($"isbn", $"status", $"oclc_number", $"work_name")
      .orderBy($"isbn")
  }

  /** Snapshot TTL refresh selection (P6 time-range shape): rows fetched
    * more than `maxAgeDays` before `now`, or fetched with empty
    * content, form the refresh work list (ref `Representation.get`
    * max_age + the empty-content re-fetch at `linked_data.py:234-236`).
    */
  def snapshotTtlRefresh(env: Env): DataFrame = {
    val now = to_date(lit("1997-06-01"))
    val maxAgeDays = 180
    val snapshot = env.orders.select(
      concat(lit("viaf/"), $"o_orderkey").as("url"),
      $"o_orderdate".as("fetched"),
      ($"o_orderkey" % 13 =!= 0).as("has_content"))
    snapshot.select(
        $"url", $"fetched",
        when(!$"has_content", "empty")
          .when($"fetched" < date_sub(now, maxAgeDays), "stale")
          .as("reason"))
      .filter($"reason".isNotNull)
      .orderBy($"url")
  }

  /** S11/SURVEY §7 hard-part 5 — the children's-books-with-no-age-range
    * report (ref `monitor.py:100-155`): `target_age` is a (lo, hi)
    * STRUCT where an unset range (SQL NULL) and an unbounded range
    * (`NumericRange(None, None)` — struct present, both ends null) are
    * DIFFERENT states and the report must catch both; audiences
    * restricted to Children/Young Adult; the first ISBN equivalency is
    * carried when present. */
  def s11AgeRangeReport(env: Env): DataFrame = {
    val k = $"c_custkey"
    val ageStruct =
      when(k % 5 === 2, struct(lit(8).as("lo"), lit(12).as("hi")))
        .when(k % 5 === 3, struct(lit(5).as("lo"), lit(null).cast("int").as("hi")))
        .when(k % 5 === 1, struct(lit(null).cast("int").as("lo"),
                                  lit(null).cast("int").as("hi")))
        .when(k % 5 === 4, struct(lit(13).as("lo"), lit(18).as("hi")))
    // k % 5 == 0 falls through the when-chain → NULL struct (unset)
    val works = env.customer.select(
      k.as("key"), $"c_name".as("title"),
      concat(lit("A"), k % 7).as("author"),
      when(k % 3 === 0, "Children").when(k % 3 === 1, "Young Adult")
        .otherwise("Adult").as("audience"),
      ageStruct.as("target_age"),
      when(k % 4 =!= 0, concat(lit("i"), k)).as("isbn"))
    works
      .filter($"audience".isin("Children", "Young Adult") &&
        ($"target_age".isNull ||                       // unset range
         ($"target_age.lo".isNull && $"target_age.hi".isNull))) // (None,None)
      .select($"key", $"title", $"author", $"audience", $"isbn")
      .orderBy($"key")
  }

  val entries: Seq[Q] = Seq(
    Q.sql("s11_age_range_report", s11AgeRangeReport,
      """SELECT c_custkey AS key, c_name AS title,
        |  'A' || (c_custkey % 7) AS author,
        |  CASE WHEN c_custkey % 3 = 0 THEN 'Children'
        |       ELSE 'Young Adult' END AS audience,
        |  CASE WHEN c_custkey % 4 <> 0 THEN 'i' || c_custkey END AS isbn
        |FROM customer
        |WHERE c_custkey % 3 <> 2
        |  AND c_custkey % 5 IN (0, 1)
        |ORDER BY key""".stripMargin),

    Q.sql("s4_isbn_redirect", s4IsbnRedirect,
      """WITH redirects AS (
        |  SELECT 'i' || p_partkey AS isbn, p_partkey AS pk,
        |    CASE
        |      WHEN p_partkey % 7 = 0 THEN NULL
        |      WHEN p_partkey % 5 = 0
        |        THEN 'http://www.worldcat.org/title/-/oclc/' || (p_partkey * 3)
        |      WHEN p_partkey % 11 = 0
        |        THEN 'http://elsewhere.org/oclc/' || (p_partkey * 3)
        |      ELSE 'http://www.worldcat.org/oclc/' || (p_partkey * 3)
        |    END AS location
        |  FROM part),
        |resolved AS (
        |  SELECT isbn, pk, location,
        |    CASE
        |      WHEN location IS NULL THEN 'no-location'
        |      WHEN NOT regexp_matches(location,
        |        '^http://[^/]*worldcat.org/.*oclc/([0-9]+)$') THEN 'bad-redirect'
        |      ELSE 'ok' END AS status,
        |    CASE WHEN regexp_matches(location,
        |        '^http://[^/]*worldcat.org/.*oclc/([0-9]+)$')
        |      THEN CAST(regexp_extract(location,
        |        '^http://[^/]*worldcat.org/.*oclc/([0-9]+)$', 1) AS BIGINT)
        |    END AS oclc_number
        |  FROM redirects),
        |works AS (
        |  SELECT p_partkey * 3 AS w_oclc, 'Work ' || p_partkey AS work_name
        |  FROM part)
        |SELECT isbn, status, oclc_number, work_name
        |FROM resolved LEFT JOIN works ON oclc_number = w_oclc
        |ORDER BY isbn""".stripMargin),

    Q.sql("snapshot_ttl_refresh", snapshotTtlRefresh,
      """SELECT 'viaf/' || o_orderkey AS url, o_orderdate AS fetched,
        |  CASE
        |    WHEN o_orderkey % 13 = 0 THEN 'empty'
        |    WHEN o_orderdate < DATE '1997-06-01' - INTERVAL 180 DAY
        |      THEN 'stale' END AS reason
        |FROM orders
        |WHERE o_orderkey % 13 = 0
        |   OR o_orderdate < DATE '1997-06-01' - INTERVAL 180 DAY
        |ORDER BY url""".stripMargin),
  )
}
