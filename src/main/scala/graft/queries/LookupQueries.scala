package graft.queries

import graft.{Env, Q}
import graft.syntax._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The §3.1 lookup flow as a batch query (SURVEY.md "Spark shape" for
  * `GET /lookup?urn=…`): a URN batch → parse → left join the
  * identifier/work state → per-row status projection. The reference
  * processes ≤30 URNs per request in a Python loop
  * (`controller.py:968-1026`); the engine shape is one set-oriented
  * pass over any batch size.
  */
object LookupQueries {

  val parseUrnUdf = udf((s: String) => {
    val p = graft.functions.Urn.parse(s)
    if (p == null) null else (p.idType, p.identifier)
  })

  /** URN batch lookup: three URN shapes (generic typed, URI, garbage),
    * parsed and resolved against an identifier table derived from
    * customers; status per row: `invalid-urn`, `not-found`,
    * `registered` (known but no work), or `ready` (presentation-ready
    * work, emits the cached entry id). Ref `controller.py:988-1026`
    * status codes. */
  def urnLookup(env: Env): DataFrame = {
    val urn = when($"c_custkey" % 5 === 4, concat(lit("bogus:"), $"c_custkey"))
      .when($"c_custkey" % 3 === 0,
        concat(lit("https://example.org/id/"), $"c_custkey"))
      .otherwise(concat(lit("urn:librarysimplified.org/terms/id/Overdrive%20ID/od-"),
                        $"c_custkey"))
    val requests = env.customer
      .select($"c_custkey".as("request_key"), urn.as("urn"),
              parseUrnUdf(urn).as("p"))
      .select($"request_key", $"urn",
              $"p._1".as("id_type"), $"p._2".as("identifier"))
    // Known identifiers: Overdrive ids for keys not divisible by 7;
    // works are presentation-ready for keys divisible by 2.
    val identifiers = env.customer.filter($"c_custkey" % 7 =!= 0)
      .select(lit("Overdrive ID").as("id_type"),
              concat(lit("od-"), $"c_custkey").as("identifier"),
              ($"c_custkey" % 2 === 0).as("presentation_ready"))
    requests
      .join(identifiers, Seq("id_type", "identifier"), "left")
      .select($"request_key", $"urn",
        when($"id_type".isNull, "invalid-urn")
          .when($"id_type" === "URI", "not-found")
          .when($"presentation_ready".isNull, "not-found")
          .when($"presentation_ready", "ready")
          .otherwise("registered").as("status"))
      .orderBy($"request_key")
  }

  val entries: Seq[Q] = Seq(
    Q.sql("urn_lookup", urnLookup,
      """SELECT c_custkey AS request_key,
        |  CASE
        |    WHEN c_custkey % 5 = 4 THEN 'bogus:' || c_custkey
        |    WHEN c_custkey % 3 = 0 THEN 'https://example.org/id/' || c_custkey
        |    ELSE 'urn:librarysimplified.org/terms/id/Overdrive%20ID/od-' || c_custkey
        |  END AS urn,
        |  CASE
        |    WHEN c_custkey % 5 = 4 THEN 'invalid-urn'
        |    WHEN c_custkey % 3 = 0 THEN 'not-found'
        |    WHEN c_custkey % 7 = 0 THEN 'not-found'
        |    WHEN c_custkey % 2 = 0 THEN 'ready'
        |    ELSE 'registered'
        |  END AS status
        |FROM customer
        |ORDER BY request_key""".stripMargin),
  )
}
