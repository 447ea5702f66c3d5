package graft.queries

import graft.{Env, Q}
import graft.syntax._
import graft.sources.{BiblioXml, HtmlScrape, JsonLd, OpdsXml, OverdriveJson}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Second source pack: snapshot-table extraction queries for the VIAF,
  * Classify, Overdrive, JSON-LD, and HTML-scrape sources, plus the
  * OPDS render sink. Payloads constructed from testdata; constructive
  * oracles.
  */
object SourceQueries2 {

  /** S2 — VIAF SRU cluster extraction (two MARC21 100$a names per
    * cluster, ordinal preserved). */
  def s2ViafParse(env: Env): DataFrame = {
    val xml = concat(
      lit("<VIAFCluster><viafID>"), $"c_custkey",
      lit("</viafID><datafield dtype=\"MARC21\" tag=\"100\"><subfield code=\"a\">"),
      $"c_name",
      lit("</subfield></datafield><datafield dtype=\"MARC21\" tag=\"100\"><subfield code=\"a\">Alt "),
      $"c_name",
      lit("</subfield></datafield></VIAFCluster>"))
    val snap = env.customer.select($"c_custkey".as("k"), xml.as("xml"))
    BiblioXml.parseViafClusters(snap, "k", "xml")
      .select($"key".cast("long").as("key"), $"viaf_id", $"ordinal", $"sort_name")
      .orderBy($"key", $"ordinal")
  }

  /** S3 — Classify multi-OWI extraction: 2 works for even keys, 1 for
    * odd; shared ddc/lcc headings. */
  def s3ClassifyParse(env: Env): DataFrame = {
    val works = when($"p_partkey" % 2 === 0, concat(
        lit("<work owi=\"A"), $"p_partkey", lit("\"/><work owi=\"B"),
        $"p_partkey", lit("\"/>")))
      .otherwise(concat(lit("<work owi=\"A"), $"p_partkey", lit("\"/>")))
    val xml = concat(
      lit("<classify><response code=\"2\"/><works>"), works,
      lit("</works><ddc><mostPopular sfa=\"8"), $"p_partkey" % 100,
      lit("\"/></ddc><lcc><mostPopular sfa=\"PS"), $"p_partkey" % 50,
      lit("\"/></lcc></classify>"))
    val snap = env.part.select($"p_partkey".as("k"), xml.as("xml"))
    BiblioXml.parseClassify(snap, "k", "xml")
      .select($"key".cast("long").as("key"), $"response_code", $"ddc", $"lcc", $"owi")
      .orderBy($"key", $"owi")
  }

  /** S3b — full Classify extraction: authors block (lc/viaf ids),
    * holdings/editions measurements, pswid, heading weights, FAST
    * recommendations (ref `oclc/classify.py:253-341, 485-529`). */
  def s3ClassifyFull(env: Env): DataFrame = {
    val k = $"p_partkey"
    val coAuthor = when(k % 3 === 0, concat(
      lit("""<author viaf=""""), k * 3,
      lit("""">Co Auth """), k, lit(""" [Editor]</author>"""))).otherwise(lit(""))
    val xml = concat(
      lit("""<classify><response code="2"/><work owi="A"""), k,
      lit("""" holdings=""""), k % 1000, lit("""" editions=""""), k % 50,
      lit("""" pswid=""""), k, lit(""""/><authors><author lc="n"""), k,
      lit("""" viaf=""""), k * 2, lit("""">Auth """), k,
      lit("""</author>"""), coAuthor,
      lit("""</authors><recommendations><ddc><mostPopular holdings=""""),
      k % 500, lit("""" sfa="8"""), k % 100,
      lit(""""/></ddc><fast><headings><heading heldby=""""), k % 200,
      lit("""" ident="F"""), k, lit("""">Fast """), k,
      lit("""</heading></headings></fast></recommendations></classify>"""))
    val snap = env.part.select(k.as("pk"), xml.as("xml"))
    BiblioXml.parseClassifyFull(snap, "pk", "xml")
      .select($"key".cast("long").as("key"),
        $"work_holdings".as("holdings"), $"work_editions".as("editions"),
        $"pswid", size($"authors").as("n_authors"),
        get($"authors", lit(0)).getField("viaf").as("first_viaf"),
        get($"authors", lit(0)).getField("lc").as("first_lc"),
        $"ddc", $"ddc_holdings".as("ddc_weight"),
        get($"fast_headings", lit(0)).getField("ident").as("fast_ident"),
        get($"fast_headings", lit(0)).getField("heldby").as("fast_heldby"))
      .orderBy($"key")
  }

  /** S6 — Overdrive JSON bibliographic parse: author-role preference
    * and format count. */
  def s6Overdrive(env: Env): DataFrame = {
    val creators = when($"c_custkey" % 3 === 0,
        concat(lit("""[{"name":"N"""), $"c_custkey",
               lit("""","role":"Narrator"},{"name":"A"""), $"c_custkey",
               lit("""","role":"Author"}]""")))
      .otherwise(concat(lit("""[{"name":"N"""), $"c_custkey",
                        lit("""","role":"Narrator"}]""")))
    val json = concat(
      lit("""{"title":"T"""), $"c_custkey",
      lit("""","creators":"""), creators,
      lit(""","languages":[{"code":"en"}],"formats":[{"id":"f1"},{"id":"f2"}]}"""))
    val snap = env.customer.select($"c_custkey".as("od_id"), json.as("json"))
    OverdriveJson.parseBibliographic(snap, "od_id", "json")
      .select($"overdrive_id".cast("long").as("overdrive_id"),
              $"title", $"author", $"language", $"n_formats")
      .orderBy($"overdrive_id")
  }

  /** S4/F14 — JSON-LD graph: per doc a Person node (en+fr names) and a
    * CreativeWork referencing it; resolve creators through the
    * internal @id self-join, names restricted to @language=en. */
  def s4JsonLd(env: Env): DataFrame = {
    val json = concat(
      lit("""{"@graph":[{"@id":"p"""), $"c_custkey",
      lit("""","@type":"Person","name":[{"@language":"fr","@value":"FR """), $"c_name",
      lit(""""},{"@language":"en","@value":"""" ), $"c_name",
      lit(""""}]},{"@id":"w"""), $"c_custkey",
      lit("""","@type":"CreativeWork","name":[{"@language":"en","@value":"Work """), $"c_custkey",
      lit(""""}],"creator":"p"""), $"c_custkey",
      lit(""""}]}"""))
    val docs = env.customer.select($"c_custkey".as("k"), json.as("json"))
    val nodes = JsonLd.explodeGraph(docs, "k", "json")
    JsonLd.resolveCreators(nodes)
      .select($"key".cast("long").as("key"), $"work_id", $"work_name",
              $"creator_name")
      .orderBy($"key")
  }

  /** S5/F15 — HTML scrape: PageHeader2 title + review table cells,
    * bad-title placeholder pages dropped. */
  def s5HtmlScrape(env: Env): DataFrame = {
    val title = when($"p_partkey" % 10 === 0, lit("Unknown")).otherwise($"p_name")
    val html = concat(
      lit("<html><body><span class=\"PageHeader2\">"), title,
      lit("</span><table><tr><td class=\"text\">Review one for "), $"p_brand",
      lit("</td></tr><tr><td class=\"text\">Review two</td></tr></table></body></html>"))
    val snap = env.part.select($"p_partkey".as("k"), html.as("html"))
    HtmlScrape.scrapeReviews(snap, "k", "html")
      .select($"key".cast("long").as("key"), $"title",
              $"review_ordinal", $"review")
      .orderBy($"key", $"review_ordinal")
  }

  /** S4b — JSON-LD subject classification (ref
    * `linked_data.py:508-585` extract_useful_data): genre → TAG,
    * about-URI patterns → DDC/FAST/LCSH, internal Intangible/Place
    * nodes → TAG/PLACE with the node's name as id, junk URIs dropped.
    */
  def s4SubjectClassify(env: Env): DataFrame = {
    val k = $"c_custkey"
    val place = when(k % 2 === 0, concat(
      lit(""","http://ex.org/g/"""), k, lit("""#P""""))).otherwise(lit(""))
    val placeNode = when(k % 2 === 0, concat(
      lit(""",{"@id":"http://ex.org/g/"""), k,
      lit("""#P","@type":"schema:Place","name":"Place """), k % 3,
      lit(""""}"""))).otherwise(lit(""))
    val json = concat(
      lit("""{"@graph":[{"@id":"b"""), k,
      lit("""","@type":["schema:CreativeWork","schema:Book"],"genre":{"@language":"en","@value":"Genre """),
      k % 5,
      lit("""."},"about":["http://dewey.info/class/8"""), k % 100,
      lit("""/e23/","http://id.worldcat.org/fast/"""), k,
      lit("""","http://id.loc.gov/authorities/subjects/sh"""), k,
      lit("""","http://ex.org/g/"""), k, lit("""#T""""), place,
      lit(""","http://junk.example/"""), k,
      lit(""""]},{"@id":"http://ex.org/g/"""), k,
      lit("""#T","@type":"schema:Intangible","name":{"@language":"en","@value":"Topic """),
      k % 7, lit(""""}}"""), placeNode, lit("""]}"""))
    val docs = env.customer.select(k.as("kk"), json.as("json"))
    val normalized = graft.sources.JsonLdKernel.normalizeGraph(docs, "kk", "json")
    graft.sources.JsonLdKernel.classifySubjects(normalized)
      .select($"key".cast("long").as("key"), $"subject_type", $"subject_id",
              $"subject_name")
      .orderBy($"key", $"subject_type", $"subject_id")
  }

  /** S13 — Content Cafe SOAP demand history: envelope snapshot →
    * per-warehouse items → monthly totals → popularity estimate
    * (as-of 2018-08-15 with a 60-day window: July is recent, June is
    * not; ref `content_cafe.py:351-424`). */
  def s13SoapDemand(env: Env): DataFrame = {
    val k = $"p_partkey"
    def item(y: Int, m: Int, demand: org.apache.spark.sql.Column, wh: String) =
      concat(lit("<DemandHistoryItem ID=\""), k, lit("\"><Year>"), lit(y),
        lit("</Year><Month>"), lit(m),
        lit("</Month><Supplier Code=\"BTB\">Supplier</Supplier><Warehouse Code=\""),
        lit(wh), lit("\">W</Warehouse><Demand>"), demand,
        lit("</Demand></DemandHistoryItem>"))
    val items = concat(
      item(2018, 6, k % 100, "SOM"),
      item(2018, 7, (k * 3) % 100, "SOM"),
      when(k % 2 === 0, item(2018, 7, (k * 7) % 50, "MOM")).otherwise(lit("")))
    val xml = concat(
      lit("<soap:Envelope xmlns:soap=\"http://schemas.xmlsoap.org/soap/envelope/\">" +
          "<soap:Body><SingleResponse><ContentCafe><RequestItems><RequestItem>" +
          "<Key Type=\"ISBN\">i"), k,
      lit("</Key><Content>DemandHistoryDetail</Content><DemandHistoryItems>"),
      items,
      lit("</DemandHistoryItems></RequestItem></RequestItems></ContentCafe>" +
          "</SingleResponse></soap:Body></soap:Envelope>"))
    val snap = env.part.select(k.as("pk"), xml.as("xml"))
    // localCheckpoint: monthly feeds BOTH the month pivot and the
    // popularity estimate — without it each branch re-parses every
    // envelope and re-runs the (key, year, month) aggregation.
    val monthly = graft.sources.DemandHistory.gatherPopularity(
      graft.sources.XmlKernels.demandHistory(snap, "pk", "xml"))
      .localCheckpoint(eager = false)
    val est = graft.sources.DemandHistory.estimatePopularity(
      monthly, to_date(lit("2018-08-15")), Some(60))
    val wide = monthly.groupBy($"key").agg(
      sum(when($"month" === 6, $"monthly_demand")).as("june_demand"),
      sum(when($"month" === 7, $"monthly_demand")).as("july_demand"))
    wide.join(est, Seq("key"))
      .select($"key".cast("long").as("key"), $"june_demand", $"july_demand",
              $"popularity")
      .orderBy($"key")
  }

  /** S10 — OPDS entry render sink (ref `controller.py:474-489`). */
  def s10OpdsRender(env: Env): DataFrame = {
    val rows = env.customer.select(
      concat(lit("urn:c:"), $"c_custkey").as("entry_id"),
      $"c_name".as("title"),
      concat(lit("Author "), $"c_custkey" % 7).as("author"),
      $"c_custkey")
    OpdsXml.renderEntries(rows, "entry_id", "title", "author")
      .orderBy($"entry_xml")
  }

  val entries: Seq[Q] = Seq(
    Q.sql("s2_viaf_parse", s2ViafParse,
      """SELECT c_custkey AS key, CAST(c_custkey AS VARCHAR) AS viaf_id,
        |       t.ordinal, t.sort_name
        |FROM customer, (VALUES (0, ''), (1, 'Alt ')) AS t0(ordinal, prefix),
        |LATERAL (SELECT t0.ordinal AS ordinal,
        |                t0.prefix || c_name AS sort_name) AS t
        |ORDER BY key, t.ordinal""".stripMargin),

    Q.sql("s3_classify_parse", s3ClassifyParse,
      """WITH base AS (
        |  SELECT p_partkey AS key, CAST(2 AS INT) AS response_code,
        |         '8' || (p_partkey % 100) AS ddc,
        |         'PS' || (p_partkey % 50) AS lcc
        |  FROM part),
        |owis AS (
        |  SELECT key, response_code, ddc, lcc, 'A' || key AS owi FROM base
        |  UNION ALL
        |  SELECT key, response_code, ddc, lcc, 'B' || key AS owi FROM base
        |  WHERE key % 2 = 0)
        |SELECT key, response_code, ddc, lcc, owi FROM owis
        |ORDER BY key, owi""".stripMargin),

    Q.sql("s3_classify_full", s3ClassifyFull,
      """SELECT p_partkey AS key,
        |  CAST(p_partkey % 1000 AS BIGINT) AS holdings,
        |  CAST(p_partkey % 50 AS BIGINT) AS editions,
        |  CAST(p_partkey AS VARCHAR) AS pswid,
        |  CAST(CASE WHEN p_partkey % 3 = 0 THEN 2 ELSE 1 END AS INT)
        |    AS n_authors,
        |  CAST(p_partkey * 2 AS VARCHAR) AS first_viaf,
        |  'n' || p_partkey AS first_lc,
        |  '8' || (p_partkey % 100) AS ddc,
        |  CAST(p_partkey % 500 AS BIGINT) AS ddc_weight,
        |  'F' || p_partkey AS fast_ident,
        |  CAST(p_partkey % 200 AS BIGINT) AS fast_heldby
        |FROM part
        |ORDER BY key""".stripMargin),

    Q.sql("s6_overdrive", s6Overdrive,
      """SELECT c_custkey AS overdrive_id,
        |  'T' || c_custkey AS title,
        |  CASE WHEN c_custkey % 3 = 0 THEN 'A' || c_custkey
        |       ELSE 'N' || c_custkey END AS author,
        |  'en' AS language,
        |  CAST(2 AS INT) AS n_formats
        |FROM customer
        |ORDER BY overdrive_id""".stripMargin),

    Q.sql("s4_jsonld", s4JsonLd,
      """SELECT c_custkey AS key,
        |  'w' || c_custkey AS work_id,
        |  'Work ' || c_custkey AS work_name,
        |  c_name AS creator_name
        |FROM customer
        |ORDER BY key""".stripMargin),

    Q.sql("s5_html_scrape", s5HtmlScrape,
      """WITH pages AS (SELECT p_partkey AS key, p_name, p_brand FROM part
        |               WHERE p_partkey % 10 <> 0)
        |SELECT key, p_name AS title, t.review_ordinal, t.review
        |FROM pages, LATERAL (SELECT * FROM (VALUES
        |  (0, 'Review one for ' || p_brand),
        |  (1, 'Review two')) AS v(review_ordinal, review)) AS t
        |ORDER BY key, t.review_ordinal""".stripMargin),

    Q.sql("s4_subject_classify", s4SubjectClassify,
      """WITH subs AS (
        |  SELECT c_custkey AS key, 'TAG' AS subject_type,
        |         'Genre ' || (c_custkey % 5) AS subject_id,
        |         NULL AS subject_name
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey, 'DDC', '8' || (c_custkey % 100), NULL FROM customer
        |  UNION ALL
        |  SELECT c_custkey, 'FAST', CAST(c_custkey AS VARCHAR), NULL FROM customer
        |  UNION ALL
        |  SELECT c_custkey, 'LCSH', 'sh' || c_custkey, NULL FROM customer
        |  UNION ALL
        |  SELECT c_custkey, 'TAG', 'Topic ' || (c_custkey % 7), NULL FROM customer
        |  UNION ALL
        |  SELECT c_custkey, 'PLACE', 'Place ' || (c_custkey % 3), NULL
        |  FROM customer WHERE c_custkey % 2 = 0)
        |SELECT key, subject_type, subject_id,
        |       CAST(subject_name AS VARCHAR) AS subject_name
        |FROM subs
        |ORDER BY key, subject_type, subject_id""".stripMargin),

    Q.sql("s13_soap_demand", s13SoapDemand,
      """WITH base AS (
        |  SELECT p_partkey AS key,
        |    CAST(p_partkey % 100 AS BIGINT) AS june_demand,
        |    CAST((p_partkey * 3) % 100
        |      + CASE WHEN p_partkey % 2 = 0 THEN (p_partkey * 7) % 50
        |             ELSE 0 END AS BIGINT) AS july_demand
        |  FROM part)
        |SELECT key, june_demand, july_demand,
        |  greatest(CAST(july_demand AS DOUBLE),
        |           CAST(greatest(june_demand, july_demand) AS DOUBLE) * 0.5)
        |    AS popularity
        |FROM base
        |ORDER BY key""".stripMargin),

    Q.sql("s10_opds_render", s10OpdsRender,
      """SELECT '<entry><id>urn:c:' || c_custkey || '</id><title>' || c_name
        |  || '</title><author><name>Author ' || (c_custkey % 7)
        |  || '</name></author></entry>' AS entry_xml
        |FROM customer
        |ORDER BY entry_xml""".stripMargin),
  )
}
