package graft.queries

import graft.{Env, Q}
import graft.syntax._
import graft.sources.{MarcJson, NTriples, OpdsXml}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Source/parser correctness queries. Raw payloads (N-Triples lines,
  * OPDS XML, MARC-in-JSON) are CONSTRUCTED deterministically from the
  * testdata tables, pushed through the real parsers, and the oracle
  * computes the expected output constructively — ground truth
  * independent of the parsing implementation.
  */
object SourceQueries {

  /** S7 — FAST N-Triples regex scan (ref `fast.py:22`, `fast.py:62-104`). */
  def s7Ntriples(env: Env): DataFrame = {
    val lines = env.part.select(concat(
      lit("<http://id.worldcat.org/fast/"), $"p_partkey",
      lit("> <http://schema.org/name> \""), $"p_name",
      lit("\" .")).as("value"))
    NTriples.parseFast(lines)
      .select($"id".cast("long").as("fast_id"), $"name")
      .orderBy($"fast_id")
  }

  /** S9 — OPDS/Atom entry parse via xpath (ref `controller.py:566-597`). */
  def s9OpdsParse(env: Env): DataFrame = {
    val xml = env.orders.select($"o_orderkey", concat(
      lit("<feed><entry><id>urn:order:"), $"o_orderkey",
      lit("</id><title>Order "), $"o_orderkey",
      lit("</title><author><name>C"), $"o_custkey",
      lit("</name></author></entry></feed>")).as("xml"))
    OpdsXml.parseEntries(xml, "xml")
      .select($"entry_id", $"title", $"author")
      .orderBy($"entry_id")
  }

  /** S12 — MARC-in-JSON tag dispatch (ref `shadow_catalog.py:200-321`):
    * 245$a title with 240$a fallback, 100$a contributor with $e role
    * defaulting to "author.". */
  def s12MarcJson(env: Env): DataFrame = {
    val titleTag = when($"c_custkey" % 3 === 0, lit("240")).otherwise(lit("245"))
    val roleSub = when($"c_custkey" % 2 === 0,
      concat(lit(""","subfields":[{"tag":"a","content":"A"""), $"c_custkey",
             lit(""""},{"tag":"e","content":"illustrator."}]""")))
      .otherwise(
        concat(lit(""","subfields":[{"tag":"a","content":"A"""), $"c_custkey",
               lit(""""}]""")))
    val json = env.customer.select($"c_custkey", concat(
      lit("""{"varFields":[{"marcTag":""""), titleTag,
      lit("""","subfields":[{"tag":"a","content":""""), $"c_name",
      lit(""""}]},{"marcTag":"100""""), roleSub,
      lit("""}]}""")).as("json"))
    val fields = MarcJson.explodeVarFields(json, "c_custkey", "json")
    MarcJson.titles(fields)
      .join(MarcJson.contributors(fields), Seq("record_id"))
      .select($"record_id", $"title", $"sort_name", $"role")
      .orderBy($"record_id")
  }

  val entries: Seq[Q] = Seq(
    Q.sql("s7_ntriples", s7Ntriples,
      """SELECT p_partkey AS fast_id, p_name AS name FROM part
        |ORDER BY fast_id""".stripMargin),

    Q.sql("s9_opds_parse", s9OpdsParse,
      """SELECT 'urn:order:' || o_orderkey AS entry_id,
        |       'Order ' || o_orderkey AS title,
        |       'C' || o_custkey AS author
        |FROM orders
        |ORDER BY entry_id""".stripMargin),

    Q.sql("s12_marc_json", s12MarcJson,
      """SELECT c_custkey AS record_id,
        |       c_name AS title,
        |       'A' || c_custkey AS sort_name,
        |       CASE WHEN c_custkey % 2 = 0 THEN 'illustrator.'
        |            ELSE 'author.' END AS role
        |FROM customer
        |ORDER BY record_id""".stripMargin),
  )
}
