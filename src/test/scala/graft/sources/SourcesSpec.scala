package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("S7: FAST triple regex extracts id and name, ignores other predicates") {
    val lines = Seq(
      """<http://id.worldcat.org/fast/1075819> <http://schema.org/name> "Python (Computer program language)" .""",
      """<http://id.worldcat.org/fast/1075819> <http://schema.org#name> "Alt name" .""",
      """<http://id.worldcat.org/fast/1075819> <http://purl.org/other> "ignored" .""",
      """garbage line""").toDF("value")
    val out = NTriples.parseFast(lines).collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.toSeq == Seq(
      ("1075819", "Python (Computer program language)"),
      ("1075819", "Alt name")))
  }

  test("S7: LCSH triple regex requires @en label") {
    val lines = Seq(
      """<http://id.loc.gov/authorities/subjects/sh85000001> <http://www.loc.gov/mads/rdf/v1#authoritativeLabel> "History"@en""",
      """<http://id.loc.gov/authorities/subjects/sh85000002> <http://www.loc.gov/mads/rdf/v1#authoritativeLabel> "Histoire"@fr""").toDF("value")
    val out = NTriples.parseLcsh(lines).collect()
    assert(out.length == 1 && out(0).getString(0) == "sh85000001")
  }

  test("S7: generic triple split handles literal and uri objects") {
    val lines = Seq(
      """<http://a> <http://p> "lit" .""",
      """<http://a> <http://p> <http://b> .""").toDF("value")
    val out = NTriples.parseTriples(lines).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(out.toSeq == Seq(
      ("http://a", "http://p", "lit"),
      ("http://a", "http://p", "http://b")))
  }

  test("S12: MARC title prefers 245 over 240; subfield accessor") {
    val json =
      """{"varFields":[
        |{"marcTag":"240","subfields":[{"tag":"a","content":"Uniform Title"}]},
        |{"marcTag":"245","subfields":[{"tag":"a","content":"Real Title"},{"tag":"b","content":"sub"}]},
        |{"marcTag":"100","subfields":[{"tag":"a","content":"Smith, Jane"},{"tag":"e","content":"editor."}]},
        |{"marcTag":"082","subfields":[{"tag":"a","content":"813.54"}]}
        |]}""".stripMargin.replaceAll("\n", "")
    val df = Seq((1L, json)).toDF("id", "json")
    val fields = MarcJson.explodeVarFields(df, "id", "json")
    assert(MarcJson.titles(fields).head().getString(1) == "Real Title")
    val c = MarcJson.contributors(fields).head()
    assert(c.getString(1) == "Smith, Jane" && c.getString(2) == "editor.")
    val s = MarcJson.subjects(fields).head()
    assert(s.getString(1) == "DDC" && s.getString(2) == "813.54")
  }

  test("S12: 240 fallback when no 245; default author role") {
    val json = """{"varFields":[{"marcTag":"240","subfields":[{"tag":"a","content":"Only Title"}]},{"marcTag":"100","subfields":[{"tag":"a","content":"Doe, J."}]}]}"""
    val fields = MarcJson.explodeVarFields(Seq((1L, json)).toDF("id", "json"), "id", "json")
    assert(MarcJson.titles(fields).head().getString(1) == "Only Title")
    assert(MarcJson.contributors(fields).head().getString(2) == "author.")
  }

  test("S9: OPDS entry parse and render round-trip") {
    val rows = Seq(("urn:x:1", "A Title & More", "Jane <Q> Smith"))
      .toDF("entry_id", "title", "author")
    val rendered = OpdsXml.renderEntries(rows, "entry_id", "title", "author")
    val parsed = OpdsXml.parseEntries(rendered, "entry_xml").head()
    assert(parsed.getString(0) == "urn:x:1")
    assert(parsed.getString(1) == "A Title & More")
    assert(parsed.getString(2) == "Jane <Q> Smith")
  }

  test("S2: VIAF cluster extraction — id, MARC21 sort names in order, titles") {
    val xml =
      """<ns2:VIAFCluster xmlns:ns2="http://viaf.org/viaf/terms#">
        |<ns2:viafID>102333412</ns2:viafID>
        |<ns2:mainHeadings>
        |  <ns2:data><ns2:datafield dtype="MARC21" tag="100">
        |    <ns2:subfield code="a">Kaling, Mindy</ns2:subfield></ns2:datafield></ns2:data>
        |  <ns2:data><ns2:datafield dtype="MARC21" tag="100">
        |    <ns2:subfield code="a">Kaling, M.</ns2:subfield></ns2:datafield></ns2:data>
        |  <ns2:data><ns2:datafield dtype="UNIMARC" tag="200">
        |    <ns2:subfield code="a">ignored</ns2:subfield></ns2:datafield></ns2:data>
        |</ns2:mainHeadings>
        |<ns2:titles><ns2:work><ns2:title>Is Everyone Hanging Out Without Me?</ns2:title></ns2:work></ns2:titles>
        |</ns2:VIAFCluster>""".stripMargin
    val snap = Seq(("k1", xml)).toDF("key", "xml")
    val rows = BiblioXml.parseViafClusters(snap, "key", "xml")
      .orderBy("ordinal").collect()
    assert(rows.map(_.getString(1)).toSet == Set("102333412"))
    assert(rows.map(r => (r.getInt(2), r.getString(3))).toSeq ==
      Seq((0, "Kaling, Mindy"), (1, "Kaling, M.")))
    val titles = snap.select(BiblioXml.viafTitles(col("xml"))).head().getSeq[String](0)
    assert(titles == Seq("Is Everyone Hanging Out Without Me?"))
  }

  test("S3: Classify multi-work response — owis exploded, headings shared") {
    val xml =
      """<classify xmlns="http://classify.oclc.org">
        |<response code="4"/>
        |<works>
        |  <work owi="1" title="t" author="a"/>
        |  <work owi="2" title="t2" author="a2"/>
        |</works>
        |<recommendations>
        |  <ddc><mostPopular nsfa="813" sfa="813.6"/></ddc>
        |  <lcc><mostPopular nsfa="PS3611" sfa="PS3611.A4"/></lcc>
        |</recommendations>
        |</classify>""".stripMargin
    val rows = BiblioXml.parseClassify(Seq(("isbn1", xml)).toDF("key", "xml"),
        "key", "xml").orderBy("owi").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getAs[String]("owi")).toSeq == Seq("1", "2"))
    assert(rows.head.getAs[Int]("response_code") == 4)
    assert(rows.head.getAs[String]("ddc") == "813.6")
    assert(rows.head.getAs[String]("lcc") == "PS3611.A4")
  }
}
