package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Kernel-vs-expression equivalence: the single-parse kernels must
  * reproduce the xpath expression pipeline (the round-2 oracle-green
  * implementation) row for row on the synthesized snapshot shapes, and
  * extend it (110 corporate headings, 400/700 alternates, UNIMARC,
  * Wikipedia source) per the reference semantics.
  */
class XmlKernelsSpec extends SparkSpec {
  import spark.implicits._

  private def viafXml(k: Int, name: String) =
    s"""<VIAFCluster><viafID>$k</viafID><datafield dtype="MARC21" tag="100"><subfield code="a">$name</subfield></datafield><datafield dtype="MARC21" tag="100"><subfield code="a">Alt $name</subfield></datafield></VIAFCluster>"""

  private def collectSorted(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  test("VIAF kernel == xpath expression pipeline on synthesized clusters") {
    val snap = (1 to 200)
      .map(k => (k.toLong, viafXml(k, s"Name $k, Jr."))).toDF("k", "xml")
    val expected = snap.select(
        col("k").as("key"),
        xpath_string(col("xml"), lit("//*[local-name()='viafID']/text()")).as("viaf_id"),
        posexplode_outer(xpath(col("xml"), lit(
          "//*[local-name()='datafield'][@dtype='MARC21'][@tag='100']/*[local-name()='subfield'][@code='a']/text()"))))
      .withColumnRenamed("pos", "ordinal")
      .withColumnRenamed("col", "sort_name")
    val actual = BiblioXml.parseViafClusters(snap, "k", "xml")
    assert(collectSorted(actual) == collectSorted(expected))
  }

  test("Classify kernel == xpath expression pipeline on synthesized docs") {
    val works = (k: Int) =>
      if (k % 2 == 0) s"""<work owi="A$k"/><work owi="B$k"/>"""
      else s"""<work owi="A$k"/>"""
    val snap = (1 to 200).map { k =>
      (k.toLong,
       s"""<classify><response code="2"/><works>${works(k)}</works><ddc><mostPopular sfa="8${k % 100}"/></ddc><lcc><mostPopular sfa="PS${k % 50}"/></lcc></classify>""")
    }.toDF("k", "xml")
    val expected = snap.select(
        col("k").as("key"),
        xpath_int(col("xml"), lit("string(//*[local-name()='response']/@code)")).as("response_code"),
        xpath_string(col("xml"), lit("string(//*[local-name()='work']/@title)")).as("title"),
        xpath_string(col("xml"), lit("string(//*[local-name()='work']/@author)")).as("author"),
        xpath_string(col("xml"), lit("string(//*[local-name()='ddc']/*[local-name()='mostPopular']/@sfa)")).as("ddc"),
        xpath_string(col("xml"), lit("string(//*[local-name()='lcc']/*[local-name()='mostPopular']/@sfa)")).as("lcc"),
        explode_outer(xpath(col("xml"), lit("//*[local-name()='work']/@owi"))).as("owi"))
    val actual = BiblioXml.parseClassify(snap, "k", "xml")
    assert(collectSorted(actual) == collectSorted(expected))
  }

  test("HTML kernel == xpath expression pipeline on synthesized pages") {
    val snap = (1 to 200).map { k =>
      val title = if (k % 10 == 0) "Unknown" else s"Part $k &amp; co"
      (k.toLong,
       s"""<html><body><span class="PageHeader2">$title</span><table><tr><td class="text">Review one for B$k</td></tr><tr><td class="text">Review two</td></tr></table></body></html>""")
    }.toDF("k", "html")
    val expected = snap.select(
        col("k").as("key"),
        xpath_string(col("html"), lit("//span[@class='PageHeader2']/text()")).as("title"),
        posexplode_outer(xpath(col("html"), lit("//td[@class='text']/text()"))))
      .withColumnRenamed("pos", "review_ordinal")
      .withColumnRenamed("col", "review")
      .filter(!col("title").isin(HtmlScrape.BadTitles: _*))
    val actual = HtmlScrape.scrapeReviews(snap, "k", "html")
    assert(collectSorted(actual) == collectSorted(expected))
  }

  test("sanitize escapes bare ampersands outside CDATA only") {
    // bare & escaped; real entities untouched
    assert(XmlKernels.sanitize("<a>AT&T</a>") == "<a>AT&amp;T</a>")
    assert(XmlKernels.sanitize("<a>&amp; &#38; &#x26;</a>") == "<a>&amp; &#38; &#x26;</a>")
    // legal CDATA text keeps its & (lxml recover=True preserves it)
    assert(XmlKernels.sanitize("<a><![CDATA[AT&T & co]]> & out</a>")
      == "<a><![CDATA[AT&T & co]]> &amp; out</a>")
    // two CDATA runs with bare & between them
    assert(XmlKernels.sanitize("<a><![CDATA[&]]>&<![CDATA[&]]></a>")
      == "<a><![CDATA[&]]>&amp;<![CDATA[&]]></a>")
    // unterminated CDATA: the rest of the document is left untouched
    assert(XmlKernels.sanitize("<a><![CDATA[x & y") == "<a><![CDATA[x & y")
  }

  test("classTagTextRuns matches class tokens, not the whole attribute") {
    val html = """<table><tr><td class="text small">One &amp; two</td></tr>
      |<tr><td class='small text'>Three</td></tr>
      |<tr><td class="textual">Nope</td></tr>
      |<tr><td class=text>Bare</td></tr>
      |<tr><td id="x" class="text">Last</td></tr></table>""".stripMargin
    assert(XmlKernels.classTagTextRuns(html, "td", "text").toSeq ==
      Seq("One & two", "Three", "Bare", "Last"))
    // a 'class =' LOOKALIKE inside another attribute's value must not
    // shadow the element's real class attribute
    val tricky = """<table><tr><td title="see class = big" class="text">X</td></tr>
      |<tr><td title='class="text"'>Nope</td></tr></table>""".stripMargin
    assert(XmlKernels.classTagTextRuns(tricky, "td", "text").toSeq == Seq("X"))
    // a '>' inside a quoted attribute value must not end the tag early
    val gtInAttr = """<table><tr><td title="a>b" class="text">Y</td></tr></table>"""
    assert(XmlKernels.classTagTextRuns(gtInAttr, "td", "text").toSeq == Seq("Y"))
  }

  test("VIAF kernel: 110 corporate headings, 400/700 alternates, UNIMARC, wikipedia") {
    val xml =
      """<ns2:VIAFCluster xmlns:ns2="http://viaf.org/viaf/terms#">
        |<ns2:viafID>42</ns2:viafID>
        |<ns2:sources><ns2:source nsid="q123">WKP|Q5231415</ns2:source>
        |<ns2:source nsid="twain">WKP|Mark_Twain</ns2:source></ns2:sources>
        |<ns2:mainHeadings>
        |<ns2:data><ns2:datafield dtype="MARC21" tag="100"><ns2:subfield code="a">Twain, Mark,</ns2:subfield></ns2:datafield></ns2:data>
        |<ns2:data><ns2:datafield dtype="MARC21" tag="110"><ns2:subfield code="a">Some Corporation</ns2:subfield></ns2:datafield></ns2:data>
        |<ns2:data><ns2:datafield dtype="UNIMARC" tag="200"><ns2:subfield code="a">Twain,</ns2:subfield><ns2:subfield code="b">Mark</ns2:subfield></ns2:datafield></ns2:data>
        |</ns2:mainHeadings>
        |<ns2:x400s><ns2:x400><ns2:datafield dtype="MARC21" tag="400"><ns2:subfield code="a">Clemens, Samuel Langhorne</ns2:subfield></ns2:datafield></ns2:x400></ns2:x400s>
        |<ns2:x700s><ns2:x700><ns2:datafield dtype="MARC21" tag="700"><ns2:subfield code="a">Snodgrass, Quintus Curtius</ns2:subfield></ns2:datafield></ns2:x700></ns2:x700s>
        |</ns2:VIAFCluster>""".stripMargin
    val row = BiblioXml.parseViafFull(Seq(("k", xml)).toDF("key", "xml"),
      "key", "xml").head()
    assert(row.getAs[String]("viaf_id") == "42")
    assert(row.getSeq[String](row.fieldIndex("sort_names")) ==
      Seq("Twain, Mark,", "Some Corporation"))
    assert(row.getSeq[String](row.fieldIndex("alternate_names")) ==
      Seq("Clemens, Samuel Langhorne", "Snodgrass, Quintus Curtius"))
    // wikidata-id WKP source skipped, real page kept (viaf.py:522-530)
    assert(row.getAs[String]("wikipedia_name") == "Mark_Twain")
    val uni = row.getSeq[org.apache.spark.sql.Row](row.fieldIndex("unimarc_names"))
    assert(uni.length == 1)
    assert(uni.head.getAs[String]("family") == "Twain")
    assert(uni.head.getAs[String]("given") == "Mark")
    assert(uni.head.getAs[String]("sort_name") == "Twain, Mark")
  }

  test("kernels tolerate malformed payloads and null content") {
    val snap = Seq((1L, "<VIAFCluster><viafID>7</viafID><unclosed"),
                   (2L, null.asInstanceOf[String]),
                   (3L, "not xml at all")).toDF("k", "xml")
    val rows = BiblioXml.parseViafClusters(snap, "k", "xml")
      .orderBy("key").collect()
    // partial extraction for 1; empty-but-present rows for 2 and 3
    assert(rows.map(_.getAs[String]("viaf_id")).toSeq == Seq("7", "", ""))
    val pages = HtmlScrape.scrapeReviews(
      Seq((1L, null.asInstanceOf[String])).toDF("k", "html"), "k", "html")
    assert(pages.count() == 0) // "" title is a bad-title sentinel
  }
}
