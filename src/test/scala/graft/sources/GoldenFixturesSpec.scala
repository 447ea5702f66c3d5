package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Golden-fixture validation: the extraction kernels against REAL
  * captured service payloads (copied from the reference's test corpus,
  * `/root/reference/tests/files/`), asserting the same facts the
  * reference's own tests assert (`tests/test_viaf.py`,
  * `tests/oclc_/test_classify_xml_parser.py`,
  * `tests/test_content_cafe.py`, `tests/oclc_/test_linked_data.py`).
  * These payloads have SRU envelopes, namespaces, UNIMARC records,
  * error statuses, and tag soup the synthesized docs never exercise.
  */
class GoldenFixturesSpec extends SparkSpec {
  import spark.implicits._

  private def fixture(path: String): String = {
    val in = getClass.getResourceAsStream("/fixtures/" + path)
    require(in != null, s"missing fixture $path")
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  private def viafRow(file: String): Row =
    BiblioXml.parseViafFull(
      Seq((file, fixture(s"viaf/$file"))).toDF("key", "xml"), "key", "xml")
      .head()

  /** Reference sort_names_by_popularity (viaf.py:533-539): most common
    * sort name after trailing-comma strip. */
  private def topSortName(row: Row): String = {
    val names = row.getSeq[String](row.fieldIndex("sort_names"))
      .map(n => if (n.endsWith(",")) n.dropRight(1) else n)
    names.groupBy(identity).toSeq
      .sortBy { case (n, g) => (-g.size, names.indexOf(n)) }.head._1
  }

  test("VIAF golden: mindy_kaling.xml — viafID, popular sort name, wikidata WKP skipped") {
    val row = viafRow("mindy_kaling.xml")
    assert(row.getAs[String]("viaf_id") == "9581122")
    assert(topSortName(row) == "Kaling, Mindy")
    // WKP|Q539917 is a wikidata id, not a Wikipedia page (test_viaf.py:114)
    assert(row.getAs[String]("wikipedia_name") == null)
    assert(row.getSeq[String](row.fieldIndex("titles"))
      .exists(_.contains("Is everyone hanging out without me")))
  }

  test("VIAF golden: will_eisner.xml — Wikipedia page name extracted") {
    val row = viafRow("will_eisner.xml")
    assert(row.getAs[String]("viaf_id") == "10455")
    assert(row.getAs[String]("wikipedia_name") == "Will_Eisner")
    assert(graft.functions.Names.wikipediaNameToDisplayName(
      row.getAs[String]("wikipedia_name")) == "Will Eisner")
  }

  test("VIAF golden: michelle_belanger.xml — wikidata-only WKP source gives no name") {
    val row = viafRow("michelle_belanger.xml")
    assert(row.getAs[String]("viaf_id") == "38770861")
    assert(row.getAs[String]("wikipedia_name") == null)
  }

  test("VIAF golden: mark_twain.xml — popular sort name, alternates, UNIMARC") {
    val row = viafRow("mark_twain.xml")
    assert(row.getAs[String]("viaf_id") == "50566653")
    assert(topSortName(row) == "Twain, Mark")
    assert(row.getAs[String]("wikipedia_name") == "Mark_Twain")
    val alts = row.getSeq[String](row.fieldIndex("alternate_names"))
    assert(alts.exists(_.startsWith("Clemens, Samuel Langhorne")))
    val uni = row.getSeq[Row](row.fieldIndex("unimarc_names"))
    assert(uni.nonEmpty)
    assert(uni.exists(u => u.getAs[String]("family") == "Twain" &&
                           u.getAs[String]("given") == "Mark"))
  }

  test("VIAF golden: aquarius.xml — corporate entry via UNIMARC nameparts") {
    val row = viafRow("aquarius.xml")
    assert(row.getAs[String]("viaf_id") == "159591140")
    // no MARC21 100/110 headings in this cluster; the name comes from
    // the UNIMARC record (test_viaf.py:133 expects "Aquarius Paris")
    // UNIMARC 210: $a family "Aquarius", $c extra "Paris", no $b
    val uni = row.getSeq[Row](row.fieldIndex("unimarc_names"))
    assert(uni.exists(u => u.getAs[String]("family") == "Aquarius" &&
                           u.getAs[String]("extra") == "Paris" &&
                           u.getAs[String]("sort_name") == "Aquarius, Paris"))
  }

  /** Run the name-resolution brain on a parsed fixture cluster. */
  private def nameInfo(file: String, workingSort: Option[String] = None,
                       workingDisplay: Option[String] = None) = {
    import graft.functions.ViafNames
    val row = viafRow(file)
    val unimarcs = row.getSeq[Row](row.fieldIndex("unimarc_names")).map { u =>
      ViafNames.UnimarcParts(
        Option(u.getAs[String]("given")), Option(u.getAs[String]("family")),
        Option(u.getAs[String]("extra")),
        Option(u.getAs[String]("sort_name")).filter(_.nonEmpty))
    }
    ViafNames.extractNameInfo(
      Option(row.getAs[String]("viaf_id")).filter(_.nonEmpty),
      row.getSeq[String](row.fieldIndex("sort_names")),
      unimarcs, Option(row.getAs[String]("wikipedia_name")),
      workingSort, workingDisplay)
  }

  test("working sort name only selects the cluster's matched form (>90 gate)") {
    // ref viaf.py:324-331: the working name is NEVER returned verbatim —
    // a cluster sort name fuzzy-matching it > 90 wins in the CLUSTER's
    // own form; with no such match the popularity consensus decides.
    val matched = nameInfo("will_eisner.xml", workingSort = Some("Will Eisner"))
    assert(matched.sortName == Some("Eisner, Will"))
    val unmatched = nameInfo("will_eisner.xml", workingSort = Some("Austen, Jane"))
    assert(unmatched.sortName == Some("Eisner, Will"))
  }

  test("VIAF name resolution: the reference's own parse() expectations") {
    import graft.functions.ViafNames.NameInfo
    // test_viaf.py:104-139 — wikipedia-present, wikidata-only, plain,
    // and corporate-via-UNIMARC entries
    val eisner = nameInfo("will_eisner.xml")
    assert(eisner.viaf == Some("10455") &&
      eisner.displayName == Some("Will Eisner") &&
      eisner.familyName == Some("Eisner") &&
      eisner.wikipediaName == Some("Will_Eisner"))
    val belanger = nameInfo("michelle_belanger.xml")
    assert(belanger.viaf == Some("38770861") &&
      belanger.displayName == Some("Michelle A. Belanger") &&
      belanger.familyName == Some("Belanger") &&
      belanger.wikipediaName == None)
    val palmer = nameInfo("palmer.xml")
    assert(palmer.viaf == Some("2506349") &&
      palmer.displayName == Some("Roy Ernest Palmer") &&
      palmer.familyName == Some("Palmer") && palmer.wikipediaName == None)
    val aquarius = nameInfo("aquarius.xml")
    assert(aquarius.viaf == Some("159591140") &&
      aquarius.displayName == Some("Aquarius Paris") &&
      aquarius.familyName == Some("Aquarius"))
  }

  test("VIAF name resolution: many-names consensus (test_many_names)") {
    // the Wikipedia name corrects even a 'Sam Clemens' working name
    val twain = nameInfo("mark_twain.xml",
      workingDisplay = Some("Sam Clemens"))
    assert(twain.viaf == Some("50566653") &&
      twain.displayName == Some("Mark Twain") &&
      twain.familyName == Some("Twain") &&
      twain.wikipediaName == Some("Mark_Twain"))
    // without Wikipedia, popularity consensus wins
    val noWiki = nameInfo("mark_twain_no_wikipedia.xml")
    assert(noWiki.displayName == Some("Mark Twain") &&
      noWiki.familyName == Some("Twain") && noWiki.wikipediaName == None)
    // a working display name keeps its own display but the family name
    // follows the resembling UNIMARC records and the sort name follows
    // the cluster's popularity
    val clemens = nameInfo("mark_twain_no_wikipedia.xml",
      workingDisplay = Some("Samuel Langhorne Clemens"))
    assert(clemens.displayName == Some("Samuel Langhorne Clemens"))
    assert(clemens.sortName == Some("Twain, Mark"))
    assert(clemens.familyName == Some("Clemens"))
    // test_process_contributor: Mindy Kaling's consensus names
    val mindy = nameInfo("mindy_kaling.xml")
    assert(mindy.sortName == Some("Kaling, Mindy"))
    assert(mindy.displayName == Some("Mindy Kaling"))
  }

  test("Classify golden: error status, multi-work owis, single-work headings") {
    val docs = Seq(
      ("not_found", fixture("classify/isbn_not_found.xml")),
      ("multi", fixture("classify/multi_work_with_owis.xml")),
      ("single", fixture("classify/single_work_48446512.xml")))
      .toDF("key", "xml")
    val rows = BiblioXml.parseClassify(docs, "key", "xml")
      .orderBy("key", "owi").collect()
    val byKey = rows.groupBy(_.getAs[String]("key"))

    // error response: code 102, no works (classify.py:68-94)
    val nf = byKey("not_found")
    assert(nf.length == 1 && nf.head.getAs[Int]("response_code") == 102 &&
           nf.head.getAs[String]("owi") == null)

    // multi-work: code 4, both owis, first work's title/author
    val mw = byKey("multi")
    assert(mw.head.getAs[Int]("response_code") == 4)
    assert(mw.map(_.getAs[String]("owi")).toSeq ==
      Seq("48446512", "48525129"))
    assert(mw.head.getAs[String]("title") ==
      "So long, and thanks for all the fish")
    assert(mw.head.getAs[String]("author") == "Adams, Douglas, 1952-2001")

    // single-work: code 2, most-popular DDC/LCC headings
    val sw = byKey("single")
    assert(sw.length == 1 && sw.head.getAs[Int]("response_code") == 2)
    assert(sw.head.getAs[String]("owi") == "48446512")
    assert(sw.head.getAs[String]("ddc") == "823.914")
    assert(sw.head.getAs[String]("lcc") == "PR6051.D3352")
  }

  test("Classify golden: single-work authors, measurements, heading weights (test_parse)") {
    val row = BiblioXml.parseClassifyFull(
      Seq(("swid", fixture("classify/single_work_response.xml"))).toDF("key", "xml"),
      "key", "xml").head()
    // measurements (test_classify_xml_parser.py:85-87)
    assert(row.getAs[Long]("work_holdings") == 46983L)
    assert(row.getAs[Long]("work_editions") == 2781L)
    // classification weights (:94-101)
    assert(row.getAs[String]("ddc") == "813.3" &&
           row.getAs[Long]("ddc_holdings") == 21183L)
    assert(row.getAs[String]("lcc") == "PS2384" &&
           row.getAs[Long]("lcc_holdings") == 22460L)
    // FAST headings in document order with weights and names (:103-107)
    val fasts = row.getSeq[Row](row.fieldIndex("fast_headings"))
    assert(fasts.map(_.getAs[String]("ident")) == Seq("1174284", "1174266",
      "801923", "1116147", "1174307", "1016699", "1110122", "1356235"))
    assert(fasts.map(_.getAs[Long]("heldby")) == Seq(32058L, 31482L, 29933L,
      19086L, 18913L, 17294L, 6893L, 4512L))
    assert(fasts.head.getAs[String]("name") == "Whaling")
    // contributors: lc/viaf ids + role brackets through Roles.parseOne
    // (:59-78)
    val authors = row.getSeq[Row](row.fieldIndex("authors"))
    val parsed = authors.map { a =>
      val p = graft.functions.Roles.parseOne(a.getAs[String]("text"))
      (p.name, a.getAs[String]("lc"), a.getAs[String]("viaf"), p.roles.toSet,
       p.birth, p.death)
    }
    val byName = parsed.map(p => p._1 -> p).toMap
    assert(byName("Parker, Hershel") ==
      (("Parker, Hershel", "n50050335", "4947338",
        Set(graft.functions.Roles.Editor), None, None)))
    assert(byName("Tanner, Tony")._4 == Set(
      graft.functions.Roles.Unknown, graft.functions.Roles.Editor,
      graft.functions.Roles.Introduction, graft.functions.Roles.Author))
    assert(byName("Hayford, Harrison")._4 == Set(
      graft.functions.Roles.Associated, graft.functions.Roles.Editor))
    val melville = byName("Melville, Herman")
    assert(melville._2 == "n79006936" && melville._3 == "27068555")
    assert(melville._4 == Set(graft.functions.Roles.Author)) // default role
    assert(melville._5 == Some("1819") && melville._6 == Some("1891"))
  }

  test("Content Cafe golden: reviews.html — title + six review sections") {
    val df = HtmlScrape.scrapeSectioned(
      Seq((1L, fixture("content_cafe/reviews.html"))).toDF("k", "html"),
      "k", "html").orderBy("section_ordinal")
    val rows = df.collect()
    // test_content_cafe.py:277-284: six reviews, first mentions the myth,
    // and the title is scraped incidentally
    assert(rows.length == 6)
    assert(rows.forall(_.getAs[String]("title") == "Shadow Thieves"))
    assert(rows.head.getAs[String]("content").contains("isn't a myth!"))
    assert(rows.head.getAs[String]("section").contains("Booklist"))
  }

  test("SOAP golden: demand history — monthly totals, recency window, unknown ISBN") {
    val docs = Seq(
      (1L, fixture("content_cafe/demand_info_present.xml")),
      (2L, fixture("content_cafe/demand_info_missing.xml"))).toDF("k", "xml")
    val items = XmlKernels.demandHistory(docs, "k", "xml")
    assert(items.count() == 12) // 12 warehouse items in the real payload
    assert(items.filter(col("key") === 2L).count() == 0) // unknown ISBN → no rows

    val monthly = DemandHistory.gatherPopularity(items)
    val byMonth = monthly.collect()
      .map(r => (r.getAs[Int]("year"), r.getAs[Int]("month")) -> r.getAs[Long]("monthly_demand"))
      .toMap
    // test_content_cafe.py:491-561: per-month totals and the 1347 peak
    assert(byMonth == Map((2018, 6) -> 969L, (2018, 7) -> 800L, (2018, 8) -> 1347L))

    // as of the gather date, the answer is the max recent monthly total
    val now = DemandHistory.estimatePopularity(monthly, to_date(lit("2019-08-04")))
      .head().getAs[Double]("popularity")
    assert(now == 1347.0)
    // six months later with a 90-day window: half the all-time max
    val later = DemandHistory.estimatePopularity(monthly,
        to_date(lit("2020-01-31")), Some(90))
      .head().getAs[Double]("popularity")
    assert(later == 1347.0 / 2)
    // a two-year window keeps the data relevant
    val longWindow = DemandHistory.estimatePopularity(monthly,
        to_date(lit("2020-01-31")), Some(730))
      .head().getAs[Double]("popularity")
    assert(longWindow == 1347.0)
  }

  test("OPDS golden: namespaced lookup feed parses; no-result feed yields no entries") {
    val feeds = Seq(
      ("lookup", fixture("opds/content_server_lookup.opds")),
      ("missing", fixture("opds/no_such_work.opds"))).toDF("key", "xml")
    val rows = OpdsXml.parseFeedEntries(feeds, "key", "xml").collect()
    assert(rows.length == 1)
    val e = rows.head
    assert(e.getAs[String]("entry_id") == "http://www.gutenberg.org/ebooks/20201")
    assert(e.getAs[String]("title") == "Mary Gray")
    assert(e.getAs[String]("author_name") == null) // real feed has <name/>
    assert(e.getAs[String]("sort_name") == "Tynan, Katharine")
    assert(e.getAs[String]("pwid") == "e05f1380-5e6b-82f6-70ee-539507f82520")
    assert(e.getAs[String]("additional_type") == "http://schema.org/Book")
    assert(e.getAs[String]("provider") == "Gutenberg")
  }

  test("Overdrive golden: real metadata payload — title, author role, language, formats") {
    val snap = Seq((1L, fixture("overdrive/overdrive_metadata.json")))
      .toDF("od", "json")
    val row = OverdriveJson.parseBibliographic(snap, "od", "json").head()
    assert(row.getAs[String]("title") == "Agile Documentation")
    assert(row.getAs[String]("author") == "Andreas R&#252;ping")
    assert(row.getAs[String]("language") == "en")
    assert(row.getAs[Int]("n_formats") == 2)
  }

  test("FAST golden: gzipped n-triples read; junk and corrupt files don't crash the scan") {
    val dir = getClass.getResource("/fixtures/fast").getPath
    // *.nt.gz glob mirrors the reference's extension filter (junk files
    // in the directory are never read); gz decompression is native to
    // the text source
    val lines = spark.read.text(s"$dir/not-consolidated/FAST/*.nt.gz")
    val out = NTriples.parseFast(lines).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(out.contains(("631903", "New Yorker (Fireboat)")))
    assert(out.contains(("1750175", "Short stories, American")))
    assert(out.contains(("1726280", "Filmed roundtables")))
    // a corrupt gz member is skipped under ignoreCorruptFiles — the
    // production posture for bulk authority loads — not a job failure
    val prev = spark.conf.getOption("spark.sql.files.ignoreCorruptFiles")
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try {
      val broken = spark.read.text(s"$dir/broken.nt.gz")
      assert(NTriples.parseFast(broken).count() == 0)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.files.ignoreCorruptFiles", v)
      case None => spark.conf.unset("spark.sql.files.ignoreCorruptFiles")
    }
  }

  test("Covers golden: stand-in placeholder rejected, real cover kept") {
    def bytes(path: String): Array[Byte] = {
      val in = getClass.getResourceAsStream("/fixtures/" + path)
      require(in != null, s"missing fixture $path")
      try in.readAllBytes() finally in.close()
    }
    val prefix = bytes("content_cafe/stand-in-prefix.png")
    val media = Seq(
      (1L, bytes("content_cafe/stand-in-image.png")),
      (2L, bytes("covers/test-book-cover.png")),
      (3L, bytes("covers/tiny-image-cover.png")),
      (4L, null.asInstanceOf[Array[Byte]])).toDF("media_id", "content")
    // content_cafe.py:308-313: a cover starting with the stand-in
    // prefix is not a real cover image
    val kept = graft.operators.Multimodal.suitableCovers(media, prefix)
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L))
    val keptBig = graft.operators.Multimodal
      .suitableCovers(media, prefix, minBytes = 10000)
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(keptBig == Set(2L)) // the 3.7KB cover fails the size floor
  }

  test("JSON-LD golden: galapagos.jsonld — book node, publisher resolved through graph") {
    val docs = Seq((1L, fixture("jsonld/galapagos.jsonld"))).toDF("k", "json")
    val nodes = JsonLdKernel.normalizeGraph(docs, "k", "json")
    val book = JsonLdKernel.resolvePublishers(nodes).head()
    // tests/oclc_/test_linked_data.py:84-119
    assert(book.getAs[String]("oclcnum") == "11866009")
    assert(book.getAs[String]("title") == "Galápagos : a novel")
    assert(book.getAs[String]("date_published") == "1985")
    assert(book.getAs[String]("publisher_name") ==
      "Delacorte Press/Seymour Lawrence")
    val bookNode = nodes
      .filter(array_contains(col("node_types"), "schema:Book")).head()
    assert(bookNode.getSeq[String](bookNode.fieldIndex("creator_refs")) ==
      Seq("http://viaf.org/viaf/71398958"))
    assert(bookNode.getSeq[String](bookNode.fieldIndex("work_example_refs"))
      .length == 2)
    assert(bookNode.getSeq[String](bookNode.fieldIndex("about_refs"))
      .length == 10)

    // subject classification (test_linked_data.py:104-114): 1 DDC,
    // 1 FAST, 4 TAG (genre + 3 Intangible topics), 1 PLACE, 3 LCSH
    // (the made-up sh12345678 parses from its URL despite having no
    // node; the example.wo URI has neither pattern nor node and drops)
    val subjects = JsonLdKernel.classifySubjects(nodes).collect()
    val byType = subjects.groupBy(_.getAs[String]("subject_type"))
    assert(byType("DDC").map(_.getAs[String]("subject_id")).toSeq == Seq("813.54"))
    assert(byType("FAST").map(_.getAs[String]("subject_id")).toSeq == Seq("1219610"))
    assert(byType("LCSH").map(_.getAs[String]("subject_id")).toSet ==
      Set("sh85062975", "sh85118637", "sh12345678"))
    assert(byType("TAG").map(_.getAs[String]("subject_id")).toSet ==
      Set("Fiction", "Islands", "Ghosts", "satirical fiction"))
    assert(byType("PLACE").map(_.getAs[String]("subject_id")).toSeq ==
      Seq("Galapagos Islands"))
    assert(!byType.contains("TOPIC")) // topics in this graph are Intangible
    // pattern-classified subjects keep the node's readable name
    assert(subjects.exists(r => r.getAs[String]("subject_id") == "sh85062975" &&
      r.getAs[String]("subject_name") == "Humorous stories"))

    // tag filtering and publisher blacklist (linked_data.py:127-173,616-623)
    val tags = Seq("Fiction.", "Large Print Books", "CD", "Good Tag")
      .toDF("t").select(JsonLdKernel.fixTag(col("t"))).collect().map(_.getString(0))
    assert(tags.toSeq == Seq("Fiction", null, null, "Good Tag"))
    val pubs = Seq("Delacorte Press/Seymour Lawrence", "Kessinger",
        "Wiley Audio Books", "Wiley")
      .toDF("p").select(JsonLdKernel.isBlacklistedPublisher(col("p")))
      .collect().map(_.getBoolean(0))
    assert(pubs.toSeq == Seq(false, true, true, false))
  }
}
