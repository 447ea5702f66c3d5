package graft.operators

import graft.SparkSpec
import graft.model._
import org.apache.spark.sql.functions._

class MetadataMergeSpec extends SparkSpec {
  import spark.implicits._

  private def ed(id: Long, title: String = null, lang: String = null) =
    Edition(id, "isbn", s"i$id", title = title, language = lang)

  private def md(ident: String, title: String = null, lang: String = null,
                 subjects: Seq[SubjectData] = Seq.empty) =
    Metadata("src", IdentifierData("isbn", ident), title = title,
      language = lang, subjects = subjects)

  test("M1: replaceScalars=true lets metadata win, missing metadata passes through") {
    val editions = Seq(ed(1, title = "Old", lang = "en"), ed(2), ed(3, title = "Keep")).toDS()
    val metadata = Seq(md("i1", title = "New"), md("i2", lang = "fr")).toDS()
    val out = MetadataMerge.applyMetadata(editions, metadata, ReplacementPolicy())
      .select("editionId", "title", "language").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toMap2
    assert(out(1L) == ("New", "en"))   // metadata title wins, lang kept
    assert(out(2L) == (null, "fr"))    // filled from metadata
    assert(out(3L) == ("Keep", null))  // no metadata → unchanged
  }

  test("M1: replaceScalars=false only fills nulls") {
    val editions = Seq(ed(1, title = "Old")).toDS()
    val metadata = Seq(md("i1", title = "New", lang = "fr")).toDS()
    val out = MetadataMerge.applyMetadata(editions, metadata,
        ReplacementPolicy(replaceScalars = false))
      .select("title", "language").head()
    assert(out.getString(0) == "Old")  // existing value protected
    assert(out.getString(1) == "fr")   // null filled
  }

  test("A4: subject weights are additive across records") {
    val metadata = Seq(
      md("i1", subjects = Seq(SubjectData("fast", "s1", weight = 2),
                              SubjectData("fast", "s2", weight = 1))),
      md("i1", subjects = Seq(SubjectData("fast", "s1", weight = 3))),
      md("i2", subjects = Seq(SubjectData("lcc", "s1", weight = 5)))).toDS()
    val out = MetadataMerge.additiveSubjects(metadata)
      .collect().map(r => ((r.getString(0), r.getString(1), r.getString(2)), r.getLong(3))).toMap
    assert(out(("i1", "fast", "s1")) == 5)
    assert(out(("i1", "fast", "s2")) == 1)
    assert(out(("i2", "lcc", "s1")) == 5)
  }

  test("M4: contributors first-wins by encounter order") {
    val df = Seq(
      ("i1", 3L, Seq("late"), Seq.empty[SubjectData]),
      ("i1", 1L, Seq.empty[String], Seq.empty[SubjectData]), // empty → skipped
      ("i1", 2L, Seq("early"), Seq.empty[SubjectData]))
      .toDF("identifier", "ord", "names", "subjects")
      .select(struct(lit("isbn").as("idType"), col("identifier"))
                .as("primaryIdentifier"),
              lit("src").as("dataSource"), col("ord"),
              transform(col("names"), n => struct(n.as("sortName"))).as("contributors"),
              col("subjects"),
              slice(array(struct(lit("q").as("quantity"),
                                 lit(0.0).as("value"))), 1, 0).as("measurements"))
    val out = MetadataMerge.consolidate(df)
      .select(element_at(col("contributors"), 1).getField("sortName")).head()
    assert(out.getString(0) == "early") // ord=2 beats ord=3; ord=1 empty skipped
  }

  test("M6: authored beats titled-only, Unknown author does not count") {
    val cands = Seq(
      (10L, 1L, "t1", MetadataMerge.UnknownAuthor),
      (10L, 2L, "t2", "real author"),
      (10L, 3L, null.asInstanceOf[String], "another"),
      (20L, 4L, "only titled", null.asInstanceOf[String]))
      .toDF("pool_id", "editionId", "title", "author")
    val out = MetadataMerge.electPresentationEdition(cands)
      .select("pool_id", "editionId").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out(10L) == 2L) // titled+authored wins; 3 has no title at all
    assert(out(20L) == 4L)
  }

  // ---- full ReplacementPolicy flag surface ----

  private def child(rows: (Long, String, String, String)*) =
    rows.toDF("identifier", "source", "rel", "href")

  test("M1 children: replace drops same-source rows for touched identifiers only") {
    val existing = child((1L, "srcA", "image", "old1"),
                         (1L, "srcB", "image", "keepB"),
                         (2L, "srcA", "image", "untouched"))
    val incoming = child((1L, "srcA", "image", "new1"),
                         (1L, "srcA", "description", "desc1"))
    val out = MetadataMerge.mergeChildRows(existing, incoming, replace = true)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(3))).toSet
    assert(out == Set((1L, "srcA", "new1"), (1L, "srcA", "desc1"),
                      (1L, "srcB", "keepB"), (2L, "srcA", "untouched")))
  }

  test("M1 children: additive unions and dedups exact duplicates") {
    val existing = child((1L, "id", "isbn", "i1"))
    val incoming = child((1L, "id", "isbn", "i1"), (1L, "id", "owi", "w1"))
    val out = MetadataMerge.mergeChildRows(existing, incoming, replace = false)
    assert(out.count() == 2)
  }

  test("M1 contributions: non-replace leaves the edition list untouched") {
    val existing = child((1L, "srcA", "author", "Old, A."))
    val incoming = child((1L, "srcB", "author", "New, B."))
    val kept = MetadataMerge.mergeContributions(existing, incoming, replace = false)
    assert(kept.collect().map(_.getString(3)).toSeq == Seq("Old, A."))
    val replaced = MetadataMerge.mergeContributions(existing, incoming, replace = true)
    assert(replaced.collect().map(_.getString(3)).toSet == Set("Old, A.", "New, B."))
    // same-source replacement: srcA incoming displaces srcA existing
    val sameSrc = MetadataMerge.mergeContributions(existing,
      child((1L, "srcA", "author", "New, B.")), replace = true)
    assert(sameSrc.collect().map(_.getString(3)).toSeq == Seq("New, B."))
  }

  test("M1 policy table: flag combinations act independently") {
    val existing = child((1L, "srcA", "image", "old"))
    val incoming = child((1L, "srcA", "image", "new"))
    for (replace <- Seq(true, false)) {
      val links = MetadataMerge.mergeChildRows(existing, incoming, replace)
        .collect().map(_.getString(3)).toSet
      assert(links == (if (replace) Set("new") else Set("old", "new")))
    }
    // presets: wrangler posture replaces bibliographic children,
    // pass-through recalculates nothing
    assert(ReplacementPolicy.fromMetadataSource.replaceLinks)
    assert(ReplacementPolicy.fromMetadataSource.replaceContributions)
    assert(!ReplacementPolicy.fromMetadataSource.replaceIdentifiers)
    assert(!ReplacementPolicy.passThrough.presentation.chooseEdition)
    assert(ReplacementPolicy.passThrough.replaceScalars)
  }

  test("M1 presentation: chooseEdition=false passes candidates through") {
    val cands = Seq((10L, 1L, "t1", "a1"), (10L, 2L, "t2", "a2"))
      .toDF("pool_id", "editionId", "title", "author")
    assert(MetadataMerge.applyPresentation(cands,
      PresentationCalculationPolicy.recalculateNothing).count() == 2)
    assert(MetadataMerge.applyPresentation(cands,
      PresentationCalculationPolicy()).count() == 1)
  }

  private implicit class ToMap2[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map(t => t._1 -> (t._2, t._3)).toMap
  }
}
