package graft.queries

import graft.{Env, SparkSpec}

/** The prep-yield funnel card must be a true funnel: every filtering
  * stage only removes documents/tokens, and the scrub stage rewrites
  * text without dropping documents. These invariants hold for ANY
  * corpus — the DuckDB oracle pins the exact values per corpus, this
  * spec pins the shape.
  */
class PrepYieldSpec extends SparkSpec {

  test("corpus_prep_yield: docs/tokens are a monotone funnel") {
    val env = Env(spark, "/root/testdata/sf0.001")
    val rows = TextQueries.corpusPrepYield(env).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == (0 to 6), "one row per stage, ordered")
    val docs = rows.map(_._3)
    val toks = rows.map(_._4)
    // stage 5 (substring scrub) rewrites text, never drops a doc
    assert(docs(5) == docs(4), "scrub must not drop documents")
    // every other transition can only shrink the doc set
    for (i <- 1 to 6 if i != 5)
      assert(docs(i) <= docs(i - 1), s"stage $i grew docs: ${docs.toSeq}")
    // tokens never grow at any stage (scrub shrinks text in place)
    for (i <- 1 to 6)
      assert(toks(i) <= toks(i - 1), s"stage $i grew tokens: ${toks.toSeq}")
    // the pipeline is non-degenerate on the test corpus: something
    // survives and something is removed
    assert(docs(6) > 0 && docs(6) < docs(0))
  }
}
