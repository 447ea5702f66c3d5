package graft.queries

import graft.{Env, SparkSpec}

/** Shape invariants for the round's data cards — the oracle pins exact
  * values per corpus; these pin the properties that must hold on ANY
  * corpus.
  */
class CardInvariantsSpec extends SparkSpec {

  test("dedup_threshold_sweep: monotone in threshold, floor row = pair table") {
    val env = Env(spark, "/root/testdata/sf0.001")
    val rows = DedupQueries.dedupThresholdSweep(env).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == Seq(0.60, 0.80, 0.85, 0.90, 0.95))
    // raising the threshold can only remove pairs and affected docs
    rows.sliding(2).foreach {
      case Array((_, p1, d1), (_, p2, d2)) =>
        assert(p2 <= p1 && d2 <= d1, rows.mkString(","))
      case _ => ()
    }
    // the 0.60 floor row must equal the derived-banding pair table's
    // count, and the 0.80 row the fixed-banding table's (the sweep's
    // single candidate pass re-filters without recall loss above it)
    val nPairs60 = graft.operators.TextDedup
      .minhashNearDupPairsAuto(env.documents, "doc_id", "text",
        threshold = 0.6)
      .count()
    assert(rows.head._2 == nPairs60)
    val nPairs80 = graft.operators.TextDedup
      .minhashNearDupPairs(env.documents, "doc_id", "text", threshold = 0.8)
      .count()
    assert(rows(1)._2 == nPairs80)
    assert(rows.head._2 > 0, "corpus must exercise the sweep")
  }

  test("corpus_ppl_buckets: buckets partition the scored docs") {
    val env = Env(spark, "/root/testdata/sf0.001")
    val rows = TextQueries.corpusPplBuckets(env).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.map(_._2).toSet == Set("head", "middle", "tail"))
    val total = rows.map(_._3).sum
    val scored = graft.operators.TextAnalysis
      .perplexity(env.documents, "doc_id", "text")
      .filter("ppl IS NOT NULL").count()
    assert(total == scored, s"buckets must partition: $total vs $scored")
    // tercile thresholds keep the split roughly balanced (boundary
    // ties may shift a few docs between adjacent buckets)
    val byBucket = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    assert(byBucket.values.forall(_ > 0), byBucket.toString)
  }
}
