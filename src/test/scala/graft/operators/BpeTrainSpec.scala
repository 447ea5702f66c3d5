package graft.operators

import graft.SparkSpec

class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  private def merges(texts: Seq[String], k: Int) =
    BpeTrain.trainMerges(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"), "text", merges = k)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))

  test("textbook corpus: merges follow the hand-computed sequence") {
    // Sennrich-style toy corpus. Word counts: low×5, lower×2, new×6.
    // Pair counts round 0: (l,o)=7, (o,w)=7, (n,e)=6, (e,w)=6+2(from
    // lower's 'we'? no — lower is l o w e r: pairs lo,ow,we,er)… the
    // operator decides; we assert the first merge is the count-max
    // with the (l asc, r asc) tie-break: (l,o)=7 vs (o,w)=7 → (l,o).
    val got = merges(Seq("low low low", "low low lower lower",
      "new new new new new new"), 3)
    assert(got(0) == ((0, "l", "o", "lo", 7L)))
    // after merging lo: low = lo w, lower = lo w e r, new unchanged;
    // round 1 pairs: (lo,w)=7, (n,e)=6, (e,w)=6, (w,e)=2, (e,r)=2
    assert(got(1) == ((1, "lo", "w", "low", 7L)))
    // round 2: low is one symbol; (n,e)=6 vs (e,w)=6 → (e,w) loses the
    // l-asc tie-break to (n,e)? 'e' < 'n' → (e,w) wins.
    assert(got(2) == ((2, "e", "w", "ew", 6L)))
  }

  test("merged symbols participate in later merges (multi-char lhs)") {
    // "abc" ×4: merges (a,b)=4 then (ab,c)=4 — the second merge's lhs
    // is the round-0 product, proving sequences really re-segment.
    val got = merges(Seq("abc abc", "abc abc"), 2)
    assert(got.toSeq == Seq((0, "a", "b", "ab", 4L),
      (1, "ab", "c", "abc", 4L)))
  }

  test("stops early when no adjacent pair remains") {
    // single-char words have no pairs after (x,y) is exhausted
    val got = merges(Seq("ab ab", "c d"), 5)
    assert(got.length == 1 && got(0)._4 == "ab")
  }

  test("tokenize: piece counts reflect the learned segmentation") {
    // merges learned on this corpus: (l,o) then (lo,w) — so "low" is
    // ONE piece, "lower" is low+e+r = 3, "new" stays n+e+w = 3.
    val docs = Seq((1L, "low low low"), (2L, "low low lower lower"),
        (3L, "new new new new new new"))
      .toDF("doc_id", "text")
    val got = BpeTrain.tokenizedCounts(docs, "doc_id", "text", merges = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (1L, 3, 3L),        // 3 × low(1)
      (2L, 4, 8L),        // 2 × low(1) + 2 × lower(3)
      (3L, 6, 18L)))      // 6 × new(3)
  }

  test("delimiter in the corpus fails loudly, not silently") {
    def deepMessages(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
    val ex = intercept[Throwable] {
      merges(Seq("ok " + BpeTrain.Delim + "bad"), 1)
    }
    assert(deepMessages(ex).contains("reserved delimiter"), deepMessages(ex))
  }
}
