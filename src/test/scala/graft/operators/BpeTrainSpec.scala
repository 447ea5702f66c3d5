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

  /** Driver-side SEQUENTIAL greedy BPE — the reference the batched
    * selection must reproduce bit-for-bit: per step, count adjacent
    * pairs over the word-frequency table, pick (count desc, l asc,
    * r asc), apply one left-to-right non-overlapping merge pass. */
  private def refTrain(texts: Seq[String], k: Int)
      : Seq[(Int, String, String, String, Long)] = {
    val wc = texts.flatMap(_.split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) => w -> ws.size.toLong }
    var seqs: Seq[(List[String], Long)] =
      wc.toSeq.map { case (w, c) => (w.map(_.toString).toList, c) }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    var step = 0
    var done = false
    while (step < k && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((s, c) <- seqs; Seq(a, b) <- s.sliding(2) if s.length >= 2)
        counts((a, b)) = counts.getOrElse((a, b), 0L) + c
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.toSeq
          .sortBy { case ((l, r), c) => (-c, l, r) }.head
        out += ((step, l, r, l + r, c))
        seqs = seqs.map { case (s, wcnt) =>
          val b = scala.collection.mutable.ListBuffer.empty[String]
          var i = 0
          while (i < s.length) {
            if (i + 1 < s.length && s(i) == l && s(i + 1) == r) {
              b += (l + r); i += 2
            } else { b += s(i); i += 1 }
          }
          (b.toList, wcnt)
        }
        step += 1
      }
    }
    out.toSeq
  }

  test("batched selection ≡ sequential greedy on adversarial corpora") {
    // ties, self-pairs, runs, and interaction chains — every shape the
    // batch cut rules exist for: (a) c-runs force the self-pair
    // singleton path, (b) equal counts exercise the tie trim, (c)
    // chained "abab" creates merged-symbol pairs mid-round
    val corpora = Seq(
      Seq("ccccc ccccc", "ab ab ab", "xy xy"),
      Seq("abab abab abab", "cd cd cd", "ef ef"),
      Seq("low low low", "low low lower lower", "new new new new new new",
        "wider wider wide"),
      Seq("aaa bbb aaa bbb", "ab ba ab ba", "cc cc cc"),
      Seq("the quick brown fox jumps over the lazy dog",
        "the quick brown cat naps under the warm sun",
        "a quick brown fox and a quick brown cat"),
      Seq("zz zz zz yy yy xx"))
    for (texts <- corpora; k <- Seq(3, 8, 14)) {
      val ref = refTrain(texts, k)
      val got = merges(texts, k).toSeq
      assert(got == ref,
        s"k=$k corpus=${texts.take(1)}…\n got=$got\n ref=$ref")
    }
  }
}
