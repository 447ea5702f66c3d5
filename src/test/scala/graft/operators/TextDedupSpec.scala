package graft.operators

import graft.{PropSupport, SparkSpec}
import org.scalacheck.Gen
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._

class TextDedupSpec extends SparkSpec with PropSupport {
  import spark.implicits._

  private def shingleSets(texts: String*): Seq[Set[String]] =
    texts.zipWithIndex.toDF("text", "id")
      .select(TextDedup.shingles($"text"))
      .collect().map(_.getSeq[String](0).toSet).toSeq

  test("shingles: n-grams, distinct, short-text fallback") {
    val Seq(a, b, c) = shingleSets(
      "a b c d",          // 2 shingles
      "x y",              // short → whole text
      "a b a b a b a b")  // repeated → distinct collapses
    assert(a == Set("a b c", "b c d"))
    assert(b == Set("x y"))
    assert(c == Set("a b a", "b a b"))
  }

  test("nearDupComponents: chains collapse transitively to the min id") {
    // components: {1,2,3} via 1-2, 2-3 (1 and 3 NOT directly paired),
    // {5,6}; 9 appears in no pair and thus in no component
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val out = TextDedup.nearDupComponents(pairs)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L)))
  }

  test("keep-best arbitration shape: max_by quality with doc_id tie-break") {
    // direct check of the argmax the dedup_keep_best entry uses: the
    // higher-quality member wins regardless of id order; equal quality
    // falls back to the SMALLER id (max of (quality, -doc_id))
    import org.apache.spark.sql.functions.{max_by, struct, col}
    val rows = Seq((10L, 1L, 0.5), (11L, 1L, 0.9), (20L, 2L, 0.7),
      (21L, 2L, 0.7)).toDF("doc_id", "canonical_id", "quality")
    val best = rows.groupBy(col("canonical_id"))
      .agg(max_by(col("doc_id"),
        struct(col("quality"), (-col("doc_id")).as("neg"))).as("best_id"))
      .orderBy("canonical_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(best == Seq((1L, 11L), (2L, 20L)))
  }

  test("nearDupComponents: long chain converges within the iteration cap") {
    val pairs = (1L until 9L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val out = TextDedup.nearDupComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert((1L to 9L).forall(out(_) == 1L))
  }

  test("pointer jumping: diameter-200 chain converges inside the default cap") {
    // plain min-label propagation needs ~200 sweeps here and would hit
    // the 25-sweep guard; path halving (label-of-label) is O(log n)
    val pairs = (0L until 200L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val out = TextDedup.nearDupComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == 201 && out.forall(_._2 == 0L))
  }

  test("nearDupComponents THROWS instead of returning a split cluster") {
    // diameter 100 >> the ~2^3 reach of 3 path-halving sweeps
    val pairs = (1L until 100L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    intercept[IllegalStateException] {
      TextDedup.nearDupComponents(pairs, maxIter = 3).collect()
    }
  }

  test("jaccard column matches set arithmetic") {
    val df = Seq(("a b c d e", "c d e f g")).toDF("x", "y")
      .select(TextDedup.jaccard(
        TextDedup.shingles($"x"), TextDedup.shingles($"y")).as("j"))
    // shingles x: {abc,bcd,cde}; y: {cde,def,efg}; inter 1, union 5
    assert(df.head().getDouble(0) == 0.2)
  }

  test("property: minhash precision is exact; recall holds in the guaranteed regime") {
    // The honest approximate-operator contract: the verify stage makes
    // PRECISION exact (every emitted pair is a true >= t pair), while
    // RECALL is only guaranteed w.h.p. for pairs well above the
    // threshold (1-(1-j^4)^16: ~0.79 at j=0.55 but 1-4e-8 at j=0.9).
    // The old form demanded lsh == brute at t=0.5, which FLAKES
    // whenever a random corpus produces a marginal pair the banding
    // legitimately misses.
    val word = Gen.oneOf("ant", "bee", "cat", "dog", "elk", "fox", "gnu", "hen")
    val doc = Gen.listOfN(12, word).map(_.mkString(" "))
    val corpus = Gen.listOfN(8, doc)
    check("minhash precision/recall")(forAll(corpus) { docs =>
      // plant one exact duplicate so non-empty results get exercised
      val all = (docs :+ docs.head).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = all.toDF("doc_id", "text")
      val lsh = TextDedup.minhashNearDupPairs(df, "doc_id", "text", threshold = 0.5)
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sh = all.map { case (i, t) =>
        (i, shingleSetLocal(t))
      }
      def bruteAtLeast(t: Double) = (for {
        (ia, sa) <- sh; (ib, sb) <- sh if ia < ib
        j = sa.intersect(sb).size.toDouble / sa.union(sb).size
        if j >= t
      } yield (ia, ib)).toSet
      lsh.subsetOf(bruteAtLeast(0.5)) &&       // precision: exact
        bruteAtLeast(0.9).subsetOf(lsh)        // recall: guaranteed regime
    })
  }

  test("property: incremental dedup = brute-force cross-split pairs") {
    val word = Gen.oneOf("ant", "bee", "cat", "dog", "elk")
    val doc = Gen.listOfN(10, word).map(_.mkString(" "))
    val corpus = Gen.listOfN(10, doc)
    check("incremental = brute force")(forAll(corpus) { docs =>
      // plant a cross-split duplicate: id 0 goes to the increment
      // (0 % 3 = 0), its copy gets id 10 → base (10 % 3 = 1)
      val all = (docs :+ docs.head).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = all.toDF("doc_id", "text")
      val inc = df.filter($"doc_id" % 3 === 0)
      val base = df.filter($"doc_id" % 3 =!= 0)
      val got = TextDedup
        .minhashNearDupAgainst(base, inc, "doc_id", "text", threshold = 0.8)
        .select("inc_id", "base_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val sh = all.map { case (i, t) => (i, shingleSetLocal(t)) }
      def brute(t: Double) = (for {
        (ia, sa) <- sh if ia % 3 == 0
        (ib, sb) <- sh if ib % 3 != 0
        j = sa.intersect(sb).size.toDouble / sa.union(sb).size
        if j >= t
      } yield (ia, ib)).toSet
      // precision exact; recall asserted in the guaranteed regime
      // (banding misses a marginal j≈0.8 pair with p≈2e-4 — across
      // 200 generated corpora that WILL eventually flake an
      // exact-equality form; the planted j=1 pair sits in the
      // guaranteed set)
      got.subsetOf(brute(0.8)) && brute(0.9).subsetOf(got)
    })
  }

  test("deriveBanding: recall floor held, rows maximal, kernel-consistent") {
    def recall(s: Double, b: Int, r: Int): Double =
      1.0 - math.pow(1.0 - math.pow(s, r.toDouble), b.toDouble)
    for (t <- Seq(0.5, 0.6, 0.7, 0.8, 0.9); floor <- Seq(0.9, 0.95, 0.99);
         k <- Seq(64, 128)) {
      val (b, r) = TextDedup.deriveBanding(t, k, floor)
      assert(b * r <= k, s"bands*rows must fit the signature ($t,$floor,$k)")
      assert(k / b == r, s"kernel rows=k/bands must equal derived rows")
      assert(recall(t, b, r) >= floor,
        s"floor violated at ($t,$floor,$k): ${recall(t, b, r)}")
      // maximality: every kernel-consistent r' > r misses the floor
      (r + 1 to k).map(r2 => (r2, k / r2))
        .filter { case (r2, b2) => k / b2 == r2 }
        .foreach { case (r2, b2) =>
          assert(recall(t, b2, r2) < floor,
            s"r=$r2 also meets the floor — derived r=$r not maximal")
        }
    }
    // documented instance: 0.6 / 0.95 / 64 → 21 bands × 3 rows
    assert(TextDedup.deriveBanding(0.6, 64, 0.95) == (21, 3))
    // monotone: lower threshold never gets MORE selective banding
    val rs = Seq(0.5, 0.6, 0.7, 0.8, 0.9)
      .map(t => TextDedup.deriveBanding(t, 64, 0.95)._2)
    assert(rs == rs.sorted, s"rows must be monotone in threshold: $rs")
    // unreachable floor: rows=1 tops out at 1-(1-t)^k < floor — a
    // clear IllegalArgumentException, not an opaque empty-maxBy crash
    val ex = intercept[IllegalArgumentException] {
      TextDedup.deriveBanding(0.03, 64, 0.95)
    }
    assert(ex.getMessage.contains("tops out"), ex.getMessage)
    // ... while the same threshold with a reachable floor derives fine
    assert(TextDedup.deriveBanding(0.03, 64, 0.5)._2 >= 1)
  }

  test("auto banding finds mid-similarity pairs the 16x4 regime misses") {
    // planted pairs at Jaccard ~0.65: 17 shared tokens + 3 distinct
    // per side over 1-gram shingles (17/(17+3+3) ≈ 0.739 on 3-gram
    // sets varies; verify against local brute force instead of a
    // constant). Deterministic given the fixed hash family.
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = (0 until 8).flatMap { i =>
      Seq((i * 2L, s"$base alpha$i beta$i gamma$i"),
          (i * 2L + 1, s"$base delta$i epsilon$i zeta$i"))
    }.toDF("doc_id", "text")
    val got = TextDedup
      .minhashNearDupPairsAuto(docs, "doc_id", "text", threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val texts = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    val brute = (for {
      (a, ta) <- texts; (b, tb) <- texts if a < b
      sa = shingleSetLocal(ta); sb = shingleSetLocal(tb)
      j = (sa intersect sb).size.toDouble / (sa union sb).size
      if j >= 0.6
    } yield (a, b)).toSet
    assert(brute.nonEmpty, "fixture must contain mid-similarity pairs")
    assert(got == brute,
      s"derived banding must reproduce brute force: got $got vs $brute")
  }

  test("cluster-keyed split admits zero cross-split near-dup pairs") {
    val env = graft.Env(spark, "/root/testdata/sf0.001")
    val assign = graft.queries.DedupQueries.dedupSplitByCluster(env)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val pairs = TextDedup
      .minhashNearDupPairs(env.documents, "doc_id", "text", threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "corpus must exercise the property")
    val straddling = pairs.filter { case (a, b) => assign(a) != assign(b) }
    assert(straddling.isEmpty,
      s"cluster-keyed split must be leakage-free: $straddling")
    // and the doc-keyed split DOES leak on this corpus — the audit's
    // reason to exist
    val docSplit = graft.operators.Sampling
      .splitAssign(env.documents.select($"doc_id"), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pairs.exists { case (a, b) => docSplit(a) != docSplit(b) },
      "fixture should show the doc-keyed split leaking")
  }

  test("duplicatedGramStats: shared grams counted, unique docs zero") {
    // n = 3 to keep the hand case small; a/b share "x y z" (and only
    // it), c is untouched, d is a short doc falling back to the
    // whole-text gram with an exact copy e
    val docs = Seq(
      (1L, "a1 a2 x y z a3"),   // 4 grams, 1 dup
      (2L, "b1 x y z b2 b3"),   // 4 grams, 1 dup
      (3L, "c1 c2 c3 c4 c5"),   // 3 grams, 0 dup
      (4L, "s t"),              // whole-text gram, dup with 5
      (5L, "s t")
    ).toDF("doc_id", "text")
    val out = TextDedup.duplicatedGramStats(docs, "doc_id", "text", n = 3)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      (1L, 4L, 1L, false), (2L, 4L, 1L, false), (3L, 3L, 0L, false),
      (4L, 1L, 1L, true), (5L, 1L, 1L, true)))
  }

  private def shingleSetLocal(t: String): Set[String] = {
    val toks = t.split(' ')
    if (toks.length < 3) Set(toks.mkString(" "))
    else toks.sliding(3).map(_.mkString(" ")).toSet
  }

  test("persisted dedup index: roundtrip/append bit-equal to inline; " +
       "delete masks candidates AND verify") {
    import spark.implicits._
    val base = Seq(
      (1L, "aa bb cc dd ee ff"),
      (2L, "aa bb cc dd ee gg"),   // near-dup of 1
      (3L, "zz yy xx ww vv uu"),
      (4L, "mm nn oo pp qq rr")).toDF("doc_id", "text")
    val inc = Seq(
      (11L, "aa bb cc dd ee ff"),  // dup of 1, near-dup of 2
      (12L, "zz yy xx ww vv uu"),  // dup of 3
      (13L, "totally novel words here")).toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("inc_id", "base_id").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          BigDecimal(r.getDouble(2)).setScale(6,
            BigDecimal.RoundingMode.HALF_UP))).toSeq
    val inline = canon(TextDedup.minhashNearDupAgainst(
      base, inc, "doc_id", "text", threshold = 0.5))
    assert(inline.map(t => (t._1, t._2)) ==
      Seq((11L, 1L), (11L, 2L), (12L, 3L)))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_dedup_idx").toString
    try {
      TextDedup.writeDedupIndex(base, "doc_id", "text", dir)
      assert(canon(TextDedup.nearDupAgainstIndex(spark, dir, inc,
        "doc_id", "text", threshold = 0.5)) == inline)
      // build-half + append-half == full build (frozen geometry)
      val dir2 = java.nio.file.Files
        .createTempDirectory("graft_dedup_idx2").toString
      try {
        TextDedup.writeDedupIndex(base.filter($"doc_id" <= 2),
          "doc_id", "text", dir2)
        TextDedup.appendDedupIndex(spark, dir2,
          base.filter($"doc_id" > 2), "doc_id", "text")
        assert(canon(TextDedup.nearDupAgainstIndex(spark, dir2, inc,
          "doc_id", "text", threshold = 0.5)) == inline)
      } finally rmRfDir(dir2)
      // takedown doc 1: 11 keeps only its match against 2; 12 keeps 3
      TextDedup.deleteFromDedupIndex(spark, dir, Seq(1L).toDF("doc_id"))
      val afterDel = canon(TextDedup.nearDupAgainstIndex(spark, dir, inc,
        "doc_id", "text", threshold = 0.5))
      assert(afterDel.map(t => (t._1, t._2)) == Seq((11L, 2L), (12L, 3L)))
      // re-ingest contract: appending the tombstoned id errors loudly
      val boom = intercept[RuntimeException](
        TextDedup.appendDedupIndex(spark, dir,
          Seq((1L, "aa bb cc dd ee ff")).toDF("doc_id", "text"),
          "doc_id", "text"))
      assert(boom.getMessage.contains("tombston"), boom.getMessage)
    } finally rmRfDir(dir)
  }

  test("dedupFsck: clean lifecycle is all-ok; a poisoned band key and " +
       "a dropped shingle row flip the right flags") {
    import spark.implicits._
    val docs = (0L until 30L).map(i =>
      (i, s"w${i % 7} w${(i * 3) % 11} w${(i * 5) % 13} common words"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_dedup_fsck").toString
    def fsck(): Map[String, (Long, Long, Boolean)] =
      TextDedup.dedupFsck(spark, dir).collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    try {
      TextDedup.writeDedupIndex(docs.filter($"doc_id" % 3 =!= 0),
        "doc_id", "text", dir)
      TextDedup.appendDedupIndex(spark, dir,
        docs.filter($"doc_id" % 3 === 0), "doc_id", "text")
      TextDedup.deleteFromDedupIndex(spark, dir,
        Seq(1L, 2L).toDF("doc_id"))
      val clean = fsck()
      assert(clean.size == 11 && clean.values.forall(_._3),
        s"clean lifecycle must fsck all-ok: $clean")
      assert(clean("live_docs") == (28L, 28L, true))
      // INJECT a poisoned band key into the append segment
      val m = IndexCommit.currentManifest(spark, dir).get
      val bseg = m.tables("bands")(1)
      val rows = spark.read.parquet(s"$dir/$bseg")
        .as[(Long, Int, Long, Int)].collect()
      val poisoned = rows.zipWithIndex.map { case ((d, b, key, ns), i) =>
        (d, b, if (i == 0) key ^ 0x5aL else key, ns)
      }.toSeq.toDF("doc_id", "band", "key", "n_sh")
      poisoned.write.mode("overwrite").parquet(s"$dir/$bseg")
      val bad = fsck()
      assert(bad("band_key_mismatches") == (0L, 1L, false),
        s"a poisoned key must flip the recount: $bad")
      assert(bad("band_count_violations")._3 &&
        bad("n_sh_mismatches")._3,
        "a key poison must not flip unrelated invariants")
      // INJECT a torn write: drop one doc's shingles row entirely
      val sseg = m.tables("shingles")(1)
      val sh = spark.read.parquet(s"$dir/$sseg")
        .as[(Long, Array[Long])].collect()
      sh.drop(1).toSeq.toDF("doc_id", "sh")
        .write.mode("overwrite").parquet(s"$dir/$sseg")
      val torn = fsck()
      // the dropped doc's `bands` rows (one per band) now match nothing
      assert(torn("band_shingle_unmatched")._2 > 0 &&
        !torn("band_shingle_unmatched")._3,
        s"a dropped shingle row must flip the join audit: $torn")
    } finally rmRfDir(dir)
  }

  private def rmRfDir(dir: String): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(new java.io.File(dir))
  }
}
