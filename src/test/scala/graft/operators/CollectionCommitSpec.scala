package graft.operators

import graft.SparkSpec

/** The cross-index snapshot contract: a collection manifest pins one
  * generation per member index, commits flip atomically with the same
  * claim/rename discipline as the member layer, readers never observe
  * a takedown applied to one member but not another, and collection GC
  * derives each member's retention floor from the retained collection
  * manifests instead of a blind keepGens. */
class CollectionCommitSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rmRf(dir: String): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(new java.io.File(dir))
  }

  private val docs = Seq(
    (1L, "red blue red fast"),
    (2L, "red blue green fast scan"),
    (3L, "green green table"),
    (4L, "red table scan value")).toDF("doc_id", "text")
  private val vecs = Seq(
    (1L, 0, Array(1.0f, 0.0f)), (2L, 0, Array(0.9f, 0.1f)),
    (3L, 1, Array(0.0f, 1.0f)), (4L, 1, Array(0.1f, 0.9f)))
    .toDF("vec_id", "label", "embedding")
  private val queries = Seq("q1" -> Seq("red", "table"))

  private def buildBoth(colDir: String): Unit =
    CollectionCommit.commit(spark, colDir) { (gen, cur) =>
      assert(gen == 1L && cur.isEmpty)
      Bm25.writeIndex(docs, "doc_id", "text",
        CollectionCommit.memberDir(colDir, "bm25"))
      VectorSearch.ivfWriteIndex(vecs,
        CollectionCommit.memberDir(colDir, "ivf"), dim = 2)
      Map("bm25" -> 1L, "ivf" -> 1L)
    }

  private def takedown(colDir: String): Unit =
    CollectionCommit.commit(spark, colDir) { (gen, cur) =>
      assert(gen == 2L && cur.get.members == Map("bm25" -> 1L, "ivf" -> 1L))
      Bm25.deleteDocs(spark, CollectionCommit.memberDir(colDir, "bm25"),
        Seq(4L).toDF("doc_id"), retainGens = Int.MaxValue)
      VectorSearch.deleteVectors(spark,
        CollectionCommit.memberDir(colDir, "ivf"),
        Seq(4L).toDF("vec_id"), retainGens = Int.MaxValue)
      Map("bm25" -> 2L, "ivf" -> 2L)
    }

  private def servedDocs(colDir: String, colGen: Long): (Set[Long], Set[Long]) = {
    val m = CollectionCommit.manifestAt(spark, colDir, colGen)
    val bm = Bm25.serve(spark, CollectionCommit.memberDir(colDir, "bm25"),
        queries, k = 10, atGen = Some(m.members("bm25")))
      .select("doc_id").as[Long].collect().toSet
    val ivf = VectorSearch.ivfServe(spark,
        CollectionCommit.memberDir(colDir, "ivf"),
        Seq((9L, Array(1.0f, 0.0f))).toDF("qid", "qe"),
        k = 10, nProbe = 16, dim = 2, atGen = Some(m.members("ivf")))
      .select("vec_id").as[Long].collect().toSet
    (bm, ivf)
  }

  test("takedown flips both members in one snapshot; time travel serves " +
       "the pre-delete pair") {
    val colDir = tmpDir("graft_col")
    try {
      buildBoth(colDir)
      takedown(colDir)
      CollectionCommit.gc(spark, colDir, keepGens = 2)
      val (bm1, ivf1) = servedDocs(colDir, 1L)
      assert(bm1.contains(4L) && ivf1.contains(4L)) // pre-delete: both legs
      val (bm2, ivf2) = servedDocs(colDir, 2L)
      assert(!bm2.contains(4L) && !ivf2.contains(4L)) // post: neither leg
      assert(CollectionCommit.currentManifest(spark, colDir).get.gen == 2L)
    } finally rmRf(colDir)
  }

  test("crash between member flips and collection flip leaves readers " +
       "on a consistent prior snapshot; retry converges") {
    val colDir = tmpDir("graft_col_crash")
    try {
      buildBoth(colDir)
      // the crash: both member deletes commit, then the process dies
      // before the collection manifest flips
      val boom = intercept[RuntimeException] {
        CollectionCommit.commit(spark, colDir) { (_, _) =>
          Bm25.deleteDocs(spark, CollectionCommit.memberDir(colDir, "bm25"),
            Seq(4L).toDF("doc_id"), retainGens = Int.MaxValue)
          VectorSearch.deleteVectors(spark,
            CollectionCommit.memberDir(colDir, "ivf"),
            Seq(4L).toDF("vec_id"), retainGens = Int.MaxValue)
          sys.error("crash before collection flip")
        }
      }
      assert(boom.getMessage.contains("crash before collection flip"))
      // collection readers still resolve the PRE-delete pair — stale
      // but mutually consistent (doc 4 alive in BOTH legs)
      val cur = CollectionCommit.currentManifest(spark, colDir).get
      assert(cur.gen == 1L && cur.members == Map("bm25" -> 1L, "ivf" -> 1L))
      val (bm1, ivf1) = servedDocs(colDir, 1L)
      assert(bm1.contains(4L) && ivf1.contains(4L))
      // the retry: member deletes are idempotent (already-tombstoned
      // ids excluded), the collection flips the gen the crash claimed
      takedown(colDir)
      val (bm2, ivf2) = servedDocs(colDir, 2L)
      assert(!bm2.contains(4L) && !ivf2.contains(4L))
    } finally rmRf(colDir)
  }

  test("two racing collection committers: exactly one wins, the loser " +
       "errors naming the contested generation") {
    val colDir = tmpDir("graft_col_race")
    try {
      buildBoth(colDir)
      // a second committer interleaves mid-stage: it contests the held
      // claim for gen 2 and loses loudly; the first completes
      var loser: Option[Throwable] = None
      CollectionCommit.commit(spark, colDir) { (_, _) =>
        loser = Some(intercept[RuntimeException](
          CollectionCommit.commit(spark, colDir) { (_, _) =>
            Map("bm25" -> 1L, "ivf" -> 1L)
          }))
        Map("bm25" -> 1L, "ivf" -> 1L)
      }
      assert(loser.get.getMessage.contains("_colclaim_g000000000002"),
        loser.get.getMessage)
      assert(loser.get.getMessage.contains("single-writer"),
        loser.get.getMessage)
      assert(CollectionCommit.currentManifest(spark, colDir).get.gen == 2L)
      // a committer KILLED before its flip strands a claim: the next
      // commit refuses, and gc (sole-writer recovery) clears it
      new java.io.File(colDir, "_colclaim_g000000000003").createNewFile()
      val stale = intercept[RuntimeException](
        CollectionCommit.commit(spark, colDir) { (_, _) =>
          Map("bm25" -> 1L, "ivf" -> 1L)
        })
      assert(stale.getMessage.contains("already held"), stale.getMessage)
      CollectionCommit.gc(spark, colDir, keepGens = 2)
      CollectionCommit.commit(spark, colDir) { (_, _) =>
        Map("bm25" -> 1L, "ivf" -> 1L)
      }
      assert(CollectionCommit.currentManifest(spark, colDir).get.gen == 3L)
    } finally rmRf(colDir)
  }

  test("collection gc derives member retention floors from retained " +
       "snapshots and trims below them") {
    val colDir = tmpDir("graft_col_gc")
    try {
      buildBoth(colDir)
      takedown(colDir)
      // keepGens = 2: both snapshots and their member gens survive
      CollectionCommit.gc(spark, colDir, keepGens = 2)
      assert(servedDocs(colDir, 1L)._1.contains(4L))
      assert(!servedDocs(colDir, 2L)._1.contains(4L))
      // keepGens = 1: snapshot 1 and the member gens only it pinned go
      CollectionCommit.gc(spark, colDir, keepGens = 1)
      val gone = intercept[IllegalArgumentException](
        CollectionCommit.manifestAt(spark, colDir, 1L))
      assert(gone.getMessage.contains("no manifest g1"), gone.getMessage)
      val memberGone = intercept[IllegalArgumentException](
        IndexCommit.manifestAt(spark,
          CollectionCommit.memberDir(colDir, "bm25"), 1L))
      assert(memberGone.getMessage.contains("no manifest g1"))
      // the surviving snapshot still serves, post-delete
      val (bm2, ivf2) = servedDocs(colDir, 2L)
      assert(!bm2.contains(4L) && !ivf2.contains(4L))
      assert(bm2.nonEmpty && ivf2.nonEmpty)
    } finally rmRf(colDir)
  }

  test("randomized lifecycle: every retained snapshot serves its own " +
       "from-scratch expectation on BOTH legs") {
    val rnd = new scala.util.Random(42)
    def vecOf(seed: Long): Array[Float] = {
      val r = new scala.util.Random(seed)
      Array(r.nextFloat() + 0.1f, r.nextFloat() + 0.1f) // never zero-norm
    }
    for (trial <- 0 until 2) {
      val colDir = tmpDir(s"graft_col_rand$trial")
      try {
        val bmDir = CollectionCommit.memberDir(colDir, "bm25")
        val ivfDir = CollectionCommit.memberDir(colDir, "ivf")
        var nextId = 100L
        def freshIds(n: Int): Seq[Long] = {
          val ids = (nextId until nextId + n); nextId += n; ids
        }
        def docsFor(ids: Seq[Long]) =
          ids.map(i => (i, s"common t$i")).toDF("doc_id", "text")
        def vecsFor(ids: Seq[Long]) =
          ids.map(i => (i, (i % 3).toInt, vecOf(i)))
            .toDF("vec_id", "label", "embedding")
        val base = freshIds(6)
        var alive = base.toSet
        // snapshot expectations, indexed by collection gen - 1
        val expected = scala.collection.mutable.ArrayBuffer[Set[Long]]()
        CollectionCommit.commit(spark, colDir) { (_, _) =>
          Bm25.writeIndex(docsFor(base), "doc_id", "text", bmDir)
          VectorSearch.ivfWriteIndex(vecsFor(base), ivfDir, dim = 2,
            retainGens = Int.MaxValue)
          Map("bm25" -> 1L, "ivf" -> 1L)
        }
        expected += alive
        def memberGen(dir: String): Long =
          IndexCommit.currentManifest(spark, dir).get.gen
        for (_ <- 0 until 3) {
          val doDelete = rnd.nextBoolean() && alive.size > 2
          CollectionCommit.commit(spark, colDir) { (_, _) =>
            if (doDelete) {
              val del = rnd.shuffle(alive.toSeq)
                .take(1 + rnd.nextInt(alive.size - 2))
              Bm25.deleteDocs(spark, bmDir, del.toDF("doc_id"),
                retainGens = Int.MaxValue)
              VectorSearch.deleteVectors(spark, ivfDir,
                del.toDF("vec_id"), retainGens = Int.MaxValue)
              alive --= del
            } else {
              val add = freshIds(1 + rnd.nextInt(3))
              Bm25.appendIndex(spark, bmDir, docsFor(add), "doc_id",
                "text", retainGens = Int.MaxValue)
              VectorSearch.ivfAppendIndex(spark, ivfDir, vecsFor(add),
                dim = 2, retainGens = Int.MaxValue)
              alive ++= add
            }
            Map("bm25" -> memberGen(bmDir), "ivf" -> memberGen(ivfDir))
          }
          expected += alive
        }
        val keep = 1 + rnd.nextInt(expected.size)
        CollectionCommit.gc(spark, colDir, keepGens = keep)
        val total = expected.size.toLong
        for (gen <- 1L to total) {
          if (gen > total - keep) {
            val m = CollectionCommit.manifestAt(spark, colDir, gen)
            val bm = Bm25.serve(spark, bmDir,
                Seq("q" -> Seq("common")), k = 100,
                atGen = Some(m.members("bm25")))
              .select("doc_id").as[Long].collect().toSet
            assert(bm == expected((gen - 1).toInt),
              s"trial $trial gen $gen bm25 leg")
            val ivf = VectorSearch.ivfServe(spark, ivfDir,
                Seq((999L, vecOf(999L))).toDF("qid", "qe"),
                k = 100, nProbe = 64, dim = 2,
                atGen = Some(m.members("ivf")))
              .select("vec_id").as[Long].collect().toSet
            assert(ivf == expected((gen - 1).toInt),
              s"trial $trial gen $gen ivf leg")
          } else {
            intercept[IllegalArgumentException](
              CollectionCommit.manifestAt(spark, colDir, gen)): Unit
          }
        }
      } finally rmRf(colDir)
    }
  }

  test("commit-time validation: default-retention member maintenance " +
       "inside stage fails the collection commit LOUDLY") {
    val colDir = tmpDir("graft_col_validate")
    try {
      buildBoth(colDir)
      // the misuse the docs warn about: a member delete with DEFAULT
      // retention GCs member gen 1 while collection snapshot 1 still
      // pins it — the commit must error before flipping, not leave
      // collection time travel silently broken
      val ex = intercept[RuntimeException] {
        CollectionCommit.commit(spark, colDir) { (_, _) =>
          Bm25.deleteDocs(spark,
            CollectionCommit.memberDir(colDir, "bm25"),
            Seq(4L).toDF("doc_id")) // retainGens = 1: WRONG here
          VectorSearch.deleteVectors(spark,
            CollectionCommit.memberDir(colDir, "ivf"),
            Seq(4L).toDF("vec_id"), retainGens = Int.MaxValue)
          Map("bm25" -> 2L, "ivf" -> 2L)
        }
      }
      assert(ex.getMessage.contains("retainGens"), ex.getMessage)
      // no torn state: the collection manifest never advanced
      assert(CollectionCommit.currentManifest(spark, colDir).get.gen == 1L)
    } finally rmRf(colDir)
  }

  test("gc removes member directories dropped from every retained " +
       "snapshot") {
    val colDir = tmpDir("graft_col_drop")
    try {
      buildBoth(colDir)
      // snapshot 2 drops the ivf member entirely (decommissioned leg)
      CollectionCommit.commit(spark, colDir) { (gen, cur) =>
        assert(gen == 2L && cur.get.members.contains("ivf"))
        Map("bm25" -> 1L)
      }
      val ivfDir = new java.io.File(
        CollectionCommit.memberDir(colDir, "ivf"))
      assert(ivfDir.isDirectory)
      // keepGens = 2 still retains snapshot 1, which pins ivf: kept
      CollectionCommit.gc(spark, colDir, keepGens = 2)
      assert(ivfDir.isDirectory)
      // keepGens = 1: no retained snapshot pins ivf — the directory
      // (all its generations) is unreachable garbage and is removed
      CollectionCommit.gc(spark, colDir, keepGens = 1)
      assert(!ivfDir.exists(),
        "unpinned member directory must not leak disk")
      // the surviving (bm25-only) snapshot still serves
      val m2 = CollectionCommit.manifestAt(spark, colDir, 2L)
      val bm = Bm25.serve(spark,
          CollectionCommit.memberDir(colDir, "bm25"), queries, k = 10,
          atGen = Some(m2.members("bm25")))
        .select("doc_id").as[Long].collect().toSet
      assert(bm.nonEmpty)
    } finally rmRf(colDir)
  }

  test("collection gc with a grace window spares a live collection " +
       "claim; aged stranded claims clear") {
    val colDir = tmpDir("graft_col_claimage")
    try {
      buildBoth(colDir)
      // gc invoked (out of contract) while a collection commit is
      // mid-stage: the fresh claim survives, the commit completes
      CollectionCommit.commit(spark, colDir) { (gen, cur) =>
        CollectionCommit.gc(spark, colDir, keepGens = 1,
          graceMs = 60000L)
        val claim = new java.io.File(colDir, f"_colclaim_g$gen%012d")
        assert(claim.isFile,
          "collection gc with a grace window must spare a live claim")
        cur.get.members
      }
      assert(CollectionCommit.currentManifest(spark, colDir).get.gen == 2L)
      // an aged stranded claim still clears
      val stale = new java.io.File(colDir, f"_colclaim_g${3L}%012d")
      assert(stale.createNewFile())
      assert(stale.setLastModified(System.currentTimeMillis() - 120000L))
      CollectionCommit.gc(spark, colDir, keepGens = 1, graceMs = 60000L)
      assert(!stale.exists(), "aged stranded collection claim must clear")
    } finally rmRf(colDir)
  }

  test("gc spares a freshly staged NEW member directory under a grace " +
       "window; aged unpinned directories still clear") {
    val colDir = tmpDir("graft_col_dirage")
    try {
      buildBoth(colDir)
      // a commit is mid-stage adding a NEW member (not pinned by any
      // retained manifest yet) when an out-of-contract gc runs: the
      // fresh directory must survive — the same grace the claims get
      CollectionCommit.commit(spark, colDir) { (_, cur) =>
        val nm = CollectionCommit.memberDir(colDir, "ivf2")
        VectorSearch.ivfWriteIndex(vecs, nm, dim = 2)
        CollectionCommit.gc(spark, colDir, keepGens = 1,
          graceMs = 60000L)
        assert(new java.io.File(nm).isDirectory,
          "grace-window gc must spare a member dir being staged")
        cur.get.members + ("ivf2" -> 1L)
      }
      assert(CollectionCommit.currentManifest(spark, colDir)
        .get.members.contains("ivf2"))
      // an AGED unpinned directory (decommissioned leg) still clears
      // even under the same grace window — once the superseded
      // manifests that pinned it have aged past the reader lease too
      // (the lease retains a just-superseded collection manifest, and
      // a retained manifest's pins are not garbage)
      CollectionCommit.commit(spark, colDir) { (_, cur) =>
        cur.get.members - "ivf2"
      }
      val dead = new java.io.File(
        CollectionCommit.memberDir(colDir, "ivf2"))
      def age(f: java.io.File): Unit = {
        f.setLastModified(System.currentTimeMillis() - 120000L): Unit
        Option(f.listFiles()).foreach(_.foreach(age))
      }
      age(dead)
      new java.io.File(colDir).listFiles()
        .filter(_.getName.startsWith("_collection_g"))
        .foreach(f => f.setLastModified(
          System.currentTimeMillis() - 120000L): Unit)
      CollectionCommit.gc(spark, colDir, keepGens = 1, graceMs = 60000L)
      assert(!dead.exists(),
        "aged unpinned member directory must still clear under grace")
    } finally rmRf(colDir)
  }

  test("a stranded claim in a manifest-less directory clears via gc " +
       "(crashed first commit / clone recovery) at both layers") {
    val colDir = tmpDir("graft_col_strand")
    val idxDir = tmpDir("graft_idx_strand")
    try {
      // collection layer: a cloneSnapshot killed before any flip
      // leaves dest with a claim and NO manifest; gc (the documented
      // recovery path) must clear the aged claim so the retry's claim
      // creation succeeds
      val claim = new java.io.File(colDir, f"_colclaim_g${1L}%012d")
      assert(claim.createNewFile())
      assert(claim.setLastModified(System.currentTimeMillis() - 120000L))
      CollectionCommit.gc(spark, colDir, keepGens = 1, graceMs = 60000L)
      assert(!claim.exists(),
        "aged claim in a manifest-less collection dir must clear")
      // ...but a FRESH claim (live first committer) survives the same gc
      assert(claim.createNewFile())
      CollectionCommit.gc(spark, colDir, keepGens = 1, graceMs = 60000L)
      assert(claim.isFile, "fresh claim must survive grace-window gc")
      assert(claim.delete())
      // and the retry actually proceeds end-to-end
      buildBoth(colDir)
      assert(CollectionCommit.currentManifest(spark, colDir).get.gen == 1L)
      // member layer: same recovery for IndexCommit.gcUnreferenced
      val iclaim = new java.io.File(idxDir, f"_claim_g${1L}%012d")
      assert(iclaim.createNewFile())
      assert(iclaim.setLastModified(System.currentTimeMillis() - 120000L))
      IndexCommit.gcUnreferenced(spark, idxDir, keepGens = 1,
        graceMs = 60000L)
      assert(!iclaim.exists(),
        "aged claim in a manifest-less index dir must clear")
      assert(iclaim.createNewFile())
      IndexCommit.gcUnreferenced(spark, idxDir, keepGens = 1,
        graceMs = 60000L)
      assert(iclaim.isFile, "fresh index claim must survive")
    } finally { rmRf(colDir); rmRf(idxDir) }
  }

  test("maintenance run: compacts exactly the flagged members in one " +
       "collection flip, serve is bit-equal, cards quiet after; a " +
       "no-flag night flips nothing") {
    val colDir = tmpDir("graft_col_maint")
    try {
      buildBoth(colDir)
      // give ONLY the bm25 member segment debt (two appends of new
      // docs) + a takedown masking both; ivf stays single-segment
      // with a sub-threshold mask
      CollectionCommit.commit(spark, colDir) { (_, cur) =>
        Bm25.appendIndex(spark, CollectionCommit.memberDir(colDir, "bm25"),
          Seq((5L, "red value table"), (6L, "blue fast")).toDF("doc_id", "text"),
          "doc_id", "text", retainGens = Int.MaxValue)
        Bm25.appendIndex(spark, CollectionCommit.memberDir(colDir, "bm25"),
          Seq((7L, "green scan")).toDF("doc_id", "text"),
          "doc_id", "text", retainGens = Int.MaxValue)
        cur.get.members + ("bm25" ->
          IndexCommit.currentManifest(spark,
            CollectionCommit.memberDir(colDir, "bm25")).get.gen)
      }
      val preGen = CollectionCommit.currentManifest(spark, colDir).get.gen
      val pre = servedDocs(colDir, preGen)
      // thresholds: bm25's 3 postings segments > 2 flags it; ivf has
      // 1 segment and no tombstones — quiet
      val flagged = CollectionMaintenance.run(spark, colDir,
        Map("bm25" -> CollectionMaintenance.KeywordFamily,
          "ivf" -> CollectionMaintenance.VectorFamily("cells", "cell")),
        maxSegments = 2)
      assert(flagged == Map("bm25" -> true, "ivf" -> false))
      val m = CollectionCommit.currentManifest(spark, colDir).get
      assert(m.gen == preGen + 1, "maintenance must flip ONE generation")
      // selective: the un-flagged member's pin carried forward verbatim
      assert(m.members("ivf") ==
        CollectionCommit.manifestAt(spark, colDir, preGen).members("ivf"))
      // serve at the new pins is bit-equal to the pre-maintenance serve
      assert(servedDocs(colDir, m.gen) == pre)
      // the compacted member's card is quiet: one segment per table
      val card = Bm25.healthCard(spark,
          CollectionCommit.memberDir(colDir, "bm25"), maxSegments = 2)
        .collect().map(r => r.getString(0) ->
          (r.getInt(1), r.getBoolean(5))).toMap
      assert(card.values.forall { case (segs, rec) => segs == 1 && !rec },
        s"post-maintenance card must be quiet: $card")
      // a second night with nothing flagged flips NO generation
      val again = CollectionMaintenance.run(spark, colDir,
        Map("bm25" -> CollectionMaintenance.KeywordFamily,
          "ivf" -> CollectionMaintenance.VectorFamily("cells", "cell")),
        maxSegments = 2)
      assert(again == Map("bm25" -> false, "ivf" -> false))
      assert(CollectionCommit.currentManifest(spark, colDir).get.gen
        == m.gen, "a no-flag night must be a no-op")
      // unknown member is a loud error
      val ex = intercept[RuntimeException](CollectionMaintenance.run(
        spark, colDir, Map("nope" -> CollectionMaintenance.KeywordFamily)))
      assert(ex.getMessage.contains("pins no member"), ex.getMessage)
    } finally rmRf(colDir)
  }

  test("collection clone promotes every member at its pinned " +
       "generation; time travel composes") {
    val colDir = tmpDir("graft_col_clone_src")
    val dest = tmpDir("graft_col_clone_dst_") + "/fresh"
    val destOld = tmpDir("graft_col_clone_old_") + "/pinned"
    try {
      buildBoth(colDir)
      takedown(colDir)
      def servedAt(dir: String, gen: Long): (Set[Long], Set[Long]) =
        servedDocs(dir, gen)
      // current-snapshot promotion: both legs land at THEIR pinned
      // generations, collection gen 1 at the destination
      CollectionCommit.cloneSnapshot(spark, colDir, dest)
      val mc = CollectionCommit.currentManifest(spark, dest).get
      assert(mc.gen == 1L && mc.members == Map("bm25" -> 1L, "ivf" -> 1L))
      assert(servedAt(dest, 1L) == servedAt(colDir, 2L))
      assert(!servedAt(dest, 1L)._1.contains(4L))
      // pinned-snapshot promotion: yesterday's consistent pair
      CollectionCommit.cloneSnapshot(spark, colDir, destOld,
        atGen = Some(1L))
      assert(servedAt(destOld, 1L) == servedAt(colDir, 1L))
      assert(servedAt(destOld, 1L)._1.contains(4L))
      // clones are fresh directories, never merges
      val busy = intercept[RuntimeException](
        CollectionCommit.cloneSnapshot(spark, colDir, dest))
      assert(busy.getMessage.contains("already holds"), busy.getMessage)
      // independence: wiping the source leaves the promotion serving
      rmRf(colDir)
      assert(!servedAt(dest, 1L)._1.contains(4L))
      assert(servedAt(dest, 1L)._1.nonEmpty)
    } finally { rmRf(colDir); rmRf(dest); rmRf(destOld) }
  }

  test("mid-compaction reader: resolving the collection WHILE the " +
       "maintenance commit is mid-flight yields the prior committed " +
       "pair — never a mixed generation — and serves bit-equal") {
    val colDir = tmpDir("graft_col_midmaint")
    try {
      buildBoth(colDir)
      val bmDir = CollectionCommit.memberDir(colDir, "bm25")
      val ivfDir = CollectionCommit.memberDir(colDir, "ivf")
      def memberGen(dir: String): Long =
        IndexCommit.currentManifest(spark, dir).get.gen
      // segment debt so the compaction has something to fold
      CollectionCommit.commit(spark, colDir) { (_, _) =>
        Bm25.appendIndex(spark, bmDir,
          Seq((5L, "red value table"), (6L, "blue scan"))
            .toDF("doc_id", "text"), "doc_id", "text",
          retainGens = Int.MaxValue)
        VectorSearch.ivfAppendIndex(spark, ivfDir,
          Seq((5L, Array(0.8f, 0.2f)), (6L, Array(0.2f, 0.8f)))
            .toDF("vec_id", "embedding"), dim = 2,
          retainGens = Int.MaxValue)
        Map("bm25" -> memberGen(bmDir), "ivf" -> memberGen(ivfDir))
      }
      val before = servedDocs(colDir, 2L)
      var mid: (Set[Long], Set[Long]) = null
      CollectionCommit.commit(spark, colDir) { (_, cur) =>
        Bm25.compactIndex(spark, bmDir, retainGens = Int.MaxValue)
        // MID-FLIGHT: the keyword member has already advanced, the
        // vector member has not. A reader resolving the collection
        // at this instant must see the PRIOR committed pair — the
        // torn state (compacted bm25 beside pre-compaction ivf pins)
        // must be unobservable through the collection manifest.
        assert(memberGen(bmDir) > cur.get.members("bm25"),
          "the keyword member really has moved underneath the reader")
        val seen = CollectionCommit.currentManifest(spark, colDir).get
        assert(seen.gen == cur.get.gen &&
          seen.members == cur.get.members,
          s"mid-flight reader must see the committed pair, got $seen")
        mid = servedDocs(colDir, seen.gen)
        VectorSearch.compactIndexTable(spark, ivfDir, "cells", "cell",
          retainGens = Int.MaxValue)
        Map("bm25" -> memberGen(bmDir), "ivf" -> memberGen(ivfDir))
      }
      assert(mid == before,
        "the mid-flight serve is bit-equal to the pre-maintenance one")
      val after = servedDocs(colDir,
        CollectionCommit.currentManifest(spark, colDir).get.gen)
      assert(after == before, "compaction is pure reorganization")
    } finally rmRf(colDir)
  }

  test("collection gc: the graceMs reader lease retains a just-" +
       "superseded COLLECTION manifest past keepGens; without the " +
       "lease the same trim collects it") {
    val colDir = tmpDir("graft_col_lease")
    try {
      buildBoth(colDir)
      takedown(colDir)
      // aggressive count-trim + lease: g1 was superseded milliseconds
      // ago, so the lease keeps BOTH the collection manifest and the
      // member generations it pins — the pinned reader still serves
      CollectionCommit.gc(spark, colDir, keepGens = 1,
        graceMs = 3600L * 1000)
      assert(servedDocs(colDir, 1L)._1 == Set(1L, 2L, 3L, 4L),
        "the leased snapshot serves its full pre-takedown corpus")
      // the same trim with no lease collects g1 (and the member layer
      // trims the gens only g1 pinned); the current snapshot serves on
      CollectionCommit.gc(spark, colDir, keepGens = 1)
      val gone = intercept[Exception](
        CollectionCommit.manifestAt(spark, colDir, 1L))
      assert(gone.getMessage.contains("no manifest"), gone.getMessage)
      assert(servedDocs(colDir, 2L)._1 == Set(1L, 2L, 3L))
    } finally rmRf(colDir)
  }
}
