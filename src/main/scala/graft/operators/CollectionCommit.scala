package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Cross-index atomic snapshots — the consistency layer ABOVE
  * [[IndexCommit]]. A retrieval deployment rarely serves one index:
  * hybrid RRF reads a BM25 manifest AND a vector manifest, and a
  * takedown must vanish from BOTH legs at once. Each member index
  * already flips atomically, but two member flips are two instants —
  * a reader resolving manifests between them sees the document deleted
  * from one leg and alive in the other (exactly the torn state a
  * multi-table transaction exists to prevent; Iceberg/Delta solve the
  * single-table version of this, the reference's analogue is the
  * consolidated cache swapping feeds under one lookup key,
  * /root/reference/fast.py:106-136).
  *
  * A COLLECTION directory owns its member indexes as subdirectories
  * (`colDir/<member>` is an ordinary [[IndexCommit]] index) plus
  * numbered collection manifests (`_collection_g<gen>`) pinning, per
  * member, ONE index generation. Readers resolve the collection
  * manifest once and serve every leg at its pinned generation
  * ([[graft.operators.Bm25.serve]]'s / ivfServe's `atGen`): the set of
  * legs they observe is always one that was committed TOGETHER.
  *
  * == Protocol ==
  *
  * [[commit]] claims its generation (atomic create-fails-if-exists,
  * same single-writer enforcement as the member layer), runs `stage`
  * — which performs the member commits, each itself atomic — and only
  * then flips the collection manifest via temp-file + rename.
  * Consequences, which CollectionCommitSpec pins:
  *
  *  - a crash AFTER some member flips but BEFORE the collection flip
  *    leaves collection readers on the PRIOR collection manifest,
  *    whose pinned member generations are all still present (member
  *    commits never modify prior generations) — consistent, just
  *    stale; the orphan member generations are superseded by the
  *    retry or trimmed by [[gc]];
  *  - a retried commit re-runs the member operations (append/delete
  *    retries are idempotent at the member layer) and flips the same
  *    collection generation the crashed attempt claimed;
  *  - two racing collection committers: exactly one wins, the loser
  *    errors naming the contested generation.
  *
  * == Retention ==
  *
  * Member-level GC must never collect a generation some retained
  * collection manifest still pins. Member maintenance invoked inside
  * `stage` should therefore pass `retainGens = Int.MaxValue` (retain
  * everything) and leave trimming to [[gc]], which derives each
  * member's exact retention floor from the retained collection
  * manifests — the same inversion of control the member layer applies
  * to its own segments (manifests decide, GC obeys). */
object CollectionCommit {

  /** One committed collection state: per member subdirectory name, the
    * pinned [[IndexCommit]] generation. */
  final case class Manifest(gen: Long, members: Map[String, Long])

  private val ManifestRe = "_collection_g(\\d+)".r
  private val ClaimRe = "_colclaim_g(\\d+)".r
  private val Header = "graft-collection-manifest-v1"

  private def fsOf(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  private def manifestName(gen: Long): String = f"_collection_g$gen%012d"
  private def claimName(gen: Long): String = f"_colclaim_g$gen%012d"

  private def listGens(fs: FileSystem, p: Path): Array[Long] =
    fs.listStatus(p).map(_.getPath.getName)
      .collect { case ManifestRe(g) => g.toLong }

  private def clearAgedClaims(fs: FileSystem, p: Path,
                              graceMs: Long): Unit = {
    val cutoff = System.currentTimeMillis() - graceMs
    fs.listStatus(p).foreach { st =>
      st.getPath.getName match {
        case ClaimRe(_) if st.getModificationTime < cutoff =>
          fs.delete(st.getPath, false): Unit
        case _ =>
      }
    }
  }

  private def parse(fs: FileSystem, p: Path, gen: Long,
                    dir: String): Manifest = {
    val in = fs.open(new Path(p, manifestName(gen)))
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val lines = text.linesIterator.toSeq
    require(lines.headOption.contains(Header),
      s"unrecognized collection manifest header in $dir: ${lines.headOption}")
    val members = lines.drop(1).filter(_.nonEmpty).map { line =>
      val i = line.indexOf('=')
      require(i > 0, s"malformed collection manifest line in $dir: $line")
      line.substring(0, i) -> line.substring(i + 1).toLong
    }.toMap
    Manifest(gen, members)
  }

  /** The member index's own directory under the collection root. */
  def memberDir(colDir: String, member: String): String =
    s"$colDir/$member"

  /** Highest-generation collection manifest, or None before the first
    * commit. */
  def currentManifest(spark: SparkSession, colDir: String): Option[Manifest] = {
    val (fs, p) = fsOf(spark, colDir)
    if (!fs.exists(p)) return None
    val gens = listGens(fs, p)
    if (gens.isEmpty) None else Some(parse(fs, p, gens.max, colDir))
  }

  /** The collection manifest at a SPECIFIC generation — collection
    * TIME TRAVEL: every leg of a prior snapshot serves bit-identically
    * as long as [[gc]] retention covers it. */
  def manifestAt(spark: SparkSession, colDir: String, gen: Long): Manifest = {
    val (fs, p) = fsOf(spark, colDir)
    require(fs.exists(new Path(p, manifestName(gen))),
      s"collection at $colDir has no manifest g$gen (never committed, " +
        "or GC'd past retention — raise keepGens on gc)")
    parse(fs, p, gen, colDir)
  }

  /** Run one atomic collection commit: `stage(gen, current)` performs
    * the member index commits (each atomic at its own layer) and
    * returns the FULL member→generation map the new collection
    * manifest pins (carrying forward untouched members' generations
    * verbatim). Only after `stage` returns is the collection marker
    * flipped; a `stage` that throws commits nothing at the collection
    * layer. */
  def commit(spark: SparkSession, colDir: String)(
      stage: (Long, Option[Manifest]) => Map[String, Long]): Unit = {
    val cur = currentManifest(spark, colDir)
    val gen = cur.map(_.gen).getOrElse(0L) + 1
    val (fs, p) = fsOf(spark, colDir)
    if (!fs.exists(p)) fs.mkdirs(p): Unit
    val claim = new Path(p, claimName(gen))
    val claimed =
      try { fs.create(claim, false).close(); true }
      catch { case _: java.io.IOException => false }
    if (!claimed) {
      if (fs.exists(new Path(p, manifestName(gen)))) sys.error(
        s"collection commit to $colDir lost the race: generation $gen " +
          "was committed by a concurrent writer (single-writer " +
          "contract violated)")
      else sys.error(
        s"collection commit to $colDir: ${claimName(gen)} is already " +
          "held — a concurrent committer is mid-flight (single-writer " +
          "contract violated) or a prior attempt was killed before its " +
          "flip; a sole writer recovering from a kill should gc the " +
          "collection to clear stranded claims, then retry")
    }
    try {
      val members = stage(gen, cur)
      require(members.nonEmpty, s"collection commit to $colDir pinned " +
        "no members")
      members.keys.foreach(m => require(
        !m.contains('=') && !m.contains('/') && !m.contains(','),
        s"bad member name: $m"))
      // every generation this manifest pins — new AND carried-forward
      // from the prior snapshot — must RESOLVE before the flip: a
      // member-level op inside stage that ran with default retention
      // (instead of the documented retainGens = Int.MaxValue) GCs
      // member generations a prior collection manifest still pins.
      // Validating here turns that misuse into a loud commit-time
      // error instead of a collection-time-travel read failing later.
      members.foreach { case (mem, g) =>
        try { IndexCommit.manifestAt(spark, memberDir(colDir, mem), g); () }
        catch { case e: Exception => sys.error(
          s"collection commit to $colDir: member '$mem' generation " +
            s"$g does not resolve (${e.getMessage}) — member " +
            "maintenance inside stage must pass retainGens = " +
            "Int.MaxValue and leave trimming to CollectionCommit.gc")
        }
      }
      cur.foreach(_.members.foreach { case (mem, g) =>
        try { IndexCommit.manifestAt(spark, memberDir(colDir, mem), g); () }
        catch { case e: Exception => sys.error(
          s"collection commit to $colDir: PRIOR snapshot g${cur.get.gen} " +
            s"pins member '$mem' generation $g which no longer resolves " +
            s"(${e.getMessage}) — member maintenance inside stage must " +
            "pass retainGens = Int.MaxValue so retained collection " +
            "snapshots keep serving; trimming belongs to " +
            "CollectionCommit.gc")
        }
      })
      val body = (Header +: members.toSeq.sortBy(_._1)
        .map { case (m, g) => s"$m=$g" }).mkString("", "\n", "\n")
      val tmp = new Path(p, s"._collection_g$gen.tmp")
      val out = fs.create(tmp, true)
      try out.write(body.getBytes("UTF-8")) finally out.close()
      val fin = new Path(p, manifestName(gen))
      require(!fs.exists(fin),
        s"collection commit to $colDir lost the race: generation $gen " +
          "was committed by a concurrent writer (single-writer contract " +
          "violated)")
      require(fs.rename(tmp, fin),
        s"collection manifest flip failed: $tmp -> $fin (concurrent " +
          "writer?)")
    } finally fs.delete(claim, false): Unit
  }

  /** CLONE one committed collection snapshot into a fresh collection
    * directory — staging→serving promotion for a MULTI-INDEX
    * deployment: validate the whole hybrid state (every leg) in
    * staging, then promote the exact bytes of EVERY member at its
    * pinned generation in one operation. Each member is cloned via
    * [[IndexCommit.cloneSnapshot]] (a distributed distcp-shape copy;
    * physical layout survives verbatim) at the generation THIS
    * collection snapshot pins — so the promoted collection is the
    * consistent cross-index state the snapshot guarantees, never a
    * mix of member currents. The destination commits as collection
    * generation 1 pinning every member's clone at its own generation
    * 1; source GC can never reach into it. `atGen` promotes any
    * retained source snapshot (collection time travel composes).
    *
    * Crash recovery: member clones land first, the collection
    * manifest flips last — a crash mid-way leaves dest without a
    * collection manifest, and the retry wipes the partial member
    * clones (nothing references them: the destination collection
    * never committed) and re-copies. A hard kill can also strand the
    * destination's `_colclaim_g1`; [[gc]] on the (manifest-less)
    * destination clears aged claims, after which the retry proceeds. */
  def cloneSnapshot(spark: SparkSession, colDir: String, dest: String,
                    atGen: Option[Long] = None): Unit = {
    val src = atGen match {
      case Some(g) => manifestAt(spark, colDir, g)
      case None => currentManifest(spark, colDir).getOrElse(sys.error(
        s"cloneSnapshot: no committed collection at $colDir"))
    }
    commit(spark, dest) { (_, cur) =>
      require(cur.isEmpty,
        s"cloneSnapshot: destination $dest already holds a committed " +
          "collection (gen " + cur.map(_.gen).getOrElse(0L) + ") — " +
          "clones are fresh directories, not merges")
      src.members.foreach { case (mem, g) =>
        val dm = memberDir(dest, mem)
        // a crashed prior attempt may have left a committed member
        // clone; the destination collection never flipped, so nothing
        // references it — wipe and re-copy (idempotent retry)
        val dmp = new Path(dm)
        val dfs = dmp.getFileSystem(spark.sessionState.newHadoopConf())
        if (dfs.exists(dmp)) dfs.delete(dmp, true): Unit
        IndexCommit.cloneSnapshot(spark, memberDir(colDir, mem), dm,
          Some(g))
      }
      src.members.map { case (mem, _) => mem -> 1L }
    }
  }

  /** Trim collection AND member retention in one pass: keep the newest
    * `keepGens` collection manifests, then GC each member index down
    * to exactly the generations some retained collection manifest
    * still pins (plus anything newer — orphans of a crashed stage are
    * superseded, not resurrected). `graceMs` is the time-based reader
    * lease at BOTH layers: a collection manifest superseded less than
    * graceMs ago stays retained past `keepGens` (so a long-running
    * reader's pinned snapshot survives an aggressive trim), and the
    * same lease forwards to each member's gcUnreferenced. Call after
    * a commit, never before — post-commit GC can only orphan, not
    * corrupt. */
  def gc(spark: SparkSession, colDir: String, keepGens: Int = 1,
         graceMs: Long = 0L): Unit = {
    require(keepGens >= 1, s"keepGens must be >= 1, got $keepGens")
    val (fs, p) = fsOf(spark, colDir)
    if (!fs.exists(p)) return
    val all = listGens(fs, p).sorted.reverse
    if (all.isEmpty) {
      // a cloneSnapshot/first-commit killed before its flip strands a
      // claim in a directory with NO manifest; gc is the documented
      // recovery path, so it must clear aged claims here too — an
      // early return would leave every retry failing at claim
      // creation until an operator hand-deletes the marker
      clearAgedClaims(fs, p, graceMs)
      return
    }
    val cutoff = System.currentTimeMillis() - graceMs
    // `graceMs` is the reader lease at THIS layer too, not only the
    // member layer's: a collection reader pins a COLLECTION manifest,
    // so a generation stays retained until it has been superseded for
    // at least graceMs (measured from its successor manifest's mtime
    // — the instant it stopped being current), regardless of
    // keepGens. Without this, an aggressive keepGens trim would
    // delete the very manifest a long-running reader resolved while
    // the member gens it pins survive — the lease would protect the
    // legs but not the snapshot naming them.
    val retainedGens = all.zipWithIndex.filter { case (_, i) =>
      i < keepGens || (graceMs > 0 &&
        fs.getFileStatus(new Path(p, manifestName(all(i - 1))))
          .getModificationTime >= cutoff)
    }.map(_._1)
    val retained = retainedGens.map(parse(fs, p, _, colDir))
    val retainedMembers = retained.flatMap(_.members.keys).toSet
    retainedMembers.foreach { member =>
      val mDir = memberDir(colDir, member)
      val floor = retained.flatMap(_.members.get(member)).min
      IndexCommit.currentManifest(spark, mDir).foreach { cur =>
        // keep every member gen >= the oldest pinned one; the member
        // layer counts retention from its newest gen downward
        val span = (cur.gen - floor + 1).max(1L).min(Int.MaxValue.toLong)
        IndexCommit.gcUnreferenced(spark, mDir, span.toInt, graceMs)
      }
    }
    fs.listStatus(p).foreach { st =>
      val n = st.getPath.getName
      val dead = n match {
        case ManifestRe(g) => !retainedGens.contains(g.toLong)
        // stranded claims only once aged past graceMs — a younger one
        // may belong to a LIVE committer (an out-of-contract
        // concurrent GC must not reopen the interleave race)
        case ClaimRe(_) => st.getModificationTime < cutoff
        // a member directory dropped from EVERY retained collection
        // manifest is unreachable by any reader this layer serves —
        // without this it (and all its generations) leaks disk
        // forever. The collection dir OWNS its subdirectories (the
        // member contract), so an unpinned subdirectory is garbage.
        // Aged-only, like claims: a fresh dir may be a NEW member a
        // live committer is mid-staging (not yet pinned by any
        // manifest) — an out-of-contract concurrent gc must not
        // destroy it, and staging keeps the dir's mtime current.
        case _ if st.isDirectory =>
          !retainedMembers.contains(n) && st.getModificationTime < cutoff
        case _ => n.startsWith("._collection_")
      }
      if (dead) fs.delete(st.getPath, true): Unit
    }
  }
}
