package graft.operators

import org.apache.spark.sql.SparkSession

/** The nightly maintenance job an operator actually schedules over a
  * hybrid collection: read each member index's HEALTH card, compact
  * exactly the members the cards flag, and flip ONE collection
  * generation pinning the maintained state — so readers move from
  * "pre-maintenance everywhere" to "post-maintenance everywhere" in a
  * single atomic step, and an un-flagged member's pin is carried
  * forward untouched (maintenance is selective, never a blanket
  * rewrite of the deployment).
  *
  * This closes the advisory loop the health cards opened:
  * [[Bm25.healthCard]] / [[VectorSearch.healthCard]] SAY
  * `compact_recommended` when segment debt or tombstone mass crosses
  * the deployment's thresholds, [[Bm25.compactIndex]] /
  * [[VectorSearch.compactIndexTable]] are the actions, and this job
  * wires signal to action under the collection-commit consistency
  * contract (the same card→action→verified-recovery discipline
  * [[VectorSearch.ivfRetrainCard]]'s rebuild entry pins for geometry
  * drift). Compactions are pure reorganization — rows identical, so
  * serving at the new collection generation is bit-equal to serving
  * at the prior one; the cards re-read after the flip report one
  * segment per table and zero masks for every compacted member.
  *
  * Reference analogue: the consolidated cache refresh that rewrites a
  * stale feed and swaps it under its lookup key
  * (/root/reference/fast.py:106-136), generalized to "rewrite every
  * flagged member, swap once".
  */
object CollectionMaintenance {

  /** Which family's health-card/compaction pair a member uses. */
  sealed trait Family
  /** BM25 keyword index: [[Bm25.healthCard]] + [[Bm25.compactIndex]]
    * (postings re-sorted by term, df deltas folded, mask
    * materialized). */
  case object KeywordFamily extends Family
  /** A vector family keyed by its rows table and partition column
    * ("cells"/"cell" for IVF, "buckets"/"bkt" for LSH, …):
    * [[VectorSearch.healthCard]] + [[VectorSearch.compactIndexTable]]. */
  final case class VectorFamily(rowsTable: String,
                                partCol: String) extends Family

  /** Run one maintenance pass over `colDir`: per member in
    * `families`, read its health card at the member's CURRENT state
    * (= the latest collection pin — the job runs between ingest
    * windows, the single-writer contract), and if ANY card row flags
    * `compact_recommended`, compact that member inside one collection
    * commit (member retention Int.MaxValue — trimming belongs to
    * [[CollectionCommit.gc]], which the caller runs after). Members
    * whose cards are quiet keep their pinned generations verbatim.
    * When no member is flagged, NO collection generation is flipped —
    * an idempotent no-op night.
    *
    * Returns member → flagged, the job's own log line. The card reads
    * are table-count-bounded collects (a few rows per member), never
    * corpus-sized; the compactions themselves are the distributed
    * rewrites the member layer already provides. */
  def run(spark: SparkSession, colDir: String,
          families: Map[String, Family],
          maxSegments: Int = 8,
          maxMaskedFrac: Double = 0.1): Map[String, Boolean] = {
    val cur = CollectionCommit.currentManifest(spark, colDir)
      .getOrElse(sys.error(s"maintenance run: no committed collection " +
        s"at $colDir"))
    families.keys.foreach(mem => require(cur.members.contains(mem),
      s"maintenance run: collection at $colDir pins no member '$mem' " +
        s"(snapshot g${cur.gen} carries ${cur.members.keys.toSeq.sorted})"))
    val flagged: Map[String, Boolean] = families.map { case (mem, fam) =>
      val dir = CollectionCommit.memberDir(colDir, mem)
      val card = fam match {
        case KeywordFamily =>
          Bm25.healthCard(spark, dir, maxSegments, maxMaskedFrac)
        case VectorFamily(rowsTable, _) =>
          VectorSearch.healthCard(spark, dir, rowsTable, maxSegments,
            maxMaskedFrac)
      }
      mem -> card.select("compact_recommended").collect()
        .exists(_.getBoolean(0))
    }
    if (flagged.values.exists(identity))
      CollectionCommit.commit(spark, colDir) { (_, prev) =>
        val pins = prev.getOrElse(sys.error(
          s"maintenance run: collection at $colDir lost its manifest " +
            "mid-run")).members
        families.foldLeft(pins) { case (acc, (mem, fam)) =>
          if (!flagged(mem)) acc
          else {
            val dir = CollectionCommit.memberDir(colDir, mem)
            fam match {
              case KeywordFamily =>
                Bm25.compactIndex(spark, dir, retainGens = Int.MaxValue)
              case VectorFamily(rowsTable, partCol) =>
                VectorSearch.compactIndexTable(spark, dir, rowsTable,
                  partCol, retainGens = Int.MaxValue)
            }
            acc.updated(mem,
              IndexCommit.currentManifest(spark, dir).get.gen)
          }
        }
      }
    flagged
  }
}
