package graft.queries

import graft.{Env, Q}
import graft.syntax._
import graft.operators.TextDedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dedup pack over the `documents` table (LLM-pipeline brief). The
  * oracles are BRUTE-FORCE all-pairs in DuckDB — fine at sf0.01 —
  * while the Spark side uses banded/chunked candidate joins, so a green
  * row proves the sub-quadratic plan reproduces the quadratic ground
  * truth exactly.
  */
object DedupQueries {

  // Shared DuckDB fragments (3-gram shingle set per doc). Fallback-
  // aware like TextDedup.shingles: a doc under 3 tokens contributes
  // its whole text as one shingle — without it a duplicated 1–2-token
  // doc pairs on the Spark side but scores NULL (0/0) Jaccard here,
  // silently vanishing from every pair oracle built on this fragment.
  private[queries] val shingleCte =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS s FROM documents),
      |sh AS (SELECT doc_id,
      |         CASE WHEN len(s) >= 3
      |              THEN list_distinct(list_transform(range(1, len(s) - 1),
      |                i -> s[i] || ' ' || s[i+1] || ' ' || s[i+2]))
      |              ELSE [array_to_string(s, ' ')] END AS g
      |       FROM toks)""".stripMargin

  /** Exact dedup on the canonical token-set (1-gram) fingerprint —
    * bag-of-words-identical documents collapse; 3-gram fingerprints are
    * stricter and find nothing in this corpus (every near-dup pair
    * differs in ≥ 1 shingle). */
  def dedupExact(env: Env): DataFrame =
    TextDedup.exactGroups(env.documents, "doc_id", "text", n = 1)
      .orderBy($"canonical_id")

  /** MinHash-LSH near-dup pairs, exact-verified at Jaccard ≥ 0.8 — the
    * regime the 16×4 banding GUARANTEES (miss ≤ (1−0.8⁴)¹⁶ ≈ 2e-4 at
    * the threshold, ≈ 4e-8 at the planted-dup 0.9). At the old 0.5
    * gate the scheme's recall is only ~0.65 and the green hash relied
    * on the corpus having no pairs in (0.5, 0.9) — measured: this
    * corpus's true pairs all sit at ≥ 0.9, so the output is identical
    * and the gate no longer depends on that gap (ADVICE r02 #1). */
  def dedupMinhash(env: Env): DataFrame =
    TextDedup.minhashNearDupPairs(env.documents, "doc_id", "text", threshold = 0.8)
      .select($"doc_a", $"doc_b", round($"jaccard", 6).as("jaccard"))
      .orderBy($"doc_a", $"doc_b")

  /** Near-dup pairs at a NON-0.8 threshold with the banding derived
    * from (threshold, recall floor) — the parameterized-LSH entry: at
    * 0.6 the S-curve inversion widens the scheme to 21 bands × 3 rows
    * (see [[graft.operators.TextDedup.deriveBanding]]); the oracle is
    * the same brute-force ground truth re-gated at 0.6. Exactness on
    * this corpus is not luck-of-the-gap anymore: the derived banding's
    * miss probability at the measured pair mass (all true pairs ≥ 0.9,
    * nothing in (0.4, 0.9)) is ≈ 1e-23. */
  def dedupMinhashAuto(env: Env): DataFrame =
    TextDedup.minhashNearDupPairsAuto(env.documents, "doc_id", "text",
        threshold = 0.6)
      .select($"doc_a", $"doc_b", round($"jaccard", 6).as("jaccard"))
      .orderBy($"doc_a", $"doc_b")

  /** Split-LEAKAGE audit: near-duplicate pairs that straddle the
    * assigned train/val/test boundary — the contamination a random
    * per-document split silently admits (a near-copy of a training
    * document sitting in val/test inflates eval), and the reason
    * production pipelines dedup BEFORE splitting or split by cluster.
    * Pure composition of two verified operators: the deterministic
    * hash split ([[graft.operators.Sampling.splitAssign]], the
    * corpus_split_assign rule) joined onto the banded near-dup pairs
    * (dedup_minhash's candidate scheme), keeping only cross-split
    * pairs. Split table is checkpointed once and joined to both pair
    * sides; everything else inherits the pair operator's scale shape.
    */
  def dedupSplitLeakage(env: Env): DataFrame = {
    val splits = graft.operators.Sampling
      .splitAssign(env.documents.select($"doc_id"), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select($"doc_id", $"split")
      .localCheckpoint(eager = false) // joined onto both pair sides
    TextDedup.minhashNearDupPairs(env.documents, "doc_id", "text",
        threshold = 0.8)
      .join(splits.select($"doc_id".as("doc_a"), $"split".as("split_a")),
        "doc_a")
      .join(splits.select($"doc_id".as("doc_b"), $"split".as("split_b")),
        "doc_b")
      .filter($"split_a" =!= $"split_b")
      .select($"doc_a", $"split_a", $"doc_b", $"split_b",
        round($"jaccard", 6).as("jaccard"))
      .orderBy($"doc_a", $"doc_b")
  }

  /** The FIX for what [[dedupSplitLeakage]] finds — LEAKAGE-FREE
    * splitting: hash-assign splits on the near-dup CLUSTER key
    * (component canonical id; unclustered docs key on themselves), so
    * every member of a near-dup cluster lands in the same split and a
    * cross-split near-dup pair is impossible by construction (pinned
    * in TextDedupSpec). This is the cluster-then-split discipline
    * production corpus builds use instead of splitting before dedup.
    * Composes the verified component operator with the verified hash
    * split; determinism is the split rule's (md5 hexBound on the
    * stringified key).
    */
  def dedupSplitByCluster(env: Env): DataFrame = {
    import org.apache.spark.sql.functions.coalesce
    val comps = TextDedup.nearDupComponents(
        TextDedup.minhashNearDupPairs(env.documents, "doc_id", "text",
          threshold = 0.8))
    val keyed = env.documents.select($"doc_id")
      .join(comps, Seq("doc_id"), "left")
      .select($"doc_id", coalesce($"canonical_id", $"doc_id").as("split_key"))
    graft.operators.Sampling.splitAssign(keyed, "split_key",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select($"doc_id", $"split_key", $"split")
      .orderBy($"doc_id")
  }

  /** Incremental dedup: every-7th doc plays the nightly increment,
    * checked against the rest as the accumulated base — increment
    * bands ⋈ base bands, never base×base (see
    * [[graft.operators.TextDedup.minhashNearDupAgainst]]).
    *
    * Scan note: because this FIXTURE carves both sides out of one
    * table, the documents parquet is read twice per side (shingle +
    * band kernels); in the operator's production shape base and
    * increment are DIFFERENT tables (the base pre-kerneled and
    * persisted, per the operator doc), so the double-read is a fixture
    * artifact, not the operator's cost model. */
  def dedupIncremental(env: Env): DataFrame = {
    import org.apache.spark.sql.functions.round
    val inc = env.documents.filter($"doc_id" % 7 === 0)
    val base = env.documents.filter($"doc_id" % 7 =!= 0)
    graft.operators.TextDedup
      .minhashNearDupAgainst(base, inc, "doc_id", "text", threshold = 0.8)
      .select($"inc_id", $"base_id", round($"jaccard", 6).as("jaccard"))
      .orderBy($"inc_id", $"base_id")
  }

  /** The incremental-dedup ground truth parameterized by the BASE
    * predicate — brute-force exact Jaccard over inc × base, shared by
    * the inline entry and every persisted-index lifecycle entry. */
  private def dedupIncrementalSqlFor(baseCond: String): String =
    s"""$shingleCte
       |SELECT i.doc_id AS inc_id, b.doc_id AS base_id,
       |       round(CAST(len(list_intersect(i.g, b.g)) AS DOUBLE)
       |             / len(list_distinct(list_concat(i.g, b.g))), 6) AS jaccard
       |FROM sh i JOIN sh b
       |  ON i.doc_id % 7 = 0 AND $baseCond
       |WHERE CAST(len(list_intersect(i.g, b.g)) AS DOUBLE)
       |      / len(list_distinct(list_concat(i.g, b.g))) >= 0.8
       |ORDER BY inc_id, base_id""".stripMargin

  private def serveIncAgainst(env: Env, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.round
    graft.operators.TextDedup
      .nearDupAgainstIndex(env.spark, dir,
        env.documents.filter($"doc_id" % 7 === 0), "doc_id", "text",
        threshold = 0.8)
      .select($"inc_id", $"base_id", round($"jaccard", 6).as("jaccard"))
      .orderBy($"inc_id", $"base_id")
  }

  /** The dedup family's persisted-index lifecycle
    * ([[graft.operators.TextDedup.writeDedupIndex]]): the base
    * corpus's band keys and shingle sets committed as manifest tables,
    * the nightly increment served against them — bit-identical to the
    * inline [[dedupIncremental]], whose oracle it shares. */
  def dedupIndexRoundtrip(env: Env): DataFrame = {
    val dir = StreamQueries.freshScratch("dedup_minhash_index")
    graft.operators.TextDedup.writeDedupIndex(
      env.documents.filter($"doc_id" % 7 =!= 0), "doc_id", "text", dir)
    serveIncAgainst(env, dir)
  }

  /** Nightly growth: half the base at build, half appended as a delta
    * segment — band keys and shingle sets are pure per-doc functions
    * under the frozen geometry, so build+append ≡ full build and the
    * entry shares the roundtrip oracle. */
  def dedupIndexAppend(env: Env): DataFrame = {
    val dir = StreamQueries.freshScratch("dedup_minhash_append_index")
    graft.operators.TextDedup.writeDedupIndex(
      env.documents.filter($"doc_id" % 7 =!= 0 && $"doc_id" % 2 === 1),
      "doc_id", "text", dir)
    graft.operators.TextDedup.appendDedupIndex(env.spark, dir,
      env.documents.filter($"doc_id" % 7 =!= 0 && $"doc_id" % 2 === 0),
      "doc_id", "text")
    serveIncAgainst(env, dir)
  }

  /** Takedown on the dedup index: tombstoned base docs can neither
    * generate candidates nor verify — the increment's matches are
    * exactly those against the surviving base, which is what the
    * oracle's tightened base predicate replays. */
  def dedupIndexDelete(env: Env): DataFrame = {
    val dir = StreamQueries.freshScratch("dedup_minhash_delete_index")
    graft.operators.TextDedup.writeDedupIndex(
      env.documents.filter($"doc_id" % 7 =!= 0), "doc_id", "text", dir)
    graft.operators.TextDedup.deleteFromDedupIndex(env.spark, dir,
      env.documents.filter($"doc_id" % 7 =!= 0 && $"doc_id" % 5 === 2)
        .select($"doc_id"))
    serveIncAgainst(env, dir)
  }

  /** Dedup-index FSCK as a verified entry
    * ([[graft.operators.TextDedup.dedupFsck]]): after a build + append
    * + takedown, re-derive every document's band keys from its STORED
    * shingle set under the frozen geometry and compare against the
    * physical bands rows — plus the shared count/duplicate/orphan/mask
    * algebra. Completes the fsck family across every persisted index
    * (BM25, IVF, IVFPQ, LSH, MRL, dedup). */
  def dedupIndexFsck(env: Env): DataFrame = {
    val spark = env.spark
    val dir = StreamQueries.freshScratch("dedup_fsck_index")
    graft.operators.TextDedup.writeDedupIndex(
      env.documents.filter($"doc_id" % 7 =!= 0), "doc_id", "text", dir)
    // append + takedown in ONE commit (identical segments/rows)
    graft.operators.TextDedup.dedupApplyDeltas(spark, dir,
      Seq(env.documents.filter($"doc_id" % 7 === 0)), "doc_id", "text",
      Some(env.documents.filter($"doc_id" % 17 === 3).select($"doc_id")))
    graft.operators.TextDedup.dedupFsck(spark, dir)
      .withColumnRenamed("check", "invariant")
      .orderBy($"invariant")
  }

  /** N-gram Jaccard near-dup via min-shingle blocking — same ground
    * truth as dedup_minhash (brute-force oracle), different candidate
    * scheme; verified at 0.8 for the same recall-guarantee reason. */
  def dedupNgram(env: Env): DataFrame =
    TextDedup.ngramJaccardPairs(env.documents, "doc_id", "text", threshold = 0.8)
      .select($"doc_a", $"doc_b", round($"jaccard", 6).as("jaccard"))
      .orderBy($"doc_a", $"doc_b")

  /** Transitive near-dup clusters: minhash pairs → min-label
    * propagation. A≈B≈C collapses to one canonical id even when A and
    * C aren't a direct pair; the oracle replays it with brute-force
    * pairs + a recursive CTE. */
  def dedupComponents(env: Env): DataFrame =
    TextDedup.nearDupComponents(
      TextDedup.minhashNearDupPairs(env.documents, "doc_id", "text",
        threshold = 0.8))
      .orderBy($"doc_id")

  /** The APPLY step of near-dup dedup — the cleaned corpus itself:
    * every unpaired document plus the canonical (min-id) member of
    * each near-dup component; non-canonical members drop. Composes
    * pair scan → min-label components → left-anti-style filter, the
    * full pipeline a corpus build runs (the pair/component queries
    * expose the intermediate stages). */
  def dedupCanonical(env: Env): DataFrame = {
    val comps = TextDedup.nearDupComponents(
      TextDedup.minhashNearDupPairs(env.documents, "doc_id", "text",
        threshold = 0.8))
    env.documents.select($"doc_id", $"lang", $"source", $"n_chars")
      .join(comps, Seq("doc_id"), "left")
      .filter($"canonical_id".isNull || $"canonical_id" === $"doc_id")
      .select($"doc_id", $"lang", $"source", $"n_chars")
      .orderBy($"doc_id")
  }

  /** Quality-aware dedup ARBITRATION — production pipelines keep the
    * BEST member of each near-dup cluster (highest quality score,
    * doc_id tie-break), not the smallest id: a boilerplate-ridden
    * early crawl of a page should lose to its cleaner re-crawl even
    * when the old copy has the lower id. Composes two verified
    * operators (min-label components × the quality score); the
    * per-cluster argmax is one combinable aggregate on the
    * pairs-output-sized component table, never a corpus window.
    */
  def dedupKeepBest(env: Env): DataFrame = {
    import org.apache.spark.sql.functions.{count => cnt, lit, max, max_by, struct}
    val comps = TextDedup.nearDupComponents(
      TextDedup.minhashNearDupPairs(env.documents, "doc_id", "text",
        threshold = 0.8))
    val q = env.spread(env.documents).select($"doc_id",
      graft.operators.TextAnalysis.qualityScore($"text").as("quality"))
    comps.join(q, Seq("doc_id"))
      .groupBy($"canonical_id")
      .agg(cnt(lit(1)).as("n_members"),
           max_by($"doc_id", struct($"quality", (-$"doc_id").as("neg")))
             .as("best_id"),
           max($"quality").as("best_quality"))
      .select($"canonical_id", $"best_id", $"n_members", $"best_quality")
      .orderBy($"canonical_id")
  }

  /** Near-dup cluster-size histogram — the data-card view of dedup
    * pressure: how many components of each size, singleton row
    * included (total docs minus clustered docs). The histogram runs on
    * the component table (pairs-output-sized), never the corpus. */
  def dedupClusterSizes(env: Env): DataFrame = {
    import graft.operators.PlanHints
    val comps = TextDedup.nearDupComponents(
      TextDedup.minhashNearDupPairs(env.documents, "doc_id", "text",
        threshold = 0.8))
      .localCheckpoint(eager = false) // histogram + clustered-count
    val hist = comps.groupBy($"canonical_id")
      .agg(count(lit(1)).as("cluster_size"))
      .groupBy($"cluster_size").agg(count(lit(1)).as("n_clusters"))
    val totals = env.documents.agg(count(lit(1)).as("n_docs"))
    val clustered = comps.agg(count(lit(1)).as("n_clustered"))
    val singles = PlanHints.withScalars(totals, clustered)
      .select(lit(1L).as("cluster_size"),
        ($"n_docs" - $"n_clustered").as("n_clusters"))
      .filter($"n_clusters" > 0)
    hist.unionByName(singles).orderBy($"cluster_size")
  }

  /** Cross-source near-dup overlap matrix — which sources duplicate
    * which: every near-dup pair mapped to its (unordered) source pair
    * and counted. The contamination-between-domains data card; runs on
    * the pairs output joined twice to the doc→source map (broadcast at
    * this cardinality, shuffled equi-join at corpus scale — never
    * pair×pair work). */
  def dedupSourceOverlap(env: Env): DataFrame = {
    val pairs = TextDedup.minhashNearDupPairs(env.documents, "doc_id",
      "text", threshold = 0.8)
    val src = env.documents.select($"doc_id", $"source")
    pairs
      .join(src.select($"doc_id".as("doc_a"), $"source".as("sa")), Seq("doc_a"))
      .join(src.select($"doc_id".as("doc_b"), $"source".as("sb")), Seq("doc_b"))
      .select(least($"sa", $"sb").as("source_a"),
        greatest($"sa", $"sb").as("source_b"))
      .groupBy($"source_a", $"source_b").agg(count(lit(1)).as("n_pairs"))
      .orderBy($"source_a", $"source_b")
  }

  /** SimHash hamming ≤ 3 near-dup pairs (exact by pigeonhole). */
  def dedupSimhash(env: Env): DataFrame =
    TextDedup.simhashNearDupPairs(env.documents, "doc_id", "text", maxHamming = 3)
      .select($"doc_a", $"doc_b", $"hamming".cast("int").as("hamming"))
      .orderBy($"doc_a", $"doc_b")

  private def simhashSql: String = {
    val bitSums = (0 until 32).map(b =>
      s"sum(CASE WHEN substr(h, ${b + 1}, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS b$b")
      .mkString(",\n         ")
    val bitsToLong = (0 until 32).map(b =>
      s"CASE WHEN b$b > 0 THEN (CAST(1 AS BIGINT) << $b) ELSE 0 END")
      .mkString(" + ")
    s"""$shingleCte,
       |shx AS (SELECT doc_id, unnest(g) AS one FROM sh),
       |hs AS (SELECT doc_id, md5(one) AS h FROM shx),
       |bits AS (SELECT doc_id,
       |         $bitSums
       |         FROM hs GROUP BY doc_id),
       |sim AS (SELECT doc_id, $bitsToLong AS simhash FROM bits)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
       |FROM sim a JOIN sim b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Threshold-sensitivity sweep for near-dup removal — pair count and
    * affected-doc count at Jaccard ≥ 0.80/0.85/0.90/0.95, the table a
    * corpus build reads before picking its dedup threshold. One banded
    * candidate pass at the 0.80 floor (the recall-guaranteed regime —
    * see the bandingPrecondition pin) feeds every row: the higher
    * thresholds just re-filter the verified exact Jaccards, so the
    * whole sweep costs one near-dup join. Each row aggregates the
    * EXPLODED pair endpoints (n_pairs = endpoint-rows/2 — exact, the
    * count is even by construction), which keeps the two stats in ONE
    * aggregate and avoids a single-row crossJoin.
    */
  def dedupThresholdSweep(env: Env): DataFrame = {
    // one candidate pass at the sweep's LOWEST threshold, with the
    // banding DERIVED from it (21×3 at 0.6/floor-0.95 — the fixed
    // 16×4 only guarantees the ≥ 0.8 regime), re-filtered per
    // threshold above
    val pairs = TextDedup
      .minhashNearDupPairsAuto(env.spread(env.documents), "doc_id", "text",
        threshold = 0.6)
      .localCheckpoint(eager = false) // one candidate pass, five rows
    // round to the oracle's 6dp grid BEFORE re-filtering so both
    // engines threshold the SAME value (the unrounded Spark jaccard
    // vs the oracle's rounded j was asymmetric — safe at realistic
    // shingle-set sizes, but needlessly so)
    val ex = pairs.select(round($"jaccard", 6).as("jaccard"),
      explode(array($"doc_a", $"doc_b")).as("d"))
    Seq(0.60, 0.80, 0.85, 0.90, 0.95)
      .map { t =>
        ex.filter($"jaccard" >= t)
          .agg((count(lit(1)) / 2).cast("long").as("n_pairs"),
               countDistinct($"d").as("n_docs"))
          .select(lit(t).as("threshold"), $"n_pairs", $"n_docs")
      }
      .reduce(_ union _)
      .orderBy($"threshold")
  }

  val entries: Seq[Q] = Seq(
    Q.sql("dedup_exact", dedupExact,
      """WITH t AS (SELECT doc_id,
        |  list_distinct(string_split(text, ' ')) AS g FROM documents)
        |SELECT md5(array_to_string(list_sort(g), '|')) AS fingerprint,
        |       min(doc_id) AS canonical_id,
        |       count(*) AS n_dups
        |FROM t
        |GROUP BY 1
        |HAVING count(*) >= 2
        |ORDER BY canonical_id""".stripMargin),

    Q.sql("dedup_incremental", dedupIncremental,
      dedupIncrementalSqlFor("b.doc_id % 7 <> 0")),

    // the persisted dedup-index lifecycle: roundtrip/append serve the
    // same ground truth as the inline incremental; delete serves it
    // against the surviving base
    Q.sql("dedup_index_roundtrip", dedupIndexRoundtrip,
      dedupIncrementalSqlFor("b.doc_id % 7 <> 0")),
    Q.sql("dedup_index_append", dedupIndexAppend,
      dedupIncrementalSqlFor("b.doc_id % 7 <> 0")),
    Q.sql("dedup_index_delete", dedupIndexDelete,
      dedupIncrementalSqlFor("b.doc_id % 7 <> 0 AND b.doc_id % 5 <> 2")),
    // band keys re-derived from the stored shingle sets vs the
    // physical bands rows — the dedup index's delta algebra checked
    // against disk
    Q.sql("dedup_index_fsck", dedupIndexFsck,
      s"""WITH v AS (SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM documents
        |   WHERE doc_id % 17 <> 3) AS live)
        |SELECT * FROM (
        |  SELECT 'band_count_violations' AS invariant,
        |         CAST(0 AS BIGINT) AS expected,
        |         CAST(0 AS BIGINT) AS actual, TRUE AS ok
        |  UNION ALL SELECT 'band_key_mismatches', CAST(0 AS BIGINT),
        |         CAST(0 AS BIGINT), TRUE
        |  UNION ALL SELECT 'band_shingle_unmatched', CAST(0 AS BIGINT),
        |         CAST(0 AS BIGINT), TRUE
        |  UNION ALL SELECT 'duplicate_shingle_rows', CAST(0 AS BIGINT),
        |         CAST(0 AS BIGINT), TRUE
        |  UNION ALL SELECT 'live_docs', live, live, TRUE FROM v
        |  UNION ALL SELECT 'n_sh_mismatches', CAST(0 AS BIGINT),
        |         CAST(0 AS BIGINT), TRUE
        |  UNION ALL SELECT 'tombstones_orphaned', CAST(0 AS BIGINT),
        |         CAST(0 AS BIGINT), TRUE
        |${Q.fsckRotRows})
        |ORDER BY invariant""".stripMargin),

    Q.sql("dedup_minhash", dedupMinhash,
      s"""$shingleCte
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |       round(CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
         |             / len(list_distinct(list_concat(a.g, b.g))), 6) AS jaccard
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
         |      / len(list_distinct(list_concat(a.g, b.g))) >= 0.8
         |ORDER BY doc_a, doc_b""".stripMargin),

    Q.sql("dedup_simhash", dedupSimhash, simhashSql),

    // cross-split near-dup pairs: brute pair ground truth + the
    // corpus_split_assign hash rule, filtered to straddling pairs
    Q.sql("dedup_split_leakage", dedupSplitLeakage,
      s"""$shingleCte,
         |sp AS (SELECT doc_id,
         |  CASE WHEN substring(md5('graft-split' || '|' || doc_id), 1, 15)
         |            < '${graft.operators.Sampling.hexBound(0.8)}' THEN 'train'
         |       WHEN substring(md5('graft-split' || '|' || doc_id), 1, 15)
         |            < '${graft.operators.Sampling.hexBound(0.9)}' THEN 'val'
         |       ELSE 'test' END AS split
         |  FROM documents),
         |pr AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |         round(CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
         |               / len(list_distinct(list_concat(a.g, b.g))), 6) AS jaccard
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
         |        / len(list_distinct(list_concat(a.g, b.g))) >= 0.8)
         |SELECT pr.doc_a, sa.split AS split_a, pr.doc_b, sb.split AS split_b,
         |       pr.jaccard
         |FROM pr JOIN sp sa ON sa.doc_id = pr.doc_a
         |        JOIN sp sb ON sb.doc_id = pr.doc_b
         |WHERE sa.split <> sb.split
         |ORDER BY pr.doc_a, pr.doc_b""".stripMargin),

    // cluster-keyed split: recursive-CTE components feed the same
    // hexBound CASE as corpus_split_assign, on the coalesced key
    Q.sql("dedup_split_by_cluster", dedupSplitByCluster,
      s"""${shingleCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
         |        / len(list_distinct(list_concat(a.g, b.g))) >= 0.8),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |          UNION ALL SELECT doc_b, doc_a FROM pairs),
         |nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
         |reach(doc_id, root) AS (
         |  SELECT doc_id, doc_id FROM nodes
         |  UNION
         |  SELECT e.dst, r.root
         |  FROM reach r JOIN edges e ON e.src = r.doc_id),
         |comp AS (SELECT doc_id, min(root) AS canonical_id
         |         FROM reach GROUP BY doc_id),
         |k AS (SELECT d.doc_id,
         |        coalesce(c.canonical_id, d.doc_id) AS split_key
         |      FROM documents d LEFT JOIN comp c USING (doc_id))
         |SELECT doc_id, split_key,
         |  CASE WHEN substring(md5('graft-split' || '|' || split_key), 1, 15)
         |            < '${graft.operators.Sampling.hexBound(0.8)}' THEN 'train'
         |       WHEN substring(md5('graft-split' || '|' || split_key), 1, 15)
         |            < '${graft.operators.Sampling.hexBound(0.9)}' THEN 'val'
         |       ELSE 'test' END AS split
         |FROM k ORDER BY doc_id""".stripMargin),

    // derived-banding LSH at the non-0.8 threshold, same brute-force
    // ground truth re-gated at 0.6
    Q.sql("dedup_minhash_auto", dedupMinhashAuto,
      s"""$shingleCte
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |       round(CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
         |             / len(list_distinct(list_concat(a.g, b.g))), 6) AS jaccard
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
         |      / len(list_distinct(list_concat(a.g, b.g))) >= 0.6
         |ORDER BY doc_a, doc_b""".stripMargin),

    // one brute pair set at the 0.60 floor (the sweep's derived-banding
    // candidate pass), re-filtered per threshold; endpoint union counts
    // both stats in one aggregate like Spark
    Q.sql("dedup_threshold_sweep", dedupThresholdSweep,
      s"""$shingleCte,
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |         round(CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
         |               / len(list_distinct(list_concat(a.g, b.g))), 6) AS j
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
         |        / len(list_distinct(list_concat(a.g, b.g))) >= 0.6),
         |ex AS (SELECT j, doc_a AS d FROM pairs
         |       UNION ALL SELECT j, doc_b FROM pairs)
         |SELECT threshold, n_pairs, n_docs FROM (
         |  SELECT CAST(0.60 AS DOUBLE) AS threshold,
         |         CAST(count(*) / 2 AS BIGINT) AS n_pairs,
         |         CAST(count(DISTINCT d) AS BIGINT) AS n_docs
         |  FROM ex WHERE j >= 0.60
         |  UNION ALL
         |  SELECT CAST(0.80 AS DOUBLE) AS threshold,
         |         CAST(count(*) / 2 AS BIGINT) AS n_pairs,
         |         CAST(count(DISTINCT d) AS BIGINT) AS n_docs
         |  FROM ex WHERE j >= 0.80
         |  UNION ALL
         |  SELECT CAST(0.85 AS DOUBLE),
         |         CAST(count(*) / 2 AS BIGINT),
         |         CAST(count(DISTINCT d) AS BIGINT)
         |  FROM ex WHERE j >= 0.85
         |  UNION ALL
         |  SELECT CAST(0.90 AS DOUBLE),
         |         CAST(count(*) / 2 AS BIGINT),
         |         CAST(count(DISTINCT d) AS BIGINT)
         |  FROM ex WHERE j >= 0.90
         |  UNION ALL
         |  SELECT CAST(0.95 AS DOUBLE),
         |         CAST(count(*) / 2 AS BIGINT),
         |         CAST(count(DISTINCT d) AS BIGINT)
         |  FROM ex WHERE j >= 0.95)
         |ORDER BY threshold""".stripMargin),

    // components replayed brute-force + quality argmax per cluster
    // (window form; ties impossible beyond doc_id, which both sides
    // break ascending). Shares dedup_minhash's exactness precondition:
    // banded recall == 1 on the frozen corpus+seeds, pinned by
    // DedupQueriesSpec.bandingPrecondition against the brute pair set.
    Q.sql("dedup_keep_best", dedupKeepBest,
      s"""${shingleCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
         |        / len(list_distinct(list_concat(a.g, b.g))) >= 0.8),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |          UNION ALL SELECT doc_b, doc_a FROM pairs),
         |nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
         |reach(doc_id, root) AS (
         |  SELECT doc_id, doc_id FROM nodes
         |  UNION
         |  SELECT e.dst, r.root
         |  FROM reach r JOIN edges e ON e.src = r.doc_id),
         |comp AS (SELECT doc_id, min(root) AS canonical_id
         |         FROM reach GROUP BY doc_id),
         |q AS (
         |  SELECT doc_id,
         |    round(0.4 * (least(CAST(length(text) AS DOUBLE) / 200.0, 1.0)
         |         * least(4000.0 / greatest(CAST(length(text) AS DOUBLE), 1.0), 1.0))
         |      + 0.3 * least((CAST(len(list_filter(string_split(text, ' '),
         |            x -> x IN ('a','the','and','of','to','in','is'))) AS DOUBLE)
         |          / greatest(CAST(len(string_split(text, ' ')) AS DOUBLE), 1.0))
         |          * 5.0, 1.0)
         |      + 0.3 * (CASE WHEN CAST(length(text) AS DOUBLE)
         |            / greatest(CAST(len(string_split(text, ' ')) AS DOUBLE), 1.0)
         |            BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END), 6) AS quality
         |  FROM documents),
         |ranked AS (
         |  SELECT c.canonical_id, c.doc_id, q.quality,
         |         row_number() OVER (PARTITION BY c.canonical_id
         |                            ORDER BY q.quality DESC, c.doc_id ASC) AS rn,
         |         count(*) OVER (PARTITION BY c.canonical_id) AS nm
         |  FROM comp c JOIN q USING (doc_id))
         |SELECT canonical_id, doc_id AS best_id,
         |       CAST(nm AS BIGINT) AS n_members, quality AS best_quality
         |FROM ranked WHERE rn = 1
         |ORDER BY canonical_id""".stripMargin),

    Q.sql("dedup_components", dedupComponents,
      s"""${shingleCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
         |        / len(list_distinct(list_concat(a.g, b.g))) >= 0.8),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |          UNION ALL SELECT doc_b, doc_a FROM pairs),
         |nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
         |reach(doc_id, root) AS (
         |  SELECT doc_id, doc_id FROM nodes
         |  UNION
         |  SELECT e.dst, r.root
         |  FROM reach r JOIN edges e ON e.src = r.doc_id)
         |SELECT doc_id, min(root) AS canonical_id
         |FROM reach
         |GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin),

    Q.sql("dedup_source_overlap", dedupSourceOverlap,
      s"""$shingleCte,
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
         |        / len(list_distinct(list_concat(a.g, b.g))) >= 0.8),
         |sp AS (SELECT least(da.source, db.source) AS source_a,
         |              greatest(da.source, db.source) AS source_b
         |       FROM pairs p
         |       JOIN documents da ON da.doc_id = p.doc_a
         |       JOIN documents db ON db.doc_id = p.doc_b)
         |SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_pairs
         |FROM sp GROUP BY source_a, source_b
         |ORDER BY source_a, source_b""".stripMargin),

    Q.sql("dedup_cluster_sizes", dedupClusterSizes,
      s"""${shingleCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
         |        / len(list_distinct(list_concat(a.g, b.g))) >= 0.8),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |          UNION ALL SELECT doc_b, doc_a FROM pairs),
         |nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
         |reach(doc_id, root) AS (
         |  SELECT doc_id, doc_id FROM nodes
         |  UNION
         |  SELECT e.dst, r.root
         |  FROM reach r JOIN edges e ON e.src = r.doc_id),
         |comp AS (SELECT doc_id, min(root) AS canonical_id
         |         FROM reach GROUP BY doc_id),
         |sized AS (SELECT CAST(count(*) AS BIGINT) AS cluster_size
         |          FROM comp GROUP BY canonical_id),
         |hist AS (SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
         |         FROM sized GROUP BY cluster_size),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
         |cl AS (SELECT CAST(count(*) AS BIGINT) AS n_clustered FROM comp)
         |SELECT cluster_size, n_clusters FROM hist
         |UNION ALL
         |SELECT 1, n_docs - n_clustered FROM tot, cl
         |WHERE n_docs - n_clustered > 0
         |ORDER BY cluster_size""".stripMargin),

    Q.sql("dedup_canonical", dedupCanonical,
      s"""${shingleCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
         |        / len(list_distinct(list_concat(a.g, b.g))) >= 0.8),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |          UNION ALL SELECT doc_b, doc_a FROM pairs),
         |nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
         |reach(doc_id, root) AS (
         |  SELECT doc_id, doc_id FROM nodes
         |  UNION
         |  SELECT e.dst, r.root
         |  FROM reach r JOIN edges e ON e.src = r.doc_id),
         |canon AS (SELECT doc_id, min(root) AS canonical_id
         |          FROM reach GROUP BY doc_id)
         |SELECT d.doc_id, d.lang, d.source, d.n_chars
         |FROM documents d LEFT JOIN canon c USING (doc_id)
         |WHERE c.canonical_id IS NULL OR c.canonical_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin),

    Q.sql("dedup_ngram", dedupNgram,
      s"""$shingleCte
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |       round(CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
         |             / len(list_distinct(list_concat(a.g, b.g))), 6) AS jaccard
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
         |      / len(list_distinct(list_concat(a.g, b.g))) >= 0.8
         |ORDER BY doc_a, doc_b""".stripMargin),
  )
}
