package graft.queries

import graft.{Env, Q}
import graft.syntax._
import graft.operators.VectorSearch
import org.apache.spark.sql.DataFrame

/** Similarity-search queries over the `embeddings` table. The DuckDB
  * oracles recompute cosine with the same sequential double-precision
  * fold (explicit list_transform/list_sum, not the built-in
  * list_cosine_similarity, to pin the accumulation order), and both
  * sides rank on the 6-dp-rounded value with vec_id tie-breaks.
  */
object AnnQueries {

  private[graft] def queriesDf(env: Env) =
    env.embeddings.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qe"))

  /** LAYOUT-DEBT health card for the persisted IVF index
    * ([[graft.operators.VectorSearch.healthCard]]) around the same
    * maintenance cycle as its BM25 twin: build one corpus third,
    * append the other two (each a new cells segment against frozen
    * centroids), take down vec_id % 17 == 3, read the card (3 cells
    * segments > the 2-segment budget flips `compact_recommended`),
    * run the [[graft.operators.VectorSearch.compactIndexTable]] it
    * recommends, read it again: one segment per table, zero masks,
    * quiet. Complements [[annRetrainCard]], which watches GEOMETRY
    * drift — together they cover both ways an append-maintained index
    * decays. Pre-compact card plans resolve segment paths at
    * construction, so the compact retains one prior generation. */
  def annIndexHealth(env: Env): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val spark = env.spark
    val dir = StreamQueries.freshScratch("ivf_health_index")
    VectorSearch.ivfWriteIndex(
      env.embeddings.filter($"vec_id" % 3 === 0), dir)
    // the nightly cycle — two appends + the takedown — lands as ONE
    // commit (identical segments/rows, one flip; guide §1.2/§2.6)
    VectorSearch.ivfApplyDeltas(spark, dir,
      Seq(env.embeddings.filter($"vec_id" % 3 === 1),
        env.embeddings.filter($"vec_id" % 3 === 2)),
      Some(env.embeddings.filter($"vec_id" % 17 === 3).select($"vec_id")))
    val pre = VectorSearch.healthCard(spark, dir, "cells", maxSegments = 2)
      .withColumn("phase", lit("pre"))
    VectorSearch.compactIndexTable(spark, dir, "cells", "cell",
      retainGens = 2)
    val post = VectorSearch.healthCard(spark, dir, "cells", maxSegments = 2)
      .withColumn("phase", lit("post"))
    pre.unionByName(post)
      .select($"phase", $"tbl", $"segments", $"n_rows",
        $"masked_vecs", $"live_vecs", $"compact_recommended")
      .orderBy($"phase".desc, $"tbl")
  }

  /** Exact brute-force cosine top-5 for every 50th vector. */
  def annBruteTopK(env: Env): DataFrame =
    VectorSearch.bruteForceTopK(env.embeddings, queriesDf(env), k = 5)
      .orderBy($"qid", $"rank")

  /** HARD-NEGATIVE MINING for embedding-model training: per query the
    * top-10 most-similar vectors that are NOT near-duplicates of the
    * query document — similar enough to be hard, distinct enough to be
    * true negatives (doc_id and vec_id share an id space by testdata
    * contract). Composition of two verified operators: brute cosine
    * top-15 (overfetch margin for the exclusions; on this corpus
    * near-dup pairs per query are far below 5) anti-joined against the
    * symmetrized MinHash near-dup pair set at jaccard ≥ 0.8, then
    * re-ranked to 10. The anti join is a two-column equi hash join —
    * never a nested loop — and the re-rank windows over ≤ 15 rows per
    * query. */
  def annHardNegatives(env: Env): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.row_number
    val top = VectorSearch.bruteForceTopK(env.embeddings, queriesDf(env),
      k = 15)
    val pairs = graft.operators.TextDedup
      .minhashNearDupPairs(env.documents, "doc_id", "text", threshold = 0.8)
      .select($"doc_a", $"doc_b")
    val sym = pairs.union(pairs.select($"doc_b", $"doc_a"))
      .toDF("qid", "vec_id")
    val w = Window.partitionBy($"qid").orderBy($"rank")
    top.join(sym, Seq("qid", "vec_id"), "left_anti")
      .withColumn("hrank", row_number().over(w))
      .filter($"hrank" <= 10)
      .select($"qid", $"hrank".cast("int").as("rank"), $"vec_id", $"cos")
      .orderBy($"qid", $"rank")
  }

  /** LSH-bucketed approximate top-5. Fully ORACLE-VERIFIABLE: the
    * hyperplanes are md5-seeded ±1 weights, so DuckDB recomputes the
    * exact bucket of every vector, the multiprobe candidate set
    * (hamming ≤ 2 on 8 bits), and the within-candidate ranking —
    * hash-equality on the approximate output itself, not just a recall
    * floor. Quality (recall vs brute force) additionally reported in
    * VectorSearchSpec. */
  def annLshTopK(env: Env): DataFrame =
    VectorSearch.lshTopK(env.embeddings, queriesDf(env), k = 5)
      .orderBy($"qid", $"rank")

  /** IVF-probed approximate top-5, also fully ORACLE-VERIFIABLE:
    * centroid components round to a 4dp grid (absorbing FP
    * accumulation-order jitter), so DuckDB recomputes the same
    * centroids, the same top-3 probe cells, and the same ranked
    * output. */
  def annIvfTopK(env: Env): DataFrame =
    VectorSearch.ivfTopK(env.embeddings, queriesDf(env), k = 5)
      .orderBy($"qid", $"rank")

  /** Index PERSISTENCE round trip — build the IVF index once, write it
    * as tables (cell-partitioned vector parquet + the tiny centroid
    * artifact), read it back, and serve the standard query set from
    * the on-disk index. The build-once/serve-many shape of a real
    * deployment; results are bit-exact vs [[annIvfTopK]] (floats and
    * doubles round-trip parquet losslessly), so the entry shares its
    * oracle. Scratch dir is per-process and idempotent (overwrite),
    * like the s8 sink round trip.
    */
  def annIndexRoundtrip(env: Env): DataFrame = {
    val dir = StreamQueries.freshScratch("ivf_index")
    VectorSearch.ivfWriteIndex(env.embeddings, dir)
    VectorSearch.ivfServe(env.spark, dir, queriesDf(env), k = 5)
      .orderBy($"qid", $"rank")
  }

  /** INCREMENTAL index lifecycle: build the IVF index on the base
    * corpus (every vec_id % 7 ≠ 0), APPEND the increment against the
    * frozen centroids ([[graft.operators.VectorSearch.ivfAppendIndex]]
    * — the nightly-ingest shape, no rebuild), and serve the standard
    * query set from the merged cells. The oracle replays base-only
    * centroid training, the increment's frozen-centroid assignment
    * (6dp cosine, lowest cell ties), and the standard probe/top-k
    * chain. */
  def annIvfAppend(env: Env): DataFrame = {
    val dir = StreamQueries.freshScratch("ivf_append_index")
    VectorSearch.ivfWriteIndex(env.embeddings.filter($"vec_id" % 7 =!= 0),
      dir)
    VectorSearch.ivfAppendIndex(env.spark, dir,
      env.embeddings.filter($"vec_id" % 7 === 0))
    VectorSearch.ivfServe(env.spark, dir, queriesDf(env), k = 5)
      .orderBy($"qid", $"rank")
  }

  /** RETRAIN TRIGGER card — closes the append-drift loop the adaptive
    * budgets started: nightly [[graft.operators.VectorSearch.ivfAppendIndex]]
    * appends assign against FROZEN centroids, so the quantizer slowly
    * stops describing the corpus (cells bloat unevenly; probes miss).
    * After the append cycle this entry reads the drifted persisted
    * index and emits the rebuild decision a maintenance scheduler
    * consumes: occupancy SKEW (max cell × cell count ÷ rows — the
    * ann_cell_stats ratio on the index as it actually is on disk),
    * the RECALL-FLOOR verdict at the serving budget (recall@5 of the
    * persisted serve vs the exact brute-force truth on the
    * calibration workload, the ann_ivf_recall_report measurement
    * pointed at the drifted artifact), and `rebuild_recommended` —
    * true when skew exceeds 1.5 or recall undershoots the 0.9 floor
    * the adaptive sweeps calibrate serving to. Scale shape: occupancy
    * is one count-by-cell aggregate over the cells table; the recall
    * leg is the fixed-size calibration workload, never the corpus. */
  def annRetrainCard(env: Env): DataFrame = {
    val dir = StreamQueries.freshScratch("ivf_retrain_index")
    VectorSearch.ivfWriteIndex(env.embeddings.filter($"vec_id" % 7 =!= 0),
      dir)
    VectorSearch.ivfAppendIndex(env.spark, dir,
      env.embeddings.filter($"vec_id" % 7 === 0))
    VectorSearch.ivfRetrainCard(env.spark, dir, queriesDf(env))
  }

  /** The REBUILD the retrain card recommends, executed: after the
    * append cycle drifts the index ([[annRetrainCard]]'s setup), a
    * fresh [[graft.operators.VectorSearch.ivfWriteIndex]] on the same
    * directory RETRAINS the quantizer on the full current corpus as
    * one more manifest generation (readers on the drifted generation
    * are undisturbed; the flip is atomic; the drifted index stays
    * time-travel readable under retention) — and the card, re-run on
    * the rebuilt artifact, reports the recovered occupancy/recall
    * posture. Card → action → verified recovery: the full maintenance
    * loop. Oracle replays the full-corpus training card. */
  def annRetrainRebuild(env: Env): DataFrame = {
    val dir = StreamQueries.freshScratch("ivf_rebuild_index")
    VectorSearch.ivfWriteIndex(env.embeddings.filter($"vec_id" % 7 =!= 0),
      dir)
    VectorSearch.ivfAppendIndex(env.spark, dir,
      env.embeddings.filter($"vec_id" % 7 === 0))
    // the rebuild: retrain on everything the index now holds — in
    // place, one atomic generation flip
    VectorSearch.ivfWriteIndex(env.embeddings, dir)
    VectorSearch.ivfRetrainCard(env.spark, dir, queriesDf(env))
  }

  /** TIME-TRAVEL serve on the VECTOR index — [[textBm25TimeTravel]]'s
    * twin ([[graft.operators.VectorSearch.ivfServe]] `atGen`): build
    * on the base corpus (gen 1), append the increment with a
    * 2-generation retention window (gen 2), then serve FROM GEN 1 —
    * cells, centroids, and mask all pinned to the committed snapshot,
    * so yesterday's retrieval is reproducible from today's index
    * directory (the audit primitive when a training run must be
    * traced to the exact index state that produced its batches).
    * Oracle: the IVF replay with training AND candidates restricted
    * to the base docs. */
  def annIvfTimeTravel(env: Env): DataFrame = {
    val dir = StreamQueries.freshScratch("ivf_tt_index")
    VectorSearch.ivfWriteIndex(env.embeddings.filter($"vec_id" % 7 =!= 0),
      dir)
    // the generation the base build just committed — read, not a
    // literal, so the entry never depends on the scratch dir's history
    val baseGen = graft.operators.IndexCommit
      .currentManifest(env.spark, dir).get.gen
    VectorSearch.ivfAppendIndex(env.spark, dir,
      env.embeddings.filter($"vec_id" % 7 === 0), retainGens = 2)
    VectorSearch.ivfServe(env.spark, dir, queriesDf(env), k = 5,
        atGen = Some(baseGen))
      .orderBy($"qid", $"rank")
  }

  /** Index COMPACTION lifecycle: build the IVF index on the base
    * corpus, append the increment (one new file per touched cell),
    * then compact the cell table
    * ([[graft.operators.VectorSearch.compactIndexTable]] — rewrite
    * one file per cell, write-to-temp-then-swap) and serve. Pure
    * reorganization: rows are byte-identical, so the entry shares
    * ann_ivf_append's oracle — the compaction IS the assertion. */
  def annIvfCompact(env: Env): DataFrame = {
    val dir = StreamQueries.freshScratch("ivf_compact_index")
    VectorSearch.ivfWriteIndex(env.embeddings.filter($"vec_id" % 7 =!= 0),
      dir)
    VectorSearch.ivfAppendIndex(env.spark, dir,
      env.embeddings.filter($"vec_id" % 7 === 0))
    VectorSearch.compactIndexTable(env.spark, dir, "cells", "cell")
    VectorSearch.ivfServe(env.spark, dir, queriesDf(env), k = 5)
      .orderBy($"qid", $"rank")
  }

  /** Vector DELETION — takedown for the embedding index
    * ([[graft.operators.VectorSearch.deleteVectors]]): build on the
    * full corpus, tombstone every vec_id % 5 == 2, serve. Centroids
    * stay frozen (the append path's geometry contract), so the oracle
    * replays full-corpus training with the deleted vectors excluded
    * from candidates. */
  def annIvfDelete(env: Env): DataFrame = {
    val dir = StreamQueries.freshScratch("ivf_delete_index")
    VectorSearch.ivfWriteIndex(env.embeddings, dir)
    VectorSearch.deleteVectors(env.spark, dir,
      env.embeddings.filter($"vec_id" % 5 === 2).select($"vec_id"))
    VectorSearch.ivfServe(env.spark, dir, queriesDf(env), k = 5)
      .orderBy($"qid", $"rank")
  }

  /** Vector-side SERVE-COST card
    * ([[graft.operators.VectorSearch.ivfServeCostCard]]) — the
    * text_serve_cost_card contract on the ANN leg: index the full
    * corpus, take down the vec_id % 5 == 2 set, then report per
    * standard query at the default probe budget the LIVE candidate
    * volume (tombstone-masked probed-cell occupancy — what scores)
    * next to the PHYSICAL volume (what the cell-pruned scan reads).
    * Capacity planning for a vector serving tier from one occupancy
    * aggregate. */
  def annServeCostCard(env: Env): DataFrame = {
    val spark = env.spark
    val dir = StreamQueries.freshScratch("ivf_cost_index")
    VectorSearch.ivfWriteIndex(env.embeddings, dir)
    VectorSearch.deleteVectors(spark, dir,
      env.embeddings.filter($"vec_id" % 5 === 2).select($"vec_id"))
    VectorSearch.ivfServeCostCard(spark, dir, queriesDf(env))
      .orderBy($"qid")
  }

  /** Vector-side SNAPSHOT DIFF — the audit view of the persisted IVF
    * lifecycle ([[graft.operators.VectorSearch.diffIndex]]): build on
    * a third, append the rest (retention ≥ 4 keeps gen 1 readable),
    * take down the vec_id % 17 == 3 set, then diff gen 1 vs current:
    * added = appended survivors, removed = base takedowns — two
    * anti-joins over pinned immutable tables. */
  def annIndexDiff(env: Env): DataFrame = {
    val spark = env.spark
    val dir = StreamQueries.freshScratch("ivf_diff_index")
    VectorSearch.ivfWriteIndex(
      env.embeddings.filter($"vec_id" % 3 === 0), dir)
    // diff against the build's own committed gen, never a literal
    val g0 = graft.operators.IndexCommit
      .currentManifest(spark, dir).get.gen
    VectorSearch.ivfApplyDeltas(spark, dir,
      Seq(env.embeddings.filter($"vec_id" % 3 === 1),
        env.embeddings.filter($"vec_id" % 3 === 2)),
      Some(env.embeddings.filter($"vec_id" % 17 === 3).select($"vec_id")),
      retainGens = 4)
    VectorSearch.diffIndex(spark, dir, genA = g0,
        genB = graft.operators.IndexCommit
          .currentManifest(spark, dir).get.gen)
      .orderBy($"status", $"vec_id")
  }

  /** Vector-side FSCK as a verified entry — the append/delete
    * algebra's claim ("each vector sits in the cell its documented
    * assignment rule chose, once, and every tombstone masks a
    * physical row") CHECKED against the cell files after a build +
    * two appends + a takedown
    * ([[graft.operators.VectorSearch.ivfFsck]]): a live-id recount vs
    * the maintained masked/total algebra, duplicate-assignment and
    * orphaned-tombstone counts, centroid-table invariants, and the
    * occupancy-drift recount — every APPEND segment's rows re-assigned
    * against the frozen centroids and compared to their stored cell.
    * The oracle recomputes the expected values from the op sequence,
    * so a drifting delta path fails BOTH the ok flags and the hash.
    * Closes the round-15 asymmetry: the keyword leg's delta algebra
    * was checked against disk ([[TextQueries.textIndexFsck]]), the
    * vector leg's was only asserted. */
  def annIndexFsck(env: Env): DataFrame = {
    val spark = env.spark
    val dir = StreamQueries.freshScratch("ivf_fsck_index")
    VectorSearch.ivfWriteIndex(
      env.embeddings.filter($"vec_id" % 3 === 0), dir)
    VectorSearch.ivfApplyDeltas(spark, dir,
      Seq(env.embeddings.filter($"vec_id" % 3 === 1),
        env.embeddings.filter($"vec_id" % 3 === 2)),
      Some(env.embeddings.filter($"vec_id" % 17 === 3).select($"vec_id")))
    VectorSearch.ivfFsck(spark, dir)
      .withColumnRenamed("check", "invariant")
      .orderBy($"invariant")
  }

  /** COLLECTION-level serve-cost card — the capacity-planning console
    * for the whole hybrid deployment: [[graft.operators.Bm25
    * .serveCostCard]] (per-query candidate postings from the df
    * vocabulary deltas) and [[graft.operators.VectorSearch
    * .ivfServeCostCard]] (per-query probed-cell occupancy) unioned
    * under a `member` column, each leg served AT THE GENERATION the
    * collection manifest pins — so the card describes one consistent
    * cross-index snapshot, never a mix of member currents (the same
    * pinning discipline as `collection_index_health`). Scenario: one
    * snapshot builds both legs on the full corpus, a second takes
    * down the % 5 == 2 set on BOTH in one flip; the card's live vs
    * physical gap is then the takedown read-amplification across the
    * whole deployment, per workload query per leg. */
  def collectionServeCostCard(env: Env): DataFrame = {
    import graft.operators.{Bm25, CollectionCommit, IndexCommit}
    import org.apache.spark.sql.functions.lit
    val spark = env.spark
    val colDir = StreamQueries.freshScratch("col_cost")
    val colPath = new org.apache.hadoop.fs.Path(colDir)
    val fs = colPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(colPath)) fs.delete(colPath, true): Unit
    val bmDir = CollectionCommit.memberDir(colDir, "bm25")
    val ivfDir = CollectionCommit.memberDir(colDir, "ivf")
    def memberGen(dir: String): Long =
      IndexCommit.currentManifest(spark, dir).get.gen
    CollectionCommit.commit(spark, colDir) { (_, _) =>
      graft.operators.Par.both(
        Bm25.writeIndex(env.documents, "doc_id", "text", bmDir),
        VectorSearch.ivfWriteIndex(env.embeddings, ivfDir))
      Map("bm25" -> memberGen(bmDir), "ivf" -> memberGen(ivfDir))
    }
    CollectionCommit.commit(spark, colDir) { (_, _) =>
      graft.operators.Par.both(
        Bm25.deleteDocs(spark, bmDir,
          env.documents.filter($"doc_id" % 5 === 2).select($"doc_id"),
          retainGens = Int.MaxValue),
        VectorSearch.deleteVectors(spark, ivfDir,
          env.embeddings.filter($"vec_id" % 5 === 2).select($"vec_id"),
          retainGens = Int.MaxValue))
      Map("bm25" -> memberGen(bmDir), "ivf" -> memberGen(ivfDir))
    }
    val pins = CollectionCommit.currentManifest(spark, colDir).get.members
    val bm = Bm25.serveCostCard(spark, bmDir, TextQueries.Bm25Workload,
        atGen = Some(pins("bm25")))
      .select(lit("bm25").as("member"), $"qid",
        $"n_terms".as("n_units"), $"live_candidates",
        $"physical_candidates")
    val ivf = VectorSearch.ivfServeCostCard(spark, ivfDir,
        queriesDf(env), atGen = Some(pins("ivf")))
      .select(lit("ivf").as("member"), $"qid".cast("string").as("qid"),
        $"n_probes".as("n_units"), $"live_candidates",
        $"physical_candidates")
    bm.unionByName(ivf).orderBy($"member", $"qid")
  }

  /** IVFPQ FSCK as a verified entry — [[annIndexFsck]]'s discipline
    * on the two-stage-quantized family
    * ([[graft.operators.VectorSearch.ivfPqFsck]]): after a build +
    * append + takedown, check the codes table's structural algebra
    * (one row per vector, every codes array exactly m wide, every
    * code a valid codebook index, every coarse cell backed by a
    * centroid), the codebook's (subspace, code) uniqueness and
    * subspace coverage against the maintained meta, and the
    * tombstone mask against a live recount. The codes table stores
    * encodings, not embeddings, so this is the honest checkable
    * surface for the quantized leg. */
  def annIvfPqFsck(env: Env): DataFrame = {
    val spark = env.spark
    val dir = StreamQueries.freshScratch("ivfpq_fsck_index")
    VectorSearch.ivfPqWriteIndex(
      env.embeddings.filter($"vec_id" % 7 =!= 0), dir)
    VectorSearch.ivfPqApplyDeltas(spark, dir,
      Seq(env.embeddings.filter($"vec_id" % 7 === 0)),
      Some(env.embeddings.filter($"vec_id" % 17 === 3).select($"vec_id")))
    VectorSearch.ivfPqFsck(spark, dir)
      .withColumnRenamed("check", "invariant")
      .orderBy($"invariant")
  }

  /** LSH FSCK as a verified entry — the STRONGEST vector recount
    * ([[graft.operators.VectorSearch.lshFsck]]): the hyperplanes are
    * seed-derived from the persisted geometry and the buckets table
    * stores the embeddings, so after a build + append + takedown
    * EVERY row's bucket and norm re-derive from first principles and
    * compare against the stored columns, alongside the shared
    * duplicate/orphan/mask algebra. */
  def annLshFsck(env: Env): DataFrame = {
    val spark = env.spark
    val dir = StreamQueries.freshScratch("lsh_fsck_index")
    VectorSearch.lshWriteIndex(
      env.embeddings.filter($"vec_id" % 7 =!= 0), dir)
    VectorSearch.lshApplyDeltas(spark, dir,
      Seq(env.embeddings.filter($"vec_id" % 7 === 0)),
      Some(env.embeddings.filter($"vec_id" % 17 === 3).select($"vec_id")))
    VectorSearch.lshFsck(spark, dir)
      .withColumnRenamed("check", "invariant")
      .orderBy($"invariant")
  }

  /** MRL FSCK as a verified entry
    * ([[graft.operators.VectorSearch.mrlFsck]]): the prefix family's
    * geometry contract (every prefix exactly prefix_dim wide) plus
    * the duplicate/orphan/mask algebra after a build + append +
    * takedown. */
  def annMrlFsck(env: Env): DataFrame = {
    val spark = env.spark
    val dir = StreamQueries.freshScratch("mrl_fsck_index")
    VectorSearch.mrlWriteIndex(
      env.embeddings.filter($"vec_id" % 7 =!= 0), dir)
    VectorSearch.mrlApplyDeltas(spark, dir,
      Seq(env.embeddings.filter($"vec_id" % 7 === 0)),
      Some(env.embeddings.filter($"vec_id" % 17 === 3).select($"vec_id")))
    VectorSearch.mrlFsck(spark, dir)
      .withColumnRenamed("check", "invariant")
      .orderBy($"invariant")
  }

  /** Promotion of the VECTOR index — [[annIvfDelete]]'s state
    * (build + takedown) cloned into a fresh serving directory via
    * [[graft.operators.IndexCommit.cloneSnapshot]] and served from
    * the CLONE. The vector side is the distributed copy's hard case:
    * cells segments are `cell=…`-partitioned parquet, so the copy
    * job's recursive file listing and nested destination paths (plus
    * the tombstone delta traveling with the bytes) all get exercised;
    * the serve shares ann_ivf_delete's oracle because promotion must
    * be invisible to results — text_bm25_clone_serve's contract on
    * the partitioned layout. */
  def annIvfCloneServe(env: Env): DataFrame = {
    val spark = env.spark
    val src = StreamQueries.freshScratch("ivf_clone_src")
    val dst = StreamQueries.freshScratch("ivf_clone_dst")
    val dstPath = new org.apache.hadoop.fs.Path(dst)
    val fs = dstPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(dstPath)) fs.delete(dstPath, true): Unit // fresh dest
    VectorSearch.ivfWriteIndex(env.embeddings, src)
    VectorSearch.deleteVectors(spark, src,
      env.embeddings.filter($"vec_id" % 5 === 2).select($"vec_id"))
    graft.operators.IndexCommit.cloneSnapshot(spark, src, dst)
    VectorSearch.ivfServe(spark, dst, queriesDf(env), k = 5)
      .orderBy($"qid", $"rank")
  }

  /** Delete then COMPACT the cells table: the tombstone mask is
    * materialized (rows rewritten minus deleted vectors, table
    * dropped) and the serve must not change — same oracle as
    * [[annIvfDelete]]. */
  def annIvfDeleteCompact(env: Env): DataFrame = {
    val dir = StreamQueries.freshScratch("ivf_delc_index")
    VectorSearch.ivfWriteIndex(env.embeddings, dir)
    VectorSearch.deleteVectors(env.spark, dir,
      env.embeddings.filter($"vec_id" % 5 === 2).select($"vec_id"))
    VectorSearch.compactIndexTable(env.spark, dir, "cells", "cell")
    VectorSearch.ivfServe(env.spark, dir, queriesDf(env), k = 5)
      .orderBy($"qid", $"rank")
  }

  /** [[annIvfDelete]]'s takedown on the LSH family — the generic
    * tombstone layer ([[graft.operators.VectorSearch.deleteVectors]])
    * applied to the bucket table; seed-derived planes are stateless,
    * so the oracle is just the standard serve with the deleted
    * vectors excluded from candidates. */
  def annLshDelete(env: Env): DataFrame = {
    val dir = StreamQueries.freshScratch("lsh_delete_index")
    VectorSearch.lshWriteIndex(env.embeddings, dir)
    VectorSearch.deleteVectors(env.spark, dir,
      env.embeddings.filter($"vec_id" % 5 === 2).select($"vec_id"))
    VectorSearch.lshServe(env.spark, dir, queriesDf(env), k = 5)
      .orderBy($"qid", $"rank")
  }

  /** Takedown on the Matryoshka family: deleted vectors are masked
    * out of the persisted prefix table before the coarse scan (they
    * can never reach the re-rank), same generic tombstone layer. */
  def annMrlDelete(env: Env): DataFrame = {
    val dir = StreamQueries.freshScratch("mrl_delete_index")
    VectorSearch.mrlWriteIndex(env.embeddings, dir)
    VectorSearch.deleteVectors(env.spark, dir,
      env.embeddings.filter($"vec_id" % 5 === 2).select($"vec_id"))
    VectorSearch.mrlServe(env.spark, dir, env.embeddings, queriesDf(env),
        k = 5)
      .orderBy($"qid", $"rank")
  }

  /** LSH index persistence round trip — the [[annIndexRoundtrip]]
    * shape for the hyperplane family: bucket-partitioned vector
    * parquet + the one-row geometry, served back bit-exactly (shares
    * ann_lsh_topk's oracle). */
  def annLshIndexRoundtrip(env: Env): DataFrame = {
    val dir = StreamQueries.freshScratch("lsh_index")
    VectorSearch.lshWriteIndex(env.embeddings, dir)
    VectorSearch.lshServe(env.spark, dir, queriesDf(env), k = 5)
      .orderBy($"qid", $"rank")
  }

  /** SHARD-PARALLEL LSH index construction
    * ([[graft.operators.VectorSearch.mergeStatelessIndexes]]): three
    * independent shard builds over disjoint corpus slices merged into
    * one serving index. The hyperplanes are seed-derived — nothing
    * trained — so every shard assigned identically and the merge is
    * bit-identical to a full build: shares ann_lsh_topk's oracle. */
  def annLshShardMerge(env: Env): DataFrame = {
    val base = StreamQueries.freshScratch("lsh_shard")
    // independent shard builds — overlap them (guide §2.6)
    val shards = graft.operators.Par.all((0 to 2).map { s => () =>
      val dir = s"${base}_$s"
      VectorSearch.lshWriteIndex(
        env.embeddings.filter($"vec_id" % 3 === s), dir)
      dir
    })
    val dest = s"${base}_merged"
    VectorSearch.mergeStatelessIndexes(env.spark, dest, shards,
      "buckets", Some("bkt"))
    VectorSearch.lshServe(env.spark, dest, queriesDf(env), k = 5)
      .orderBy($"qid", $"rank")
  }

  /** SHARD-PARALLEL MRL prefix-table construction — the same merge on
    * the stateless prefix copy; shares ann_mrl_rerank's oracle. */
  def annMrlShardMerge(env: Env): DataFrame = {
    val base = StreamQueries.freshScratch("mrl_shard")
    val shards = graft.operators.Par.all((0 to 2).map { s => () =>
      val dir = s"${base}_$s"
      VectorSearch.mrlWriteIndex(
        env.embeddings.filter($"vec_id" % 3 === s), dir)
      dir
    })
    val dest = s"${base}_merged"
    VectorSearch.mergeStatelessIndexes(env.spark, dest, shards,
      "prefix", None)
    VectorSearch.mrlServe(env.spark, dest, env.embeddings,
        queriesDf(env), k = 5)
      .orderBy($"qid", $"rank")
  }

  /** INCREMENTAL LSH index lifecycle: build the bucket table on the
    * base corpus (every vec_id % 7 ≠ 0), APPEND the increment
    * ([[graft.operators.VectorSearch.lshAppendIndex]] — bucket-assign
    * against the persisted seed geometry, no rebuild), and serve the
    * standard query set. The quantizer is stateless, so the
    * incremental index is bit-identical to a full build — the entry
    * shares ann_lsh_topk's oracle, and the split itself is the
    * assertion. */
  def annLshAppend(env: Env): DataFrame = {
    val dir = StreamQueries.freshScratch("lsh_append_index")
    VectorSearch.lshWriteIndex(env.embeddings.filter($"vec_id" % 7 =!= 0),
      dir)
    VectorSearch.lshAppendIndex(env.spark, dir,
      env.embeddings.filter($"vec_id" % 7 === 0))
    VectorSearch.lshServe(env.spark, dir, queriesDf(env), k = 5)
      .orderBy($"qid", $"rank")
  }

  /** PQ index persistence round trip: train once, persist the m-byte
    * codes + codebooks, and serve the standard query set from the
    * codes table (the approx scan never touches an embedding; only
    * re-rank candidates do). Bit-exact vs [[annPqRerank]] — shares
    * its oracle. */
  def annPqIndexRoundtrip(env: Env): DataFrame = {
    val dir = StreamQueries.freshScratch("pq_index")
    VectorSearch.pqWriteIndex(env.embeddings, dir)
    VectorSearch.pqServe(env.spark, dir, env.embeddings, queriesDf(env),
        k = 5)
      .orderBy($"qid", $"rank")
  }

  /** INCREMENTAL PQ index lifecycle: train codebooks on the base
    * corpus (every vec_id % 7 ≠ 0), APPEND the increment's code rows
    * against the FROZEN codebooks
    * ([[graft.operators.VectorSearch.pqAppendIndex]] — no retrain),
    * and serve the standard query set from the merged codes table.
    * The oracle replays base-only training with full-corpus encoding
    * (pqRerankSqlFor's trainPred). Completes the nightly-ingest
    * story across all three index families (IVF cells, LSH buckets,
    * PQ codes). */
  def annPqAppend(env: Env): DataFrame = {
    val dir = StreamQueries.freshScratch("pq_append_index")
    VectorSearch.pqWriteIndex(env.embeddings.filter($"vec_id" % 7 =!= 0),
      dir)
    VectorSearch.pqAppendIndex(env.spark, dir,
      env.embeddings.filter($"vec_id" % 7 === 0))
    VectorSearch.pqServe(env.spark, dir, env.embeddings, queriesDf(env),
        k = 5)
      .orderBy($"qid", $"rank")
  }

  /** IVF with ONE Lloyd refinement sweep — the label cells seed
    * k-means, every vector reassigns to its nearest centroid, the
    * centroids retrain, and probing runs against the TRAINED index.
    * Still exactly oracle-reproducible (6dp assignment sims, 4dp
    * centroid grid, cell-asc tie-breaks). */
  def annIvfRefined(env: Env): DataFrame =
    VectorSearch.ivfTopK(env.embeddings, queriesDf(env), k = 5, refine = 1)
      .orderBy($"qid", $"rank")

  /** IVF with AUTO-SCALED geometry — cells and probes derived from the
    * corpus size (nCells = first power of two ≥ √n, probe fraction
    * pinned at 3/16), so a 100× corpus keeps its recall instead of
    * decaying like the fixed-16-cell entries (measured 0.56 → 0.36
    * sf0.01 → sf0.1 at pinned geometry). Cells are the md5-seeded
    * hyperplane buckets, so the whole construction — sizing rule,
    * bucket assignment, centroids, probe ranking — replays exactly in
    * SQL. */
  def annIvfAutoscale(env: Env): DataFrame =
    VectorSearch.ivfAutoTopK(env.embeddings, queriesDf(env), k = 5)
      .orderBy($"qid", $"rank")

  /** SQ8 scalar-quantized approximate top-5 with exact re-rank: the
    * scan ranks by asymmetric cosine against the u8-dequantized image
    * of every vector, keeps 4·k candidates, and re-ranks them at full
    * precision. Fully ORACLE-VERIFIABLE: the quantization bounds are
    * order-independent per-dim min/max and the code/decode arithmetic
    * is pinned IEEE-double, so DuckDB recomputes the same codes, the
    * same candidate sets, and the same re-ranked output. */
  def annSq8Rerank(env: Env): DataFrame =
    VectorSearch.sq8TopK(env.embeddings, queriesDf(env), k = 5)
      .orderBy($"qid", $"rank")

  /** PQ-compressed approximate top-5 with exact re-rank: 8 subspaces
    * × 16 centroids, codebooks trained with one deterministic Lloyd
    * sweep. Fully ORACLE-VERIFIABLE like IVF/SQ8: init cells are
    * vec_id % 16, centroid means round to the 4dp grid, assignment is
    * 6dp-rounded squared L2 with lowest-cell ties — DuckDB recomputes
    * the same codebooks, codes, reconstructions, candidate sets, and
    * re-ranked output. */
  def annPqRerank(env: Env): DataFrame =
    VectorSearch.pqTopK(env.embeddings, queriesDf(env), k = 5)
      .orderBy($"qid", $"rank")

  /** IVFPQ — coarse cells bound the scan to 3 of 16 cells per query,
    * and within a cell the approximate score reads an 8-byte PQ code
    * of the RESIDUAL (vector − cell centroid), the Jégou-et-al
    * composition every billion-scale ANN deployment serves. Same
    * deterministic recipe as IVF + PQ separately (label cells, 4dp
    * centroid grid, exact-double residuals, one Lloyd sweep, 6dp
    * scores, vec_id ties), so DuckDB replays the full composition:
    * centroids → residuals → codebooks → codes → reconstructions →
    * probes → candidates → exact re-rank. */
  def annIvfPqTopK(env: Env): DataFrame =
    VectorSearch.ivfPqTopK(env.embeddings, queriesDf(env), k = 5)
      .orderBy($"qid", $"rank")

  /** Recall\@5 of the composed IVFPQ index against brute force — the
    * [[annRecallReport]] pattern on the third index family, so the
    * LSH / IVF / IVFPQ quality trade reads side by side (the PQ
    * candidate cut can only LOWER recall vs plain IVF at equal
    * probes; this card prices that loss). */
  def annIvfPqRecallReport(env: Env): DataFrame = {
    import org.apache.spark.sql.functions.{count, lit, round}
    val brute = VectorSearch.bruteForceTopK(env.embeddings, queriesDf(env),
        k = 5)
      .select($"qid", $"vec_id")
    val approx = VectorSearch.ivfPqTopK(env.embeddings, queriesDf(env), k = 5)
      .select($"qid", $"vec_id", lit(1).as("hit"))
    brute.join(approx, Seq("qid", "vec_id"), "left")
      .groupBy($"qid")
      .agg(count($"hit").as("nh"))
      .select($"qid", $"nh".cast("int").as("n_hits"),
        round($"nh".cast("double") / 5.0, 4).as("recall_at_5"))
      .orderBy($"qid")
  }

  /** IVFPQ index persistence round trip: train once, persist the
    * cell-partitioned residual codes + centroids + codebooks, serve
    * the standard query set from the codes table. Bit-exact vs
    * [[annIvfPqTopK]] — shares its oracle. */
  def annIvfPqIndexRoundtrip(env: Env): DataFrame = {
    val dir = StreamQueries.freshScratch("ivfpq_index")
    VectorSearch.ivfPqWriteIndex(env.embeddings, dir)
    VectorSearch.ivfPqServe(env.spark, dir, env.embeddings, queriesDf(env),
        k = 5)
      .orderBy($"qid", $"rank")
  }

  /** INCREMENTAL IVFPQ lifecycle: train coarse centroids + residual
    * codebooks on the base corpus (every vec_id % 7 ≠ 0), APPEND the
    * increment's residual code rows against BOTH frozen artifacts
    * ([[graft.operators.VectorSearch.ivfPqAppendIndex]]), serve the
    * standard query set from the merged codes. The oracle replays
    * base-only training with full-corpus residual encoding
    * (ivfPqChainFor's trainPred). With this all four index families
    * (IVF cells, LSH buckets, PQ codes, IVFPQ residual codes) carry
    * the same nightly-ingest discipline. */
  def annIvfPqAppend(env: Env): DataFrame = {
    val dir = StreamQueries.freshScratch("ivfpq_append_index")
    VectorSearch.ivfPqWriteIndex(
      env.embeddings.filter($"vec_id" % 7 =!= 0), dir)
    VectorSearch.ivfPqAppendIndex(env.spark, dir,
      env.embeddings.filter($"vec_id" % 7 === 0))
    VectorSearch.ivfPqServe(env.spark, dir, env.embeddings, queriesDf(env),
        k = 5)
      .orderBy($"qid", $"rank")
  }

  /** Corpus-scale k-NN JOIN: EVERY vector is a query (|Q| = |V| — the
    * all-pairs-top-k shape of corpus-wide SemDeDup / hard-negative
    * mining at 100 TB), answered through the IVF index. This is the
    * design point the round-9 distributed query side exists for: the
    * full corpus flows down the query path (probe cells computed in a
    * compiled map, candidates from the cell equi-join) with no driver
    * collect anywhere — a query set this size would have been a
    * driver OOM under the old collect-and-broadcast shape. Fully
    * oracle-verifiable like [[annIvfTopK]] (same 4dp centroid grid,
    * 6dp sims, deterministic tie-breaks). */
  def annKnnJoin(env: Env): DataFrame =
    VectorSearch.ivfKnnJoin(env.embeddings,
        env.embeddings.select($"vec_id".as("qid"), $"embedding".as("qe")),
        k = 3)
      .orderBy($"qid", $"rank")

  /** JL random projection 64 → 16 dims, exploded to scalar rows for
    * the exact compare (the md5-seeded ±1/√k matrix is replayed
    * component-for-component in SQL). */
  def annRpProject(env: Env): DataFrame = {
    import org.apache.spark.sql.functions.posexplode
    VectorSearch.randomProject(env.embeddings, k = 16)
      .select($"vec_id", posexplode($"proj").as(Seq("d", "v")))
      .orderBy($"vec_id", $"d")
  }

  /** Embedding near-dup: all pairs with cosine ≥ 0.45. */
  def annCosPairs(env: Env): DataFrame =
    VectorSearch.cosineThresholdPairs(env.embeddings, 0.45)
      .orderBy($"vec_a", $"vec_b")

  /** LSH-prefiltered near-dup pairs — the scale path of the above;
    * md5-seeded planes make even the probabilistic candidate stage
    * exactly SQL-replayable. */
  def annCosPairsLsh(env: Env): DataFrame =
    VectorSearch.cosineThresholdPairsLsh(env.embeddings, 0.45)
      .orderBy($"vec_a", $"vec_b")

  /** SemDeDup: cluster-then-prune semantic dedup — a vector is dropped
    * when a lower-id vector in the SAME label cell has cosine ≥ 0.35.
    * Deterministic keep-lowest-id variant, so the oracle replays it
    * exactly (pairwise join restricted to the cell). */
  def annSemDedup(env: Env): DataFrame =
    VectorSearch.semDedup(env.embeddings, 0.35)
      .orderBy($"vec_id")

  /** Embedding near-dup CLUSTERS: transitive components over the exact
    * cosine pair graph — one operator's output feeding another (pair
    * scan → min-label propagation), the cluster-then-canonicalize
    * shape of embedding dedup. Oracle: recursive CTE over the same
    * pair predicate. */
  def annComponents(env: Env): DataFrame =
    graft.operators.TextDedup.nearDupComponents(
      VectorSearch.cosineThresholdPairs(env.embeddings, 0.45)
        .select($"vec_a".as("doc_a"), $"vec_b".as("doc_b")))
      .orderBy($"doc_id")

  private val cosSql =
    """list_sum(list_transform(range(1, len(%s) + 1),
      |    i -> CAST(%s[i] AS DOUBLE) * CAST(%s[i] AS DOUBLE)))""".stripMargin

  private def cos(a: String, b: String): String = {
    val ab = cosSql.format(a, a, b)
    val aa = cosSql.format(a, a, a)
    val bb = cosSql.format(b, b, b)
    s"($ab / (sqrt($aa) * sqrt($bb)))"
  }

  /** Recall\@5 of the LSH index against the brute-force ground truth,
    * per query — index-quality MEASUREMENT as a first-class query
    * (the data-card view of the approximate/exact trade both sides of
    * which are already individually hash-verified): the overlap count
    * of two deterministic top-k sets is exact integer work, and the
    * single recall division is correctly rounded, so even this
    * accuracy REPORT is oracle-exact. */
  def annRecallReport(env: Env): DataFrame = {
    import org.apache.spark.sql.functions.{count, lit, round}
    val brute = VectorSearch.bruteForceTopK(env.embeddings, queriesDf(env),
        k = 5)
      .select($"qid", $"vec_id")
    val approx = VectorSearch.lshTopK(env.embeddings, queriesDf(env), k = 5)
      .select($"qid", $"vec_id", lit(1).as("hit"))
    brute.join(approx, Seq("qid", "vec_id"), "left")
      .groupBy($"qid")
      .agg(count($"hit").as("nh"))
      .select($"qid", $"nh".cast("int").as("n_hits"),
        round($"nh".cast("double") / 5.0, 4).as("recall_at_5"))
      .orderBy($"qid")
  }

  /** Recall\@5 of the IVF index against brute force — the
    * [[annRecallReport]] pattern for the other index family, so the
    * LSH-vs-IVF quality trade is readable side by side. */
  def annIvfRecallReport(env: Env): DataFrame = {
    import org.apache.spark.sql.functions.{count, lit, round}
    val brute = VectorSearch.bruteForceTopK(env.embeddings, queriesDf(env),
        k = 5)
      .select($"qid", $"vec_id")
    val approx = VectorSearch.ivfTopK(env.embeddings, queriesDf(env), k = 5)
      .select($"qid", $"vec_id", lit(1).as("hit"))
    brute.join(approx, Seq("qid", "vec_id"), "left")
      .groupBy($"qid")
      .agg(count($"hit").as("nh"))
      .select($"qid", $"nh".cast("int").as("n_hits"),
        round($"nh".cast("double") / 5.0, 4).as("recall_at_5"))
      .orderBy($"qid")
  }

  /** Per-label embedding centroid drift — the domain-embedding data
    * card: each label's centroid compared (cosine) to the global
    * centroid. Float sums are NOT associative, so components are
    * quantized to exact micro-unit longs first (floor(v·10⁶) — one
    * correctly-rounded double product per element) and summed as
    * longs: map-side-combinable, order-independent, engine-exact. The
    * only float work is the final 64-term fold per label, run in fixed
    * dimension order and rounded once (6 dp); sqrt is IEEE
    * correctly-rounded, so the oracle replays it exactly. Scale shape:
    * one posexplode pass, two combinable aggregates keyed by
    * (label,dim)/(dim), a 64-row broadcast, and a label-sized fold. */
  def annLabelCentroids(env: Env): DataFrame = {
    import org.apache.spark.sql.functions._
    val spark = env.spark
    import spark.implicits._
    def r6(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val q = env.embeddings
      .select(col("label"), posexplode(col("embedding")).as(Seq("d", "v")))
      .select(col("label"), col("d"),
        floor(col("v").cast("double") * lit(1e6)).cast("long").as("qv"))
      .localCheckpoint(eager = false) // label sums + global sums
    val ls = q.groupBy(col("label"), col("d")).agg(sum(col("qv")).as("cs"))
    val gs = q.groupBy(col("d")).agg(sum(col("qv")).as("cg"))
    val folded = ls.join(broadcast(gs), Seq("d"))
      .groupBy(col("label"))
      .agg(collect_list(struct(col("d"), col("cs"), col("cg"))).as("ds"))
      .as[(Int, Seq[(Int, Long, Long)])]
      .map { case (label, ds) =>
        var dot = 0.0; var na = 0.0; var ng = 0.0
        ds.sortBy(_._1).foreach { case (_, cs, cg) =>
          dot += cs.toDouble * cg.toDouble
          na += cs.toDouble * cs.toDouble
          ng += cg.toDouble * cg.toDouble
        }
        (label, r6(dot / (math.sqrt(na) * math.sqrt(ng))))
      }
      .toDF("label", "cos_to_global")
    env.embeddings.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"))
      .join(folded, Seq("label"))
      .select(col("label"), col("n_vecs"), col("cos_to_global"))
      .orderBy(col("label"))
  }

  /** MATRYOSHKA prefix-dimension search: coarse top-20 on the FIRST
    * 16 of 64 components (the nested-representation serving trick — a
    * 4× cut in scanned floats, the byte lever PQ pulls with codes but
    * with zero training state), exact full-dim re-rank to top-5.
    * [[graft.operators.VectorSearch.mrlTopK]]. */
  def annMrlRerank(env: Env): DataFrame =
    VectorSearch.mrlTopK(env.embeddings, queriesDf(env), k = 5)
      .orderBy($"qid", $"rank")

  /** MRL index persistence round trip — persist the 16-float prefix
    * as its own table ([[graft.operators.VectorSearch.mrlWriteIndex]])
    * and serve the standard query set from it: the coarse scan now
    * reads ¼ of the bytes from DISK, not just in memory. Bit-exact vs
    * [[annMrlRerank]] (floats round-trip parquet), so it shares its
    * oracle. */
  def annMrlIndexRoundtrip(env: Env): DataFrame = {
    val dir = StreamQueries.freshScratch("mrl_index")
    VectorSearch.mrlWriteIndex(env.embeddings, dir)
    VectorSearch.mrlServe(env.spark, dir, env.embeddings, queriesDf(env),
        k = 5)
      .orderBy($"qid", $"rank")
  }

  /** INCREMENTAL MRL lifecycle — the last vector family to carry the
    * nightly-ingest discipline: persist the prefix table on the base
    * corpus (every vec_id % 7 ≠ 0), APPEND the increment
    * ([[graft.operators.VectorSearch.mrlAppendIndex]] — a stateless
    * prefix copy against the persisted geometry, so base+append is
    * bit-identical to a full build) and serve the standard workload.
    * Shares ann_mrl_rerank's oracle — the split is the assertion. */
  def annMrlAppend(env: Env): DataFrame = {
    val dir = StreamQueries.freshScratch("mrl_append_index")
    VectorSearch.mrlWriteIndex(env.embeddings.filter($"vec_id" % 7 =!= 0),
      dir)
    VectorSearch.mrlAppendIndex(env.spark, dir,
      env.embeddings.filter($"vec_id" % 7 === 0))
    VectorSearch.mrlServe(env.spark, dir, env.embeddings, queriesDf(env),
        k = 5)
      .orderBy($"qid", $"rank")
  }

  /** Recall\@5 of the prefix-16 two-stage search against brute force
    * — the [[annRecallReport]] pattern for the Matryoshka family, so
    * the trained-state-free byte cut is readable next to LSH/IVF/PQ
    * quality. */
  def annMrlRecallReport(env: Env): DataFrame = {
    import org.apache.spark.sql.functions.{count, lit, round}
    val brute = VectorSearch.bruteForceTopK(env.embeddings, queriesDf(env),
        k = 5)
      .select($"qid", $"vec_id")
    val approx = VectorSearch.mrlTopK(env.embeddings, queriesDf(env), k = 5)
      .select($"qid", $"vec_id", lit(1).as("hit"))
    brute.join(approx, Seq("qid", "vec_id"), "left")
      .groupBy($"qid")
      .agg(count($"hit").as("nh"))
      .select($"qid", $"nh".cast("int").as("n_hits"),
        round($"nh".cast("double") / 5.0, 4).as("recall_at_5"))
      .orderBy($"qid")
  }

  /** Sequential prefix-d dot product — the [[cosSql]] fold over only
    * the first `d` components. */
  private def dotPfx(a: String, b: String, d: Int): String =
    s"""list_sum(list_transform(range(1, ${d + 1}),
       |    i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))""".stripMargin

  /** CTE chain shared by ann_mrl_rerank, its recall report, and the
    * adaptive-budget entries: prefix-16 coarse cosine (rows with zero
    * PREFIX norm excluded on either side — prefix cosine undefined),
    * per-query top-`candCutExpr` candidates, exact full-dim re-rank
    * ranked as `mranked`. The candidate cut is an EXPRESSION so the
    * adaptive oracle can bind it to the calibration sweep's chosen
    * budget. */
  private def mrlChainFor(qWhere: String, candCutExpr: String,
                          candPred: String = "TRUE"): String = {
    val p = 16
    s"""q AS (
       |  SELECT vec_id AS qid, embedding AS qe FROM embeddings
       |  $qWhere),
       |mapprox AS (
       |  SELECT q.qid, e.vec_id,
       |         round(${dotPfx("q.qe", "e.embedding", p)}
       |               / (sqrt(${dotPfx("q.qe", "q.qe", p)})
       |                  * sqrt(${dotPfx("e.embedding", "e.embedding", p)})),
       |               6) AS cos_mrl
       |  FROM q JOIN embeddings e ON e.vec_id <> q.qid
       |  WHERE ${dotPfx("e.embedding", "e.embedding", p)} > 0
       |    AND ${dotPfx("q.qe", "q.qe", p)} > 0
       |    AND $candPred),
       |mcand AS (
       |  SELECT qid, vec_id, cos_mrl FROM (
       |    SELECT qid, vec_id, cos_mrl,
       |           row_number() OVER (PARTITION BY qid
       |                              ORDER BY cos_mrl DESC, vec_id ASC) AS rn
       |    FROM mapprox) WHERE rn <= $candCutExpr),
       |mrr AS (
       |  SELECT c.qid, c.vec_id,
       |         round(${cos("q.qe", "e.embedding")}, 6) AS cos, c.cos_mrl
       |  FROM mcand c
       |  JOIN embeddings e ON e.vec_id = c.vec_id
       |  JOIN q ON q.qid = c.qid),
       |mranked AS (
       |  SELECT qid, vec_id, cos, cos_mrl,
       |         row_number() OVER (PARTITION BY qid
       |                            ORDER BY cos DESC, vec_id ASC) AS rn
       |  FROM mrr)""".stripMargin
  }

  private def mrlChain: String = mrlChainFor("WHERE vec_id % 50 = 0", "20")

  private[queries] val mrlRerankSql: String =
    s"""WITH $mrlChain
       |SELECT qid, CAST(rn AS INT) AS rank, vec_id, cos, cos_mrl
       |FROM mranked WHERE rn <= 5
       |ORDER BY qid, rank""".stripMargin

  /** Post-deletion MRL serve: prefix-coarse chain with the deleted
    * vectors excluded before the candidate cut. */
  private val mrlDeleteSql: String =
    s"""WITH ${mrlChainFor("WHERE vec_id % 50 = 0", "20", "e.vec_id % 5 <> 2")}
       |SELECT qid, CAST(rn AS INT) AS rank, vec_id, cos, cos_mrl
       |FROM mranked WHERE rn <= 5
       |ORDER BY qid, rank""".stripMargin

  private val mrlRecallSql: String =
    s"""WITH $mrlChain,
       |bscored AS (
       |  SELECT q.qid, e.vec_id,
       |         round(${cos("q.qe", "e.embedding")}, 6) AS cos
       |  FROM q JOIN embeddings e ON e.vec_id <> q.qid),
       |branked AS (
       |  SELECT qid, vec_id,
       |         row_number() OVER (PARTITION BY qid
       |                            ORDER BY cos DESC, vec_id ASC) AS rn
       |  FROM bscored),
       |btop AS (SELECT qid, vec_id FROM branked WHERE rn <= 5),
       |mtop AS (SELECT qid, vec_id FROM mranked WHERE rn <= 5),
       |hits AS (
       |  SELECT b.qid,
       |         CAST(count(m.vec_id) AS INT) AS n_hits
       |  FROM btop b LEFT JOIN mtop m
       |    ON m.qid = b.qid AND m.vec_id = b.vec_id
       |  GROUP BY b.qid)
       |SELECT qid, n_hits,
       |       round(CAST(n_hits AS DOUBLE) / 5.0, 4) AS recall_at_5
       |FROM hits
       |ORDER BY qid""".stripMargin

  /** Held-out CALIBRATION sample for the adaptive-budget entries:
    * every 100th vector — half of the standard serve workload, so the
    * other half (odd multiples of 50) tests whether a budget chosen on
    * the sample generalizes. */
  private def calibQueriesDf(env: Env) =
    env.embeddings.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qe"))

  /** The exact recall-vs-probe-budget CURVE for the IVF family, one
    * row per budget 1..nCells, with the smallest budget meeting the
    * 0.9 recall floor flagged `chosen` —
    * [[graft.operators.VectorSearch.ivfProbeSweep]]: budgets are
    * DERIVED from a stated floor (the dedup_minhash_auto discipline on
    * the probe dial), not hand-tuned, and the whole curve costs ONE
    * pass (no re-serving per ladder point — recall\@k at budget p is
    * exactly P(truth vector's cell ranks ≤ p), because the exact
    * re-rank can never evict a global-top-k vector). */
  def annIvfProbeSweep(env: Env): DataFrame =
    VectorSearch.ivfProbeSweep(env.embeddings, calibQueriesDf(env), k = 5)

  /** IVF top-5 served at the probe budget the calibration sweep chose
    * for the 0.9 floor, budget stamped on every row
    * ([[graft.operators.VectorSearch.ivfAdaptiveTopK]]) — build-once
    * artifacts shared between the sweep and the serve. */
  def annIvfAdaptive(env: Env): DataFrame =
    VectorSearch.ivfAdaptiveTopK(env.embeddings, calibQueriesDf(env),
        queriesDf(env), k = 5)
      .orderBy($"qid", $"rank")

  /** One-row recall CARD for the adaptive IVF serve: recall\@5 of the
    * FULL workload (including the held-out half the calibration never
    * saw) at the chosen budget, with the floor verdict — the
    * "stated floor at a stated budget" contract as a verified result. */
  def annIvfAdaptiveRecall(env: Env): DataFrame =
    adaptiveRecallCard(env,
      VectorSearch.ivfAdaptiveTopK(env.embeddings, calibQueriesDf(env),
        queriesDf(env), k = 5), "nprobe")

  /** The recall-vs-candidate-budget curve for the Matryoshka family
    * (budget dial: candMult, the coarse-candidate multiplier the exact
    * re-rank sees) — same one-pass closed form via the truth vectors'
    * global coarse ranks; ladder 1..64.
    * [[graft.operators.VectorSearch.mrlCandSweep]]. */
  def annMrlCandSweep(env: Env): DataFrame =
    VectorSearch.mrlCandSweep(env.embeddings, calibQueriesDf(env), k = 5,
      maxCandMult = 64)

  /** MRL top-5 served at the candidate budget the calibration sweep
    * chose for the 0.9 floor (the pinned ann_mrl_rerank entry's
    * candMult 4 measures recall ~0.5 — the sweep finds the budget that
    * actually meets the floor), budget stamped on every row. */
  def annMrlAdaptive(env: Env): DataFrame =
    VectorSearch.mrlAdaptiveTopK(env.embeddings, calibQueriesDf(env),
        queriesDf(env), k = 5, maxCandMult = 64)
      .orderBy($"qid", $"rank")

  /** One-row recall card for the adaptive MRL serve — the
    * [[annIvfAdaptiveRecall]] contract on the candMult dial. */
  def annMrlAdaptiveRecall(env: Env): DataFrame =
    adaptiveRecallCard(env,
      VectorSearch.mrlAdaptiveTopK(env.embeddings, calibQueriesDf(env),
        queriesDf(env), k = 5, maxCandMult = 64), "cand_mult")

  /** The recall-vs-multiprobe-radius curve for the LSH family (budget
    * dial: probeHamming) — min recall radius of a truth pair is just
    * popcount(qbucket XOR vbucket), so the curve is one narrow join,
    * ladder 0..8. [[graft.operators.VectorSearch.lshRadiusSweep]]. */
  def annLshRadiusSweep(env: Env): DataFrame =
    VectorSearch.lshRadiusSweep(env.embeddings, calibQueriesDf(env), k = 5)

  /** LSH top-5 served at the multiprobe radius the calibration sweep
    * chose for the 0.9 floor (the pinned ann_lsh_topk entry's
    * radius 2), budget stamped on every row. */
  def annLshAdaptive(env: Env): DataFrame =
    VectorSearch.lshAdaptiveTopK(env.embeddings, calibQueriesDf(env),
        queriesDf(env), k = 5)
      .orderBy($"qid", $"rank")

  /** One-row recall card for the adaptive LSH serve — the
    * [[annIvfAdaptiveRecall]] contract on the hamming dial. */
  def annLshAdaptiveRecall(env: Env): DataFrame =
    adaptiveRecallCard(env,
      VectorSearch.lshAdaptiveTopK(env.embeddings, calibQueriesDf(env),
        queriesDf(env), k = 5), "radius")

  /** IVFPQ's SECOND dial swept at the first dial's choice: the
    * candMult curve from ADC ranks within the chosen probe budget's
    * candidate sets, probe budget stamped per row.
    * [[graft.operators.VectorSearch.ivfPqCandSweep]]. */
  def annIvfPqCandSweep(env: Env): DataFrame =
    VectorSearch.ivfPqCandSweep(env.embeddings, calibQueriesDf(env), k = 5)

  /** IVFPQ top-5 with BOTH dials derived from the 0.9 floor (nProbe
    * from the coarse-cell sweep, candMult from the ADC-rank sweep at
    * that budget), both stamped per row. */
  def annIvfPqAdaptive(env: Env): DataFrame =
    VectorSearch.ivfPqAdaptiveTopK(env.embeddings, calibQueriesDf(env),
        queriesDf(env), k = 5)
      .orderBy($"qid", $"rank")

  /** One-row recall card for the two-dial adaptive IVFPQ serve. */
  def annIvfPqAdaptiveRecall(env: Env): DataFrame =
    adaptiveRecallCard(env,
      VectorSearch.ivfPqAdaptiveTopK(env.embeddings, calibQueriesDf(env),
        queriesDf(env), k = 5), "nprobe", "cand_mult")

  /** Recall\@5 of an adaptively-budgeted serve over the FULL workload,
    * as one row: (budget, n_truth, n_hits, recall, floor_met). The
    * brute side is the standard ground-truth scan; the single recall
    * division is correctly rounded, so the card is oracle-exact. */
  private def adaptiveRecallCard(env: Env, served: DataFrame,
                                 budgetCols: String*): DataFrame = {
    import org.apache.spark.sql.functions.{col, count, lit, max, round}
    val brute = VectorSearch.bruteForceTopK(env.embeddings, queriesDf(env),
        k = 5)
      .select($"qid", $"vec_id")
    val card = brute.join(
        served.select($"qid", $"vec_id", lit(1).as("hit")),
        Seq("qid", "vec_id"), "left")
      .agg(count(lit(1)).as("n_truth"), count($"hit").as("n_hits"))
      .select($"n_truth", $"n_hits",
        round($"n_hits".cast("double") / $"n_truth", 4).as("recall"))
    graft.operators.PlanHints.withScalars(card,
        served.agg(max(col(budgetCols.head)).as(budgetCols.head),
          budgetCols.tail.map(c => max(col(c)).as(c)): _*))
      .select(budgetCols.map(col) ++
        Seq($"n_truth", $"n_hits", $"recall",
          ($"recall" >= 0.9).as("floor_met")): _*)
  }

  /** Calibration CTE chain for the IVF adaptive oracles: probe ranks
    * of every (calibration query, cell), brute truth on the sample,
    * min_probe per truth pair, the one-pass sweep, and the chosen
    * budget (smallest with recall ≥ 0.9, nCells fallback). */
  private val ivfCalibCtes: String =
    s"""nc AS (SELECT CAST(count(*) AS INT) AS n_cells FROM cent),
       |cq AS (
       |  SELECT vec_id AS qid, embedding AS qe FROM embeddings
       |  WHERE vec_id % 100 = 0),
       |csim AS (
       |  SELECT q.qid, c.cell,
       |    round(
       |      list_sum(list_transform(range(1, 65),
       |        i -> CAST(q.qe[i] AS DOUBLE) * c.centroid[i]))
       |      / (sqrt(list_sum(list_transform(range(1, 65),
       |           i -> CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))))
       |         * sqrt(list_sum(list_transform(range(1, 65),
       |             i -> c.centroid[i] * c.centroid[i])))), 6) AS sim
       |  FROM cq q, cent c),
       |cranks AS (
       |  SELECT qid, cell,
       |         row_number() OVER (PARTITION BY qid
       |                            ORDER BY sim DESC, cell ASC) AS probe_rank
       |  FROM csim),
       |cbscored AS (
       |  SELECT q.qid, e.vec_id,
       |         round(${cos("q.qe", "e.embedding")}, 6) AS cos
       |  FROM cq q JOIN embeddings e ON e.vec_id <> q.qid),
       |cbtop AS (
       |  SELECT qid, vec_id FROM (
       |    SELECT qid, vec_id,
       |           row_number() OVER (PARTITION BY qid
       |                              ORDER BY cos DESC, vec_id ASC) AS rn
       |    FROM cbscored) WHERE rn <= 5),
       |minp AS (
       |  SELECT b.qid, b.vec_id, r.probe_rank
       |  FROM cbtop b JOIN embeddings e ON e.vec_id = b.vec_id
       |  LEFT JOIN cranks r ON r.qid = b.qid AND r.cell = CAST(e.label AS INT)),
       |ladder AS (
       |  SELECT CAST(t.x AS INT) AS nprobe FROM range(1, 65537) t(x)
       |  WHERE t.x <= (SELECT n_cells FROM nc)),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM minp),
       |sweep AS (
       |  SELECT l.nprobe, CAST(count(m.vec_id) AS BIGINT) AS n_hits
       |  FROM ladder l LEFT JOIN minp m ON m.probe_rank <= l.nprobe
       |  GROUP BY l.nprobe),
       |curve AS (
       |  SELECT s.nprobe, s.n_hits, t.n_truth,
       |         round(CAST(s.n_hits AS DOUBLE) / t.n_truth, 4) AS recall
       |  FROM sweep s, tot t),
       |chosen AS (
       |  SELECT coalesce(
       |           min(CASE WHEN recall >= CAST(0.9 AS DOUBLE)
       |               THEN nprobe END),
       |           (SELECT n_cells FROM nc)) AS p FROM curve)""".stripMargin

  private val ivfSweepSql: String =
    s"""WITH $ivfCentCte,
       |$ivfCalibCtes
       |SELECT c.nprobe, c.n_hits, c.n_truth, c.recall,
       |       (c.nprobe = ch.p) AS chosen
       |FROM curve c, chosen ch ORDER BY c.nprobe""".stripMargin

  private val ivfAdaptiveSql: String =
    s"""WITH $ivfCentCte,
       |$ivfCalibCtes,
       |${ivfServeCtes("WHERE vec_id % 50 = 0", "(SELECT p FROM chosen)")}
       |SELECT qid, CAST(rn AS INT) AS rank, vec_id, cos,
       |       (SELECT p FROM chosen) AS nprobe
       |FROM ranked WHERE rn <= 5
       |ORDER BY qid, rank""".stripMargin

  private val ivfAdaptiveRecallSql: String =
    s"""WITH $ivfCentCte,
       |$ivfCalibCtes,
       |${ivfServeCtes("WHERE vec_id % 50 = 0", "(SELECT p FROM chosen)")},
       |stop AS (SELECT qid, vec_id FROM ranked WHERE rn <= 5),
       |sbscored AS (
       |  SELECT q.qid, e.vec_id,
       |         round(${cos("q.qe", "e.embedding")}, 6) AS cos
       |  FROM q JOIN embeddings e ON e.vec_id <> q.qid),
       |sbtop AS (
       |  SELECT qid, vec_id FROM (
       |    SELECT qid, vec_id,
       |           row_number() OVER (PARTITION BY qid
       |                              ORDER BY cos DESC, vec_id ASC) AS rn
       |    FROM sbscored) WHERE rn <= 5)
       |SELECT (SELECT p FROM chosen) AS nprobe,
       |       CAST(count(*) AS BIGINT) AS n_truth,
       |       CAST(count(s.vec_id) AS BIGINT) AS n_hits,
       |       round(CAST(count(s.vec_id) AS DOUBLE) / count(*), 4) AS recall,
       |       (round(CAST(count(s.vec_id) AS DOUBLE) / count(*), 4)
       |        >= CAST(0.9 AS DOUBLE)) AS floor_met
       |FROM sbtop b LEFT JOIN stop s
       |  ON s.qid = b.qid AND s.vec_id = b.vec_id""".stripMargin

  /** Calibration CTEs for the MRL adaptive oracles: global coarse
    * (prefix-16) rank of each truth pair on the sample, min candMult
    * = ⌈rank / 5⌉, ladder 1..64, chosen = smallest meeting 0.9. */
  private val mrlCalibCtes: String = {
    val p = 16
    s"""cq AS (
       |  SELECT vec_id AS qid, embedding AS qe FROM embeddings
       |  WHERE vec_id % 100 = 0),
       |cmapprox AS (
       |  SELECT q.qid, e.vec_id,
       |         round(${dotPfx("q.qe", "e.embedding", p)}
       |               / (sqrt(${dotPfx("q.qe", "q.qe", p)})
       |                  * sqrt(${dotPfx("e.embedding", "e.embedding", p)})),
       |               6) AS cos_mrl
       |  FROM cq q JOIN embeddings e ON e.vec_id <> q.qid
       |  WHERE ${dotPfx("e.embedding", "e.embedding", p)} > 0
       |    AND ${dotPfx("q.qe", "q.qe", p)} > 0),
       |cranked AS (
       |  SELECT qid, vec_id,
       |         row_number() OVER (PARTITION BY qid
       |                            ORDER BY cos_mrl DESC, vec_id ASC) AS crank
       |  FROM cmapprox),
       |cbscored AS (
       |  SELECT q.qid, e.vec_id,
       |         round(${cos("q.qe", "e.embedding")}, 6) AS cos
       |  FROM cq q JOIN embeddings e ON e.vec_id <> q.qid),
       |cbtop AS (
       |  SELECT qid, vec_id FROM (
       |    SELECT qid, vec_id,
       |           row_number() OVER (PARTITION BY qid
       |                              ORDER BY cos DESC, vec_id ASC) AS rn
       |    FROM cbscored) WHERE rn <= 5),
       |mincm AS (
       |  SELECT b.qid, b.vec_id, CAST((c.crank + 4) // 5 AS INT) AS min_cm
       |  FROM cbtop b LEFT JOIN cranked c
       |    ON c.qid = b.qid AND c.vec_id = b.vec_id),
       |ladder AS (SELECT CAST(t.x AS INT) AS cand_mult FROM range(1, 65) t(x)),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM mincm),
       |sweep AS (
       |  SELECT l.cand_mult, CAST(count(m.vec_id) AS BIGINT) AS n_hits
       |  FROM ladder l LEFT JOIN mincm m ON m.min_cm <= l.cand_mult
       |  GROUP BY l.cand_mult),
       |curve AS (
       |  SELECT s.cand_mult, s.n_hits, t.n_truth,
       |         round(CAST(s.n_hits AS DOUBLE) / t.n_truth, 4) AS recall
       |  FROM sweep s, tot t),
       |chosen AS (
       |  SELECT coalesce(
       |           min(CASE WHEN recall >= CAST(0.9 AS DOUBLE)
       |               THEN cand_mult END),
       |           64) AS p FROM curve)""".stripMargin
  }

  private val mrlSweepSql: String =
    s"""WITH $mrlCalibCtes
       |SELECT c.cand_mult, c.n_hits, c.n_truth, c.recall,
       |       (c.cand_mult = ch.p) AS chosen
       |FROM curve c, chosen ch ORDER BY c.cand_mult""".stripMargin

  private val mrlAdaptiveSql: String =
    s"""WITH $mrlCalibCtes,
       |${mrlChainFor("WHERE vec_id % 50 = 0", "5 * (SELECT p FROM chosen)")}
       |SELECT qid, CAST(rn AS INT) AS rank, vec_id, cos, cos_mrl,
       |       (SELECT p FROM chosen) AS cand_mult
       |FROM mranked WHERE rn <= 5
       |ORDER BY qid, rank""".stripMargin

  private val mrlAdaptiveRecallSql: String =
    s"""WITH $mrlCalibCtes,
       |${mrlChainFor("WHERE vec_id % 50 = 0", "5 * (SELECT p FROM chosen)")},
       |stop AS (SELECT qid, vec_id FROM mranked WHERE rn <= 5),
       |sbscored AS (
       |  SELECT q.qid, e.vec_id,
       |         round(${cos("q.qe", "e.embedding")}, 6) AS cos
       |  FROM q JOIN embeddings e ON e.vec_id <> q.qid),
       |sbtop AS (
       |  SELECT qid, vec_id FROM (
       |    SELECT qid, vec_id,
       |           row_number() OVER (PARTITION BY qid
       |                              ORDER BY cos DESC, vec_id ASC) AS rn
       |    FROM sbscored) WHERE rn <= 5)
       |SELECT (SELECT p FROM chosen) AS cand_mult,
       |       CAST(count(*) AS BIGINT) AS n_truth,
       |       CAST(count(s.vec_id) AS BIGINT) AS n_hits,
       |       round(CAST(count(s.vec_id) AS DOUBLE) / count(*), 4) AS recall,
       |       (round(CAST(count(s.vec_id) AS DOUBLE) / count(*), 4)
       |        >= CAST(0.9 AS DOUBLE)) AS floor_met
       |FROM sbtop b LEFT JOIN stop s
       |  ON s.qid = b.qid AND s.vec_id = b.vec_id""".stripMargin

  /** Index BALANCE card: per-cell occupancy of the coarse quantizer
    * (the label cells ivf_topk probes), each cell's corpus share, and
    * the global skew ratio (max/mean occupancy) stamped on every row
    * — the ops signal a serving tier watches to decide when append
    * drift warrants a centroid retrain (candidate volume per probe is
    * share·|V|, so a skew ratio creeping above ~2 means the hot cell
    * dominates serve latency; SCALING.md's recall-decay note is the
    * same phenomenon from the recall side). Zero-shuffle beyond one
    * cell-count aggregate; the global row is a codegen-safe scalar
    * broadcast ([[graft.operators.PlanHints.withScalars]]). */
  def annCellStats(env: Env): DataFrame = {
    import org.apache.spark.sql.functions._
    val cells = env.embeddings
      .filter($"embedding".isNotNull)
      .groupBy($"label".cast("int").as("cell"))
      .agg(count(lit(1)).as("n"))
    val tot = cells.agg(sum($"n").as("total"), max($"n").as("max_n"),
      count(lit(1)).as("n_cells"))
    graft.operators.PlanHints.withScalars(cells, tot)
      .select($"cell", $"n",
        round($"n".cast("double") / $"total", 6).as("share"),
        round(($"max_n".cast("double") * $"n_cells") / $"total", 6)
          .as("skew"))
      .orderBy($"cell")
  }

  private val cellStatsSql: String =
    """WITH cells AS (
      |  SELECT CAST(label AS INT) AS cell, CAST(count(*) AS BIGINT) AS n
      |  FROM embeddings WHERE embedding IS NOT NULL
      |  GROUP BY 1),
      |tot AS (
      |  SELECT CAST(sum(n) AS BIGINT) AS total, max(n) AS max_n,
      |         CAST(count(*) AS BIGINT) AS n_cells FROM cells)
      |SELECT cell, n,
      |       round(CAST(n AS DOUBLE) / total, 6) AS share,
      |       round(CAST(max_n AS DOUBLE) * n_cells / total, 6) AS skew
      |FROM cells, tot
      |ORDER BY cell""".stripMargin

  /** The trained-centroid CTE shared by every IVF-family oracle.
    * A def, not a val: the adaptive oracles above it in declaration
    * order read it during object init. */
  private def ivfCentCte: String = ivfCentCteFor("")

  /** [[ivfCentCte]] with a training predicate — replays an index whose
    * centroids were trained on a corpus SLICE (the time-travel serve
    * of a base-only generation). */
  private def ivfCentCteFor(where: String): String =
    s"""cent AS (
       |  SELECT cell, list(c ORDER BY d) AS centroid FROM (
       |    SELECT CAST(label AS INT) AS cell, t.d AS d,
       |           round(sum(CAST(embedding[t.d] AS DOUBLE)) / count(*), 4) AS c
       |    FROM embeddings, range(1, 65) t(d)
       |    $where
       |    GROUP BY cell, t.d)
       |  GROUP BY cell)""".stripMargin

  /** The IVF serve chain (query set → probe cells → candidates →
    * exact rank), parameterized by the query predicate and the probe
    * budget EXPRESSION — a literal for the pinned entries, a scalar
    * subquery over the calibration sweep for the adaptive one. */
  private def ivfServeCtes(qWhere: String, probeExpr: String,
                           candPred: String = "TRUE"): String =
    s"""q AS (
       |  SELECT vec_id AS qid, embedding AS qe FROM embeddings
       |  $qWhere),
       |psim AS (
       |  SELECT q.qid, c.cell,
       |    round(
       |      list_sum(list_transform(range(1, 65),
       |        i -> CAST(q.qe[i] AS DOUBLE) * c.centroid[i]))
       |      / (sqrt(list_sum(list_transform(range(1, 65),
       |           i -> CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))))
       |         * sqrt(list_sum(list_transform(range(1, 65),
       |             i -> c.centroid[i] * c.centroid[i])))), 6) AS sim
       |  FROM q, cent c),
       |probes AS (
       |  SELECT qid, cell FROM (
       |    SELECT qid, cell,
       |           row_number() OVER (PARTITION BY qid
       |                              ORDER BY sim DESC, cell ASC) AS rn
       |    FROM psim) WHERE rn <= $probeExpr),
       |cand AS (
       |  SELECT p.qid, e.vec_id,
       |         round(${cos("q.qe", "e.embedding")}, 6) AS cos
       |  FROM probes p
       |  JOIN embeddings e ON CAST(e.label AS INT) = p.cell
       |  JOIN q ON q.qid = p.qid
       |  WHERE e.vec_id <> p.qid AND $candPred),
       |ranked AS (
       |  SELECT qid, vec_id, cos,
       |         row_number() OVER (PARTITION BY qid
       |                            ORDER BY cos DESC, vec_id ASC) AS rn
       |  FROM cand)""".stripMargin

  /** The IVF-top-k oracle, parameterized by the query-set predicate
    * and k — ONE body shared by ann_ivf_topk, ann_knn_join (every
    * vector, k = 3) and the streaming ANN entry t9 (whose per-query
    * results are batch-independent, so the streamed union replays
    * exactly this SQL); a fix to the centroid grid / probe tie-break
    * lands in all three or none. */
  private[queries] def ivfTopkSqlFor(qWhere: String, k: Int): String =
    s"""WITH $ivfCentCte,
       |${ivfServeCtes(qWhere, "3")}
       |SELECT qid, CAST(rn AS INT) AS rank, vec_id, cos
       |FROM ranked WHERE rn <= $k
       |ORDER BY qid, rank""".stripMargin

  private[queries] val ivfTopkSql: String =
    ivfTopkSqlFor("WHERE vec_id % 50 = 0", k = 5)

  /** Post-deletion serve: full-corpus centroid training (frozen
    * geometry), deleted vectors excluded from candidates only. */
  private[queries] val ivfDeleteSql: String =
    s"""WITH $ivfCentCte,
       |${ivfServeCtes("WHERE vec_id % 50 = 0", "3", "e.vec_id % 5 <> 2")}
       |SELECT qid, CAST(rn AS INT) AS rank, vec_id, cos
       |FROM ranked WHERE rn <= 5
       |ORDER BY qid, rank""".stripMargin

  /** The incremental-index replay: centroids trained on the BASE only,
    * increment vectors assigned to the frozen centroids with the
    * refine sweep's exact rule, merged cells served through the
    * standard probe/top-k chain. `incPred` restricts WHICH of the
    * % 7 = 0 increment has been appended — "TRUE" for all of it; a
    * narrower predicate replays a time-travel serve of a generation
    * that had ingested only part of the stream (t22's phase pins). */
  private[queries] def ivfAppendSqlFor(incPred: String): String =
    s"""WITH cent AS (
       |  SELECT cell, list(c ORDER BY d) AS centroid FROM (
       |    SELECT CAST(label AS INT) AS cell, t.d AS d,
       |           round(sum(CAST(embedding[t.d] AS DOUBLE)) / count(*), 4) AS c
       |    FROM embeddings, range(1, 65) t(d)
       |    WHERE vec_id % 7 <> 0
       |    GROUP BY cell, t.d)
       |  GROUP BY cell),
       |inc AS (SELECT vec_id, embedding FROM embeddings
       |        WHERE vec_id % 7 = 0 AND ($incPred)),
       |isim AS (
       |  SELECT i.vec_id, c.cell,
       |    round(
       |      list_sum(list_transform(range(1, 65),
       |        x -> CAST(i.embedding[x] AS DOUBLE) * c.centroid[x]))
       |      / (sqrt(list_sum(list_transform(range(1, 65),
       |           x -> CAST(i.embedding[x] AS DOUBLE)
       |                * CAST(i.embedding[x] AS DOUBLE))))
       |         * sqrt(list_sum(list_transform(range(1, 65),
       |             x -> c.centroid[x] * c.centroid[x])))), 6) AS sim
       |  FROM inc i, cent c
       |  WHERE list_sum(list_transform(range(1, 65),
       |          x -> CAST(i.embedding[x] AS DOUBLE)
       |               * CAST(i.embedding[x] AS DOUBLE))) > 0),
       |iassign AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT vec_id, cell,
       |           row_number() OVER (PARTITION BY vec_id
       |                              ORDER BY sim DESC, cell ASC) AS rn
       |    FROM isim) WHERE rn = 1),
       |cells AS (
       |  SELECT CAST(label AS INT) AS cell, vec_id, embedding
       |  FROM embeddings WHERE vec_id % 7 <> 0
       |  UNION ALL
       |  SELECT a.cell, i.vec_id, i.embedding
       |  FROM inc i JOIN iassign a USING (vec_id)),
       |q AS (
       |  SELECT vec_id AS qid, embedding AS qe FROM embeddings
       |  WHERE vec_id % 50 = 0),
       |psim AS (
       |  SELECT q.qid, c.cell,
       |    round(
       |      list_sum(list_transform(range(1, 65),
       |        i -> CAST(q.qe[i] AS DOUBLE) * c.centroid[i]))
       |      / (sqrt(list_sum(list_transform(range(1, 65),
       |           i -> CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))))
       |         * sqrt(list_sum(list_transform(range(1, 65),
       |             i -> c.centroid[i] * c.centroid[i])))), 6) AS sim
       |  FROM q, cent c),
       |probes AS (
       |  SELECT qid, cell FROM (
       |    SELECT qid, cell,
       |           row_number() OVER (PARTITION BY qid
       |                              ORDER BY sim DESC, cell ASC) AS rn
       |    FROM psim) WHERE rn <= 3),
       |cand AS (
       |  SELECT p.qid, e.vec_id,
       |         round(${cos("q.qe", "e.embedding")}, 6) AS cos
       |  FROM probes p
       |  JOIN cells e ON e.cell = p.cell
       |  JOIN q ON q.qid = p.qid
       |  WHERE e.vec_id <> p.qid),
       |ranked AS (
       |  SELECT qid, vec_id, cos,
       |         row_number() OVER (PARTITION BY qid
       |                            ORDER BY cos DESC, vec_id ASC) AS rn
       |  FROM cand)
       |SELECT qid, CAST(rn AS INT) AS rank, vec_id, cos
       |FROM ranked WHERE rn <= 5
       |ORDER BY qid, rank""".stripMargin

  private[queries] val ivfAppendSql: String = ivfAppendSqlFor("TRUE")

  // The plane weight for bit b, dimension d (1-based i = d+1) is ±1 by
  // the md5 hex digit of the seed string — identical to
  // VectorSearch.hyperplanes. The md5 bucket CTE, shared by every
  // LSH-family oracle.
  private def lshBucketsCte: String =
    """bitsums AS (
      |  SELECT v.vec_id, t.b AS b,
      |    list_sum(list_transform(range(1, 65),
      |      i -> CAST(v.embedding[i] AS DOUBLE) *
      |           (CASE WHEN substr(md5('graft-hp-' || t.b || '-' || ((i-1) // 32)),
      |                             CAST((i-1) % 32 + 1 AS INT), 1) >= '8'
      |                 THEN 1.0 ELSE -1.0 END))) AS s
      |  FROM embeddings v, range(0, 8) t(b)),
      |buckets AS (
      |  SELECT vec_id,
      |         CAST(sum(CASE WHEN s > 0 THEN 1 << b ELSE 0 END) AS INT) AS bucket
      |  FROM bitsums
      |  GROUP BY vec_id)""".stripMargin

  // bit_count(xor(buckets)) <= radius is exactly the kernel's
  // multiprobe mask-set membership; the radius is an EXPRESSION so the
  // adaptive oracle binds it to the calibration sweep's choice.
  private def lshServeCtes(qWhere: String, radiusExpr: String,
                           candPred: String = "TRUE"): String =
    s"""q AS (
       |  SELECT vec_id AS qid, embedding AS qe FROM embeddings
       |  $qWhere),
       |qb AS (
       |  SELECT q.qid, q.qe, b.bucket AS qbucket
       |  FROM q JOIN buckets b ON b.vec_id = q.qid),
       |cand AS (
       |  SELECT qb.qid, e.vec_id,
       |         round(${cos("qb.qe", "e.embedding")}, 6) AS cos
       |  FROM qb
       |  JOIN buckets vb
       |    ON vb.vec_id <> qb.qid
       |   AND bit_count(CAST(xor(vb.bucket, qb.qbucket) AS BIGINT))
       |       <= $radiusExpr
       |   AND $candPred
       |  JOIN embeddings e ON e.vec_id = vb.vec_id),
       |ranked AS (
       |  SELECT qid, vec_id, cos,
       |         row_number() OVER (PARTITION BY qid
       |                            ORDER BY cos DESC, vec_id ASC) AS rn
       |  FROM cand)""".stripMargin

  // ONE body shared by ann_lsh_topk, the persisted-index roundtrip,
  // and the incremental append (all bit-exact serves).
  private[queries] val lshTopkSql: String =
    s"""WITH $lshBucketsCte,
       |${lshServeCtes("WHERE vec_id % 50 = 0", "2")}
       |SELECT qid, CAST(rn AS INT) AS rank, vec_id, cos
       |FROM ranked WHERE rn <= 5
       |ORDER BY qid, rank""".stripMargin

  /** Calibration CTEs for the LSH adaptive oracles: min recall radius
    * of each truth pair = popcount(qbucket XOR vbucket), ladder 0..8,
    * chosen = smallest radius meeting 0.9 (fallback 8). */
  private val lshCalibCtes: String =
    s"""cq AS (
       |  SELECT vec_id AS qid, embedding AS qe FROM embeddings
       |  WHERE vec_id % 100 = 0),
       |cbscored AS (
       |  SELECT q.qid, e.vec_id,
       |         round(${cos("q.qe", "e.embedding")}, 6) AS cos
       |  FROM cq q JOIN embeddings e ON e.vec_id <> q.qid),
       |cbtop AS (
       |  SELECT qid, vec_id FROM (
       |    SELECT qid, vec_id,
       |           row_number() OVER (PARTITION BY qid
       |                              ORDER BY cos DESC, vec_id ASC) AS rn
       |    FROM cbscored) WHERE rn <= 5),
       |minr AS (
       |  SELECT b.qid, b.vec_id,
       |         CAST(bit_count(CAST(xor(vb.bucket, qb.bucket) AS BIGINT))
       |              AS INT) AS min_radius
       |  FROM cbtop b
       |  LEFT JOIN buckets vb ON vb.vec_id = b.vec_id
       |  LEFT JOIN buckets qb ON qb.vec_id = b.qid),
       |ladder AS (SELECT CAST(t.x AS INT) AS radius FROM range(0, 9) t(x)),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM minr),
       |sweep AS (
       |  SELECT l.radius, CAST(count(m.vec_id) AS BIGINT) AS n_hits
       |  FROM ladder l LEFT JOIN minr m ON m.min_radius <= l.radius
       |  GROUP BY l.radius),
       |curve AS (
       |  SELECT s.radius, s.n_hits, t.n_truth,
       |         round(CAST(s.n_hits AS DOUBLE) / t.n_truth, 4) AS recall
       |  FROM sweep s, tot t),
       |chosen AS (
       |  SELECT coalesce(
       |           min(CASE WHEN recall >= CAST(0.9 AS DOUBLE)
       |               THEN radius END),
       |           8) AS p FROM curve)""".stripMargin

  /** Post-deletion LSH serve: standard radius-2 chain, deleted
    * vectors excluded from the bucket candidates. */
  private val lshDeleteSql: String =
    s"""WITH $lshBucketsCte,
       |${lshServeCtes("WHERE vec_id % 50 = 0", "2", "vb.vec_id % 5 <> 2")}
       |SELECT qid, CAST(rn AS INT) AS rank, vec_id, cos
       |FROM ranked WHERE rn <= 5
       |ORDER BY qid, rank""".stripMargin

  private val lshSweepSql: String =
    s"""WITH $lshBucketsCte,
       |$lshCalibCtes
       |SELECT c.radius, c.n_hits, c.n_truth, c.recall,
       |       (c.radius = ch.p) AS chosen
       |FROM curve c, chosen ch ORDER BY c.radius""".stripMargin

  private val lshAdaptiveSql: String =
    s"""WITH $lshBucketsCte,
       |$lshCalibCtes,
       |${lshServeCtes("WHERE vec_id % 50 = 0", "(SELECT p FROM chosen)")}
       |SELECT qid, CAST(rn AS INT) AS rank, vec_id, cos,
       |       (SELECT p FROM chosen) AS radius
       |FROM ranked WHERE rn <= 5
       |ORDER BY qid, rank""".stripMargin

  private val lshAdaptiveRecallSql: String =
    s"""WITH $lshBucketsCte,
       |$lshCalibCtes,
       |${lshServeCtes("WHERE vec_id % 50 = 0", "(SELECT p FROM chosen)")},
       |stop AS (SELECT qid, vec_id FROM ranked WHERE rn <= 5),
       |sbscored AS (
       |  SELECT q.qid, e.vec_id,
       |         round(${cos("q.qe", "e.embedding")}, 6) AS cos
       |  FROM q JOIN embeddings e ON e.vec_id <> q.qid),
       |sbtop AS (
       |  SELECT qid, vec_id FROM (
       |    SELECT qid, vec_id,
       |           row_number() OVER (PARTITION BY qid
       |                              ORDER BY cos DESC, vec_id ASC) AS rn
       |    FROM sbscored) WHERE rn <= 5)
       |SELECT (SELECT p FROM chosen) AS radius,
       |       CAST(count(*) AS BIGINT) AS n_truth,
       |       CAST(count(s.vec_id) AS BIGINT) AS n_hits,
       |       round(CAST(count(s.vec_id) AS DOUBLE) / count(*), 4) AS recall,
       |       (round(CAST(count(s.vec_id) AS DOUBLE) / count(*), 4)
       |        >= CAST(0.9 AS DOUBLE)) AS floor_met
       |FROM sbtop b LEFT JOIN stop s
       |  ON s.qid = b.qid AND s.vec_id = b.vec_id""".stripMargin

  // PQ 8x16 training replay (init cells vec_id % 16, one Lloyd sweep
  // on the 4dp grid / 6dp squared L2, lowest-cell ties), encoding,
  // reconstruction as the j-major 64-list, then the sq8-style
  // candidate window + exact re-rank. ONE body shared by
  // ann_pq_rerank and the persisted-index roundtrip (bit-exact
  // serve over the codes table); `trainPred` restricts the TRAINING
  // rows only (init means + Lloyd sweep) — encoding/scan stay
  // full-corpus, which is exactly the frozen-codebook append replay
  // ann_pq_append needs.
  private def pqRerankSqlFor(trainPred: String => String): String =
    s"""WITH sv AS (
       |  SELECT vec_id, j.j AS j, d.d AS d,
       |         CAST(embedding[j.j * 8 + d.d] AS DOUBLE) AS x
       |  FROM embeddings, range(0, 8) j(j), range(1, 9) d(d)),
       |cb0 AS (
       |  SELECT sv.j, sv.vec_id % 16 AS cell, sv.d,
       |         round(sum(sv.x) / count(*), 4) AS c
       |  FROM sv WHERE ${trainPred("sv")}
       |  GROUP BY sv.j, sv.vec_id % 16, sv.d),
       |cb0l AS (SELECT j, cell, list(c ORDER BY d) AS cl
       |         FROM cb0 GROUP BY j, cell),
       |svl AS (SELECT vec_id, j, list(x ORDER BY d) AS xl
       |        FROM sv GROUP BY vec_id, j),
       |d1 AS (
       |  SELECT s.vec_id, s.j, b.cell,
       |         round(list_sum(list_transform(range(1, 9),
       |           i -> (s.xl[i] - b.cl[i]) * (s.xl[i] - b.cl[i]))), 6) AS dist
       |  FROM svl s JOIN cb0l b ON b.j = s.j
       |  WHERE ${trainPred("s")}),
       |a1 AS (
       |  SELECT vec_id, j, cell FROM (
       |    SELECT vec_id, j, cell,
       |           row_number() OVER (PARTITION BY vec_id, j
       |                              ORDER BY dist, cell) AS rn
       |    FROM d1) WHERE rn = 1),
       |cb1 AS (
       |  SELECT sv.j, a1.cell, sv.d, round(sum(sv.x) / count(*), 4) AS c
       |  FROM sv JOIN a1 ON a1.vec_id = sv.vec_id AND a1.j = sv.j
       |  GROUP BY sv.j, a1.cell, sv.d),
       |cb1l AS (SELECT j, cell, list(c ORDER BY d) AS cl
       |         FROM cb1 GROUP BY j, cell),
       |d2 AS (
       |  SELECT s.vec_id, s.j, b.cell,
       |         round(list_sum(list_transform(range(1, 9),
       |           i -> (s.xl[i] - b.cl[i]) * (s.xl[i] - b.cl[i]))), 6) AS dist
       |  FROM svl s JOIN cb1l b ON b.j = s.j),
       |code AS (
       |  SELECT vec_id, j, cell FROM (
       |    SELECT vec_id, j, cell,
       |           row_number() OVER (PARTITION BY vec_id, j
       |                              ORDER BY dist, cell) AS rn
       |    FROM d2) WHERE rn = 1),
       |recon AS (
       |  SELECT c2.vec_id, list(cb.c ORDER BY cb.j, cb.d) AS rv
       |  FROM code c2 JOIN cb1 cb ON cb.j = c2.j AND cb.cell = c2.cell
       |  GROUP BY c2.vec_id),
       |q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
       |      WHERE vec_id % 50 = 0),
       |approx AS (
       |  SELECT q.qid, r.vec_id,
       |    round(list_sum(list_transform(range(1, 65),
       |            i -> CAST(q.qe[i] AS DOUBLE) * r.rv[i]))
       |          / (sqrt(list_sum(list_transform(range(1, 65),
       |               i -> CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))))
       |             * sqrt(list_sum(list_transform(range(1, 65),
       |                 i -> r.rv[i] * r.rv[i])))), 6) AS cos_pq
       |  FROM q JOIN recon r ON r.vec_id <> q.qid
       |  JOIN embeddings e ON e.vec_id = r.vec_id
       |  WHERE list_sum(list_transform(range(1, 65),
       |          i -> CAST(e.embedding[i] AS DOUBLE)
       |               * CAST(e.embedding[i] AS DOUBLE))) > 0
       |    AND list_sum(list_transform(range(1, 65),
       |          i -> r.rv[i] * r.rv[i])) > 0
       |    AND list_sum(list_transform(range(1, 65),
       |          i -> CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))) > 0),
       |cand AS (
       |  SELECT qid, vec_id, cos_pq FROM (
       |    SELECT qid, vec_id, cos_pq,
       |           row_number() OVER (PARTITION BY qid
       |                              ORDER BY cos_pq DESC, vec_id ASC) AS rn
       |    FROM approx) WHERE rn <= 20),
       |rr AS (
       |  SELECT c3.qid, c3.vec_id,
       |         round(${cos("q.qe", "e.embedding")}, 6) AS cos, c3.cos_pq
       |  FROM cand c3
       |  JOIN embeddings e ON e.vec_id = c3.vec_id
       |  JOIN q ON q.qid = c3.qid),
       |ranked AS (
       |  SELECT qid, vec_id, cos, cos_pq,
       |         row_number() OVER (PARTITION BY qid
       |                            ORDER BY cos DESC, vec_id ASC) AS rn
       |  FROM rr)
       |SELECT qid, CAST(rn AS INT) AS rank, vec_id, cos, cos_pq
       |FROM ranked WHERE rn <= 5
       |ORDER BY qid, rank""".stripMargin

  private[queries] val pqRerankSql: String = pqRerankSqlFor(_ => "TRUE")

  /** The frozen-codebook append replay: codebooks trained on the BASE
    * split only, every vector (base + increment) encoded against
    * them, scan/re-rank unchanged. */
  private val pqAppendSql: String =
    pqRerankSqlFor(t => s"$t.vec_id % 7 <> 0")

  // IVFPQ replay: the ivf oracle's centroid/probe fragments composed
  // with the pq oracle's training replay, run on RESIDUALS (exact
  // double subtraction against the 4dp centroid grid). recon = coarse
  // centroid + residual codeword; approx restricted to probed cells;
  // exact re-rank tail identical to pqRerankSql.
  /** The IVFPQ replay chain; `trainPred` restricts the TRAINING rows
    * (coarse centroid means + residual codebook init/sweep) — residual
    * computation and encoding stay full-corpus, which is the
    * frozen-artifact append replay ann_ivfpq_append needs. */
  private def ivfPqTrainCtes(trainPred: String => String): String =
    s"""cent AS (
       |  SELECT cell, list(c ORDER BY d) AS centroid FROM (
       |    SELECT CAST(label AS INT) AS cell, t.d AS d,
       |           round(sum(CAST(embedding[t.d] AS DOUBLE)) / count(*), 4) AS c
       |    FROM embeddings, range(1, 65) t(d)
       |    WHERE ${trainPred("embeddings")}
       |    GROUP BY cell, t.d)
       |  GROUP BY cell),
       |ev AS (
       |  SELECT e.vec_id, CAST(e.label AS INT) AS cell, e.embedding
       |  FROM embeddings e),
       |rsv AS (
       |  SELECT ev.vec_id, ev.cell, j.j AS j, d.d AS d,
       |         CAST(ev.embedding[j.j * 8 + d.d] AS DOUBLE)
       |           - c.centroid[j.j * 8 + d.d] AS x
       |  FROM ev JOIN cent c ON c.cell = ev.cell,
       |       range(0, 8) j(j), range(1, 9) d(d)),
       |cb0 AS (
       |  SELECT rsv.j, rsv.vec_id % 16 AS cell, rsv.d,
       |         round(sum(rsv.x) / count(*), 4) AS c
       |  FROM rsv WHERE ${trainPred("rsv")}
       |  GROUP BY rsv.j, rsv.vec_id % 16, rsv.d),
       |cb0l AS (SELECT j, cell, list(c ORDER BY d) AS cl
       |         FROM cb0 GROUP BY j, cell),
       |rvl AS (SELECT vec_id, j, list(x ORDER BY d) AS xl
       |        FROM rsv GROUP BY vec_id, j),
       |d1 AS (
       |  SELECT s.vec_id, s.j, b.cell,
       |         round(list_sum(list_transform(range(1, 9),
       |           i -> (s.xl[i] - b.cl[i]) * (s.xl[i] - b.cl[i]))), 6) AS dist
       |  FROM rvl s JOIN cb0l b ON b.j = s.j
       |  WHERE ${trainPred("s")}),
       |a1 AS (
       |  SELECT vec_id, j, cell FROM (
       |    SELECT vec_id, j, cell,
       |           row_number() OVER (PARTITION BY vec_id, j
       |                              ORDER BY dist, cell) AS rn
       |    FROM d1) WHERE rn = 1),
       |cb1 AS (
       |  SELECT rsv.j, a1.cell, rsv.d, round(sum(rsv.x) / count(*), 4) AS c
       |  FROM rsv JOIN a1 ON a1.vec_id = rsv.vec_id AND a1.j = rsv.j
       |  GROUP BY rsv.j, a1.cell, rsv.d),
       |cb1l AS (SELECT j, cell, list(c ORDER BY d) AS cl
       |         FROM cb1 GROUP BY j, cell),
       |d2 AS (
       |  SELECT s.vec_id, s.j, b.cell,
       |         round(list_sum(list_transform(range(1, 9),
       |           i -> (s.xl[i] - b.cl[i]) * (s.xl[i] - b.cl[i]))), 6) AS dist
       |  FROM rvl s JOIN cb1l b ON b.j = s.j),
       |code AS (
       |  SELECT vec_id, j, cell FROM (
       |    SELECT vec_id, j, cell,
       |           row_number() OVER (PARTITION BY vec_id, j
       |                              ORDER BY dist, cell) AS rn
       |    FROM d2) WHERE rn = 1),
       |reconr AS (
       |  SELECT c2.vec_id, list(cb.c ORDER BY cb.j, cb.d) AS rv
       |  FROM code c2 JOIN cb1 cb ON cb.j = c2.j AND cb.cell = c2.cell
       |  GROUP BY c2.vec_id),
       |recon AS (
       |  SELECT r.vec_id, ev.cell,
       |         list_transform(range(1, 65),
       |           i -> c.centroid[i] + r.rv[i]) AS fv
       |  FROM reconr r JOIN ev ON ev.vec_id = r.vec_id
       |  JOIN cent c ON c.cell = ev.cell)""".stripMargin

  /** The IVFPQ serve chain (probe selection → ADC scoring → candidate
    * cut → exact re-rank), parameterized by the query predicate and
    * BOTH budget expressions so the adaptive oracle can bind them to
    * the calibration sweeps' choices. */
  private def ivfPqServeCtes(qWhere: String, probeExpr: String,
                             candCutExpr: String): String =
    s"""q AS (
       |  SELECT vec_id AS qid, embedding AS qe FROM embeddings
       |  $qWhere),
       |psim AS (
       |  SELECT q.qid, c.cell,
       |    round(
       |      list_sum(list_transform(range(1, 65),
       |        i -> CAST(q.qe[i] AS DOUBLE) * c.centroid[i]))
       |      / (sqrt(list_sum(list_transform(range(1, 65),
       |           i -> CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))))
       |         * sqrt(list_sum(list_transform(range(1, 65),
       |             i -> c.centroid[i] * c.centroid[i])))), 6) AS sim
       |  FROM q, cent c),
       |probes AS (
       |  SELECT qid, cell FROM (
       |    SELECT qid, cell,
       |           row_number() OVER (PARTITION BY qid
       |                              ORDER BY sim DESC, cell ASC) AS rn
       |    FROM psim) WHERE rn <= $probeExpr),
       |approx AS (
       |  SELECT p.qid, r.vec_id,
       |    round(list_sum(list_transform(range(1, 65),
       |            i -> CAST(q.qe[i] AS DOUBLE) * r.fv[i]))
       |          / (sqrt(list_sum(list_transform(range(1, 65),
       |               i -> CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))))
       |             * sqrt(list_sum(list_transform(range(1, 65),
       |                 i -> r.fv[i] * r.fv[i])))), 6) AS cos_pq
       |  FROM probes p
       |  JOIN recon r ON r.cell = p.cell
       |  JOIN q ON q.qid = p.qid
       |  JOIN embeddings e ON e.vec_id = r.vec_id
       |  WHERE r.vec_id <> p.qid
       |    AND list_sum(list_transform(range(1, 65),
       |          i -> CAST(e.embedding[i] AS DOUBLE)
       |               * CAST(e.embedding[i] AS DOUBLE))) > 0
       |    AND list_sum(list_transform(range(1, 65),
       |          i -> r.fv[i] * r.fv[i])) > 0),
       |cand AS (
       |  SELECT qid, vec_id, cos_pq FROM (
       |    SELECT qid, vec_id, cos_pq,
       |           row_number() OVER (PARTITION BY qid
       |                              ORDER BY cos_pq DESC, vec_id ASC) AS rn
       |    FROM approx) WHERE rn <= $candCutExpr),
       |rr AS (
       |  SELECT c3.qid, c3.vec_id,
       |         round(${cos("q.qe", "e.embedding")}, 6) AS cos, c3.cos_pq
       |  FROM cand c3
       |  JOIN embeddings e ON e.vec_id = c3.vec_id
       |  JOIN q ON q.qid = c3.qid),
       |ranked AS (
       |  SELECT qid, vec_id, cos, cos_pq,
       |         row_number() OVER (PARTITION BY qid
       |                            ORDER BY cos DESC, vec_id ASC) AS rn
       |  FROM rr)""".stripMargin

  private def ivfPqChainFor(trainPred: String => String): String =
    s"""${ivfPqTrainCtes(trainPred)},
       |${ivfPqServeCtes("WHERE vec_id % 50 = 0", "3", "20")}""".stripMargin

  private[queries] def ivfPqChain: String = ivfPqChainFor(_ => "TRUE")

  /** Dial-2 calibration CTEs for the adaptive IVFPQ oracles — ADC
    * ranks of the calibration truth pairs within the candidate sets
    * the CHOSEN probe budget exposes (cranks/cbtop/chosen come from
    * [[ivfCalibCtes]]; cent/recon from the shared training chain). */
  private val ivfPqCalib2Ctes: String =
    s"""cprobes AS (
       |  SELECT qid, cell FROM cranks
       |  WHERE probe_rank <= (SELECT p FROM chosen)),
       |capprox AS (
       |  SELECT p.qid, r.vec_id,
       |    round(list_sum(list_transform(range(1, 65),
       |            i -> CAST(q.qe[i] AS DOUBLE) * r.fv[i]))
       |          / (sqrt(list_sum(list_transform(range(1, 65),
       |               i -> CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))))
       |             * sqrt(list_sum(list_transform(range(1, 65),
       |                 i -> r.fv[i] * r.fv[i])))), 6) AS cos_pq
       |  FROM cprobes p
       |  JOIN recon r ON r.cell = p.cell
       |  JOIN cq q ON q.qid = p.qid
       |  JOIN embeddings e ON e.vec_id = r.vec_id
       |  WHERE r.vec_id <> p.qid
       |    AND list_sum(list_transform(range(1, 65),
       |          i -> CAST(e.embedding[i] AS DOUBLE)
       |               * CAST(e.embedding[i] AS DOUBLE))) > 0
       |    AND list_sum(list_transform(range(1, 65),
       |          i -> r.fv[i] * r.fv[i])) > 0),
       |caranked AS (
       |  SELECT qid, vec_id,
       |         row_number() OVER (PARTITION BY qid
       |                            ORDER BY cos_pq DESC, vec_id ASC) AS arank
       |  FROM capprox),
       |minc AS (
       |  SELECT b.qid, b.vec_id, CAST((c.arank + 4) // 5 AS INT) AS min_cm
       |  FROM cbtop b LEFT JOIN caranked c
       |    ON c.qid = b.qid AND c.vec_id = b.vec_id),
       |ladder2 AS (SELECT CAST(t.x AS INT) AS cand_mult FROM range(1, 65) t(x)),
       |tot2 AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM minc),
       |sweep2 AS (
       |  SELECT l.cand_mult, CAST(count(m.vec_id) AS BIGINT) AS n_hits
       |  FROM ladder2 l LEFT JOIN minc m ON m.min_cm <= l.cand_mult
       |  GROUP BY l.cand_mult),
       |curve2 AS (
       |  SELECT s.cand_mult, s.n_hits, t.n_truth,
       |         round(CAST(s.n_hits AS DOUBLE) / t.n_truth, 4) AS recall
       |  FROM sweep2 s, tot2 t),
       |chosen2 AS (
       |  SELECT coalesce(
       |           min(CASE WHEN recall >= CAST(0.9 AS DOUBLE)
       |               THEN cand_mult END),
       |           64) AS c FROM curve2)""".stripMargin

  private val ivfPqCandSweepSql: String =
    s"""WITH ${ivfPqTrainCtes(_ => "TRUE")},
       |$ivfCalibCtes,
       |$ivfPqCalib2Ctes
       |SELECT c.cand_mult, c.n_hits, c.n_truth, c.recall,
       |       (c.cand_mult = ch.c) AS chosen,
       |       (SELECT p FROM chosen) AS nprobe
       |FROM curve2 c, chosen2 ch ORDER BY c.cand_mult""".stripMargin

  private val ivfPqAdaptiveSql: String =
    s"""WITH ${ivfPqTrainCtes(_ => "TRUE")},
       |$ivfCalibCtes,
       |$ivfPqCalib2Ctes,
       |${ivfPqServeCtes("WHERE vec_id % 50 = 0", "(SELECT p FROM chosen)",
          "5 * (SELECT c FROM chosen2)")}
       |SELECT qid, CAST(rn AS INT) AS rank, vec_id, cos, cos_pq,
       |       (SELECT p FROM chosen) AS nprobe,
       |       (SELECT c FROM chosen2) AS cand_mult
       |FROM ranked WHERE rn <= 5
       |ORDER BY qid, rank""".stripMargin

  private val ivfPqAdaptiveRecallSql: String =
    s"""WITH ${ivfPqTrainCtes(_ => "TRUE")},
       |$ivfCalibCtes,
       |$ivfPqCalib2Ctes,
       |${ivfPqServeCtes("WHERE vec_id % 50 = 0", "(SELECT p FROM chosen)",
          "5 * (SELECT c FROM chosen2)")},
       |stop AS (SELECT qid, vec_id FROM ranked WHERE rn <= 5),
       |sbscored AS (
       |  SELECT q.qid, e.vec_id,
       |         round(${cos("q.qe", "e.embedding")}, 6) AS cos
       |  FROM q JOIN embeddings e ON e.vec_id <> q.qid),
       |sbtop AS (
       |  SELECT qid, vec_id FROM (
       |    SELECT qid, vec_id,
       |           row_number() OVER (PARTITION BY qid
       |                              ORDER BY cos DESC, vec_id ASC) AS rn
       |    FROM sbscored) WHERE rn <= 5)
       |SELECT (SELECT p FROM chosen) AS nprobe,
       |       (SELECT c FROM chosen2) AS cand_mult,
       |       CAST(count(*) AS BIGINT) AS n_truth,
       |       CAST(count(s.vec_id) AS BIGINT) AS n_hits,
       |       round(CAST(count(s.vec_id) AS DOUBLE) / count(*), 4) AS recall,
       |       (round(CAST(count(s.vec_id) AS DOUBLE) / count(*), 4)
       |        >= CAST(0.9 AS DOUBLE)) AS floor_met
       |FROM sbtop b LEFT JOIN stop s
       |  ON s.qid = b.qid AND s.vec_id = b.vec_id""".stripMargin

  private[queries] val ivfPqSql: String =
    s"""WITH $ivfPqChain
       |SELECT qid, CAST(rn AS INT) AS rank, vec_id, cos, cos_pq
       |FROM ranked WHERE rn <= 5
       |ORDER BY qid, rank""".stripMargin

  /** The frozen-artifact append replay: coarse centroids AND residual
    * codebooks trained on the BASE split only, every vector encoded
    * against them, probe/scan/re-rank unchanged. */
  private[queries] val ivfPqAppendSql: String =
    s"""WITH ${ivfPqChainFor(t => s"$t.vec_id % 7 <> 0")}
       |SELECT qid, CAST(rn AS INT) AS rank, vec_id, cos, cos_pq
       |FROM ranked WHERE rn <= 5
       |ORDER BY qid, rank""".stripMargin

  // recall@5 of the composed index vs brute force: the chain's ranked
  // set against a brute top-5 leg sharing the chain's q CTE
  private[queries] val ivfPqRecallSql: String =
    s"""WITH $ivfPqChain,
       |itop AS (SELECT qid, vec_id FROM ranked WHERE rn <= 5),
       |bscored AS (
       |  SELECT q.qid, e.vec_id,
       |         round(${cos("q.qe", "e.embedding")}, 6) AS bcos
       |  FROM q JOIN embeddings e ON e.vec_id <> q.qid),
       |branked AS (
       |  SELECT qid, vec_id,
       |         row_number() OVER (PARTITION BY qid
       |                            ORDER BY bcos DESC, vec_id ASC) AS rn
       |  FROM bscored),
       |btop AS (SELECT qid, vec_id FROM branked WHERE rn <= 5)
       |SELECT b.qid, CAST(count(l.vec_id) AS INT) AS n_hits,
       |       round(CAST(count(l.vec_id) AS DOUBLE) / 5.0, 4) AS recall_at_5
       |FROM btop b LEFT JOIN itop l USING (qid, vec_id)
       |GROUP BY b.qid
       |ORDER BY b.qid""".stripMargin

  val entries: Seq[Q] = Seq(
    Q.sql("ann_recall_report", annRecallReport,
      s"""WITH q AS (
         |  SELECT vec_id AS qid, embedding AS qe FROM embeddings
         |  WHERE vec_id % 50 = 0),
         |bscored AS (
         |  SELECT q.qid, e.vec_id,
         |         round(${cos("q.qe", "e.embedding")}, 6) AS cos
         |  FROM q JOIN embeddings e ON e.vec_id <> q.qid),
         |branked AS (
         |  SELECT qid, vec_id,
         |         row_number() OVER (PARTITION BY qid
         |                            ORDER BY cos DESC, vec_id ASC) AS rn
         |  FROM bscored),
         |btop AS (SELECT qid, vec_id FROM branked WHERE rn <= 5),
         |bitsums AS (
         |  SELECT v.vec_id, t.b AS b,
         |    list_sum(list_transform(range(1, 65),
         |      i -> CAST(v.embedding[i] AS DOUBLE) *
         |           (CASE WHEN substr(md5('graft-hp-' || t.b || '-' || ((i-1) // 32)),
         |                             CAST((i-1) % 32 + 1 AS INT), 1) >= '8'
         |                 THEN 1.0 ELSE -1.0 END))) AS s
         |  FROM embeddings v, range(0, 8) t(b)),
         |buckets AS (
         |  SELECT vec_id,
         |         CAST(sum(CASE WHEN s > 0 THEN 1 << b ELSE 0 END) AS INT) AS bucket
         |  FROM bitsums
         |  GROUP BY vec_id),
         |qb AS (
         |  SELECT q.qid, q.qe, b.bucket AS qbucket
         |  FROM q JOIN buckets b ON b.vec_id = q.qid),
         |lcand AS (
         |  SELECT qb.qid, e.vec_id,
         |         round(${cos("qb.qe", "e.embedding")}, 6) AS cos
         |  FROM qb
         |  JOIN buckets vb
         |    ON vb.vec_id <> qb.qid
         |   AND bit_count(CAST(xor(vb.bucket, qb.qbucket) AS BIGINT)) <= 2
         |  JOIN embeddings e ON e.vec_id = vb.vec_id),
         |lranked AS (
         |  SELECT qid, vec_id,
         |         row_number() OVER (PARTITION BY qid
         |                            ORDER BY cos DESC, vec_id ASC) AS rn
         |  FROM lcand),
         |ltop AS (SELECT qid, vec_id FROM lranked WHERE rn <= 5)
         |SELECT b.qid, CAST(count(l.vec_id) AS INT) AS n_hits,
         |       round(CAST(count(l.vec_id) AS DOUBLE) / 5.0, 4) AS recall_at_5
         |FROM btop b LEFT JOIN ltop l USING (qid, vec_id)
         |GROUP BY b.qid
         |ORDER BY b.qid""".stripMargin),

    Q.sql("ann_ivf_recall_report", annIvfRecallReport,
      s"""WITH q AS (
         |  SELECT vec_id AS qid, embedding AS qe FROM embeddings
         |  WHERE vec_id % 50 = 0),
         |bscored AS (
         |  SELECT q.qid, e.vec_id,
         |         round(${cos("q.qe", "e.embedding")}, 6) AS cos
         |  FROM q JOIN embeddings e ON e.vec_id <> q.qid),
         |branked AS (
         |  SELECT qid, vec_id,
         |         row_number() OVER (PARTITION BY qid
         |                            ORDER BY cos DESC, vec_id ASC) AS rn
         |  FROM bscored),
         |btop AS (SELECT qid, vec_id FROM branked WHERE rn <= 5),
         |cent AS (
         |  SELECT cell, list(c ORDER BY d) AS centroid FROM (
         |    SELECT CAST(label AS INT) AS cell, t.d AS d,
         |           round(sum(CAST(embedding[t.d] AS DOUBLE)) / count(*), 4) AS c
         |    FROM embeddings, range(1, 65) t(d)
         |    GROUP BY cell, t.d)
         |  GROUP BY cell),
         |psim AS (
         |  SELECT q.qid, c.cell,
         |    round(
         |      list_sum(list_transform(range(1, 65),
         |        i -> CAST(q.qe[i] AS DOUBLE) * c.centroid[i]))
         |      / (sqrt(list_sum(list_transform(range(1, 65),
         |           i -> CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))))
         |         * sqrt(list_sum(list_transform(range(1, 65),
         |             i -> c.centroid[i] * c.centroid[i])))), 6) AS sim
         |  FROM q, cent c),
         |probes AS (
         |  SELECT qid, cell FROM (
         |    SELECT qid, cell,
         |           row_number() OVER (PARTITION BY qid
         |                              ORDER BY sim DESC, cell ASC) AS rn
         |    FROM psim) WHERE rn <= 3),
         |icand AS (
         |  SELECT p.qid, e.vec_id,
         |         round(${cos("q.qe", "e.embedding")}, 6) AS cos
         |  FROM probes p
         |  JOIN embeddings e ON CAST(e.label AS INT) = p.cell
         |  JOIN q ON q.qid = p.qid
         |  WHERE e.vec_id <> p.qid),
         |iranked AS (
         |  SELECT qid, vec_id,
         |         row_number() OVER (PARTITION BY qid
         |                            ORDER BY cos DESC, vec_id ASC) AS rn
         |  FROM icand),
         |itop AS (SELECT qid, vec_id FROM iranked WHERE rn <= 5)
         |SELECT b.qid, CAST(count(l.vec_id) AS INT) AS n_hits,
         |       round(CAST(count(l.vec_id) AS DOUBLE) / 5.0, 4) AS recall_at_5
         |FROM btop b LEFT JOIN itop l USING (qid, vec_id)
         |GROUP BY b.qid
         |ORDER BY b.qid""".stripMargin),

    Q.sql("ann_cell_stats", annCellStats, cellStatsSql),
    Q.sql("ann_label_centroids", annLabelCentroids,
      """WITH q AS (SELECT label, u.i AS d,
        |             CAST(floor(CAST(embedding[u.i] AS DOUBLE) * 1000000.0)
        |                  AS BIGINT) AS qv
        |           FROM embeddings,
        |                unnest(range(1, len(embedding) + 1)) AS u(i)),
        |ls AS (SELECT label, d, CAST(sum(qv) AS BIGINT) AS cs
        |       FROM q GROUP BY 1, 2),
        |gs AS (SELECT d, CAST(sum(qv) AS BIGINT) AS cg FROM q GROUP BY 1),
        |j AS (SELECT ls.label, ls.d,
        |        CAST(ls.cs AS DOUBLE) AS cs, CAST(gs.cg AS DOUBLE) AS cg
        |      FROM ls JOIN gs USING (d)),
        |a AS (SELECT label,
        |        list_sum(list(cs * cg ORDER BY d)) AS dot,
        |        list_sum(list(cs * cs ORDER BY d)) AS na,
        |        list_sum(list(cg * cg ORDER BY d)) AS ng
        |      FROM j GROUP BY label),
        |n AS (SELECT label, CAST(count(*) AS BIGINT) AS n_vecs
        |      FROM embeddings GROUP BY label)
        |SELECT n.label, n.n_vecs,
        |       round(a.dot / (sqrt(a.na) * sqrt(a.ng)), 6) AS cos_to_global
        |FROM n JOIN a USING (label)
        |ORDER BY label""".stripMargin),
    Q.sql("ann_brute_topk", annBruteTopK,
      s"""WITH q AS (
         |  SELECT vec_id AS qid, embedding AS qe FROM embeddings
         |  WHERE vec_id % 50 = 0),
         |scored AS (
         |  SELECT q.qid, e.vec_id,
         |         round(${cos("q.qe", "e.embedding")}, 6) AS cos
         |  FROM q JOIN embeddings e ON e.vec_id <> q.qid),
         |ranked AS (
         |  SELECT qid, vec_id, cos,
         |         row_number() OVER (PARTITION BY qid
         |                            ORDER BY cos DESC, vec_id ASC) AS rn
         |  FROM scored)
         |SELECT qid, CAST(rn AS INT) AS rank, vec_id, cos
         |FROM ranked WHERE rn <= 5
         |ORDER BY qid, rank""".stripMargin),

    // brute top-15 minus the brute-force jaccard>=0.8 pair set (the
    // dedup_minhash contract), re-ranked by original cosine rank
    Q.sql("ann_hard_negatives", annHardNegatives,
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS s
         |             FROM documents),
         |sh AS (SELECT doc_id,
         |         list_distinct(list_transform(range(1, len(s) - 1),
         |           i -> s[i] || ' ' || s[i+1] || ' ' || s[i+2])) AS g
         |       FROM toks),
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
         |        / len(list_distinct(list_concat(a.g, b.g))) >= 0.8),
         |sym AS (SELECT doc_a AS qid, doc_b AS vid FROM pairs
         |        UNION ALL SELECT doc_b, doc_a FROM pairs),
         |q AS (
         |  SELECT vec_id AS qid, embedding AS qe FROM embeddings
         |  WHERE vec_id % 50 = 0),
         |scored AS (
         |  SELECT q.qid, e.vec_id,
         |         round(${cos("q.qe", "e.embedding")}, 6) AS cos
         |  FROM q JOIN embeddings e ON e.vec_id <> q.qid),
         |ranked AS (
         |  SELECT qid, vec_id, cos,
         |         row_number() OVER (PARTITION BY qid
         |                            ORDER BY cos DESC, vec_id ASC) AS rn
         |  FROM scored),
         |kept AS (
         |  SELECT r.qid, r.vec_id, r.cos, r.rn FROM ranked r
         |  WHERE r.rn <= 15 AND NOT EXISTS (
         |    SELECT 1 FROM sym s
         |    WHERE s.qid = r.qid AND s.vid = r.vec_id)),
         |rr AS (
         |  SELECT qid, vec_id, cos,
         |         row_number() OVER (PARTITION BY qid ORDER BY rn) AS rank
         |  FROM kept)
         |SELECT qid, CAST(rank AS INT) AS rank, vec_id, cos
         |FROM rr WHERE rank <= 10
         |ORDER BY qid, rank""".stripMargin),

    Q.sql("ann_lsh_topk", annLshTopK, lshTopkSql),

    // build→persist(bucket-partitioned parquet + one-row geometry)→
    // load→serve: bit-exact vs the inline path, so it shares
    // ann_lsh_topk's oracle
    Q.sql("ann_lsh_index_roundtrip", annLshIndexRoundtrip, lshTopkSql),
    // stateless quantizer: incremental build ≡ full build, same oracle
    Q.sql("ann_lsh_append", annLshAppend, lshTopkSql),
    // shard-parallel build: stateless geometry => merge bit-identical
    // to a full build, same oracle
    Q.sql("ann_lsh_shard_merge", annLshShardMerge, lshTopkSql),
    // takedown on the bucket table: generic tombstone mask, stateless
    // geometry — oracle = standard serve minus the deleted candidates
    Q.sql("ann_lsh_delete", annLshDelete, lshDeleteSql),

    // Centroids: per-cell per-dimension mean rounded to 4dp (the kernel
    // rounds identically, making training order-independent); probes:
    // top-3 cells by rounded cosine, cell-asc tie-break.
    Q.sql("ann_ivf_topk", annIvfTopK, ivfTopkSql),

    // build→persist(parquet, cell-partitioned)→load→serve: bit-exact
    // vs the inline index, so it shares ann_ivf_topk's oracle
    Q.sql("ann_index_roundtrip", annIndexRoundtrip, ivfTopkSql),

    // incremental lifecycle: base-trained centroids + frozen-centroid
    // increment assignment, served from the merged cells
    Q.sql("ann_ivf_append", annIvfAppend, ivfAppendSql),

    // layout-debt maintenance advisor (the retrain card's physical
    // twin): segment counts from the op sequence, row counts from the
    // corpus, tombstone debt from the takedown set; card -> compact ->
    // quiet re-run
    Q.sql("ann_index_health", annIndexHealth,
      """WITH m AS (SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM embeddings
        |   WHERE vec_id % 17 = 3) AS masked,
        |  (SELECT CAST(count(*) AS BIGINT) FROM embeddings) AS total,
        |  (SELECT CAST(count(DISTINCT label) AS BIGINT) FROM embeddings
        |   WHERE vec_id % 3 = 0) AS ncells)
        |SELECT * FROM (
        |  SELECT 'pre' AS phase, 'cells' AS tbl, CAST(3 AS INT) AS segments,
        |         m.total AS n_rows, m.masked AS masked_vecs,
        |         m.total - m.masked AS live_vecs,
        |         TRUE AS compact_recommended FROM m
        |  UNION ALL SELECT 'pre', 'centroids', 1, m.ncells, m.masked,
        |         m.total - m.masked, TRUE FROM m
        |  UNION ALL SELECT 'pre', 'tombstones', 1, m.masked, m.masked,
        |         m.total - m.masked, TRUE FROM m
        |  UNION ALL SELECT 'post', 'cells', 1, m.total - m.masked,
        |         CAST(0 AS BIGINT), m.total - m.masked, FALSE FROM m
        |  UNION ALL SELECT 'post', 'centroids', 1, m.ncells,
        |         CAST(0 AS BIGINT), m.total - m.masked, FALSE FROM m)
        |ORDER BY phase DESC, tbl""".stripMargin),

    // the recommended rebuild executed: retrained-on-everything card
    // (full-corpus training; occupancy over label cells; recall at the
    // serving budget vs brute truth)
    Q.sql("ann_retrain_rebuild", annRetrainRebuild,
      s"""WITH q AS (
         |  SELECT vec_id AS qid, embedding AS qe FROM embeddings
         |  WHERE vec_id % 50 = 0),
         |bscored AS (
         |  SELECT q.qid, e.vec_id,
         |         round(${cos("q.qe", "e.embedding")}, 6) AS cos
         |  FROM q JOIN embeddings e ON e.vec_id <> q.qid),
         |branked AS (
         |  SELECT qid, vec_id,
         |         row_number() OVER (PARTITION BY qid
         |                            ORDER BY cos DESC, vec_id ASC) AS rn
         |  FROM bscored),
         |btop AS (SELECT qid, vec_id FROM branked WHERE rn <= 5),
         |$ivfCentCte,
         |cells AS (
         |  SELECT CAST(label AS INT) AS cell, vec_id, embedding
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |occ AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_cells,
         |         CAST(sum(n) AS BIGINT) AS total, max(n) AS max_n
         |  FROM (SELECT cell, CAST(count(*) AS BIGINT) AS n
         |        FROM cells GROUP BY cell)),
         |psim AS (
         |  SELECT q.qid, c.cell,
         |    round(
         |      list_sum(list_transform(range(1, 65),
         |        i -> CAST(q.qe[i] AS DOUBLE) * c.centroid[i]))
         |      / (sqrt(list_sum(list_transform(range(1, 65),
         |           i -> CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))))
         |         * sqrt(list_sum(list_transform(range(1, 65),
         |             i -> c.centroid[i] * c.centroid[i])))), 6) AS sim
         |  FROM q, cent c),
         |probes AS (
         |  SELECT qid, cell FROM (
         |    SELECT qid, cell,
         |           row_number() OVER (PARTITION BY qid
         |                              ORDER BY sim DESC, cell ASC) AS rn
         |    FROM psim) WHERE rn <= 3),
         |icand AS (
         |  SELECT p.qid, c.vec_id,
         |         round(${cos("q.qe", "c.embedding")}, 6) AS cos
         |  FROM probes p
         |  JOIN cells c ON c.cell = p.cell
         |  JOIN q ON q.qid = p.qid
         |  WHERE c.vec_id <> p.qid),
         |iranked AS (
         |  SELECT qid, vec_id,
         |         row_number() OVER (PARTITION BY qid
         |                            ORDER BY cos DESC, vec_id ASC) AS rn
         |  FROM icand),
         |itop AS (SELECT qid, vec_id FROM iranked WHERE rn <= 5),
         |nq AS (SELECT CAST(count(*) AS BIGINT) AS n_q FROM q),
         |hit AS (SELECT CAST(count(*) AS BIGINT) AS n_hit
         |        FROM btop JOIN itop USING (qid, vec_id))
         |SELECT occ.n_cells, occ.total, occ.max_n,
         |  round(CAST(occ.max_n AS DOUBLE) * occ.n_cells / occ.total, 6)
         |    AS skew,
         |  round(CAST(hit.n_hit AS DOUBLE) / (nq.n_q * 5.0), 4)
         |    AS recall_at_k,
         |  (round(CAST(occ.max_n AS DOUBLE) * occ.n_cells / occ.total, 6)
         |     > 1.5
         |   OR round(CAST(hit.n_hit AS DOUBLE) / (nq.n_q * 5.0), 4) < 0.9)
         |    AS rebuild_recommended
         |FROM occ, nq, hit""".stripMargin),

    // vector-side time travel: gen-1 (base-only) serve replayed with
    // training AND candidates restricted to the base docs
    Q.sql("ann_ivf_time_travel", annIvfTimeTravel,
      s"""WITH ${ivfCentCteFor("WHERE vec_id % 7 <> 0")},
         |${ivfServeCtes("WHERE vec_id % 50 = 0", "3",
             "e.vec_id % 7 <> 0")}
         |SELECT qid, CAST(rn AS INT) AS rank, vec_id, cos
         |FROM ranked WHERE rn <= 5
         |ORDER BY qid, rank""".stripMargin),

    // rebuild decision on the drifted (base + frozen-assignment
    // append) index: occupancy skew + recall@5 at the serving budget
    // vs brute truth, flag = skew > 1.5 OR recall < 0.9
    Q.sql("ann_retrain_card", annRetrainCard,
      s"""WITH q AS (
         |  SELECT vec_id AS qid, embedding AS qe FROM embeddings
         |  WHERE vec_id % 50 = 0),
         |bscored AS (
         |  SELECT q.qid, e.vec_id,
         |         round(${cos("q.qe", "e.embedding")}, 6) AS cos
         |  FROM q JOIN embeddings e ON e.vec_id <> q.qid),
         |branked AS (
         |  SELECT qid, vec_id,
         |         row_number() OVER (PARTITION BY qid
         |                            ORDER BY cos DESC, vec_id ASC) AS rn
         |  FROM bscored),
         |btop AS (SELECT qid, vec_id FROM branked WHERE rn <= 5),
         |cent AS (
         |  SELECT cell, list(c ORDER BY d) AS centroid FROM (
         |    SELECT CAST(label AS INT) AS cell, t.d AS d,
         |           round(sum(CAST(embedding[t.d] AS DOUBLE)) / count(*), 4) AS c
         |    FROM embeddings, range(1, 65) t(d)
         |    WHERE vec_id % 7 <> 0
         |    GROUP BY cell, t.d)
         |  GROUP BY cell),
         |inc AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 7 = 0),
         |isim AS (
         |  SELECT i.vec_id, c.cell,
         |    round(
         |      list_sum(list_transform(range(1, 65),
         |        x -> CAST(i.embedding[x] AS DOUBLE) * c.centroid[x]))
         |      / (sqrt(list_sum(list_transform(range(1, 65),
         |           x -> CAST(i.embedding[x] AS DOUBLE)
         |                * CAST(i.embedding[x] AS DOUBLE))))
         |         * sqrt(list_sum(list_transform(range(1, 65),
         |             x -> c.centroid[x] * c.centroid[x])))), 6) AS sim
         |  FROM inc i, cent c
         |  WHERE list_sum(list_transform(range(1, 65),
         |          x -> CAST(i.embedding[x] AS DOUBLE)
         |               * CAST(i.embedding[x] AS DOUBLE))) > 0),
         |iassign AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT vec_id, cell,
         |           row_number() OVER (PARTITION BY vec_id
         |                              ORDER BY sim DESC, cell ASC) AS rn
         |    FROM isim) WHERE rn = 1),
         |cells AS (
         |  SELECT CAST(label AS INT) AS cell, vec_id, embedding
         |  FROM embeddings
         |  WHERE vec_id % 7 <> 0 AND embedding IS NOT NULL
         |  UNION ALL
         |  SELECT a.cell, i.vec_id, i.embedding
         |  FROM inc i JOIN iassign a USING (vec_id)),
         |occ AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_cells,
         |         CAST(sum(n) AS BIGINT) AS total, max(n) AS max_n
         |  FROM (SELECT cell, CAST(count(*) AS BIGINT) AS n
         |        FROM cells GROUP BY cell)),
         |psim AS (
         |  SELECT q.qid, c.cell,
         |    round(
         |      list_sum(list_transform(range(1, 65),
         |        i -> CAST(q.qe[i] AS DOUBLE) * c.centroid[i]))
         |      / (sqrt(list_sum(list_transform(range(1, 65),
         |           i -> CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))))
         |         * sqrt(list_sum(list_transform(range(1, 65),
         |             i -> c.centroid[i] * c.centroid[i])))), 6) AS sim
         |  FROM q, cent c),
         |probes AS (
         |  SELECT qid, cell FROM (
         |    SELECT qid, cell,
         |           row_number() OVER (PARTITION BY qid
         |                              ORDER BY sim DESC, cell ASC) AS rn
         |    FROM psim) WHERE rn <= 3),
         |icand AS (
         |  SELECT p.qid, c.vec_id,
         |         round(${cos("q.qe", "c.embedding")}, 6) AS cos
         |  FROM probes p
         |  JOIN cells c ON c.cell = p.cell
         |  JOIN q ON q.qid = p.qid
         |  WHERE c.vec_id <> p.qid),
         |iranked AS (
         |  SELECT qid, vec_id,
         |         row_number() OVER (PARTITION BY qid
         |                            ORDER BY cos DESC, vec_id ASC) AS rn
         |  FROM icand),
         |itop AS (SELECT qid, vec_id FROM iranked WHERE rn <= 5),
         |nq AS (SELECT CAST(count(*) AS BIGINT) AS n_q FROM q),
         |hit AS (SELECT CAST(count(*) AS BIGINT) AS n_hit
         |        FROM btop JOIN itop USING (qid, vec_id))
         |SELECT occ.n_cells, occ.total, occ.max_n,
         |  round(CAST(occ.max_n AS DOUBLE) * occ.n_cells / occ.total, 6)
         |    AS skew,
         |  round(CAST(hit.n_hit AS DOUBLE) / (nq.n_q * 5.0), 4)
         |    AS recall_at_k,
         |  (round(CAST(occ.max_n AS DOUBLE) * occ.n_cells / occ.total, 6)
         |     > 1.5
         |   OR round(CAST(hit.n_hit AS DOUBLE) / (nq.n_q * 5.0), 4) < 0.9)
         |    AS rebuild_recommended
         |FROM occ, nq, hit""".stripMargin),
    // takedown: frozen centroids, deleted vectors excluded from
    // candidates; compaction materializes the mask, same oracle
    Q.sql("ann_ivf_delete", annIvfDelete, ivfDeleteSql),
    Q.sql("ann_ivf_delete_compact", annIvfDeleteCompact, ivfDeleteSql),
    // distributed-copy promotion over the cell-partitioned layout;
    // the takedown travels with the bytes
    Q.sql("ann_ivf_clone_serve", annIvfCloneServe, ivfDeleteSql),
    // per-query live vs physical probed-cell occupancy — the vector
    // leg's takedown read-amplification (cand/ranked CTEs from the
    // shared serve chain go unreferenced and are pruned by the engine)
    Q.sql("ann_serve_cost_card", annServeCostCard,
      s"""WITH $ivfCentCte,
         |${ivfServeCtes("WHERE vec_id % 50 = 0", "3")},
         |occp AS (SELECT CAST(label AS INT) AS cell,
         |                CAST(count(*) AS BIGINT) AS phys
         |         FROM embeddings GROUP BY 1),
         |occl AS (SELECT CAST(label AS INT) AS cell,
         |                CAST(count(*) AS BIGINT) AS live
         |         FROM embeddings WHERE vec_id % 5 <> 2 GROUP BY 1)
         |SELECT p.qid, CAST(count(*) AS BIGINT) AS n_probes,
         |       CAST(sum(coalesce(l.live, 0)) AS BIGINT)
         |         AS live_candidates,
         |       CAST(sum(coalesce(o.phys, 0)) AS BIGINT)
         |         AS physical_candidates
         |FROM probes p
         |LEFT JOIN occp o USING (cell)
         |LEFT JOIN occl l USING (cell)
         |GROUP BY p.qid
         |ORDER BY p.qid""".stripMargin),

    // what changed between two retained vector snapshots
    Q.sql("ann_index_diff", annIndexDiff,
      """SELECT * FROM (
        |  SELECT 'added' AS status, CAST(vec_id AS BIGINT) AS vec_id
        |  FROM embeddings WHERE vec_id % 3 <> 0 AND vec_id % 17 <> 3
        |  UNION ALL
        |  SELECT 'removed', CAST(vec_id AS BIGINT)
        |  FROM embeddings WHERE vec_id % 3 = 0 AND vec_id % 17 = 3)
        |ORDER BY status, vec_id""".stripMargin),
    // recount-vs-maintained invariants for the vector index after a
    // maintenance window — the keyword fsck's twin; the oracle
    // recomputes the expected values from the op sequence
    Q.sql("ann_index_fsck", annIndexFsck,
      s"""WITH v AS (SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM embeddings) AS total,
        |  (SELECT CAST(count(*) AS BIGINT) FROM embeddings
        |   WHERE vec_id % 17 <> 3) AS live)
        |SELECT * FROM (
        |  SELECT 'append_assignment_mismatches' AS invariant,
        |         CAST(0 AS BIGINT) AS expected,
        |         CAST(0 AS BIGINT) AS actual, TRUE AS ok
        |  UNION ALL SELECT 'cells_without_centroid', CAST(0 AS BIGINT),
        |         CAST(0 AS BIGINT), TRUE
        |  UNION ALL SELECT 'centroid_duplicate_cells', CAST(0 AS BIGINT),
        |         CAST(0 AS BIGINT), TRUE
        |  UNION ALL SELECT 'duplicate_vec_rows', CAST(0 AS BIGINT),
        |         CAST(0 AS BIGINT), TRUE
        |  UNION ALL SELECT 'live_vecs', live, live, TRUE FROM v
        |  UNION ALL SELECT 'tombstones_orphaned', CAST(0 AS BIGINT),
        |         CAST(0 AS BIGINT), TRUE
        |  UNION ALL SELECT 'zero_norm_rows', CAST(0 AS BIGINT),
        |         CAST(0 AS BIGINT), TRUE
        |${Q.fsckRotRows})
        |ORDER BY invariant""".stripMargin),
    // the whole hybrid deployment's capacity console: both members'
    // per-query live vs physical candidate volume at the pinned
    // collection generations, under one member column (cand/ranked
    // CTEs from the shared serve chain go unreferenced and are pruned)
    Q.sql("collection_serve_cost_card", collectionServeCostCard,
      s"""WITH $ivfCentCte,
         |${ivfServeCtes("WHERE vec_id % 50 = 0", "3")},
         |occp AS (SELECT CAST(label AS INT) AS cell,
         |                CAST(count(*) AS BIGINT) AS phys
         |         FROM embeddings GROUP BY 1),
         |occl AS (SELECT CAST(label AS INT) AS cell,
         |                CAST(count(*) AS BIGINT) AS live
         |         FROM embeddings WHERE vec_id % 5 <> 2 GROUP BY 1),
         |ivfcard AS (
         |  SELECT CAST(p.qid AS VARCHAR) AS qid,
         |         CAST(count(*) AS BIGINT) AS n_units,
         |         CAST(sum(coalesce(l.live, 0)) AS BIGINT)
         |           AS live_candidates,
         |         CAST(sum(coalesce(o.phys, 0)) AS BIGINT)
         |           AS physical_candidates
         |  FROM probes p
         |  LEFT JOIN occp o USING (cell)
         |  LEFT JOIN occl l USING (cell)
         |  GROUP BY p.qid),
         |t AS (SELECT doc_id, string_split(text, ' ') AS s
         |      FROM documents),
         |tpairs AS (SELECT DISTINCT doc_id, u.term AS term
         |           FROM t, unnest(s) AS u(term)),
         |tq(qid, term) AS (VALUES
         |  ('q1', 'table'), ('q2', 'fast'), ('q2', 'scan'),
         |  ('q3', 'window'), ('q3', 'group'), ('q3', 'value')),
         |tper AS (SELECT tq.qid, tq.term,
         |  (SELECT count(*) FROM tpairs p
         |   WHERE p.term = tq.term AND p.doc_id % 5 <> 2) AS live,
         |  (SELECT count(*) FROM tpairs p WHERE p.term = tq.term)
         |    AS phys
         |  FROM tq),
         |bmcard AS (
         |  SELECT qid, CAST(count(*) AS BIGINT) AS n_units,
         |         CAST(sum(live) AS BIGINT) AS live_candidates,
         |         CAST(sum(phys) AS BIGINT) AS physical_candidates
         |  FROM tper GROUP BY qid)
         |SELECT * FROM (
         |  SELECT 'bm25' AS member, * FROM bmcard
         |  UNION ALL
         |  SELECT 'ivf', * FROM ivfcard)
         |ORDER BY member, qid""".stripMargin),
    // the stateless-quantizer recount: every bucket and norm
    // re-derived from the stored embeddings + seed geometry
    Q.sql("ann_lsh_fsck", annLshFsck,
      s"""WITH v AS (SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM embeddings
        |   WHERE vec_id % 17 <> 3) AS live)
        |SELECT * FROM (
        |  SELECT 'bucket_mismatches' AS invariant,
        |         CAST(0 AS BIGINT) AS expected,
        |         CAST(0 AS BIGINT) AS actual, TRUE AS ok
        |  UNION ALL SELECT 'duplicate_vec_rows', CAST(0 AS BIGINT),
        |         CAST(0 AS BIGINT), TRUE
        |  UNION ALL SELECT 'live_vecs', live, live, TRUE FROM v
        |  UNION ALL SELECT 'norm_mismatches', CAST(0 AS BIGINT),
        |         CAST(0 AS BIGINT), TRUE
        |  UNION ALL SELECT 'tombstones_orphaned', CAST(0 AS BIGINT),
        |         CAST(0 AS BIGINT), TRUE
        |  UNION ALL SELECT 'zero_norm_rows', CAST(0 AS BIGINT),
        |         CAST(0 AS BIGINT), TRUE
        |${Q.fsckRotRows})
        |ORDER BY invariant""".stripMargin),
    // the prefix family's geometry contract + mask algebra
    Q.sql("ann_mrl_fsck", annMrlFsck,
      s"""WITH v AS (SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM embeddings
        |   WHERE vec_id % 17 <> 3) AS live)
        |SELECT * FROM (
        |  SELECT 'duplicate_vec_rows' AS invariant,
        |         CAST(0 AS BIGINT) AS expected,
        |         CAST(0 AS BIGINT) AS actual, TRUE AS ok
        |  UNION ALL SELECT 'live_vecs', live, live, TRUE FROM v
        |  UNION ALL SELECT 'prefix_width_violations', CAST(0 AS BIGINT),
        |         CAST(0 AS BIGINT), TRUE
        |  UNION ALL SELECT 'tombstones_orphaned', CAST(0 AS BIGINT),
        |         CAST(0 AS BIGINT), TRUE
        |${Q.fsckRotRows})
        |ORDER BY invariant""".stripMargin),
    // the quantized leg's structural fsck: codes-table, codebook and
    // tombstone algebra vs the maintained meta, recounted from disk
    Q.sql("ann_ivfpq_fsck", annIvfPqFsck,
      s"""WITH v AS (SELECT
        |  (SELECT CAST(count(*) AS BIGINT) FROM embeddings
        |   WHERE vec_id % 17 <> 3) AS live)
        |SELECT * FROM (
        |  SELECT 'cells_without_centroid' AS invariant,
        |         CAST(0 AS BIGINT) AS expected,
        |         CAST(0 AS BIGINT) AS actual, TRUE AS ok
        |  UNION ALL SELECT 'code_range_violations', CAST(0 AS BIGINT),
        |         CAST(0 AS BIGINT), TRUE
        |  UNION ALL SELECT 'code_width_violations', CAST(0 AS BIGINT),
        |         CAST(0 AS BIGINT), TRUE
        |  UNION ALL SELECT 'codebook_duplicate_entries',
        |         CAST(0 AS BIGINT), CAST(0 AS BIGINT), TRUE
        |  UNION ALL SELECT 'codebook_subspaces', CAST(8 AS BIGINT),
        |         CAST(8 AS BIGINT), TRUE
        |  UNION ALL SELECT 'duplicate_vec_rows', CAST(0 AS BIGINT),
        |         CAST(0 AS BIGINT), TRUE
        |  UNION ALL SELECT 'live_vecs', live, live, TRUE FROM v
        |  UNION ALL SELECT 'tombstones_orphaned', CAST(0 AS BIGINT),
        |         CAST(0 AS BIGINT), TRUE
        |${Q.fsckRotRows})
        |ORDER BY invariant""".stripMargin),
    // compaction is pure reorganization: same rows, same oracle
    Q.sql("ann_ivf_compact", annIvfCompact, ivfAppendSql),

    // the ann_ivf_topk replay with q = EVERY vector and k = 3
    Q.sql("ann_knn_join", annKnnJoin, ivfTopkSqlFor("", k = 3)),

    // sizing rule replayed integer-exact (smallest b with 4^b >= n);
    // cells replayed via the LSH bitsum fragment bounded by a
    // constant range(0,16) + params filter; everything downstream is
    // the standard IVF oracle with (cells, nprobe) from params
    Q.sql("ann_ivf_autoscale", annIvfAutoscale,
      s"""WITH params AS (
         |  SELECT CAST(b.b AS INT) AS bits,
         |         greatest(1, CAST(round(power(2, b.b) * 3.0 / 16) AS INT))
         |           AS nprobe
         |  FROM range(2, 17) b(b)
         |  WHERE power(4, b.b) >= (SELECT count(*) FROM embeddings)
         |  ORDER BY b.b LIMIT 1),
         |bitsums AS (
         |  SELECT v.vec_id, t.b AS b,
         |    list_sum(list_transform(range(1, 65),
         |      i -> CAST(v.embedding[i] AS DOUBLE) *
         |           (CASE WHEN substr(md5('graft-hp-' || t.b || '-' || ((i-1) // 32)),
         |                             CAST((i-1) % 32 + 1 AS INT), 1) >= '8'
         |                 THEN 1.0 ELSE -1.0 END))) AS s
         |  FROM embeddings v, range(0, 16) t(b)
         |  WHERE t.b < (SELECT bits FROM params)),
         |cells AS (
         |  SELECT vec_id,
         |         CAST(sum(CASE WHEN s > 0 THEN 1 << b ELSE 0 END) AS INT) AS cell
         |  FROM bitsums GROUP BY vec_id),
         |cent AS (
         |  SELECT cell, list(c ORDER BY d) AS centroid FROM (
         |    SELECT c.cell AS cell, t.d AS d,
         |           round(sum(CAST(e.embedding[t.d] AS DOUBLE)) / count(*), 4) AS c
         |    FROM embeddings e JOIN cells c ON c.vec_id = e.vec_id,
         |         range(1, 65) t(d)
         |    GROUP BY c.cell, t.d)
         |  GROUP BY cell),
         |q AS (
         |  SELECT vec_id AS qid, embedding AS qe FROM embeddings
         |  WHERE vec_id % 50 = 0),
         |psim AS (
         |  SELECT q.qid, c.cell,
         |    round(
         |      list_sum(list_transform(range(1, 65),
         |        i -> CAST(q.qe[i] AS DOUBLE) * c.centroid[i]))
         |      / (sqrt(list_sum(list_transform(range(1, 65),
         |           i -> CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))))
         |         * sqrt(list_sum(list_transform(range(1, 65),
         |             i -> c.centroid[i] * c.centroid[i])))), 6) AS sim
         |  FROM q, cent c),
         |probes AS (
         |  SELECT qid, cell FROM (
         |    SELECT qid, cell,
         |           row_number() OVER (PARTITION BY qid
         |                              ORDER BY sim DESC, cell ASC) AS rn
         |    FROM psim) WHERE rn <= (SELECT nprobe FROM params)),
         |cand AS (
         |  SELECT p.qid, e.vec_id,
         |         round(${cos("q.qe", "e.embedding")}, 6) AS cos
         |  FROM probes p
         |  JOIN cells c ON c.cell = p.cell
         |  JOIN embeddings e ON e.vec_id = c.vec_id
         |  JOIN q ON q.qid = p.qid
         |  WHERE e.vec_id <> p.qid),
         |ranked AS (
         |  SELECT qid, vec_id, cos,
         |         row_number() OVER (PARTITION BY qid
         |                            ORDER BY cos DESC, vec_id ASC) AS rn
         |  FROM cand)
         |SELECT qid, CAST(rn AS INT) AS rank, vec_id, cos
         |FROM ranked WHERE rn <= 5
         |ORDER BY qid, rank""".stripMargin),

    Q.sql("ann_ivf_refined", annIvfRefined,
      s"""WITH cent AS (
         |  SELECT cell, list(c ORDER BY d) AS centroid FROM (
         |    SELECT CAST(label AS INT) AS cell, t.d AS d,
         |           round(sum(CAST(embedding[t.d] AS DOUBLE)) / count(*), 4) AS c
         |    FROM embeddings, range(1, 65) t(d)
         |    GROUP BY cell, t.d)
         |  GROUP BY cell),
         |asim AS (
         |  SELECT e.vec_id, c.cell,
         |    round(
         |      list_sum(list_transform(range(1, 65),
         |        i -> CAST(e.embedding[i] AS DOUBLE) * c.centroid[i]))
         |      / (sqrt(list_sum(list_transform(range(1, 65),
         |           i -> CAST(e.embedding[i] AS DOUBLE)
         |                * CAST(e.embedding[i] AS DOUBLE))))
         |         * sqrt(list_sum(list_transform(range(1, 65),
         |             i -> c.centroid[i] * c.centroid[i])))), 6) AS sim
         |  FROM embeddings e, cent c),
         |newcell AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT vec_id, cell,
         |           row_number() OVER (PARTITION BY vec_id
         |                              ORDER BY sim DESC, cell ASC) AS rn
         |    FROM asim) WHERE rn = 1),
         |emb2 AS (
         |  SELECT n.cell, e.vec_id, e.embedding
         |  FROM embeddings e JOIN newcell n USING (vec_id)),
         |cent2 AS (
         |  SELECT cell, list(c ORDER BY d) AS centroid FROM (
         |    SELECT cell, t.d AS d,
         |           round(sum(CAST(embedding[t.d] AS DOUBLE)) / count(*), 4) AS c
         |    FROM emb2, range(1, 65) t(d)
         |    GROUP BY cell, t.d)
         |  GROUP BY cell),
         |q AS (
         |  SELECT vec_id AS qid, embedding AS qe FROM embeddings
         |  WHERE vec_id % 50 = 0),
         |psim AS (
         |  SELECT q.qid, c.cell,
         |    round(
         |      list_sum(list_transform(range(1, 65),
         |        i -> CAST(q.qe[i] AS DOUBLE) * c.centroid[i]))
         |      / (sqrt(list_sum(list_transform(range(1, 65),
         |           i -> CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))))
         |         * sqrt(list_sum(list_transform(range(1, 65),
         |             i -> c.centroid[i] * c.centroid[i])))), 6) AS sim
         |  FROM q, cent2 c),
         |probes AS (
         |  SELECT qid, cell FROM (
         |    SELECT qid, cell,
         |           row_number() OVER (PARTITION BY qid
         |                              ORDER BY sim DESC, cell ASC) AS rn
         |    FROM psim) WHERE rn <= 3),
         |cand AS (
         |  SELECT p.qid, e.vec_id,
         |         round(${cos("q.qe", "e.embedding")}, 6) AS cos
         |  FROM probes p
         |  JOIN emb2 e ON e.cell = p.cell
         |  JOIN q ON q.qid = p.qid
         |  WHERE e.vec_id <> p.qid),
         |ranked AS (
         |  SELECT qid, vec_id, cos,
         |         row_number() OVER (PARTITION BY qid
         |                            ORDER BY cos DESC, vec_id ASC) AS rn
         |  FROM cand)
         |SELECT qid, CAST(rn AS INT) AS rank, vec_id, cos
         |FROM ranked WHERE rn <= 5
         |ORDER BY qid, rank""".stripMargin),

    // Replays the SQ8 quantizer: per-dim min/max bounds, u8 code =
    // least(255, floor((v-lo)*255/(hi-lo))), decode lo + code*step —
    // the same pinned double expression order as the kernel — then the
    // asymmetric candidate scan (top-20 by quantized cosine) and the
    // exact re-rank to top-5.
    Q.sql("ann_sq8_rerank", annSq8Rerank,
      s"""WITH stats AS (
         |  SELECT list(lo ORDER BY d) AS lo, list(hi ORDER BY d) AS hi FROM (
         |    SELECT t.d AS d, min(CAST(embedding[t.d] AS DOUBLE)) AS lo,
         |           max(CAST(embedding[t.d] AS DOUBLE)) AS hi
         |    FROM embeddings, range(1, 65) t(d)
         |    GROUP BY t.d)),
         |deq AS (
         |  SELECT e.vec_id, e.embedding,
         |    list_transform(range(1, 65), i ->
         |      CASE WHEN s.hi[i] = s.lo[i] THEN s.lo[i]
         |           ELSE s.lo[i]
         |                + least(255.0,
         |                        floor((CAST(e.embedding[i] AS DOUBLE) - s.lo[i])
         |                              * 255.0 / (s.hi[i] - s.lo[i])))
         |                  * ((s.hi[i] - s.lo[i]) / 255.0) END) AS dv
         |  FROM embeddings e, stats s),
         |q AS (
         |  SELECT vec_id AS qid, embedding AS qe FROM embeddings
         |  WHERE vec_id % 50 = 0),
         |approx AS (
         |  SELECT q.qid, d.vec_id,
         |    round(
         |      list_sum(list_transform(range(1, 65),
         |        i -> CAST(q.qe[i] AS DOUBLE) * d.dv[i]))
         |      / (sqrt(list_sum(list_transform(range(1, 65),
         |           i -> CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))))
         |         * sqrt(list_sum(list_transform(range(1, 65),
         |             i -> d.dv[i] * d.dv[i])))), 6) AS cos_sq8
         |  FROM q JOIN deq d ON d.vec_id <> q.qid
         |  WHERE list_sum(list_transform(range(1, 65),
         |          i -> CAST(d.embedding[i] AS DOUBLE)
         |               * CAST(d.embedding[i] AS DOUBLE))) > 0
         |    AND list_sum(list_transform(range(1, 65),
         |          i -> d.dv[i] * d.dv[i])) > 0
         |    AND list_sum(list_transform(range(1, 65),
         |          i -> CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))) > 0),
         |cand AS (
         |  SELECT qid, vec_id, cos_sq8 FROM (
         |    SELECT qid, vec_id, cos_sq8,
         |           row_number() OVER (PARTITION BY qid
         |                              ORDER BY cos_sq8 DESC, vec_id ASC) AS rn
         |    FROM approx) WHERE rn <= 20),
         |rr AS (
         |  SELECT c.qid, c.vec_id,
         |         round(${cos("q.qe", "e.embedding")}, 6) AS cos, c.cos_sq8
         |  FROM cand c
         |  JOIN embeddings e ON e.vec_id = c.vec_id
         |  JOIN q ON q.qid = c.qid),
         |ranked AS (
         |  SELECT qid, vec_id, cos, cos_sq8,
         |         row_number() OVER (PARTITION BY qid
         |                            ORDER BY cos DESC, vec_id ASC) AS rn
         |  FROM rr)
         |SELECT qid, CAST(rn AS INT) AS rank, vec_id, cos, cos_sq8
         |FROM ranked WHERE rn <= 5
         |ORDER BY qid, rank""".stripMargin),

    // full codebook replay: init cells vec_id % 16, 4dp centroid
    // means (same grid argument as ann_ivf_topk), 6dp squared-L2
    // assignment with lowest-cell ties (row_number ORDER BY dist,
    // cell), reconstruction as the j-major 64-list, then the sq8-style
    // candidate window + exact re-rank
    Q.sql("ann_pq_rerank", annPqRerank, pqRerankSql),

    Q.sql("ann_ivfpq_topk", annIvfPqTopK, ivfPqSql),

    // persisted-index serve is bit-exact vs the inline index
    Q.sql("ann_ivfpq_roundtrip", annIvfPqIndexRoundtrip, ivfPqSql),
    // both quantizer stages frozen; base-only-training replay
    Q.sql("ann_ivfpq_append", annIvfPqAppend, ivfPqAppendSql),

    Q.sql("ann_ivfpq_recall_report", annIvfPqRecallReport, ivfPqRecallSql),

    // build→persist(m-byte codes + codebooks + one-row geometry)→
    // load→serve: the approx scan runs over the codes table only;
    // bit-exact vs the inline path, so it shares ann_pq_rerank's
    // oracle
    Q.sql("ann_pq_index_roundtrip", annPqIndexRoundtrip, pqRerankSql),
    // frozen-codebook increment encoding; base-only-training replay
    Q.sql("ann_pq_append", annPqAppend, pqAppendSql),
    Q.sql("ann_mrl_rerank", annMrlRerank, mrlRerankSql),
    // prefix persisted as its own table: the byte cut reaches disk
    Q.sql("ann_mrl_index_roundtrip", annMrlIndexRoundtrip, mrlRerankSql),
    // stateless prefix copy: base+append ≡ full build, same oracle
    Q.sql("ann_mrl_append", annMrlAppend, mrlRerankSql),
    Q.sql("ann_mrl_shard_merge", annMrlShardMerge, mrlRerankSql),
    // takedown on the prefix table: deleted vectors masked before the
    // coarse scan — oracle excludes them from the prefix candidates
    Q.sql("ann_mrl_delete", annMrlDelete, mrlDeleteSql),
    Q.sql("ann_mrl_recall_report", annMrlRecallReport, mrlRecallSql),

    // ADAPTIVE BUDGETS — (nProbe, candMult) derived from a stated
    // recall floor via one-pass calibration sweeps (the S-curve-
    // inversion discipline on the serving dials), never hand-tuned:
    // the full recall-vs-budget curve, the serve at the chosen
    // budget (stamped on every row), and the full-workload recall
    // card with the floor verdict
    Q.sql("ann_ivf_probe_sweep", annIvfProbeSweep, ivfSweepSql),
    Q.sql("ann_ivf_adaptive", annIvfAdaptive, ivfAdaptiveSql),
    Q.sql("ann_ivf_adaptive_recall", annIvfAdaptiveRecall,
      ivfAdaptiveRecallSql),
    Q.sql("ann_mrl_cand_sweep", annMrlCandSweep, mrlSweepSql),
    Q.sql("ann_mrl_adaptive", annMrlAdaptive, mrlAdaptiveSql),
    Q.sql("ann_mrl_adaptive_recall", annMrlAdaptiveRecall,
      mrlAdaptiveRecallSql),
    Q.sql("ann_lsh_radius_sweep", annLshRadiusSweep, lshSweepSql),
    Q.sql("ann_lsh_adaptive", annLshAdaptive, lshAdaptiveSql),
    Q.sql("ann_lsh_adaptive_recall", annLshAdaptiveRecall,
      lshAdaptiveRecallSql),
    Q.sql("ann_ivfpq_cand_sweep", annIvfPqCandSweep, ivfPqCandSweepSql),
    Q.sql("ann_ivfpq_adaptive", annIvfPqAdaptive, ivfPqAdaptiveSql),
    Q.sql("ann_ivfpq_adaptive_recall", annIvfPqAdaptiveRecall,
      ivfPqAdaptiveRecallSql),

    // same plane-seed replay as ann_lsh_topk; sequential dim fold,
    // /sqrt(16) = /4 exact, 6dp edge rounding
    Q.sql("ann_rp_project", annRpProject,
      """SELECT e.vec_id, CAST(t.b AS INT) AS d,
        |  round(list_sum(list_transform(range(1, 65),
        |      i -> CAST(e.embedding[i] AS DOUBLE) *
        |           (CASE WHEN substr(md5('graft-hp-' || t.b || '-' || ((i-1) // 32)),
        |                             CAST((i-1) % 32 + 1 AS INT), 1) >= '8'
        |                 THEN 1.0 ELSE -1.0 END)))
        |    / sqrt(16.0), 6) AS v
        |FROM embeddings e, range(0, 16) t(b)
        |WHERE e.embedding IS NOT NULL
        |ORDER BY e.vec_id, d""".stripMargin),

    Q.sql("ann_cos_pairs", annCosPairs,
      s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |       round(${cos("a.embedding", "b.embedding")}, 6) AS cos
         |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |WHERE NOT isnan(${cos("a.embedding", "b.embedding")})
         |  AND round(${cos("a.embedding", "b.embedding")}, 6) >= 0.45
         |ORDER BY vec_a, vec_b""".stripMargin),

    Q.sql("ann_semdedup", annSemDedup,
      s"""WITH p AS (
         |  SELECT b.vec_id AS vid, CAST(count(*) AS BIGINT) AS n
         |  FROM embeddings a JOIN embeddings b
         |    ON CAST(a.label AS INT) = CAST(b.label AS INT)
         |   AND a.vec_id < b.vec_id
         |  WHERE NOT isnan(${cos("a.embedding", "b.embedding")})
         |    AND round(${cos("a.embedding", "b.embedding")}, 6) >= 0.35
         |  GROUP BY b.vec_id)
         |SELECT e.vec_id, CAST(e.label AS INT) AS cell,
         |       coalesce(p.n, 0) AS n_dups,
         |       p.vid IS NULL AS kept
         |FROM embeddings e LEFT JOIN p ON p.vid = e.vec_id
         |ORDER BY e.vec_id""".stripMargin),

    Q.sql("ann_components", annComponents,
      s"""WITH RECURSIVE pairs AS (
         |  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
         |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |  WHERE NOT isnan(${cos("a.embedding", "b.embedding")})
         |    AND round(${cos("a.embedding", "b.embedding")}, 6) >= 0.45),
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

    // Replays the md5-seeded hyperplane signatures (8 tables × 8 bits =
    // planes 0..63; table = b // 8, bit = b % 8), the any-table bucket
    // collision, then the exact cosine verify — the probabilistic
    // candidate stage is deterministic given the seeds, so the oracle
    // is exact.
    Q.sql("ann_cos_pairs_lsh", annCosPairsLsh,
      s"""WITH bitsums AS (
         |  SELECT v.vec_id, t.b AS b,
         |    list_sum(list_transform(range(1, 65),
         |      i -> CAST(v.embedding[i] AS DOUBLE) *
         |           (CASE WHEN substr(md5('graft-hp-' || t.b || '-' || ((i-1) // 32)),
         |                             CAST((i-1) % 32 + 1 AS INT), 1) >= '8'
         |                 THEN 1.0 ELSE -1.0 END))) AS s
         |  FROM embeddings v, range(0, 64) t(b)),
         |keys AS (
         |  SELECT vec_id, b // 8 AS tbl,
         |         sum(CASE WHEN s > 0 THEN 1 << (b % 8) ELSE 0 END) AS bucket
         |  FROM bitsums GROUP BY vec_id, b // 8),
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
         |  FROM keys a JOIN keys b
         |    ON a.tbl = b.tbl AND a.bucket = b.bucket
         |   AND a.vec_id < b.vec_id)
         |SELECT c.vec_a, c.vec_b,
         |       round(${cos("ea.embedding", "eb.embedding")}, 6) AS cos
         |FROM cand c
         |JOIN embeddings ea ON ea.vec_id = c.vec_a
         |JOIN embeddings eb ON eb.vec_id = c.vec_b
         |WHERE NOT isnan(${cos("ea.embedding", "eb.embedding")})
         |  AND round(${cos("ea.embedding", "eb.embedding")}, 6) >= 0.45
         |ORDER BY vec_a, vec_b""".stripMargin),
  )
}
