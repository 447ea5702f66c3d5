package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorSearchSpec extends SparkSpec {
  import spark.implicits._

  private def vecDf(rows: Seq[(Long, Seq[Float])]) =
    rows.toDF("vec_id", "embedding")

  test("cosine of identical / orthogonal / opposite vectors") {
    val df = vecDf(Seq(
      (0L, Seq(1f, 0f)), (1L, Seq(1f, 0f)), (2L, Seq(0f, 1f)), (3L, Seq(-1f, 0f))))
    val pairs = VectorSearch.cosineThresholdPairs(df, -2.0, dim = 2)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((0L, 1L)) == 1.0)
    assert(pairs((0L, 2L)) == 0.0)
    assert(pairs((0L, 3L)) == -1.0)
  }

  test("brute top-k is chunking-invariant (per-chunk cut exactness)") {
    // the per-(query, vector-chunk) top-cut is hand-written insertion
    // logic — pin that chunk boundaries can't change the result by
    // running the same query set under pathological chunkings
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter($"vec_id" % 25 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qe"))
    def rows(cs: Int) =
      VectorSearch.bruteForceTopK(emb, q, k = 4, chunkSize = cs)
        .collect().map(r =>
          (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val base = rows(256)
    for (cs <- Seq(1, 3, 7)) {
      assert(rows(cs) == base, s"chunkSize=$cs diverged")
    }
  }

  test("ivfKnnJoin equals ivfTopK for every-vector queries (block exactness)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.select($"vec_id".as("qid"), $"embedding".as("qe"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val viaJoin = rows(VectorSearch.ivfTopK(emb, q, k = 3))
    val viaBlocks = rows(VectorSearch.ivfKnnJoin(emb, q, k = 3))
    assert(viaBlocks == viaJoin,
      s"diff: ${(viaBlocks diff viaJoin).take(5)} / ${(viaJoin diff viaBlocks).take(5)}")
  }

  test("ivfKnnJoin refine path equals ivfTopK refine path (shared index)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter($"vec_id" % 10 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qe"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSet
    val viaJoin = rows(VectorSearch.ivfTopK(emb, q, k = 3, refine = 1))
    val viaBlocks = rows(VectorSearch.ivfKnnJoin(emb, q, k = 3, refine = 1))
    assert(viaBlocks == viaJoin)
  }

  test("brute-force top-k ranks by cosine with id tie-break") {
    val base = Seq(1f, 0f, 0f)
    val df = vecDf(Seq(
      (0L, base),
      (1L, Seq(0.9f, 0.1f, 0f)),   // most similar
      (2L, Seq(0.5f, 0.5f, 0f)),
      (3L, Seq(0f, 1f, 0f)),       // orthogonal
      (4L, Seq(0.9f, 0.1f, 0f)))) // duplicate of 1 → tie broken by id
    val q = df.filter($"vec_id" === 0L).select($"vec_id".as("qid"), $"embedding".as("qe"))
    val top = VectorSearch.bruteForceTopK(df, q, 3, dim = 3)
      .orderBy("rank").collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(top.toSeq == Seq((1, 1L), (2, 4L), (3, 2L)))
  }

  test("hyperplanes are deterministic and balanced-ish") {
    val p1 = VectorSearch.hyperplanes(8, 64)
    val p2 = VectorSearch.hyperplanes(8, 64)
    assert(p1 == p2)
    assert(p1.length == 8 && p1.head.length == 64)
    val pos = p1.flatten.count(_ > 0)
    assert(pos > 150 && pos < 360, s"weights badly skewed: $pos/512 positive")
  }

  test("LSH top-k is internally consistent with exact cosine on real data") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qe"))
    val approx = VectorSearch.lshTopK(emb, q, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val exact = VectorSearch.bruteForceTopK(emb, q, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet

    // ≤ k per query, every reported cosine matches the exact pair cosine
    val perQuery = approx.groupBy(_._1)
    perQuery.foreach { case (_, rows) =>
      assert(rows.length <= 5)
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.length))
    }
    val exactCos = VectorSearch.bruteForceTopK(emb, q, k = Int.MaxValue)
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap
    approx.foreach { case (qid, _, vid, c) =>
      assert(math.abs(exactCos((qid, vid)) - c) < 1e-9)
    }
    // recall is data-dependent (random vectors are LSH-hostile); report,
    // don't gate.
    val hit = approx.count { case (qid, _, vid, _) => exact.contains((qid, vid)) }
    info(s"LSH recall@5 on sf0.001: $hit/${exact.size}")
  }

  test("IVF top-k probes cells and stays consistent with exact cosine") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qe"))
    val approx = VectorSearch.ivfTopK(emb, q, k = 5, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val exactCos = VectorSearch.bruteForceTopK(emb, q, k = Int.MaxValue)
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap
    approx.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.length <= 5)
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.length))
    }
    approx.foreach { case (qid, _, vid, c) =>
      assert(math.abs(exactCos((qid, vid)) - c) < 1e-9)
    }
    val exact = VectorSearch.bruteForceTopK(emb, q, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val hit = approx.count { case (qid, _, vid, _) => exact.contains((qid, vid)) }
    info(s"IVF recall@5 on sf0.001 (3/10 cells probed): $hit/${exact.size}")
  }

  test("Lloyd refinement retrains the index and keeps exact cosines") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qe"))
    val refined = VectorSearch.ivfTopK(emb, q, k = 5, nProbe = 3, refine = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val exactCos = VectorSearch.bruteForceTopK(emb, q, k = Int.MaxValue)
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap
    refined.foreach { case (qid, _, vid, c) =>
      assert(math.abs(exactCos((qid, vid)) - c) < 1e-9)
    }
    val exact = VectorSearch.bruteForceTopK(emb, q, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val hitR = refined.count { case (qid, _, vid, _) => exact.contains((qid, vid)) }
    val base = VectorSearch.ivfTopK(emb, q, k = 5, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val hitB = base.count(exact.contains)
    info(s"IVF recall@5 refined vs label cells: $hitR vs $hitB / ${exact.size}")
    // the trained index must not be a no-op relabeling
    assert(refined.map(t => (t._1, t._3)).toSet != base.toSet ||
           hitR == exact.size)
  }

  test("PQ: re-rank cosines are exact and codebook recall holds up") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qe"))
    val out = VectorSearch.pqTopK(emb, q, k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3),
                 r.getDouble(4)))
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.length <= 5)
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.length))
    }
    // reported exact cosine equals the brute-force cosine for the pair
    val exactCos = VectorSearch.bruteForceTopK(emb, q, k = Int.MaxValue)
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap
    out.foreach { case (qid, _, vid, c, _) =>
      assert(exactCos((qid, vid)) == c, s"($qid,$vid)")
    }
    val exact5 = VectorSearch.bruteForceTopK(emb, q, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val hit = out.count { case (qid, _, vid, _, _) => exact5.contains((qid, vid)) }
    info(s"PQ recall@5 on sf0.001: $hit/${exact5.size}")
    // 100 vectors is a coarse training set for 8x16 codebooks — the
    // soft floor guards collapse, not quality (LSH/IVF posture here)
    assert(hit >= exact5.size / 3, s"PQ recall collapsed: $hit/${exact5.size}")
    // determinism: training + encode + rank reproduce exactly
    val again = VectorSearch.pqTopK(emb, q, k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3),
                 r.getDouble(4)))
    assert(out.toSeq == again.toSeq)
  }

  test("IVFPQ: probed-cell candidates, exact re-rank, residual codes beat nothing") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qe"))
    val out = VectorSearch.ivfPqTopK(emb, q, k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3),
                 r.getDouble(4)))
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.length <= 5)
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.length))
    }
    // no self-matches ever
    assert(out.forall { case (qid, _, vid, _, _) => qid != vid })
    // coarse structure respected (refine = 0 ⇒ cells ARE the label
    // column): every candidate's label must be one of its query's
    // 3 probed cells — the IVF half of the composition
    val labels = emb.select($"vec_id", $"label".cast("int"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val probed = out.groupBy(_._1).view
      .mapValues(_.map(t => labels(t._3)).toSet)
    probed.foreach { case (_, cells) => assert(cells.size <= 3) }
    // reported exact cosine equals the brute-force cosine for the pair
    // — the PQ half only PICKS candidates, never scores the output
    val exactCos = VectorSearch.bruteForceTopK(emb, q, k = Int.MaxValue)
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap
    out.foreach { case (qid, _, vid, c, _) =>
      assert(exactCos((qid, vid)) == c, s"($qid,$vid)")
    }
    // determinism: coarse assign + residual train + encode reproduce
    val again = VectorSearch.ivfPqTopK(emb, q, k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3),
                 r.getDouble(4)))
    assert(out.toSeq == again.toSeq)
  }

  test("SQ8: bounds cover the data and re-rank cosines are exact") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val (lo, hi) = VectorSearch.sq8Stats(emb)
    assert(lo.length == 64 && hi.length == 64)
    assert(lo.zip(hi).forall { case (l, h) => l <= h })
    val q = emb.filter($"vec_id" % 100 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qe"))
    val out = VectorSearch.sq8TopK(emb, q, k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3),
                 r.getDouble(4)))
    // ranks are 1..n per query, ordered by EXACT cosine
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.length <= 5)
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.length))
      val byRank = rows.sortBy(_._2).map(r => (r._4, r._3)) // (cos, vec_id)
      byRank.zip(byRank.tail).foreach { case ((c1, i1), (c2, i2)) =>
        assert(c1 > c2 || (c1 == c2 && i1 < i2), s"rank order broken: $byRank")
      }
    }
    // reported exact cosine equals the brute-force cosine for the pair
    val exactCos = VectorSearch.bruteForceTopK(emb, q, k = Int.MaxValue)
      .collect().map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap
    out.foreach { case (qid, _, vid, c, _) =>
      assert(exactCos((qid, vid)) == c, s"($qid,$vid)")
    }
    // quantized score approximates exact: the 4x overfetch should give
    // high recall vs brute force (report + soft floor)
    val exact5 = VectorSearch.bruteForceTopK(emb, q, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val hit = out.count { case (qid, _, vid, _, _) => exact5.contains((qid, vid)) }
    info(s"SQ8 recall@5 on sf0.001: $hit/${exact5.size}")
    assert(hit >= exact5.size / 2, s"SQ8 recall collapsed: $hit/${exact5.size}")
  }

  test("random projection: deterministic, and JL-preserves pairwise structure") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val p1 = VectorSearch.randomProject(emb, k = 16)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toMap
    val p2 = VectorSearch.randomProject(emb, k = 16)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1))).toMap
    assert(p1 == p2) // md5-seeded: no RNG state anywhere
    assert(p1.values.forall(_.length == 16))
    // JL distortion check on real vectors: for sampled pairs, dot
    // products in projected space track the originals (±1/√k entries,
    // E[<Px,Py>] = <x,y>). Statistical, so assert a loose aggregate
    // bound, not per-pair.
    val orig = emb.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toMap
    def dot(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    def dotD(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    val ids = orig.keys.toSeq.sorted.take(30)
    val errs = for (a <- ids; b <- ids if a < b) yield
      math.abs(dotD(p1(a), p1(b)) - dot(orig(a), orig(b)))
    val meanErr = errs.sum / errs.size
    // raw dots on these unit-ish vectors are O(0.1–1); k=16 distortion
    // stddev ~ |x||y|/√16 — mean abs error must stay well under 1
    assert(meanErr < 0.5, s"JL distortion too large: mean abs err $meanErr")
  }

  test("SQ8 dequantization error is within one quantization step") {
    // 1-d slice through the public contract: every component's decoded
    // image must sit within (hi-lo)/255 of the source value
    val rows = Seq(
      (0L, Seq(-1f, 0f, 0.25f)), (1L, Seq(1f, 2f, 0.5f)),
      (2L, Seq(0.5f, -3f, 0.75f)), (3L, Seq(0f, 1f, 1f)))
    val df = vecDf(rows)
    val (lo, hi) = VectorSearch.sq8Stats(df, dim = 3)
    rows.foreach { case (_, e) =>
      for (i <- 0 until 3) {
        val l = lo(i); val h = hi(i)
        val step = if (h == l) 0.0 else (h - l) / 255.0
        val code = if (h == l) 0.0
                   else math.min(255.0, math.floor((e(i).toDouble - l) * 255.0 / (h - l)))
        val deq = l + code * step
        assert(math.abs(deq - e(i).toDouble) <= step + 1e-12,
          s"dim $i: v=${e(i)} deq=$deq step=$step")
      }
    }
  }

  test("semDedup drops exactly the vectors with a lower-id in-cell near-dup") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val th = 0.3
    // ground truth from the independently-verified pair scan + label map
    val labels = emb.select($"vec_id", $"label")
      .as[(Long, Int)].collect().toMap
    val inCell = VectorSearch.cosineThresholdPairs(emb, th)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => labels(a) == labels(b) }
    val expDups = inCell.groupBy(_._2).map { case (v, ps) => v -> ps.length.toLong }
    val got = VectorSearch.semDedup(emb, th)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3)))
    assert(got.length == labels.size) // every vector present exactly once
    got.foreach { case (vid, cell, nDups, kept) =>
      assert(cell == labels(vid))
      assert(nDups == expDups.getOrElse(vid, 0L), s"vec $vid")
      assert(kept == !expDups.contains(vid), s"vec $vid")
    }
    assert(expDups.nonEmpty, "fixture has no in-cell near-dups — threshold too high")
  }

  test("persisted IVF index serves bit-identical results to the inline path") {
    val rnd = new scala.util.Random(7)
    val emb = (0 until 120).map { i =>
      (i.toLong, i % 8, Array.fill(16)(rnd.nextGaussian().toFloat)) }
      .toDF("vec_id", "label", "embedding")
    val queries = emb.filter($"vec_id" % 10 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qe"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ivf_idx").toString
    try {
      VectorSearch.ivfWriteIndex(emb, dir, dim = 16, refine = 1)
      // on-disk layout: the cell table's manifest segment is
      // PARTITIONED by cell (a probe reads only its cells' dirs)
      val cellSeg = IndexCommit.tablePaths(spark, dir, "cells").head
      val cellDirs = new java.io.File(cellSeg).listFiles()
        .filter(_.getName.startsWith("cell=")).map(_.getName).sorted
      assert(cellDirs.length >= 2, s"expected cell=* partitions, got ${cellDirs.mkString(",")}")
      val served = VectorSearch.ivfServe(spark, dir, queries, k = 4, dim = 16)
        .orderBy("qid", "rank").collect().toSeq
      val inline = VectorSearch.ivfTopK(emb, queries, k = 4, dim = 16,
          refine = 1)
        .orderBy("qid", "rank").collect().toSeq
      assert(served == inline)
      assert(served.nonEmpty)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
  }

  test("LSH pair prefilter: exact precision, high recall on near-dups") {
    // planted corpus: 40 seeded random base vectors, each with a
    // perturbed copy at cosine ≳ 0.95 — the regime the prefilter
    // targets (real near-dups), unlike the barely-at-threshold random
    // pairs of the parquet embeddings
    val rnd = new scala.util.Random(42)
    val rows = (0 until 40).flatMap { i =>
      val base = Array.fill(64)(rnd.nextGaussian().toFloat)
      val dup = base.map(v => v + 0.1f * rnd.nextGaussian().toFloat)
      Seq((i.toLong * 2, base), (i.toLong * 2 + 1, dup))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val exact = VectorSearch.cosineThresholdPairs(emb, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = VectorSearch.cosineThresholdPairsLsh(emb, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // precision is EXACT: every emitted pair is a true pair with the
    // identical rounded cosine
    lsh.foreach { case (k, c) => assert(exact.get(k).contains(c), k) }
    // recall on the planted ≥0.8 pairs
    assert(exact.nonEmpty)
    val recall = lsh.size.toDouble / exact.size
    info(s"LSH pair recall at 0.8 on planted near-dups: ${lsh.size}/${exact.size}")
    assert(recall >= 0.8, s"recall $recall")
  }

  test("persisted LSH index serves bit-identical results to the inline path") {
    val rnd = new scala.util.Random(11)
    val emb = (0 until 150).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat)) }
      .toDF("vec_id", "embedding")
    val queries = emb.filter($"vec_id" % 10 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qe"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_lsh_idx").toString
    try {
      VectorSearch.lshWriteIndex(emb, dir, bits = 4, dim = 16)
      // bucket-partitioned layout: a probe reads only its buckets
      val bktSeg = IndexCommit.tablePaths(spark, dir, "buckets").head
      val bktDirs = new java.io.File(bktSeg).listFiles()
        .filter(_.getName.startsWith("bkt=")).map(_.getName)
      assert(bktDirs.length >= 2, s"expected bkt=* partitions, got ${bktDirs.mkString(",")}")
      val served = VectorSearch.lshServe(spark, dir, queries, k = 4)
        .orderBy("qid", "rank").collect().toSeq
      val inline = VectorSearch.lshTopK(emb, queries, k = 4, bits = 4,
          dim = 16)
        .orderBy("qid", "rank").collect().toSeq
      assert(served == inline)
      assert(served.nonEmpty)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
  }

  test("LSH index built base+append is bit-identical to a full build") {
    val rnd = new scala.util.Random(17)
    val emb = (0 until 150).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat)) }
      .toDF("vec_id", "embedding")
    val queries = emb.filter($"vec_id" % 10 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qe"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_lsh_app").toString
    try {
      VectorSearch.lshWriteIndex(emb.filter($"vec_id" % 7 =!= 0), dir,
        bits = 4, dim = 16)
      VectorSearch.lshAppendIndex(spark, dir,
        emb.filter($"vec_id" % 7 === 0))
      val served = VectorSearch.lshServe(spark, dir, queries, k = 4)
        .orderBy("qid", "rank").collect().toSeq
      val inline = VectorSearch.lshTopK(emb, queries, k = 4, bits = 4,
          dim = 16)
        .orderBy("qid", "rank").collect().toSeq
      assert(served == inline)
      assert(served.nonEmpty)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
  }

  test("mrlTopK with prefixDim == dim degenerates to exact brute force") {
    val rnd = new scala.util.Random(29)
    val emb = (0 until 150).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat)) }
      .toDF("vec_id", "embedding")
    val queries = emb.filter($"vec_id" % 10 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qe"))
    // full-width prefix: the coarse score IS the exact cosine, so the
    // re-ranked top-k must equal brute force row for row
    val mrl = VectorSearch.mrlTopK(emb, queries, k = 4, prefixDim = 16,
        dim = 16)
      .select($"qid", $"rank", $"vec_id", $"cos")
      .orderBy("qid", "rank").collect().toSeq
    val brute = VectorSearch.bruteForceTopK(emb, queries, k = 4, dim = 16)
      .orderBy("qid", "rank").collect().toSeq
    assert(mrl == brute)
    assert(mrl.nonEmpty)
    // narrow prefix still returns a full result set per query
    val narrow = VectorSearch.mrlTopK(emb, queries, k = 4, prefixDim = 4,
      dim = 16)
    assert(narrow.groupBy("qid").count().collect()
      .forall(_.getLong(1) == 4L))
  }

  test("IVF vector deletion: tombstoned vectors never serve; compaction materializes") {
    val rnd = new scala.util.Random(43)
    val emb = (0 until 150).map { i =>
      (i.toLong, i % 6, Array.fill(16)(rnd.nextGaussian().toFloat)) }
      .toDF("vec_id", "label", "embedding")
    val qs = emb.filter($"vec_id" % 10 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qe"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ivf_del").toString
    try {
      VectorSearch.ivfWriteIndex(emb, dir, dim = 16)
      val before = VectorSearch.ivfServe(spark, dir, qs, k = 4, dim = 16)
        .orderBy("qid", "rank").collect().toSeq
      val ids = emb.filter($"vec_id" % 5 === 2).select($"vec_id")
      VectorSearch.deleteVectors(spark, dir, ids)
      val served = VectorSearch.ivfServe(spark, dir, qs, k = 4, dim = 16)
        .orderBy("qid", "rank").collect().toSeq
      // no deleted vector in any result; the result actually changed
      assert(served.forall(r => r.getLong(2) % 5 != 2))
      assert(served != before && served.nonEmpty)
      assert(before.exists(r => r.getLong(2) % 5 == 2)) // teeth
      // idempotent re-delete
      VectorSearch.deleteVectors(spark, dir, ids)
      assert(VectorSearch.ivfServe(spark, dir, qs, k = 4, dim = 16)
        .orderBy("qid", "rank").collect().toSeq == served)
      // compaction materializes: tombstones dropped, rows gone,
      // serve unchanged
      VectorSearch.compactIndexTable(spark, dir, "cells", "cell")
      val m = IndexCommit.currentManifest(spark, dir).get
      assert(!m.tables.contains("tombstones"))
      assert(IndexCommit.readTable(spark, dir, "cells")
        .filter($"vec_id" % 5 === 2).count() == 0)
      assert(VectorSearch.ivfServe(spark, dir, qs, k = 4, dim = 16)
        .orderBy("qid", "rank").collect().toSeq == served)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
  }

  test("MRL append equals a full build (stateless prefix quantizer)") {
    val rnd = new scala.util.Random(37)
    val emb = (0 until 150).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat)) }
      .toDF("vec_id", "embedding")
    val queries = emb.filter($"vec_id" % 10 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qe"))
    val dirA = java.nio.file.Files
      .createTempDirectory("graft_mrl_full").toString
    val dirB = java.nio.file.Files
      .createTempDirectory("graft_mrl_app").toString
    try {
      VectorSearch.mrlWriteIndex(emb, dirA, prefixDim = 4, dim = 16)
      VectorSearch.mrlWriteIndex(emb.filter($"vec_id" % 7 =!= 0), dirB,
        prefixDim = 4, dim = 16)
      VectorSearch.mrlAppendIndex(spark, dirB,
        emb.filter($"vec_id" % 7 === 0))
      // two prefix segments live under the manifest after the append
      assert(IndexCommit.tablePaths(spark, dirB, "prefix").size == 2)
      val full = VectorSearch.mrlServe(spark, dirA, emb, queries, k = 4)
        .orderBy("qid", "rank").collect().toSeq
      val appended = VectorSearch.mrlServe(spark, dirB, emb, queries,
          k = 4)
        .orderBy("qid", "rank").collect().toSeq
      assert(appended == full)
      assert(full.nonEmpty)
      // every eligible vector is served from the merged prefix table
      assert(IndexCommit.readTable(spark, dirB, "prefix").count() == 150)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(dirA)); rm(new java.io.File(dirB))
    }
  }

  test("IVFPQ index appends compose: two nightly increments equal one") {
    val rnd = new scala.util.Random(31)
    val emb = (0 until 150).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat)) }
      .toDF("vec_id", "embedding")
      .withColumn("label", ($"vec_id" % 4).cast("int"))
    val queries = emb.filter($"vec_id" % 10 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qe"))
    val base = emb.filter($"vec_id" % 7 =!= 0)
    val dirA = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_appA").toString
    val dirB = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_appB").toString
    try {
      VectorSearch.ivfPqWriteIndex(base, dirA, m = 4, nCells = 8,
        dim = 16)
      VectorSearch.ivfPqAppendIndex(spark, dirA,
        emb.filter($"vec_id" % 7 === 0))
      VectorSearch.ivfPqWriteIndex(base, dirB, m = 4, nCells = 8,
        dim = 16)
      VectorSearch.ivfPqAppendIndex(spark, dirB,
        emb.filter($"vec_id" % 14 === 0))
      VectorSearch.ivfPqAppendIndex(spark, dirB,
        emb.filter($"vec_id" % 7 === 0 && $"vec_id" % 14 =!= 0))
      val servedA = VectorSearch.ivfPqServe(spark, dirA, emb, queries,
          k = 4)
        .orderBy("qid", "rank").collect().toSeq
      val servedB = VectorSearch.ivfPqServe(spark, dirB, emb, queries,
          k = 4)
        .orderBy("qid", "rank").collect().toSeq
      assert(servedA == servedB)
      assert(servedA.nonEmpty)
      assert(IndexCommit.readTable(spark, dirA, "codes").count() == 150)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(dirA)); rm(new java.io.File(dirB))
    }
  }

  test("index compaction merges per-cell files and preserves results") {
    val rnd = new scala.util.Random(23)
    val emb = (0 until 150).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat)) }
      .toDF("vec_id", "embedding")
      .withColumn("label", ($"vec_id" % 4).cast("int"))
    val queries = emb.filter($"vec_id" % 10 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qe"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ivf_cmp").toString
    // per-cell parquet file count ACROSS the table's live manifest
    // segments — the small-files figure a serve-time probe pays
    def filesPerCell: Map[String, Int] =
      IndexCommit.tablePaths(spark, dir, "cells")
        .flatMap(seg => Option(new java.io.File(seg).listFiles()).toSeq
          .flatten.filter(_.getName.startsWith("cell=")))
        .groupMapReduce(_.getName)(
          _.listFiles().count(_.getName.endsWith(".parquet")))(_ + _)
    try {
      VectorSearch.ivfWriteIndex(emb.filter($"vec_id" % 7 =!= 0), dir,
        dim = 16)
      VectorSearch.ivfAppendIndex(spark, dir,
        emb.filter($"vec_id" % 7 === 0), dim = 16)
      val before = VectorSearch.ivfServe(spark, dir, queries, k = 4,
          dim = 16)
        .orderBy("qid", "rank").collect().toSeq
      assert(filesPerCell.values.exists(_ > 1),
        "append should have left a cell with multiple files")
      VectorSearch.compactIndexTable(spark, dir, "cells", "cell")
      assert(filesPerCell.values.forall(_ == 1),
        s"expected one file per cell after compaction, got $filesPerCell")
      val after = VectorSearch.ivfServe(spark, dir, queries, k = 4,
          dim = 16)
        .orderBy("qid", "rank").collect().toSeq
      assert(after == before)
      assert(after.nonEmpty)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
  }

  test("PQ index appends compose: two nightly increments equal one") {
    val rnd = new scala.util.Random(19)
    val emb = (0 until 150).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat)) }
      .toDF("vec_id", "embedding")
    val queries = emb.filter($"vec_id" % 10 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qe"))
    val base = emb.filter($"vec_id" % 7 =!= 0)
    val dirA = java.nio.file.Files
      .createTempDirectory("graft_pq_appA").toString
    val dirB = java.nio.file.Files
      .createTempDirectory("graft_pq_appB").toString
    try {
      // A: the whole increment in one append
      VectorSearch.pqWriteIndex(base, dirA, m = 4, nCells = 8, dim = 16)
      VectorSearch.pqAppendIndex(spark, dirA,
        emb.filter($"vec_id" % 7 === 0))
      // B: the same increment split across two nights
      VectorSearch.pqWriteIndex(base, dirB, m = 4, nCells = 8, dim = 16)
      VectorSearch.pqAppendIndex(spark, dirB,
        emb.filter($"vec_id" % 14 === 0))
      VectorSearch.pqAppendIndex(spark, dirB,
        emb.filter($"vec_id" % 7 === 0 && $"vec_id" % 14 =!= 0))
      val servedA = VectorSearch.pqServe(spark, dirA, emb, queries, k = 4)
        .orderBy("qid", "rank").collect().toSeq
      val servedB = VectorSearch.pqServe(spark, dirB, emb, queries, k = 4)
        .orderBy("qid", "rank").collect().toSeq
      assert(servedA == servedB)
      assert(servedA.nonEmpty)
      // every eligible vector is served from the merged codes table
      assert(IndexCommit.readTable(spark, dirA, "codes").count() == 150)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(dirA)); rm(new java.io.File(dirB))
    }
  }

  test("persisted PQ index serves bit-identical results to the inline path") {
    val rnd = new scala.util.Random(13)
    val emb = (0 until 150).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat)) }
      .toDF("vec_id", "embedding")
    val queries = emb.filter($"vec_id" % 10 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qe"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pq_idx").toString
    try {
      VectorSearch.pqWriteIndex(emb, dir, m = 4, nCells = 8, dim = 16)
      // the codes artifact is the compressed form: m ints per vector
      val codes = IndexCommit.readTable(spark, dir, "codes")
      assert(codes.count() == 150)
      assert(codes.head().getSeq[Int](1).length == 4)
      val served = VectorSearch.pqServe(spark, dir, emb, queries, k = 4)
        .orderBy("qid", "rank").collect().toSeq
      val inline = VectorSearch.pqTopK(emb, queries, k = 4, m = 4,
          nCells = 8, dim = 16)
        .orderBy("qid", "rank").collect().toSeq
      assert(served == inline)
      assert(served.nonEmpty)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
  }

  test("ivfSizing: nCells tracks sqrt(n) at a constant 3/16 probe fraction") {
    // smallest power of two >= sqrt(n), bits clamped to [2, 16]
    assert(VectorSearch.ivfSizing(1L) == (2, 1))
    assert(VectorSearch.ivfSizing(16L) == (2, 1))       // 4^2 = 16 covers
    assert(VectorSearch.ivfSizing(17L) == (3, 2))       // next bucket
    assert(VectorSearch.ivfSizing(500L) == (5, 6))      // sf0.01 -> 32 cells
    assert(VectorSearch.ivfSizing(2000L) == (6, 12))    // sf0.1 -> 64 cells
    assert(VectorSearch.ivfSizing(20000L) == (8, 48))   // sf1 -> 256 cells
    assert(VectorSearch.ivfSizing(Long.MaxValue)._1 == 16) // clamped
    // the probe fraction stays 3/16 at every derived size
    (2 to 16).foreach { bits =>
      val n = 1L << (2 * bits)
      val (b, p) = VectorSearch.ivfSizing(n)
      assert(b == bits && p == math.max(1, math.round((1 << b) * 3.0 / 16).toInt))
    }
  }

  test("ivfAutoTopK: hyperplane-cell index returns exact cosines for its candidates") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 120).map(i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat)))
    val emb = rows.toDF("vec_id", "embedding")
    val q = emb.filter($"vec_id" % 20 === 0)
      .select($"vec_id".as("qid"), $"embedding".as("qe"))
    val auto = VectorSearch.ivfAutoTopK(emb, q, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val brute = VectorSearch.bruteForceTopK(emb, q, k = 120)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    assert(auto.nonEmpty)
    // every returned (query, candidate) cosine matches the exact value
    auto.foreach { case (k, c) => assert(brute.get(k).contains(c), k) }
  }

  test("vector health card: cells segment debt flips the flag; " +
       "compaction quiets it") {
    val rnd = new scala.util.Random(11)
    val emb = (0 until 60).map { i =>
      (i.toLong, i % 4, Array.fill(8)(rnd.nextGaussian().toFloat)) }
      .toDF("vec_id", "label", "embedding")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ivf_health").toString
    try {
      VectorSearch.ivfWriteIndex(emb.filter($"vec_id" % 3 === 0), dir,
        dim = 8)
      VectorSearch.ivfAppendIndex(spark, dir,
        emb.filter($"vec_id" % 3 === 1), dim = 8)
      VectorSearch.ivfAppendIndex(spark, dir,
        emb.filter($"vec_id" % 3 === 2), dim = 8)
      VectorSearch.deleteVectors(spark, dir,
        emb.filter($"vec_id" % 10 === 7).select($"vec_id"))
      val pre = VectorSearch.healthCard(spark, dir, "cells",
          maxSegments = 2)
        .collect().map(r => r.getString(0) ->
          (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4),
           r.getBoolean(5))).toMap
      // 60 vectors across 3 cells segments; 4 label-derived centroids;
      // 6 tombstoned ids (7,17,...,57) still physically present
      assert(pre("cells") == (3, 60L, 6L, 54L, true))
      assert(pre("centroids") == (1, 4L, 6L, 54L, true))
      assert(pre("tombstones") == (1, 6L, 6L, 54L, true))
      // masked fraction alone: 6/60 = 10% is NOT > 0.1, so a generous
      // segment budget keeps the flag quiet — the thresholds compose
      // by OR, not by accident
      assert(!VectorSearch.healthCard(spark, dir, "cells",
        maxSegments = 100).select("compact_recommended")
        .head().getBoolean(0))
      VectorSearch.compactIndexTable(spark, dir, "cells", "cell")
      val post = VectorSearch.healthCard(spark, dir, "cells",
          maxSegments = 2)
        .collect().map(r => r.getString(0) ->
          (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4),
           r.getBoolean(5))).toMap
      assert(post.keySet == Set("cells", "centroids"))
      assert(post("cells") == (1, 54L, 0L, 54L, false))
      assert(post("centroids") == (1, 4L, 0L, 54L, false))
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
  }

  test("ivfFsck: clean lifecycle is all-ok; injected occupancy drift, " +
       "duplicate ingest, and orphan tombstones flip the right flags") {
    val rnd = new scala.util.Random(13)
    val emb = (0 until 60).map { i =>
      (i.toLong, i % 4, Array.fill(8)(rnd.nextGaussian().toFloat)) }
      .toDF("vec_id", "label", "embedding")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ivf_fsck").toString
    def fsck(): Map[String, (Long, Long, Boolean)] =
      VectorSearch.ivfFsck(spark, dir, dim = 8).collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    try {
      VectorSearch.ivfWriteIndex(emb.filter($"vec_id" % 3 === 0), dir,
        dim = 8)
      VectorSearch.ivfAppendIndex(spark, dir,
        emb.filter($"vec_id" % 3 === 1), dim = 8)
      VectorSearch.ivfAppendIndex(spark, dir,
        emb.filter($"vec_id" % 3 === 2), dim = 8)
      VectorSearch.deleteVectors(spark, dir,
        emb.filter($"vec_id" % 10 === 7).select($"vec_id"))
      val clean = fsck()
      assert(clean.size == 11 && clean.values.forall(_._3),
        s"clean lifecycle must fsck all-ok: $clean")
      assert(clean("live_vecs") == (54L, 54L, true))
      // INJECT occupancy drift: rewrite one append segment with one
      // row moved to a wrong (but existing) cell — file-level
      // corruption the commit protocol never produces
      val seg = graft.operators.IndexCommit
        .currentManifest(spark, dir).get.tables("cells")(1)
      val rows = spark.read.option("basePath", s"$dir/$seg")
        .parquet(s"$dir/$seg")
        .select($"vec_id", $"embedding", $"cell".cast("int").as("cell"))
        .as[(Long, Array[Float], Int)].collect()
      val drifted = rows.zipWithIndex.map { case ((v, e, c), i) =>
        (v, e, if (i == 0) (c + 1) % 4 else c)
      }.toSeq.toDF("vec_id", "embedding", "cell")
      drifted.write.mode("overwrite").partitionBy("cell")
        .parquet(s"$dir/$seg")
      val driftRun = fsck()
      assert(driftRun("append_assignment_mismatches") == (0L, 1L, false),
        s"injected drift must flip the assignment recount: $driftRun")
      assert(driftRun("tombstones_orphaned")._3 &&
        driftRun("duplicate_vec_rows")._3,
        "drift injection must not flip unrelated invariants")
      assert(!driftRun("segment_files_missing")._3 &&
        !driftRun("segment_files_unstamped")._3,
        "a file-level rewrite also trips the bit-rot stamps: the " +
          s"stamped part files are gone, foreign ones appeared: $driftRun")
      // INJECT duplicate ingest: re-append an id already present (the
      // tombstone-disjointness gate doesn't see it — it's not deleted)
      VectorSearch.ivfAppendIndex(spark, dir,
        emb.filter($"vec_id" === 1L), dim = 8)
      val dupRun = fsck()
      assert(dupRun("duplicate_vec_rows") == (0L, 1L, false),
        s"duplicate ingest must flip the row/id recount: $dupRun")
      assert(!dupRun("live_vecs")._3,
        "a duplicate also breaks the masked/live algebra")
      // INJECT an orphan tombstone: delete an id that was never
      // ingested — it masks nothing
      VectorSearch.deleteVectors(spark, dir,
        Seq(999L).toDF("vec_id"))
      val orphanRun = fsck()
      assert(orphanRun("tombstones_orphaned")._2 == 1L &&
        !orphanRun("tombstones_orphaned")._3,
        s"an orphan tombstone must flip the recount: $orphanRun")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
  }

  test("ivfFsck: a null embedding in an append segment is reported " +
       "as an assignment mismatch, not an fsck crash") {
    val rnd = new scala.util.Random(29)
    val emb = (0 until 40).map { i =>
      (i.toLong, i % 4, Array.fill(8)(rnd.nextGaussian().toFloat)) }
      .toDF("vec_id", "label", "embedding")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ivf_fsck_null").toString
    try {
      VectorSearch.ivfWriteIndex(emb.filter($"vec_id" % 2 === 0), dir,
        dim = 8)
      VectorSearch.ivfAppendIndex(spark, dir,
        emb.filter($"vec_id" % 2 === 1), dim = 8)
      // INJECT a null embedding into the append segment — exactly the
      // corruption class an fsck exists to survive and report
      val seg = graft.operators.IndexCommit
        .currentManifest(spark, dir).get.tables("cells")(1)
      val rows = spark.read.option("basePath", s"$dir/$seg")
        .parquet(s"$dir/$seg")
        .select($"vec_id", $"embedding", $"cell".cast("int").as("cell"))
        .as[(Long, Array[Float], Int)].collect()
      val nulled = rows.zipWithIndex.map { case ((v, e, c), i) =>
        (v, if (i == 0) null: Array[Float] else e, c)
      }.toSeq.toDF("vec_id", "embedding", "cell")
      nulled.write.mode("overwrite").partitionBy("cell")
        .parquet(s"$dir/$seg")
      val run = VectorSearch.ivfFsck(spark, dir, dim = 8).collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
      assert(run("append_assignment_mismatches") == (0L, 1L, false),
        s"a null embedding must surface as a mismatch row: $run")
      assert(run("zero_norm_rows") == (0L, 1L, false),
        "the null row is also a zero-norm violation")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
  }

  test("lshFsck: clean lifecycle is all-ok; a poisoned bucket flips " +
       "the bucket recount alone") {
    val rnd = new scala.util.Random(23)
    val emb = (0 until 80).map { i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian().toFloat)) }
      .toDF("vec_id", "embedding")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_lsh_fsck").toString
    def fsck(): Map[String, (Long, Long, Boolean)] =
      VectorSearch.lshFsck(spark, dir).collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    try {
      VectorSearch.lshWriteIndex(emb.filter($"vec_id" % 3 =!= 0), dir,
        bits = 6, dim = 8)
      VectorSearch.lshAppendIndex(spark, dir,
        emb.filter($"vec_id" % 3 === 0))
      VectorSearch.deleteVectors(spark, dir,
        emb.filter($"vec_id" % 10 === 7).select($"vec_id"))
      val clean = fsck()
      assert(clean.size == 10 && clean.values.forall(_._3),
        s"clean lifecycle must fsck all-ok: $clean")
      assert(clean("live_vecs") == (72L, 72L, true))
      // INJECT: move one append-segment row to a wrong bucket — the
      // corruption that silently mis-routes probes
      val seg = graft.operators.IndexCommit
        .currentManifest(spark, dir).get.tables("buckets")(1)
      val rows = spark.read.option("basePath", s"$dir/$seg")
        .parquet(s"$dir/$seg")
        .select($"vec_id", $"embedding", $"nv",
          $"bkt".cast("int").as("bkt"))
        .as[(Long, Array[Float], Double, Int)].collect()
      val drifted = rows.zipWithIndex.map { case ((v, e, nv, b), i) =>
        (v, e, nv, if (i == 0) (b + 1) % 64 else b)
      }.toSeq.toDF("vec_id", "embedding", "nv", "bkt")
      drifted.write.mode("overwrite").partitionBy("bkt")
        .parquet(s"$dir/$seg")
      val bad = fsck()
      assert(bad("bucket_mismatches") == (0L, 1L, false),
        s"a poisoned bucket must flip the recount: $bad")
      assert(bad("norm_mismatches")._3 && bad("duplicate_vec_rows")._3,
        "a bucket poison must not flip unrelated invariants")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
  }

  test("ivfPqFsck: clean lifecycle is all-ok; a poisoned code value " +
       "and an orphan tombstone flip the right flags") {
    val rnd = new scala.util.Random(17)
    val emb = (0 until 120).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat)) }
      .toDF("vec_id", "embedding")
      .withColumn("label", ($"vec_id" % 4).cast("int"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_fsck").toString
    def fsck(): Map[String, (Long, Long, Boolean)] =
      VectorSearch.ivfPqFsck(spark, dir).collect()
        .map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    try {
      VectorSearch.ivfPqWriteIndex(emb.filter($"vec_id" % 7 =!= 0), dir,
        m = 4, nCells = 8, dim = 16)
      VectorSearch.ivfPqAppendIndex(spark, dir,
        emb.filter($"vec_id" % 7 === 0))
      VectorSearch.deleteVectors(spark, dir,
        emb.filter($"vec_id" % 10 === 7).select($"vec_id"))
      val clean = fsck()
      assert(clean.size == 12 && clean.values.forall(_._3),
        s"clean lifecycle must fsck all-ok: $clean")
      assert(clean("codebook_subspaces") == (4L, 4L, true))
      assert(clean("live_vecs") == (108L, 108L, true))
      // INJECT a poisoned code (out of the codebook's range) into the
      // append segment — file-level corruption the commit never writes
      val seg = graft.operators.IndexCommit
        .currentManifest(spark, dir).get.tables("codes")(1)
      val rows = spark.read.option("basePath", s"$dir/$seg")
        .parquet(s"$dir/$seg")
        .select($"vec_id", $"codes", $"cell".cast("int").as("cell"))
        .as[(Long, Array[Int], Int)].collect()
      val poisoned = rows.zipWithIndex.map { case ((v, c, cell), i) =>
        (v, if (i == 0) c.updated(0, 99) else c, cell)
      }.toSeq.toDF("vec_id", "codes", "cell")
      poisoned.write.mode("overwrite").partitionBy("cell")
        .parquet(s"$dir/$seg")
      val bad = fsck()
      assert(bad("code_range_violations") == (0L, 1L, false),
        s"a poisoned code must flip the range check: $bad")
      assert(bad("code_width_violations")._3,
        "the width check must not flip on a range poison")
      // INJECT an orphan tombstone
      VectorSearch.deleteVectors(spark, dir, Seq(999L).toDF("vec_id"))
      val orphan = fsck()
      assert(orphan("tombstones_orphaned")._2 == 1L &&
        !orphan("tombstones_orphaned")._3, s"orphan must flip: $orphan")
      // EMPTY the codes table entirely: width/range sums over zero
      // rows must coalesce to 0 and report ok=TRUE, not NULL
      val allSegs = graft.operators.IndexCommit
        .currentManifest(spark, dir).get.tables("codes")
      for (s <- allSegs)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("vec_id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("codes",
              org.apache.spark.sql.types.ArrayType(
                org.apache.spark.sql.types.IntegerType)),
            org.apache.spark.sql.types.StructField("cell",
              org.apache.spark.sql.types.IntegerType))))
          .repartition(1)
          .write.mode("overwrite").parquet(s"$dir/$s")
      val empty = fsck()
      assert(empty("code_width_violations") == (0L, 0L, true) &&
        empty("code_range_violations") == (0L, 0L, true),
        s"an empty codes table must report ok=TRUE, not NULL: $empty")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
  }
}
