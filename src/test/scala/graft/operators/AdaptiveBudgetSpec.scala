package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The adaptive-budget sweeps (recall-vs-budget curves computed in one
  * pass from truth-vector ranks, never by re-serving per ladder point)
  * rest on a closed-form claim: the exact re-rank can never evict a
  * global-top-k vector, so recall at budget b is exactly the fraction
  * of truth pairs whose rank statistic clears b. These tests pin that
  * claim against DIRECT measurement — serve at a budget, intersect
  * with brute truth — at several ladder points, plus the selection
  * rule (chosen = smallest budget meeting the floor) and the adaptive
  * serve's equality with the pinned-budget operator. */
class AdaptiveBudgetSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  private def queries = emb.filter($"vec_id" % 25 === 0)
    .select($"vec_id".as("qid"), $"embedding".as("qe"))

  private def directRecall(approx: org.apache.spark.sql.DataFrame): Double = {
    val brute = VectorSearch.bruteForceTopK(emb, queries, k = 5)
      .select($"qid", $"vec_id")
    val n = brute.count().toDouble
    val hits = brute.join(approx.select($"qid", $"vec_id"),
      Seq("qid", "vec_id"), "left_semi").count()
    hits / n
  }

  test("ivfProbeSweep matches directly-measured recall at every budget") {
    val sweep = VectorSearch.ivfProbeSweep(emb, queries, k = 5)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val nCells = sweep.size
    assert(nCells >= 2)
    for (p <- Seq(1, nCells / 2, nCells)) {
      val direct = directRecall(
        VectorSearch.ivfTopK(emb, queries, k = 5, nProbe = p))
      val (h, t, rec) = sweep(p)
      assert(math.abs(rec - math.rint(direct * t) / t) < 1e-9 &&
        h == math.round(direct * t),
        s"nProbe=$p sweep=(h=$h,t=$t,$rec) direct=$direct")
    }
    // monotone, and a full-budget scan recalls everything
    val recs = (1 to nCells).map(p => sweep(p)._3)
    assert(recs.zip(recs.tail).forall { case (a, b) => a <= b })
    assert(recs.last == 1.0)
  }

  test("ivf chosen budget is the smallest meeting the floor; adaptive serve equals pinned serve") {
    val floor = 0.7
    val sweep = VectorSearch.ivfProbeSweep(emb, queries, k = 5,
        recallFloor = floor)
      .collect().map(r => (r.getInt(0), r.getDouble(3), r.getBoolean(4)))
    val chosen = sweep.filter(_._3).map(_._1).toSeq
    assert(chosen.size == 1, s"exactly one chosen row: $chosen")
    val expected = sweep.find(_._2 >= floor).map(_._1)
      .getOrElse(sweep.length)
    assert(chosen.head == expected)
    val adaptive = VectorSearch.ivfAdaptiveTopK(emb, queries, queries,
        k = 5, recallFloor = floor)
    assert(adaptive.select($"nprobe").distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(expected))
    val pinned = VectorSearch.ivfTopK(emb, queries, k = 5,
        nProbe = expected)
      .orderBy($"qid", $"rank").collect().toSeq
    assert(adaptive.drop("nprobe").orderBy($"qid", $"rank")
      .collect().toSeq == pinned)
    assert(pinned.nonEmpty)
  }

  test("mrlCandSweep matches directly-measured recall at every budget") {
    val maxCm = 8
    val sweep = VectorSearch.mrlCandSweep(emb, queries, k = 5,
        maxCandMult = maxCm)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(sweep.size == maxCm)
    for (c <- Seq(1, 3, maxCm)) {
      val direct = directRecall(
        VectorSearch.mrlTopK(emb, queries, k = 5, candMult = c))
      val (h, t, rec) = sweep(c)
      assert(h == math.round(direct * t),
        s"candMult=$c sweep=(h=$h,t=$t,$rec) direct=$direct")
    }
    val recs = (1 to maxCm).map(c => sweep(c)._3)
    assert(recs.zip(recs.tail).forall { case (a, b) => a <= b })
  }

  test("lshRadiusSweep matches directly-measured recall at every radius") {
    val sweep = VectorSearch.lshRadiusSweep(emb, queries, k = 5)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(sweep.size == 9) // ladder 0..8
    for (r <- Seq(0, 2, 5)) {
      val direct = directRecall(
        VectorSearch.lshTopK(emb, queries, k = 5, probeHamming = r))
      val (h, t, _) = sweep(r)
      assert(h == math.round(direct * t),
        s"radius=$r sweep=(h=$h,t=$t) direct=$direct")
    }
    val recs = (0 to 8).map(r => sweep(r)._3)
    assert(recs.zip(recs.tail).forall { case (a, b) => a <= b })
    assert(recs.last == 1.0) // radius 8 probes every bucket
  }

  test("lsh adaptive serve equals pinned radius serve, budget stamped") {
    val floor = 0.7
    val sweep = VectorSearch.lshRadiusSweep(emb, queries, k = 5,
        recallFloor = floor)
      .collect().map(r => (r.getInt(0), r.getDouble(3), r.getBoolean(4)))
    val expected = sweep.find(_._2 >= floor).map(_._1).getOrElse(8)
    val adaptive = VectorSearch.lshAdaptiveTopK(emb, queries, queries,
        k = 5, recallFloor = floor)
    assert(adaptive.select($"radius").distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(expected))
    val pinned = VectorSearch.lshTopK(emb, queries, k = 5,
        probeHamming = expected)
      .orderBy($"qid", $"rank").collect().toSeq
    assert(adaptive.drop("radius").orderBy($"qid", $"rank")
      .collect().toSeq == pinned)
    assert(pinned.nonEmpty)
  }

  test("ivfPqCandSweep matches directly-measured recall; adaptive equals pinned two-dial serve") {
    val maxCm = 8
    val sweep = VectorSearch.ivfPqCandSweep(emb, queries, k = 5,
        maxCandMult = maxCm, recallFloor = 0.7)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4), r.getInt(5)))
    val p = sweep.head._6
    assert(sweep.forall(_._6 == p)) // one probe budget stamped throughout
    for ((c, h, t, _, _, _) <- sweep.filter(r => Seq(1, 4, maxCm).contains(r._1))) {
      val direct = directRecall(
        VectorSearch.ivfPqTopK(emb, queries, k = 5, nProbe = p,
          candMult = c))
      assert(h == math.round(direct * t),
        s"candMult=$c at nProbe=$p: sweep h=$h/$t direct=$direct")
    }
    val recs = sweep.sortBy(_._1).map(_._4)
    assert(recs.zip(recs.tail).forall { case (a, b) => a <= b })
    val expected = sweep.sortBy(_._1).find(_._4 >= 0.7).map(_._1)
      .getOrElse(maxCm)
    val adaptive = VectorSearch.ivfPqAdaptiveTopK(emb, queries, queries,
      k = 5, maxCandMult = maxCm, recallFloor = 0.7)
    assert(adaptive.select($"nprobe", $"cand_mult").distinct().collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((p, expected)))
    val pinned = VectorSearch.ivfPqTopK(emb, queries, k = 5, nProbe = p,
        candMult = expected)
      .orderBy($"qid", $"rank").collect().toSeq
    assert(adaptive.drop("nprobe", "cand_mult").orderBy($"qid", $"rank")
      .collect().toSeq == pinned)
    assert(pinned.nonEmpty)
  }

  test("mrl adaptive serve equals pinned candMult serve, budget stamped") {
    val floor = 0.6
    val sweep = VectorSearch.mrlCandSweep(emb, queries, k = 5,
        maxCandMult = 16, recallFloor = floor)
      .collect().map(r => (r.getInt(0), r.getDouble(3), r.getBoolean(4)))
    val expected = sweep.find(_._2 >= floor).map(_._1).getOrElse(16)
    val adaptive = VectorSearch.mrlAdaptiveTopK(emb, queries, queries,
        k = 5, maxCandMult = 16, recallFloor = floor)
    assert(adaptive.select($"cand_mult").distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(expected))
    val pinned = VectorSearch.mrlTopK(emb, queries, k = 5,
        candMult = expected)
      .orderBy($"qid", $"rank").collect().toSeq
    assert(adaptive.drop("cand_mult").orderBy($"qid", $"rank")
      .collect().toSeq == pinned)
    assert(pinned.nonEmpty)
  }
}
