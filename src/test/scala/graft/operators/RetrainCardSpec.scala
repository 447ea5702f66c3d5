package graft.operators

import graft.SparkSpec

/** The retrain-trigger card ([[VectorSearch.ivfRetrainCard]]) must
  * stay quiet on a healthy append and FLIP on a drifted one — the
  * feedback loop that tells a maintenance scheduler when the frozen
  * coarse quantizer has stopped describing the corpus. Drift is
  * synthesized the way it actually happens: the increment's
  * distribution moves away from what the centroids were trained on,
  * so frozen-centroid assignment funnels every new vector into one
  * cell. */
class RetrainCardSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8
  private val rnd = new scala.util.Random(47)

  /** A vector near one-hot center `c` scaled to 10, σ = 0.1 noise —
    * four well-separated clusters, so within-cluster cosine ≈ 1 and
    * cross-cluster ≈ 0 (recall at nProbe = 3 of 4 is exactly 1 on
    * healthy data; only genuine drift can flip the card). */
  private def near(c: Int): Array[Float] =
    Array.tabulate(dim)(d =>
      ((if (d == c) 10.0 else 0.0) + rnd.nextGaussian() * 0.1).toFloat)

  private def base = (0 until 160).map { i =>
    val c = i % 4
    (i.toLong, c, near(c))
  }.toDF("vec_id", "label", "embedding")

  private def queriesDf = (0 until 8).map { i =>
    (1000L + i, near(i % 4))
  }.toDF("qid", "qe")

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rmRf(dir: String): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    rm(new java.io.File(dir))
  }

  private def card(dir: String) = VectorSearch
    .ivfRetrainCard(spark, dir, queriesDf, k = 3, nProbe = 3, dim = dim)
    .head()

  test("healthy append keeps the card quiet; drifted append flips it") {
    // healthy: the increment is drawn from the same four clusters the
    // centroids were trained on — assignment stays balanced
    val okDir = tmpDir("graft_card_ok")
    try {
      VectorSearch.ivfWriteIndex(base, okDir, dim = dim)
      val inc = (200 until 208).map { i =>
        (i.toLong, near(i % 4)) }.toDF("vec_id", "embedding")
      VectorSearch.ivfAppendIndex(spark, okDir, inc, dim = dim)
      val ok = card(okDir)
      val okSkew = ok.getAs[Double]("skew")
      assert(okSkew < 1.5, s"healthy skew $okSkew")
      assert(ok.getAs[Double]("recall_at_k") >= 0.9)
      assert(!ok.getAs[Boolean]("rebuild_recommended"))
    } finally rmRf(okDir)

    // drifted: the corpus moved — every increment vector sits in a
    // region the quantizer never saw, so frozen assignment funnels
    // all 200 into the single nearest cell and occupancy skews
    val drDir = tmpDir("graft_card_drift")
    try {
      VectorSearch.ivfWriteIndex(base, drDir, dim = dim)
      val drift = (300 until 500).map { i =>
        val e = Array.tabulate(dim)(d =>
          ((if (d <= 1) 7.0 else 0.0) + rnd.nextGaussian() * 0.1).toFloat)
        (i.toLong, e)
      }.toDF("vec_id", "embedding")
      VectorSearch.ivfAppendIndex(spark, drDir, drift, dim = dim)
      val dr = card(drDir)
      val drSkew = dr.getAs[Double]("skew")
      // 160 base + 200 drifted into one cell: skew ≈ max·4/360 ≥ 2
      assert(drSkew > 1.5, s"drifted skew $drSkew should exceed 1.5")
      assert(dr.getAs[Boolean]("rebuild_recommended"),
        s"card must recommend a rebuild at skew $drSkew")
      // the recommended rebuild, executed: retrain on everything the
      // index holds — the drift region gets cells of its own, sized
      // like a retrained quantizer would size them (5 sub-cells of 40,
      // matching the base occupancy) — one atomic generation flip in
      // place — and the card reports recovery: the loop closes
      val rebuilt = base.select($"vec_id", $"label", $"embedding")
        .unionByName((300 until 500).map { i =>
          val e = Array.tabulate(dim)(d =>
            ((if (d <= 1) 7.0 else 0.0) + rnd.nextGaussian() * 0.1).toFloat)
          (i.toLong, 4 + i % 5, e)
        }.toDF("vec_id", "label", "embedding"))
      VectorSearch.ivfWriteIndex(rebuilt, drDir, dim = dim)
      val post = card(drDir)
      assert(post.getAs[Double]("skew") < 1.5)
      assert(!post.getAs[Boolean]("rebuild_recommended"),
        "rebuilt card must report recovery")
    } finally rmRf(drDir)
  }
}
