package graft.operators

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("stratified sample: exact quota per stratum with floor of 1") {
    val df = (1L to 100L).map(i =>
        (i, if (i <= 90) "en" else if (i <= 99) "fr" else "de"))
      .toDF("doc_id", "lang")
    val out = Sampling.stratified(df, Seq("lang"), "doc_id", fraction = 0.2)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byLang = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLang("en") == 18) // ceil(0.2 * 90)
    assert(byLang("fr") == 2)  // ceil(0.2 * 9)
    assert(byLang("de") == 1)  // floor: ceil(0.2 * 1) = 1
  }

  test("stratified sample is deterministic (hash order, not rand)") {
    val df = (1L to 50L).map(i => (i, "en")).toDF("doc_id", "lang")
    val a = Sampling.stratified(df, Seq("lang"), "doc_id", 0.1)
      .collect().map(_.getLong(0)).sorted.toSeq
    val b = Sampling.stratified(df, Seq("lang"), "doc_id", 0.1)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b && a.length == 5)
  }

  test("threshold sample: rate near fraction, deterministic, nested") {
    val df = (1L to 10000L).map(i => (i, s"l${i % 3}")).toDF("doc_id", "lang")
    val at20 = Sampling.stratifiedThreshold(df, Seq("lang"), "doc_id", 0.2)
      .collect().map(_.getLong(0)).toSet
    assert(at20.size > 1700 && at20.size < 2300, at20.size)
    // nested property: a smaller fraction's sample is a subset of a
    // larger one's (same hash, lower bound) — reproducible downsampling
    val at05 = Sampling.stratifiedThreshold(df, Seq("lang"), "doc_id", 0.05)
      .collect().map(_.getLong(0)).toSet
    assert(at05.subsetOf(at20) && at05.size > 350 && at05.size < 650, at05.size)
  }

  test("threshold sample: fraction edges keep all / none") {
    val df = (1L to 100L).map(i => (i, "en")).toDF("doc_id", "lang")
    assert(Sampling.stratifiedThreshold(df, Seq("lang"), "doc_id", 1.0).count() == 100)
    assert(Sampling.stratifiedThreshold(df, Seq("lang"), "doc_id", 0.0).count() == 0)
  }

  test("threshold mixture: per-stratum bounds give per-stratum rates") {
    import org.apache.spark.sql.functions.{lit, when}
    val df = (1L to 9000L).map(i => (i, s"src${i % 3}")).toDF("doc_id", "source")
    val bound = when($"source" === "src0", lit(Sampling.hexBound(0.5)))
      .when($"source" === "src1", lit(Sampling.hexBound(0.25)))
      .otherwise(lit(Sampling.hexBound(0.0)))
    val out = Sampling.thresholdByBound(df, Seq("source"), "doc_id", bound)
      .collect().map(r => r.getString(1))
    val bySrc = out.groupBy(identity).view.mapValues(_.length).toMap
    assert(bySrc.getOrElse("src2", 0) == 0)
    assert(bySrc("src0") > 1350 && bySrc("src0") < 1650, bySrc)
    assert(bySrc("src1") > 600 && bySrc("src1") < 900, bySrc)
  }

  private def deepMessages(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")

  test("contract violations raise instead of silently perturbing hash order") {
    val nullId = Seq((Some(1L), "en"), (None: Option[Long], "en"))
      .toDF("doc_id", "lang")
    val e1 = intercept[Throwable] {
      Sampling.stratifiedThreshold(nullId, Seq("lang"), "doc_id", 0.5).collect()
    }
    assert(deepMessages(e1).contains("Sampling: NULL doc_id"), deepMessages(e1))

    val badStratum = Seq((1L, "en|fr")).toDF("doc_id", "lang")
    val e2 = intercept[Throwable] {
      Sampling.stratified(badStratum, Seq("lang"), "doc_id", 0.5).collect()
    }
    assert(deepMessages(e2).contains("reserved '|'"), deepMessages(e2))

    // windowed path: a pre-existing rn/n_stratum column would be
    // silently overwritten then dropped — must raise at plan time
    val clash = Seq((1L, "en", 7)).toDF("doc_id", "lang", "rn")
    val e3 = intercept[IllegalArgumentException] {
      Sampling.stratified(clash, Seq("lang"), "doc_id", 0.5)
    }
    assert(e3.getMessage.contains("reserved"), e3.getMessage)
  }

  test("split assignment: disjoint, exhaustive, near-weight, stable") {
    val df = (1L to 10000L).map(i => (i, s"l${i % 3}")).toDF("doc_id", "lang")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Sampling.splitAssign(df, "doc_id", splits)
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    // exhaustive: every row assigned to exactly one split (withColumn
    // guarantees one value; the ELSE branch guarantees non-null)
    assert(out.size == 10000 && out.values.forall(Set("train", "val", "test")))
    val sizes = out.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(sizes("train") > 7700 && sizes("train") < 8300, sizes)
    assert(sizes("val") > 800 && sizes("val") < 1200, sizes)
    assert(sizes("test") > 800 && sizes("test") < 1200, sizes)
    // stability under growth: assignments on a superset corpus agree on
    // the original rows — the frozen-eval-set property
    val grown = (1L to 20000L).map(i => (i, s"l${i % 3}")).toDF("doc_id", "lang")
    val out2 = Sampling.splitAssign(grown, "doc_id", splits)
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(out.forall { case (id, s) => out2(id) == s })
  }

  test("temperature mixture: rare strata upsample, alpha=1 is proportional") {
    // 900/90/10 skew at alpha=0.5: w ∝ sqrt(n) boosts rare strata
    val rows = (1L to 900L).map((_, "big")) ++
      (1001L to 1090L).map((_, "mid")) ++ (2001L to 2010L).map((_, "rare"))
    val df = rows.toDF("doc_id", "src")
    val out = Sampling.temperatureThreshold(df, "src", "doc_id", target = 0.2)
      .collect().map(r => r.getString(1))
    val byStratum = out.groupBy(identity).view.mapValues(_.size).toMap
    // expected f: N=1000, S=sqrt(900)+sqrt(90)+sqrt(10)=42.65:
    //   big ≈ 0.14, mid ≈ 0.44, rare ≈ 1.48 → clamped to 1
    assert(byStratum("rare") == 10, s"clamped rare stratum keeps all: $byStratum")
    val fBig = byStratum("big") / 900.0
    val fMid = byStratum("mid") / 90.0
    assert(fBig > 0.09 && fBig < 0.20, s"big ≈ 0.14 expected: $byStratum")
    assert(fMid > 0.30 && fMid < 0.60, s"mid ≈ 0.44 expected: $byStratum")
    // alpha = 1: every stratum's fraction collapses to target — the
    // output must EQUAL the plain proportional threshold sample
    val temp1 = Sampling.temperatureThreshold(df, "src", "doc_id",
        target = 0.2, alpha = 1.0)
      .collect().map(_.getLong(0)).toSet
    val plain = Sampling.stratifiedThreshold(df, Seq("src"), "doc_id", 0.2)
      .collect().map(_.getLong(0)).toSet
    assert(temp1 == plain)
    // contract guards
    intercept[IllegalArgumentException] {
      Sampling.temperatureThreshold(df, "src", "doc_id", target = 0.0)
    }
    intercept[IllegalArgumentException] {
      Sampling.temperatureThreshold(df, "src", "doc_id", target = 0.2,
        alpha = 1.5)
    }
    val withNull = rows.toDF("doc_id", "src")
      .withColumn("src", org.apache.spark.sql.functions
        .when($"doc_id" === 1L, null).otherwise($"src"))
    intercept[IllegalArgumentException] {
      Sampling.temperatureThreshold(withNull, "src", "doc_id", target = 0.2)
    }
  }

  test("split assignment: bounds equal the literal-weight hexBounds") {
    // 0.7+0.2 in doubles is 0.8999999999999999 — the regression this
    // pins is the kernel's cumulative bound drifting off hexBound(0.9),
    // the literal an oracle author would write. Independent md5 replay:
    val splits = Seq("a" -> 0.7, "b" -> 0.2, "c" -> 0.1)
    val b1 = Sampling.hexBound(0.7)
    val b2 = Sampling.hexBound(0.9)
    val md = java.security.MessageDigest.getInstance("MD5")
    def expected(id: Long): String = {
      val hex = md.digest(s"graft-split|$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      if (hex < b1) "a" else if (hex < b2) "b" else "c"
    }
    val df = (1L to 5000L).map(i => (i, "x")).toDF("doc_id", "lang")
    val got = Sampling.splitAssign(df, "doc_id", splits)
      .collect().map(r => (r.getLong(0), r.getString(2)))
    got.foreach { case (id, s) => assert(s == expected(id), s"doc $id") }
  }

  test("weighted priority sample: equals the scalar bottom-k reference") {
    val rows = (1L to 200L).map(i => (i, 1L + (i * 7) % 50))
    val df = rows.toDF("doc_id", "w")
    val out = Sampling.weightedPriority(df, "doc_id", "w", k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    // scalar reference: first 13 md5 hex digits of "graft-wrs|id" over w
    val md = java.security.MessageDigest.getInstance("MD5")
    def priority(id: Long, w: Long): Double = {
      val hex = md.digest(s"graft-wrs|$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(13)
      java.lang.Long.parseLong(hex, 16).toDouble / w
    }
    val expect = rows.map { case (id, w) => (id, priority(id, w)) }
      .sortBy { case (id, p) => (p, id) }.take(20)
    assert(out.toSeq == expect,
      s"spark=${out.take(3).toSeq} ref=${expect.take(3)}")
  }

  test("weighted priority sample: heavier rows are drawn more often") {
    // 500 rows, every 10th has weight 100 vs 1 — the heavy 10% should
    // dominate a k=50 draw (expected ~45 of 50 at these odds)
    val df = (1L to 500L).map(i => (i, if (i % 10 == 0) 100L else 1L))
      .toDF("doc_id", "w")
    val picked = Sampling.weightedPriority(df, "doc_id", "w", k = 50)
      .collect().map(_.getLong(0))
    val heavy = picked.count(_ % 10 == 0)
    assert(heavy > 35, s"only $heavy/50 heavy rows drawn")
  }

  test("weighted priority sample: contract guards") {
    val df = Seq((1L, 0L), (2L, 5L)).toDF("doc_id", "w")
    val e = intercept[Exception] {
      Sampling.weightedPriority(df, "doc_id", "w", k = 2).collect()
    }
    assert(e.getMessage.contains("weight"), e.getMessage)
    val reserved = Seq((1L, 5L, 0.0)).toDF("doc_id", "w", "priority")
    val r = intercept[IllegalArgumentException] {
      Sampling.weightedPriority(reserved, "doc_id", "w", k = 1)
    }
    assert(r.getMessage.contains("reserved"), r.getMessage)
  }

  test("split assignment: contract guards") {
    val df = Seq((1L, "en")).toDF("doc_id", "lang")
    intercept[IllegalArgumentException] { // weights must sum to 1
      Sampling.splitAssign(df, "doc_id", Seq("a" -> 0.5, "b" -> 0.4))
    }
    intercept[IllegalArgumentException] { // reserved output column
      Sampling.splitAssign(df.withColumnRenamed("lang", "split"), "doc_id",
        Seq("a" -> 1.0))
    }
    // single split: everything lands in it
    val one = Sampling.splitAssign(df, "doc_id", Seq("all" -> 1.0))
      .collect().map(_.getString(2))
    assert(one.toSeq == Seq("all"))
  }

  test("token budget: realized mass tracks share*budget; unlisted excluded") {
    import org.apache.spark.sql.functions.col
    // src A: 4000 docs x 10 tokens = 40k; src B: 1000 x 10 = 10k; C unlisted
    val df = ((1L to 4000L).map(i => (i, "A", 10)) ++
              (5001L to 6000L).map(i => (i, "B", 10)) ++
              (9001L to 9100L).map(i => (i, "C", 10)))
      .toDF("doc_id", "source", "n_toks")
    val out = Sampling.tokenBudgetThreshold(df, "source", "doc_id",
        col("n_toks"), budgetTokens = 20000L,
        shares = Seq("A" -> 0.5, "B" -> 0.5))
      .collect().map(r => (r.getString(1), r.getInt(2)))
    val mass = out.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    // A: 10k budget of 40k mass -> keep ~25%; B: 10k of 10k -> clamp, all
    assert(mass("B") == 10000)
    assert(math.abs(mass("A") - 10000) < 1500, s"A mass ${mass("A")}")
    assert(!mass.contains("C")) // zero budget -> excluded
    // deterministic
    val again = Sampling.tokenBudgetThreshold(df, "source", "doc_id",
        col("n_toks"), 20000L, Seq("A" -> 0.5, "B" -> 0.5))
      .collect().map(r => (r.getString(1), r.getInt(2)))
    assert(again.toSeq == out.toSeq)
    // guards
    intercept[IllegalArgumentException] {
      Sampling.tokenBudgetThreshold(df, "source", "doc_id", col("n_toks"),
        0L, Seq("A" -> 1.0)) }
    intercept[IllegalArgumentException] {
      Sampling.tokenBudgetThreshold(df, "source", "doc_id", col("n_toks"),
        100L, Seq("A" -> 0.4, "B" -> 0.4)) }
  }

  test("curriculum shard: same shards as shuffle, score-ordered within") {
    import org.apache.spark.sql.functions.col
    val df = (1L to 500L).map(i => (i, (i * 37 % 101).toDouble))
      .toDF("doc_id", "score")
    val cur = Sampling.curriculumShard(df, "doc_id", 8,
        Seq(col("score").desc))
      .collect().map(r => (r.getAs[Int]("shard"), r.getAs[Int]("pos"),
                           r.getAs[Long]("doc_id"), r.getAs[Double]("score")))
    val shuf = Sampling.shuffleShard(df, "doc_id", 8)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("shard")))
      .toMap
    // identical shard assignment, curriculum order within each shard
    cur.foreach { case (s, _, id, _) => assert(shuf(id) == s) }
    cur.groupBy(_._1).foreach { case (_, rows) =>
      val scores = rows.sortBy(_._2).map(_._4)
      assert(scores.zip(scores.tail).forall { case (x, y) => x >= y }) }
  }

  test("shuffle shard: permutation, balance, determinism, guards") {
    val df = (1L to 2000L).map(i => (i, s"src${i % 4}"))
      .toDF("doc_id", "source")
    val out = Sampling.shuffleShard(df, "doc_id", shards = 8)
      .collect().map(r => (r.getAs[Int]("shard"), r.getAs[Int]("pos"),
                           r.getAs[Long]("doc_id")))
    // a permutation: every doc exactly once, positions 1..|shard| dense
    assert(out.map(_._3).sorted.toSeq == (1L to 2000L))
    out.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.length)) }
    // md5-balanced: no shard more than 2x the mean
    val sizes = out.groupBy(_._1).view.mapValues(_.length).toMap
    assert(sizes.size == 8 && sizes.values.max < 2 * 250)
    // stable under re-run and NOT the input order (it actually mixes)
    val again = Sampling.shuffleShard(df, "doc_id", shards = 8)
      .collect().map(r => (r.getAs[Int]("shard"), r.getAs[Int]("pos"),
                           r.getAs[Long]("doc_id")))
    assert(again.toSeq.sorted == out.toSeq.sorted)
    val shard0 = out.filter(_._1 == 0).sortBy(_._2).map(_._3)
    assert(shard0.toSeq != shard0.sorted.toSeq)
    // reserved-column + argument guards
    intercept[IllegalArgumentException] {
      Sampling.shuffleShard(df.withColumn("pos", $"doc_id"), "doc_id", 8) }
    intercept[IllegalArgumentException] {
      Sampling.shuffleShard(df, "doc_id", 0) }
  }
}
