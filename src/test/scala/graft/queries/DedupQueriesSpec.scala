package graft.queries

import graft.SparkSpec
import graft.operators.TextDedup
import org.apache.spark.sql.functions._

class DedupQueriesSpec extends SparkSpec {
  import spark.implicits._

  test("bandingPrecondition: banded MinHash finds EVERY brute pair >= 0.8 on the corpus") {
    // The dedup/fuzzy-decontaminate oracles assert EXACT equality
    // between banded-MinHash output and a brute-force Jaccard ground
    // truth at threshold 0.8. The 16x4 banding misses a pair at
    // jaccard j with prob (1-j^4)^16 over the hash seeds — ~2e-4 at
    // 0.8, ~1.5e-7 at the corpus's lowest real pair (j = 0.889
    // between docs 33/436 at sf0.001) — and with FIXED md5 seeds the
    // outcome is frozen per corpus: a pair either always bands
    // together or never does. This pin checks the frozen outcome
    // directly — banded recall == 1 on this corpus — so a testdata
    // regeneration or seed change that strands a marginal pair fails
    // here before the driver's oracle comparison goes red.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val shingled = docs
      .select($"doc_id".cast("long"), TextDedup.shingles($"text").as("g"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toSet))
    val brute = (for {
      i <- shingled.indices.iterator
      j <- (i + 1 until shingled.length).iterator
      inter = (shingled(i)._2 & shingled(j)._2).size
      if inter > 0
      jac = inter.toDouble / (shingled(i)._2 | shingled(j)._2).size
      if jac >= 0.8
    } yield {
      val (a, b) = (shingled(i)._1, shingled(j)._1)
      (math.min(a, b), math.max(a, b))
    }).toSet
    val banded = TextDedup
      .minhashNearDupPairs(docs, "doc_id", "text", threshold = 0.8)
      .select($"doc_a", $"doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "corpus lost its planted near-dup pairs")
    assert(banded == brute,
      s"banded/brute mismatch: missed=${(brute -- banded).take(5)} " +
        s"extra=${(banded -- brute).take(5)}")
  }
}
