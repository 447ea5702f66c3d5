package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  private val large = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, s"v$i"))
    .toDF("k", "payload")                      // key 1 is hot: 900 of 1000 rows
  private val small = Seq((1L, "dim1"), (950L, "dim950"), (999L, "dim999"))
    .toDF("k", "dim")

  test("salted join returns exactly the plain join's rows") {
    val plain = large.join(small, Seq("k"))
      .select("k", "payload", "dim").collect().toSet
    val salted = SkewJoin.saltedJoin(large, small, "k", factor = 8)
      .select("k", "payload", "dim").collect().toSet
    assert(salted == plain)
    assert(plain.size == 902)
  }

  test("hot-key variant matches too") {
    val plain = large.join(small, Seq("k"))
      .select("k", "payload", "dim").collect().toSet
    val hot = SkewJoin.saltedJoinHotKeys(large, small, "k",
        hotKeys = Seq(1L), factor = 4)
      .select("k", "payload", "dim").collect().toSet
    assert(hot == plain)
  }

  test("salt actually spreads the hot key across partitions") {
    val salted = large.withColumn("_salt", (rand(11) * 8).cast("int"))
      .filter($"k" === 1L)
      .groupBy("_salt").count().collect()
    assert(salted.length > 4, "hot key should spread over most salt buckets")
  }
}
