package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def reference(a: Long, b: Long, bits: Int): Long =
    (0 until bits).map { i =>
      (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }.reduce(_ | _)

  test("interleave matches the scalar reference over a grid") {
    val rows = for (a <- 0L to 40L; b <- 0L to 40L) yield (a, b)
    val got = rows.toDF("a", "b")
      .select($"a", $"b", ZOrder.zorderCode($"a", $"b").as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    for ((a, b) <- rows)
      assert(got((a, b)) == reference(a, b, 21), s"($a,$b)")
  }

  test("z-order clusters both dimensions: quadrant prefix property") {
    // the top interleaved bits are the quadrant: all (a,b) in the same
    // half-plane pair share them, so a sort groups quadrants together
    def quadrant(z: Long) = z >> 40
    for (a <- Seq(0L, 1000000L); b <- Seq(0L, 1000000L)) {
      val z = reference(a, b, 21)
      assert(quadrant(z) == ((b >> 20 << 1) | (a >> 20)), s"($a,$b)")
    }
  }

  test("out-of-range input raises instead of wrapping") {
    val err = intercept[Exception] {
      Seq((1L << 22, 1L)).toDF("a", "b")
        .select(ZOrder.zorderCode(col("a"), col("b"))).collect()
    }
    assert(err.getMessage.contains("ZOrder"))
    intercept[IllegalArgumentException] {
      ZOrder.zorderCode(col("a"), col("b"), bits = 0)
    }
  }
}
