package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, concat, conv, lit, md5, pmod, substring}
import org.scalatest.funsuite.AnyFunSuite

class Md5BucketSpec extends AnyFunSuite {

  // fresh session with the extension (see TokenSortRatioSpec for why
  // the shared session cannot be reused here)
  private lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[2]")
      .appName("graft-md5bucket-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
  }

  test("native bucket equals the builtin hex-substring chain, incl. unicode") {
    import spark.implicits._
    val toks = Seq("", "a", "the", "tok123", "naïve", "日本語テキスト",
      "ctrl", "𝔘𝔫𝔦𝔠𝔬𝔡𝔢", "a b", "|", "graft-qc|x")
    val df = (toks ++ (1 to 500).map(i => s"w$i")).toDF("tok")
    for (buckets <- Seq(1, 7, 256, 4096)) {
      val builtin = pmod(
        conv(substring(md5(concat(lit("graft-qc|"), col("tok"))), 1, 13),
          16, 10).cast("long"),
        lit(buckets.toLong)).cast("int")
      val native = org.apache.spark.sql.graft.ColumnBridge.column(
        Md5Bucket(
          org.apache.spark.sql.graft.ColumnBridge
            .expression(lit("graft-qc|")),
          org.apache.spark.sql.graft.ColumnBridge
            .expression(col("tok")),
          buckets))
      val bad = df.select(col("tok"), builtin.as("b"), native.as("n"))
        .filter(col("b") =!= col("n")).collect()
      assert(bad.isEmpty, s"buckets=$buckets: ${bad.mkString(",")}")
    }
  }

  test("SQL registration, null semantics, constant folding") {
    val rows = spark.sql(
      "SELECT md5_bucket('s|', 'tok', 256) AS a, " +
        "md5_bucket('s|', CAST(NULL AS STRING), 256) AS b").collect()
    assert(!rows(0).isNullAt(0))
    assert(rows(0).isNullAt(1), "null token must yield null bucket")
    val optimized = spark.sql("SELECT md5_bucket('s|', 'tok', 256) AS r")
      .queryExecution.optimizedPlan.toString
    assert(!optimized.toLowerCase.contains("md5_bucket"),
      s"constant args must fold: $optimized")
    // a foldable-but-null bucket count is an analysis error with the
    // registration's own message, never an NPE at plan time
    val nullBuckets = intercept[Throwable] {
      spark.sql("SELECT md5_bucket('s|', 'tok', CAST(NULL AS INT))").collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      t +: Option(t.getCause).toSeq.flatMap(chain)
    assert(chain(nullBuckets).exists(
        _.getMessage.contains("must be an int literal")),
      s"expected the int-literal message, got: $nullBuckets")
  }

  test("interpreted eval matches codegen kernel") {
    import org.apache.spark.unsafe.types.UTF8String
    val e = Md5Bucket(
      org.apache.spark.sql.catalyst.expressions.Literal("graft-qc|"),
      org.apache.spark.sql.catalyst.expressions.Literal("token"), 256)
    assert(e.eval(null) == Md5Bucket.compute(
      UTF8String.fromString("graft-qc|"), UTF8String.fromString("token"), 256))
  }
}
