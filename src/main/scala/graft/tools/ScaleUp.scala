package graft.tools

import graft.Env
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: synthesize an ~sf1 dataset from sf0.1 by unioning 10
  * key-remapped copies (the driver only generates up to sf0.1; the
  * 100× scaling story needs a third measured point). Every key space
  * is shifted by copy·10⁹ so FK joins stay consistent; fixed dims
  * (region/nation) are left at TPC-H's fixed cardinality, exactly as a
  * real larger SF would. Document text is positionally salted per copy
  * (every 5th token) so cross-copy near-dup pairs fall well below the
  * 0.8 verify threshold — pair counts grow ~linearly like a real
  * corpus, not quadratically like naive duplication — while intra-copy
  * planted near-dups keep their similarity (both sides of a pair get
  * the same positional salt). Event times shift 1h per copy.
  *
  * Usage: runMain graft.tools.ScaleUp <srcDir> <dstDir> [copies]
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/root/repo/.scratch/sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val env = Env(spark, src)
    val M = 1000000000L

    def replicate(df: DataFrame)(remap: (DataFrame, Long) => DataFrame)
        : DataFrame =
      (0 until copies).map(k => remap(df, k * M)).reduce(_ unionByName _)

    def shiftKeys(keys: String*)(df: DataFrame, off: Long): DataFrame =
      keys.foldLeft(df)((d, c) => d.withColumn(c, col(c) + off))

    val saltTok = udf { (text: String, k: Long) =>
      if (text == null) null
      else {
        val toks = text.split(" ", -1)
        var i = 0
        while (i < toks.length) {
          if (i % 5 == 0) toks(i) = toks(i) + "~" + k
          i += 1
        }
        toks.mkString(" ")
      }
    }

    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scaleup] $name: ${spark.read.parquet(s"$dst/$name.parquet").count()} rows")
    }

    write("region", env.region)
    write("nation", env.nation)
    write("customer", replicate(env.customer)(shiftKeys("c_custkey")))
    write("supplier", replicate(env.supplier)(shiftKeys("s_suppkey")))
    write("part", replicate(env.part)(shiftKeys("p_partkey")))
    write("orders", replicate(env.orders)(shiftKeys("o_orderkey", "o_custkey")))
    write("lineitem", replicate(env.lineitem)(
      shiftKeys("l_orderkey", "l_partkey", "l_suppkey")))
    write("events", replicate(env.events) { (df, off) =>
      shiftKeys("event_id", "user_id")(df, off)
        .withColumn("ts", col("ts") + lit(off / M * 3600L * 1000000000L))
    })
    write("documents", replicate(env.documents) { (df, off) =>
      shiftKeys("doc_id")(df, off)
        .withColumn("text", saltTok(col("text"), lit(off / M)))
    })
    write("embeddings", replicate(env.embeddings)(shiftKeys("vec_id")))
    spark.stop()
  }
}
