package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: A/B the native [[graft.plans.Md5Bucket]] expression
  * against the builtin pmod/conv/substring/md5 chain it replaced, on
  * the real sf0.1 token stream (checkpointed once so both sides read
  * identical input; noop-write action). Recorded result 2026-08:
  * builtin ~0.25 s vs native ~0.10 s steady state over 270k tokens —
  * the 2.5× quoted in the Md5Bucket scaladoc.
  * Usage: runMain graft.tools.Md5BucketBench
  */
object Md5BucketBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), explode(split(col("text")," ")).as("tok"))
      .localCheckpoint(true)
    println("rows: " + df.count())
    def time(name: String)(c: org.apache.spark.sql.Column): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        df.select(c.as("f")).write.format("noop").mode("overwrite").save()
        println(f"$name rep$i: ${(System.nanoTime()-t0)/1e9}%.3f s")
      }
    }
    val builtin = pmod(conv(substring(md5(concat(lit("graft-qc|"), col("tok"))),1,13),16,10).cast("long"), lit(256L)).cast("int")
    val native = org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.Md5Bucket(
        org.apache.spark.sql.graft.ColumnBridge.expression(lit("graft-qc|")),
        org.apache.spark.sql.graft.ColumnBridge.expression(col("tok")), 256))
    time("builtin")(builtin); time("native")(native)
    time("builtin2")(builtin); time("native2")(native)
    spark.stop()
  }
}
