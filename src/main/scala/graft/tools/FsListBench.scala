package graft.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Dev micro-bench: Hadoop FS listing/stat cost on a many-small-file
  * local directory vs raw java.nio — isolates the per-file metadata
  * overhead the commit path pays. Usage: runMain ... <dir> */
object FsListBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp")
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[fsb] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    for (_ <- 1 to 2) {
      val n1 = t("hadoop listFiles(recursive)") {
        val it = fs.listFiles(p, true)
        var n = 0
        while (it.hasNext) { it.next(); n += 1 }
        n
      }
      val n2 = t("hadoop listStatus(top)") {
        fs.listStatus(p).length
      }
      val n3 = t("nio Files.walk") {
        val s = java.nio.file.Files.walk(java.nio.file.Paths.get(
          dir.stripPrefix("file:")))
        try s.filter(java.nio.file.Files.isRegularFile(_)).count()
        finally s.close()
      }
      println(s"[fsb] counts: $n1 / $n2 / $n3")
    }
    spark.stop()
  }
}
