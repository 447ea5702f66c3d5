package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dev tool: plan audit over every registered query — flags physical
  * operators that don't survive scale (cartesian products, nested-loop
  * joins, single-partition windows) so regressions are caught before
  * the bench does. Usage: runMain graft.tools.ExplainAll <sfDir>
  */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val flags = Seq(
      "CartesianProduct" -> "cartesian product",
      "BroadcastNestedLoopJoin" -> "nested-loop join",
      "No Partition Defined" -> "single-partition window")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val hits = flags.collect { case (pat, label) if plan.contains(pat) => label }
        println(s"[audit] $name: ${if (hits.isEmpty) "ok" else hits.mkString("; ")}")
      } catch {
        case e: Throwable => println(s"[audit] $name: ERROR ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
