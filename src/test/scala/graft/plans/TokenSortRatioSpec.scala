package graft.plans

import graft.functions.Fuzzy
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

class TokenSortRatioSpec extends AnyFunSuite {

  // Extensions install at session build time, and getOrCreate() would
  // silently return another suite's extension-less shared session — so
  // clear the active/default sessions first to force a fresh session
  // (the underlying SparkContext, if any, is reused).
  private lazy val spark: SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
  }

  test("SQL function resolves to the native expression and matches the Scala impl") {
    import spark.implicits._
    val df = Seq(
      ("Martin Dugard", "Dugard, Martin"),
      ("J. R. R. Tolkien", "Tolkien, J. R. R."),
      ("Jane Austen", "Charles Dickens"),
      (null.asInstanceOf[String], "x"))
      .toDF("a", "b")
    df.createOrReplaceTempView("names")
    val rows = spark.sql(
      "SELECT a, b, token_sort_ratio(a, b) AS r FROM names").collect()
    rows.foreach { row =>
      val expected =
        if (row.isNullAt(0) || row.isNullAt(1)) null
        else Int.box(Fuzzy.tokenSortRatio(row.getString(0), row.getString(1)))
      assert(Option(row.get(2)).map(_.asInstanceOf[Int]) == Option(expected).map(_.asInstanceOf[Int]),
        s"for ${row.getString(0)} / ${row.getString(1)}")
    }
    // exact token permutations score 100
    assert(rows(0).getInt(2) == 100)
  }

  test("constant arguments fold at plan time") {
    val df = spark.sql("SELECT token_sort_ratio('abc def', 'def abc') AS r")
    // after constant folding the optimized plan contains a literal, not
    // the expression
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("100"), optimized)
    assert(!optimized.toLowerCase.contains("token_sort_ratio"), optimized)
  }

  test("DataFrame API usage via selectExpr") {
    import spark.implicits._
    val out = Seq(("a b", "b a")).toDF("x", "y")
      .selectExpr("token_sort_ratio(x, y)")
      .head().getInt(0)
    assert(out == 100)
  }
}
