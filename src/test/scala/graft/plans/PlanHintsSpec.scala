package graft.plans

import graft.SparkSpec
import graft.operators.PlanHints
import org.apache.spark.sql.DataFrame

/** Plan-position regression for `PlanHints.ndZero` (VERDICT r02 #9):
  * the `rand(7) * 0.0` bound perturbation relies on Catalyst never
  * constant-folding `rand * 0.0` and never pushing the perturbed
  * predicate into the join condition. A Spark upgrade could silently
  * undo either — this spec fails if the expensive predicate ever moves
  * back into a join node (where it would evaluate interpreted, outside
  * whole-stage codegen).
  */
class PlanHintsSpec extends SparkSpec {
  import spark.implicits._

  private def planLines(df: DataFrame): Array[String] = {
    df.collect() // finalize AQE before reading the executed plan
    df.queryExecution.executedPlan.toString.split('\n')
  }

  test("geqNonPushable keeps an expensive both-sides predicate out of the join") {
    val a = (1 to 200).map(i => (i.toLong, s"left name $i")).toDF("ka", "na")
    val b = (1 to 200).map(i => (i.toLong, s"left namf $i")).toDF("kb", "nb")
    val ratio = graft.functions.ColumnFunctions.levenshteinRatio($"na", $"nb")

    val pinned = a.join(b, $"ka" % 10 === $"kb" % 10)
      .filter(PlanHints.geqNonPushable(ratio, 80))
    val lines = planLines(pinned)
    val joinLines = lines.filter(_.contains("Join"))
    assert(joinLines.nonEmpty)
    assert(!joinLines.exists(_.contains("levenshtein")),
      s"expensive predicate was pushed into the join:\n${joinLines.mkString("\n")}")
    assert(lines.exists(l => l.contains("Filter") && l.contains("levenshtein")),
      "expected a standalone Filter carrying the levenshtein predicate")
    // and the pin must not change results
    val unpinned = a.join(b, $"ka" % 10 === $"kb" % 10).filter(ratio >= 80)
    assert(pinned.count() == unpinned.count())

    // control (informational): without the pin Catalyst pushes the
    // predicate into the join on current Spark — if this ever stops
    // happening, ndZero can be retired
    val controlJoins = planLines(unpinned).filter(_.contains("Join"))
    info(s"unpinned predicate in join: ${controlJoins.exists(_.contains("levenshtein"))}")
  }

  test("ndZero survives constant folding") {
    // spark.range: a LocalRelation would be evaluated away whole at
    // optimize time, taking the filter (and the test) with it
    val df = spark.range(1, 11).toDF("x")
      .filter(PlanHints.gtNonPushable($"x".cast("double"), 5.0))
    assert(df.count() == 5)
    assert(df.queryExecution.optimizedPlan.toString.contains("rand"),
      "rand*0.0 was constant-folded away — the pin no longer works")
  }
}
