package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** UniMax epoch-capped mixture allocation (Chung et al. 2023): split a
  * total token budget across domains as uniformly as possible while
  * capping every domain at `maxEpochs` passes over its own supply —
  * the sampling schedule that avoids over-epoching low-resource
  * domains (the mT5 lesson) without starving high-resource ones.
  *
  * The greedy loop of the paper ("give the smallest-supply domain
  * min(cap, remaining/budget-share), recurse") has a closed form:
  * with caps sorted ascending, g(i) = cap_i·(m−i) + cum_i is monotone,
  * so a single waterline index k = max{i : g(i) ≤ B} splits the
  * domains into fully-capped (i ≤ k) and equal-share (alloc =
  * ⌊R/(m−k)⌋ + 1 for the first R mod (m−k) by the same sort order) —
  * all integer arithmetic, so the SQL oracle matches exactly.
  *
  * Scale shape: the corpus is touched only by the caller's supply
  * aggregate (map-side combinable); everything here runs on the
  * DOMAIN-sized table (tens to thousands of rows at any corpus size),
  * where the single-partition sort window is the right plan, not a
  * bottleneck. Totals and the waterline attach via the codegen-safe
  * [[PlanHints.withScalars]].
  */
object Unimax {

  /** @param supplies one row per domain: (`keyCol`, `supplyCol`) with
    *                 positive integral supply (token counts).
    * @return (key, supply, cap, alloc, epochs) — alloc in supply
    *         units, Σ alloc = min(budget, Σ cap), epochs = alloc/supply
    *         rounded to 4 dp. Budget = Σ supply (one corpus epoch).
    */
  def epochAllocation(supplies: DataFrame, keyCol: String,
                      supplyCol: String, maxEpochs: Int = 2): DataFrame = {
    require(maxEpochs > 0, s"Unimax: maxEpochs must be positive ($maxEpochs)")
    val base = supplies.select(col(keyCol).as("key"),
        col(supplyCol).cast("long").as("supply"))
      .withColumn("cap", col("supply") * maxEpochs)
    val totals = base.agg(sum(col("supply")).as("budget"),
      count(lit(1)).as("m"))
    val w = Window.orderBy(col("cap"), col("key"))
    val o = PlanHints.withScalars(base, totals)
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("cap")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .localCheckpoint(eager = false) // feeds the waterline agg + output
    val waterline = o.agg(
      coalesce(max(when(col("cap") * (col("m") - col("i")) + col("cum")
        <= col("budget"), col("i"))), lit(0L)).as("kk"),
      coalesce(max(when(col("cap") * (col("m") - col("i")) + col("cum")
        <= col("budget"), col("cum"))), lit(0L)).as("cumk"))
    PlanHints.withScalars(o, waterline)
      .withColumn("alloc",
        when(col("i") <= col("kk"), col("cap"))
          .otherwise(expr("(budget - cumk) div (m - kk)")
            + when(col("i") - col("kk")
                <= expr("(budget - cumk) % (m - kk)"), lit(1L))
              .otherwise(lit(0L))))
      .select(col("key"), col("supply"), col("cap"), col("alloc"),
        round(col("alloc").cast("double") / col("supply").cast("double"), 4)
          .as("epochs"))
  }
}
