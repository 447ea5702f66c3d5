package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content Cafe SOAP demand-history source (ref
  * `content_cafe.py:351-424`): the SOAP envelope snapshot parses to
  * per-warehouse demand items (`XmlKernels.demandHistory`), monthly
  * totals aggregate per key, and the popularity estimate is the max
  * recent monthly total or half the all-time max, whichever is greater
  * — all set-oriented (one narrow parse, one grouped agg, one
  * conditional agg), vs the reference's per-ISBN SOAP call + Counter.
  */
object DemandHistory {

  /** gather_popularity (ref `content_cafe.py:384-394`): total demand
    * per (key, year, month) — warehouses/suppliers summed together. */
  def gatherPopularity(items: DataFrame): DataFrame =
    items.groupBy(col("key"), col("year"), col("month"))
      .agg(sum(col("demand")).as("monthly_demand"))

  /** estimate_popularity (ref `content_cafe.py:396-424`): per key, the
    * max monthly total within the cutoff window, or half the all-time
    * max when the window is empty. Keys with no demand rows are simply
    * absent (the reference's None — distinct from measured zero). */
  def estimatePopularity(monthly: DataFrame, asOf: Column,
                         cutoffDays: Option[Int] = None): DataFrame = {
    val monthDate = to_date(concat(col("year"), lit("-"),
      lpad(col("month").cast("string"), 2, "0"), lit("-01")))
    val isRecent = cutoffDays match {
      case Some(d) => monthDate >= date_sub(asOf, d)
      case None => lit(true)
    }
    monthly.groupBy(col("key"))
      .agg(max(col("monthly_demand")).cast("double").as("max_lifetime"),
           max(when(isRecent, col("monthly_demand"))).cast("double").as("max_recent"))
      .select(col("key"),
        when(col("max_recent").isNotNull,
            greatest(col("max_recent"), col("max_lifetime") * 0.5))
          .otherwise(col("max_lifetime") * 0.5).as("popularity"))
  }
}
