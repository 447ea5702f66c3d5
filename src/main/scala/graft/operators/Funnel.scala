package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequential event-pattern analytics over an event stream: funnel
  * completion (did the user do A, then B after it, then C after that)
  * and cohort retention (of the users who first appeared on day D, how
  * many were active again D+k). The two standard product-analytics
  * rollups; neither is expressible as a plain groupBy, both reduce to
  * conditional aggregates chained on a per-user key.
  *
  * Scale posture: every aggregate and join keys on the user id, so the
  * whole chain lives in ONE hash-partitioning of the events table —
  * the stage aggregates and the stage joins are co-partitioned and AQE
  * reuses the exchange instead of reshuffling (the same posture as the
  * gram-dedup join). No windows over the raw stream, no per-user
  * collect_list (a power user with 10⁸ events costs an aggregate, not
  * a buffered array). Step timestamps use STRICT `>` against the
  * previous step, so simultaneous events never satisfy two stages and
  * the result is deterministic without an event-id tie-break.
  */
object Funnel {

  /** Earliest strictly-ordered completion chain of `steps` per user:
    * t₁ = min ts of step 1, tᵢ = min ts of step i with ts > tᵢ₋₁.
    * Emits every user seen in the stream with the per-step timestamps
    * (NULL once the chain breaks) and n_stages reached — the funnel
    * report is one further groupBy(n_stages) away.
    *
    * @param tsCol long timestamps (any epoch unit, only compared)
    */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "Funnel: at least one step required")
    require(steps.distinct.size == steps.size,
      s"Funnel: duplicate step names in ${steps.mkString(",")} (a repeated " +
        "stage needs distinct labels to anchor its strict-order chain)")
    val base = events.select(col(userCol).as("user_id"),
      col(typeCol).as("et"), col(tsCol).as("ts"))
    val users = base.select(col("user_id")).distinct()
    val stages = steps.zipWithIndex.map { case (s, i) => (s, s"t_$s", i) }
    val out = stages.foldLeft(users) { case (acc, (step, tname, i)) =>
      val prev = if (i == 0) lit(0L) else col(stages(i - 1)._2)
      // first-stage min is unconditional; later stages gate on the
      // previous stage's timestamp (NULL prev → NULL gate → no rows
      // aggregate → NULL, the broken-chain case)
      val stage = base.filter(col("et") === step)
        .groupBy(col("user_id")).agg(min(col("ts")).as("m"))
      val cond =
        if (i == 0) acc.join(stage, Seq("user_id"), "left")
          .withColumn(tname, col("m")).drop("m")
        else {
          val s2 = base.filter(col("et") === step)
            .select(col("user_id").as("u2"), col("ts").as("ts2"))
          acc.join(s2, col("user_id") === col("u2") && col("ts2") > prev,
              "left")
            .groupBy(acc.columns.map(col): _*)
            .agg(min(col("ts2")).as(tname))
        }
      cond
    }
    val nStages = stages.map { case (_, t, _) => when(col(t).isNotNull, 1) }
      .reduce((a, b) => a + coalesce(b, lit(0)))
    out.withColumn("n_stages", coalesce(nStages, lit(0)).cast("int"))
  }

  /** Cohort retention: cohort = the day (ts div `dayUnit`) of the
    * user's FIRST event; a user is retained at offset k when any event
    * falls on cohort day + k. Emits (cohort_day, day_offset, n_users)
    * — the retention triangle. Integer day arithmetic only, so the
    * oracle replays it exactly. */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
                      dayUnit: Long): DataFrame = {
    // `div`, not `/`: Divide on longs is DOUBLE division, and an
    // epoch-nanos timestamp (~1.7e18) is far past 2^53 — the rounded
    // quotient would misplace events near day boundaries
    val base = events.select(col(userCol).as("user_id"),
      expr(s"CAST($tsCol AS BIGINT) div ${dayUnit}L").as("day"))
    val cohort = base.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    base.join(cohort, Seq("user_id"))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }
}
