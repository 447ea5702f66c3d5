package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of an event stream: a new session starts
  * when a user's inter-event gap exceeds `gapNs`. Beyond the reference
  * surface (its T1/T2 sweeps are batch polling); a training-data
  * pipeline needs this to turn raw interaction logs into
  * session-shaped examples.
  *
  * Scale posture: ONE shuffle (hash partition by user), then two
  * windows and the rollup all run inside the same user-partition — the
  * lag flag, the running session index, and the per-session aggregate
  * reuse one sort order, so Catalyst plans a single sort per
  * partition and no further exchange. Skewed power users are bounded:
  * window state is O(1) per row (lag + running sum, no buffering).
  * The streaming equivalent for live feeds is
  * `session_window`/`flatMapGroupsWithState` (see graft.streaming).
  */
object Sessionize {

  /** Sessions of (user_id, ts: long ns, event_id, value) events:
    * (user_id, session_idx, session_start, session_end, n_events,
    * total_value). `value` is summed as DECIMAL(18,2) so the total is
    * accumulation-order-independent, then surfaced as double.
    */
  def sessionize(events: DataFrame, gapNs: Long): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prevTs = lag(col("ts"), 1).over(byUser)
    events
      .withColumn("new_sess",
        when(prevTs.isNull || col("ts") - prevTs > gapNs, 1).otherwise(0))
      .withColumn("session_idx", sum(col("new_sess")).over(run))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(min(col("ts")).as("session_start"),
           max(col("ts")).as("session_end"),
           count(lit(1)).as("n_events"),
           sum(col("value").cast("decimal(18,2)")).cast("double")
             .as("total_value"))
  }
}
