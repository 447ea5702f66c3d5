package graft.operators

import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  test("funnel: strict ordering, broken chains, simultaneous events") {
    val events = Seq(
      // u1 completes in order
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      // u2 clicks BEFORE viewing — chain breaks at stage 2
      (2L, "click", 5L), (2L, "view", 10L),
      // u3 purchase simultaneous with click: strict > rejects it
      (3L, "view", 1L), (3L, "click", 2L), (3L, "purchase", 2L),
      // u4 never views
      (4L, "click", 1L),
      // u5: earliest chain picked among repeats
      (5L, "view", 1L), (5L, "view", 50L), (5L, "click", 3L),
      (5L, "purchase", 2L), (5L, "purchase", 7L)
    ).toDF("user_id", "event_type", "ts")
    val out = Funnel.funnel(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .orderBy($"user_id").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)),
                 Option(r.get(3)), r.getInt(4)))
    assert(out.toSeq == Seq(
      (1L, Some(10L), Some(20L), Some(30L), 3),
      (2L, Some(10L), None, None, 1),
      (3L, Some(1L), Some(2L), None, 2),
      (4L, None, None, None, 0),
      (5L, Some(1L), Some(3L), Some(7L), 3)))
  }

  test("funnel: duplicate step labels rejected") {
    val df = Seq((1L, "a", 1L)).toDF("user_id", "event_type", "ts")
    val e = intercept[IllegalArgumentException] {
      Funnel.funnel(df, "user_id", "event_type", "ts", Seq("a", "a"))
    }
    assert(e.getMessage.contains("duplicate"), e.getMessage)
  }

  test("cohort retention: first-day cohorts, distinct users per offset") {
    val day = 100L
    val events = Seq(
      (1L, 0L * day), (1L, 2L * day + 3), // cohort 0, offsets 0 and 2
      (2L, 0L * day + 50), (2L, 1L * day), // cohort 0, offsets 0 and 1
      (3L, 1L * day + 1), (3L, 1L * day + 2) // cohort 1, offset 0 twice
    ).toDF("user_id", "ts")
    val out = Funnel.cohortRetention(events, "user_id", "ts", day)
      .orderBy($"cohort_day", $"day_offset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (0L, 0L, 2L), (0L, 1L, 1L), (0L, 2L, 1L), (1L, 0L, 1L)))
  }
}
