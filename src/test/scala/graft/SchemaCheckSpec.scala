package graft

import graft.tools.SchemaCheck
import org.apache.spark.sql.types._

/** Pins the testdata preflight: current driver testdata is clean, and
  * a drifted physical type is reported with the table.column name (the
  * failure mode that cost the round-7 bench window when events.ts
  * silently changed to timestamp[us]).
  */
class SchemaCheckSpec extends SparkSpec {

  test("driver testdata passes the preflight at every SF") {
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val drift = SchemaCheck.check(Env(spark, d))
      assert(drift.isEmpty, drift.mkString("; "))
    }
  }

  test("a drifted column type is reported by name") {
    val drifted = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", StringType), // the drift
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
    val msgs = SchemaCheck.diff("events", drifted)
    assert(msgs.size == 1 && msgs.head.startsWith("events.ts: string"),
      msgs.mkString("; "))
  }

  test("missing and unexpected columns are both reported") {
    val s = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType),
      StructField("source", StringType),
      // n_chars missing
      StructField("surprise", IntegerType)))
    val msgs = SchemaCheck.diff("documents", s)
    assert(msgs.exists(_.contains("documents.n_chars: MISSING")), msgs)
    assert(msgs.exists(_.contains("documents.surprise: UNEXPECTED")), msgs)
  }
}
