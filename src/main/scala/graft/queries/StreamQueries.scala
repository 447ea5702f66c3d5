package graft.queries

import graft.{Env, Q}
import graft.streaming.Streams
import graft.streaming.Streams.CoverageAttempt
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{concat, lit}

/** T3 as a VERIFIED query: the flatMapGroupsWithState queue drain runs
  * as a real streaming query (MemoryStream → state store → memory
  * sink) inside the batch harness, and its FINAL STATE is checked
  * against a DuckDB oracle. The queue contents are constructed
  * order-invariant — each identifier gets either only failures or a
  * single success — so the per-group iterator order (which Structured
  * Streaming does not guarantee) cannot change the outcome, and the
  * state machine's result is deterministic and SQL-expressible.
  *
  * MemoryStream feeding collects the bounded queue to the driver — the
  * harness pattern (StreamsSpec does the same); a production drain
  * reads Kafka/files with identical downstream code.
  */
object StreamQueries {

  def t3QueueDrain(env: Env): DataFrame = {
    val spark = env.spark
    import spark.implicits._
    val queue: Seq[CoverageAttempt] = env.customer
      .select($"c_custkey".cast("long"),
              ($"c_custkey" % 3 === 0).as("allFail"),
              ($"c_custkey" % 5 + 1).cast("int").as("n"))
      .collect().toSeq
      .flatMap { r =>
        val id = r.getLong(0).toString
        if (r.getBoolean(1))
          Seq.fill(r.getInt(2))(CoverageAttempt(id, "resolve", success = false))
        else Seq(CoverageAttempt(id, "resolve", success = true))
      }
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[CoverageAttempt]
    stream.addData(queue)
    val sink = s"t3_drain_${System.nanoTime()}"
    val q = Streams.coverageStateMachine(stream.toDS())
      .writeStream.format("memory").queryName(sink)
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()
    spark.table(sink)
      .select($"identifier".cast("long").as("identifier"), $"status",
              $"attempts")
      .orderBy($"identifier")
  }

  /** S8+S11 as a VERIFIED round-trip: the consolidated parquet cache
    * and the CSV report sink each write to a scratch location and read
    * back, and the oracle checks the content that survived the
    * round-trip — the sinks stop being write-only test code. The
    * scratch path is per-process (pid suffix) so two concurrent Verify
    * runs on one host cannot overwrite each other's files mid-read;
    * within a process the fixed path + overwrite keeps reruns
    * idempotent. */
  def s8SinkRoundtrip(env: Env): DataFrame = {
    val spark = env.spark
    import spark.implicits._
    val rows = env.customer.select(
      $"c_custkey".cast("long").as("fast_id"),
      concat(lit("Subject "), $"c_custkey" % 97).as("name"))
    val base = StreamQueries.scratchBase
    graft.sources.NTriples.writeConsolidated(rows, s"$base/consolidated")
    graft.sources.Sinks.writeCsvReport(rows, s"$base/report")
    val pq = graft.sources.NTriples.readConsolidated(spark, s"$base/consolidated")
      .select(lit("parquet").as("sink"), $"fast_id".cast("long").as("fast_id"),
              $"name")
    val csv = graft.sources.Sinks.readCsvReport(spark, s"$base/report")
      .select(lit("csv").as("sink"), $"fast_id".cast("long").as("fast_id"),
              $"name")
    pq.unionByName(csv).orderBy($"sink", $"fast_id")
  }

  /** Per-process scratch root, deleted on JVM exit so repeated Verify
    * runs don't accumulate orphaned pid-suffixed trees in tmpdir. */
  private lazy val scratchBase: String = {
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_sink_roundtrip_${ProcessHandle.current().pid()}"
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(new java.io.File(base))
    }
    base
  }

  val entries: Seq[Q] = Seq(
    Q.sql("s8_sink_roundtrip", s8SinkRoundtrip,
      """WITH rows_ AS (
        |  SELECT CAST(c_custkey AS BIGINT) AS fast_id,
        |         'Subject ' || (c_custkey % 97) AS name
        |  FROM customer)
        |SELECT sink, fast_id, name FROM (
        |  SELECT 'parquet' AS sink, fast_id, name FROM rows_
        |  UNION ALL
        |  SELECT 'csv', fast_id, name FROM rows_)
        |ORDER BY sink, fast_id""".stripMargin),

    Q.sql("t3_queue_drain", t3QueueDrain,
      """SELECT c_custkey AS identifier,
        |  CASE WHEN c_custkey % 3 = 0 THEN
        |    CASE WHEN (c_custkey % 5) + 1 >= 3
        |         THEN 'PERSISTENT_FAILURE' ELSE 'TRANSIENT_FAILURE' END
        |  ELSE 'SUCCESS' END AS status,
        |  CAST(CASE WHEN c_custkey % 3 = 0 THEN (c_custkey % 5) + 1
        |            ELSE 1 END AS INT) AS attempts
        |FROM customer
        |ORDER BY identifier""".stripMargin),
  )
}
