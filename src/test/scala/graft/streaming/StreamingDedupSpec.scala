package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import java.sql.Timestamp

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(1700000000000L + minute * 60000L)

  test("streaming dedup keeps one row per fingerprint within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val docs = input.toDF().toDF("ts", "doc_id", "fingerprint")
    input.addData(
      (ts(0), 1L, "fpA"),
      (ts(1), 2L, "fpA"),   // duplicate within watermark → dropped
      (ts(2), 3L, "fpB"))
    val q = Streams.streamingDedup(docs, "ts", "fingerprint")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    q.stop()
    val out = spark.table("dedup_out").collect()
      .map(r => (r.getLong(1), r.getString(2)))
    assert(out.map(_._2).sorted.toSeq == Seq("fpA", "fpB"))
  }
}
