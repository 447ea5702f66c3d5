package graft.streaming

import graft.SparkSpec
import graft.operators.Decontaminate
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import scala.collection.mutable

class StreamingDecontaminateSpec extends SparkSpec {
  import spark.implicits._

  test("streamed flags equal the batch operator; bench index built once") {
    implicit val sqlCtx = spark.sqlContext
    val gram = (1 to 13).map(i => s"s$i").mkString(" ")
    val bench = Seq((100L, gram + " trailing"), (101L, "other bench doc"))
      .toDF("doc_id", "text")
    val idx = Decontaminate.benchIndex(bench, "doc_id", "text")

    val input = MemoryStream[(Long, String)]
    val docs = input.toDF().toDF("doc_id", "text")
    input.addData((1L, "pre " + gram), (2L, "clean one"))
    input.addData((3L, gram), (4L, "also clean"))

    val got = mutable.ArrayBuffer.empty[(Long, Long, Long)]
    val q = Streams.decontaminateEachBatch(docs, idx, "doc_id", "text") {
      (flags, _) =>
        got ++= flags.collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getLong(2)))
    }.trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    q.stop()

    val batch = Decontaminate.contaminated(
        Seq((1L, "pre " + gram), (2L, "clean one"),
            (3L, gram), (4L, "also clean")).toDF("doc_id", "text"),
        bench, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.sortBy(_._1).toSeq == batch.sortBy(_._1).toSeq)
    assert(got.map(_._1).toSet == Set(1L, 3L))
  }
}
