package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Sequence packing for training-data batching: greedy first-fit of
  * documents into fixed-capacity token bins ("sequences"), processed
  * in deterministic doc_id order within each shard. The standard step
  * that turns a filtered corpus into dense fixed-length training rows.
  * Beyond the reference surface; pipeline-brief addition.
  *
  * Scale posture: ONE shuffle (hash partition by shard) and a sorted
  * in-memory pass per shard holding two primitive long arrays plus an
  * int index (~20 retained bytes per doc, never the text), so a shard
  * of 100M docs costs ~2GB of executor heap; size `shards` to the
  * corpus. The greedy scan is inherently sequential per shard (each
  * bin decision depends on the running fill), which is exactly why the
  * shard is the parallelism unit.
  */
object SequencePack {

  /** @return (doc_id, shard, seq_id) — seq_id 1-based per shard.
    * A doc larger than `capacity` gets a bin of its own. Rows with a
    * null id are dropped; a null token count packs as 0 tokens. */
  def packSequences(docs: DataFrame, idCol: String, tokCol: String,
                    shards: Int, capacity: Long): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.filter(col(idCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id"),
              pmod(col(idCol), lit(shards)).cast("long").as("shard"),
              coalesce(col(tokCol).cast("long"), lit(0L)).as("n_tokens"))
      .as[(Long, Long, Long)]
      .groupByKey(_._2)(Encoders.scalaLong)
      .flatMapGroups { (shard, it) =>
        // primitive parallel arrays + an index sort — tuples are boxed
        // only transiently while streaming, never retained per shard
        val idsB = new scala.collection.mutable.ArrayBuilder.ofLong
        val toksB = new scala.collection.mutable.ArrayBuilder.ofLong
        it.foreach { case (docId, _, n) => idsB += docId; toksB += n }
        val ids = idsB.result()
        val toks = toksB.result()
        val order = Array.range(0, ids.length).sortBy(ids(_))
        var seq = 0L
        var fill = 0L
        order.iterator.map { i =>
          val n = toks(i)
          if (seq == 0L || fill + n > capacity) { seq += 1; fill = n }
          else fill += n
          (ids(i), shard, seq)
        }
      }(Encoders.product[(Long, Long, Long)])
      .toDF("doc_id", "shard", "seq_id")
  }
}
