package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: flag training
  * documents that share any exact n-token gram with an evaluation
  * (benchmark) document — the standard collision check run before
  * training so eval answers don't leak into the corpus. Beyond the
  * reference surface; part of the large-scale pipeline brief alongside
  * [[TextDedup]].
  *
  * Scale posture (100 TB corpus, ~10⁴–10⁵ benchmark docs): the
  * benchmark gram set is tiny relative to the corpus, so it is
  * deduplicated and BROADCAST — the training side streams through a
  * map-side hash join with no shuffle of the corpus. A multi-suite
  * eval corpus too large to broadcast (10⁶+ docs × ~10² grams would
  * OOM the driver and every executor) auto-switches to a
  * SHUFFLE_HASH equi-join on the gram hash — the corpus pays one
  * shuffle, but is only streamed (never sorted or buffered) against
  * the bench-side hash table; the decision is one column-pruned
  * aggregate over the bench table (GRAM volume, not doc count — a
  * handful of book-length eval docs can out-gram 10⁵ short ones),
  * negligible next to the corpus scan. Training grams
  * are deduplicated per document only (array_distinct inside the row),
  * never globally — the global distinct would be a corpus-sized
  * shuffle bought for nothing. All expressions are codegen'd
  * built-ins; grams travel as md5 hex (fixed 32 bytes) instead of the
  * raw 13-token strings.
  */
object Decontaminate {

  /** Distinct n-token gram hashes of a whitespace-tokenized text
    * column. Documents shorter than n tokens contribute one whole-text
    * gram (same fallback as [[TextDedup.shingles]]) so a short eval
    * answer still decontaminates its exact copies. NULL text yields NO
    * grams — the concat_ws fallback would otherwise turn null into
    * md5("") and make every null-text doc "contaminated" by any other
    * (and SQL `||` NULL propagation disagrees).
    */
  def gramHashes(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    when(text.isNull, array().cast("array<string>"))
      .otherwise(array_distinct(
        when(size(toks) >= n,
          transform(sequence(lit(0), size(toks) - n),
            i => md5(concat_ws(" ", slice(toks, i + 1, lit(n))))))
        .otherwise(array(md5(concat_ws(" ", toks))))))
  }

  /** Contaminated training docs: (doc_id, n_hits = distinct shared
    * grams, n_bench_docs = distinct benchmark docs implicated). Clean
    * docs don't appear — the common case at scale, so the output is a
    * small flag table to anti-join against the corpus.
    *
    * @param maxBroadcastBenchGrams estimated bench gram count above
    *   which the broadcast is replaced by the shuffled hash join (see
    *   object doc). Grams per doc ≤ split tokens = separators + 1 ≤
    *   chars + 1 (split(" ") keeps EMPTY tokens from consecutive
    *   spaces, so the tighter ⌈chars/2⌉ non-empty-token bound does not
    *   hold), so sum(length(text)) + count upper-bounds the gram
    *   volume from ONE eager column-pruned aggregate of the bench side
    *   only — never the corpus. Default 2M grams ≈ a ~10²MB broadcast
    *   hash relation of 32-byte md5 keys.
    */
  def contaminated(train: DataFrame, bench: DataFrame, idCol: String,
                   textCol: String, n: Int = 13,
                   maxBroadcastBenchGrams: Long = 2000000L): DataFrame = {
    val tg = train.select(col(idCol).as("doc_id"),
      explode(gramHashes(col(textCol), n)).as("g"))
    val bg = bench.select(col(idCol).as("bench_id"),
      explode(gramHashes(col(textCol), n)).as("g"))
    val sizing = bench
      .agg(coalesce(sum(length(col(textCol))), lit(0L)).cast("long"),
           count(lit(1)))
      .collect()(0)
    // chars + docs ≥ tokens ≥ grams, and the +count term also covers
    // the ≥ 1 whole-text gram of every short/empty doc
    val estGrams = sizing.getLong(0) + sizing.getLong(1)
    val joined =
      if (estGrams <= maxBroadcastBenchGrams) tg.join(broadcast(bg), "g")
      else tg.join(bg.hint("SHUFFLE_HASH"), "g")
    joined
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("g")).as("n_hits"),
           countDistinct(col("bench_id")).as("n_bench_docs"))
  }

  /** Bloom-prefiltered decontamination — the scale path PAST the
    * broadcast budget where [[contaminated]] falls back to shuffling
    * the whole corpus gram stream. A Bloom filter over the bench grams
    * costs ~10 bits/gram at 1% fpp (vs 32-byte md5 keys in the
    * broadcast hash relation — a ~25× smaller executor footprint), so
    * it stays broadcastable one or two orders of magnitude beyond the
    * exact form. The corpus side drops every gram the filter rejects
    * MAP-SIDE (guaranteed no false negatives), and only the surviving
    * sliver — true hits plus the fpp share of false positives — pays
    * the exact verify join, so the shuffle volume falls from all
    * corpus grams to ~fpp × corpus grams. The verify join makes the
    * RESULT exactly equal to [[contaminated]]: false positives die
    * there, so the oracle is the same SQL.
    *
    * Ids travel through a typed kernel, so `idCol` must be castable to
    * long here (the generic-id exact form remains for other key
    * types). The expected-item bound reuses the chars+docs gram bound
    * of [[contaminated]] — conservative by ~the average token length,
    * which only makes the filter larger (never raises fpp).
    */
  def contaminatedBloom(train: DataFrame, bench: DataFrame, idCol: String,
                        textCol: String, n: Int = 13,
                        fpp: Double = 0.01): DataFrame =
    contaminatedWithIndex(train,
      benchIndex(bench, idCol, textCol, n, fpp), idCol, textCol, n)

  /** Bench-side artifacts of the Bloom path, built ONCE and reusable
    * across many corpus scans (or streaming micro-batches — see
    * [[graft.streaming.Streams.decontaminateEachBatch]]): the
    * broadcast filter plus the exact (bench_id, gram) relation for the
    * verify join.
    */
  final case class BenchIndex(
      filter: org.apache.spark.broadcast.Broadcast[
        org.apache.spark.util.sketch.BloomFilter],
      grams: DataFrame)

  def benchIndex(bench: DataFrame, idCol: String, textCol: String,
                 n: Int = 13, fpp: Double = 0.01): BenchIndex = {
    val spark = bench.sparkSession
    // pinned: the gram relation is consumed by the bloom build AND by
    // every subsequent verify join (one per corpus scan / micro-batch)
    // — without the checkpoint the bench would re-tokenize each time
    val bg = bench.select(col(idCol).cast("long").as("bench_id"),
      explode(gramHashes(col(textCol), n)).as("g"))
      .localCheckpoint(eager = false)
    val sizing = bench
      .agg(coalesce(sum(length(col(textCol))), lit(0L)).cast("long"),
           count(lit(1)))
      .collect()(0)
    val estGrams = math.max(sizing.getLong(0) + sizing.getLong(1), 1L)
    val bf = bg.stat.bloomFilter("g", estGrams, fpp)
    BenchIndex(spark.sparkContext.broadcast(bf), bg)
  }

  def contaminatedWithIndex(train: DataFrame, idx: BenchIndex,
                            idCol: String, textCol: String,
                            n: Int = 13): DataFrame = {
    val spark = train.sparkSession
    import spark.implicits._
    val tg = train.select(col(idCol).cast("long").as("doc_id"),
      explode(gramHashes(col(textCol), n)).as("g"))
    val bcBf = idx.filter
    val hits = tg.as[(Long, String)]
      .mapPartitions { it =>
        val f = bcBf.value
        it.filter { case (_, g) => f.mightContainString(g) }
      }.toDF("doc_id", "g")
    // exact verify: only bloom survivors reach the shuffle; the bench
    // side builds the hash table (it's the small side by contract)
    hits.join(idx.grams.hint("SHUFFLE_HASH"), "g")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("g")).as("n_hits"),
           countDistinct(col("bench_id")).as("n_bench_docs"))
  }
}
