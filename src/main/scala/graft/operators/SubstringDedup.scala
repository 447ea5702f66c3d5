package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact duplicated-SUBSTRING dedup — the character-span-level method of
  * Lee et al., "Deduplicating Training Data Makes Language Models
  * Better" (arXiv:2107.06499, "ExactSubstr"): find every maximal span
  * that is covered by some length-L character window occurring ≥ 2
  * times anywhere in the corpus (another document OR another position
  * of the same document), keep the globally-first occurrence of each
  * duplicated window, and mark every other covered position for
  * removal. This is a different capability from the document-level
  * passes in [[TextDedup]]: whole-document fingerprints miss a quoted
  * paragraph inside an otherwise-unique page, and the 13-token gram
  * accounting ([[TextDedup.duplicatedGramStats]]) only counts — it does
  * not say WHICH characters to cut. The reference paper removes exactly
  * these spans before training.
  *
  * Distributed design (the suffix-array of the paper is a single-node
  * structure; the equivalent corpus-wide question — "which length-L
  * windows repeat?" — is a hash aggregation):
  *  - every position contributes its window's double-mod polynomial
  *    hash (a rolling mapPartitions kernel, O(1) per position);
  *    windows travel as ONE long, never as L-char strings, so the
  *    shuffle is ~8B/char regardless of L;
  *  - ONE map-side-combinable groupBy on the hash finds duplicated
  *    windows and their keeper occurrence (min encoded (doc,pos));
  *  - the hash kernel is cheap enough to recompute per consumer
  *    (caching a window stream many times corpus size would cost
  *    more than re-hashing);
  *  - the dup set joins back ON THE SAME KEY as a SHUFFLE_HASH build
  *    (at 100 TB the duplicated-window set is corpus-scale — a viral
  *    boilerplate line appears everywhere — so it is never broadcast,
  *    and AQE's skew split handles the hot digests);
  *  - span merge (gaps-and-islands) windows ONLY per document — state
  *    is bounded by document length, never by corpus or key frequency.
  */
object SubstringDedup {

  /** Default window length in characters. The paper uses 50 BPE tokens;
    * 40 chars is the analogous scale for the ~300-char test documents.
    */
  val DefaultL = 40

  /** doc/pos pairs ride the aggregation as one orderable long (min of a
    * struct is not portable to the DuckDB oracle; min of this encoding
    * is identical on both engines). Positions are 1-based; 28 bits
    * supports 268M-character documents, leaving 35 bits of doc_id
    * (3.4e10 docs — the sf1 ScaleUp remap alone reaches 9e9). The
    * window kernel REJECTS inputs outside either bound — a silent
    * wrap would corrupt keeper selection identically on both engines
    * and verify green.
    */
  private val PosBits = 28
  private[operators] val MaxPos = (1L << PosBits) - 1
  private[operators] val MaxDocId = (1L << (63 - PosBits)) - 1

  private def encodeOcc(doc: Column, pos: Column): Column =
    shiftleft(doc, PosBits) + pos

  /** Double-mod polynomial window hash: h_p = Σ_j c_{i+j}·B^{l-1-j}
    * mod p over the window's CODEPOINTS, for two independent (B, p)
    * pairs, packed into one long (h1·2^31 + h2 — h < p < 2^30 each).
    * Deterministic and engine-portable: the DuckDB oracle recomputes
    * the identical positional sum with inlined mod-power literals, so
    * even the ~2^-60 collision case agrees on both sides.
    */
  val B1 = 257L;  val P1 = 1000000007L
  val B2 = 263L;  val P2 = 998244353L

  def modpow(b: Long, e: Int, p: Long): Long =
    (0 until e).foldLeft(1L)((a, _) => a * b % p)

  /** (doc_id, pos, g): one row per length-`l` character window, `g` the
    * window's packed polynomial hash; `pos` is 1-based over codepoints.
    * Documents shorter than `l` contribute nothing.
    *
    * This is a dense numeric loop, so it runs as a mapPartitions kernel
    * (rolling-hash update: O(1) per position instead of O(l)) — the
    * md5-per-window expression form it replaces spent its time in
    * digest + substring allocation, and shipped 36-byte string keys
    * where this ships one long. The kernel is cheap enough to
    * recompute for each consumer; at corpus scale re-hashing beats
    * caching a window stream many times the corpus size (no checkpoint).
    */
  def windowHashes(docs: DataFrame, idCol: String, textCol: String,
                   l: Int = DefaultL): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val pw1 = modpow(B1, l - 1, P1)
    val pw2 = modpow(B2, l - 1, P2)
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val cps = if (text == null) Array.empty[Int]
                    else text.codePoints.toArray
          val n = cps.length
          require(id >= 0 && id <= MaxDocId && n <= MaxPos,
            s"doc $id (len $n) outside the (doc_id, pos) encoding bounds")
          if (n < l) Iterator.empty
          else {
            val out = new Array[(Long, Int, Long)](n - l + 1)
            var a1 = 0L; var a2 = 0L
            var j = 0
            while (j < l) {
              a1 = (a1 * B1 + cps(j)) % P1
              a2 = (a2 * B2 + cps(j)) % P2
              j += 1
            }
            out(0) = (id, 1, (a1 << 31) + a2)
            var i = 1
            while (i <= n - l) {
              val cOut = cps(i - 1); val cIn = cps(i + l - 1)
              a1 = ((a1 - cOut * pw1 % P1 + P1) * B1 + cIn) % P1
              a2 = ((a2 - cOut * pw2 % P2 + P2) * B2 + cIn) % P2
              out(i) = (id, i + 1, (a1 << 31) + a2)
              i += 1
            }
            out.iterator
          }
        }
      }.toDF("doc_id", "pos", "g")
  }

  /** Duplicated windows with keeper: (g, n_occ ≥ 2, keeper_key). */
  def duplicatedWindows(windows: DataFrame): DataFrame =
    windows.groupBy(col("g"))
      .agg(count(lit(1)).as("n_occ"),
           min(encodeOcc(col("doc_id"), col("pos"))).as("keeper_key"))
      .filter(col("n_occ") >= 2)

  /** Maximal removal spans: for every non-keeper occurrence of a
    * duplicated window, cover [pos, pos+l-1]; merge covering windows
    * that overlap or touch (next start ≤ prev start + l) into maximal
    * spans per document.
    *
    * @return (doc_id, span_start, span_len, n_windows) ordered by
    *         (doc_id, span_start).
    */
  def removalSpans(docs: DataFrame, idCol: String, textCol: String,
                   l: Int = DefaultL): DataFrame = {
    val windows = windowHashes(docs, idCol, textCol, l)
    val dup = duplicatedWindows(windows)
    val removed = windows
      .join(dup.hint("SHUFFLE_HASH"), Seq("g"))
      .filter(encodeOcc(col("doc_id"), col("pos")) =!= col("keeper_key"))
      .select(col("doc_id"), col("pos"))
    // gaps-and-islands on per-doc sorted positions: all windows have
    // the same length, so intervals merge iff pos_i ≤ pos_{i-1} + l
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    removed
      .withColumn("brk",
        when(col("pos") > lag(col("pos"), 1).over(byDoc) + l, 1)
          .otherwise(0))
      .withColumn("island",
        sum(col("brk")).over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("span_start"),
           (max(col("pos")) - min(col("pos")) + l).as("span_len"),
           count(lit(1)).as("n_windows"))
      .select(col("doc_id"), col("span_start"), col("span_len"),
              col("n_windows"))
  }

  /** Apply the removal: cut every span from its document and return the
    * surviving text. Affected documents only (the uncut corpus is the
    * trivial complement). Spans per document are few and bounded by
    * len/1 — the per-doc fold over the collected span array is
    * driver-free and O(doc length).
    *
    * @return (doc_id, orig_len, kept_len, new_text) ordered by doc_id.
    */
  def scrub(docs: DataFrame, idCol: String, textCol: String,
            l: Int = DefaultL): DataFrame = {
    val spans = removalSpans(docs, idCol, textCol, l)
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("span_start"),
        col("span_len")))).as("spans"))
    val t = col(textCol)
    spans.join(docs.select(col(idCol).as("doc_id"), t.as("text")), Seq("doc_id"))
      .withColumn("acc",
        aggregate(col("spans"),
          struct(lit("").as("kept"), lit(1).as("cur")),
          (acc, s) => struct(
            concat(acc.getField("kept"),
              col("text").substr(acc.getField("cur"),
                s.getField("span_start") - acc.getField("cur"))).as("kept"),
            (s.getField("span_start") + s.getField("span_len")).as("cur"))))
      .select(col("doc_id"),
        length(col("text")).as("orig_len"),
        concat(col("acc").getField("kept"),
          col("text").substr(col("acc").getField("cur"),
            length(col("text")) - col("acc").getField("cur") + 1))
          .as("new_text"))
      .select(col("doc_id"), col("orig_len"),
        length(col("new_text")).as("kept_len"), col("new_text"))
  }

  /** Corpus accounting per source: affected docs, spans, duplicated
    * chars, and the duplicated fraction of ALL text in the source
    * (unaffected documents count in the denominator).
    */
  def sourceStats(docs: DataFrame, idCol: String, textCol: String,
                  sourceCol: String, l: Int = DefaultL): DataFrame = {
    val spans = removalSpans(docs, idCol, textCol, l)
    val perDoc = spans.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"), sum(col("span_len")).as("dup_chars"))
    val base = docs.select(col(idCol).as("doc_id"),
      col(sourceCol).as("source"), length(col(textCol)).as("len"))
    base.join(perDoc, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(col("n_spans")).as("docs_affected"),
           coalesce(sum(col("n_spans")), lit(0L)).as("n_spans"),
           coalesce(sum(col("dup_chars")), lit(0L)).as("dup_chars"),
           sum(col("len")).as("total_chars"))
      .withColumn("dup_frac",
        round(col("dup_chars").cast("double") / col("total_chars"), 6))
  }
}
