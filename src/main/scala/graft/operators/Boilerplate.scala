package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-frequency boilerplate removal — the C4 cleaning recipe
  * (drop any line occurring ≥ 3 times in the corpus) re-expressed over
  * token n-grams, since this engine's documents are single-line: an
  * n-gram appearing in at least ceil(minDfFrac × corpus docs) DISTINCT
  * documents is boilerplate (headers, footers, navigation chrome,
  * license blurbs), and every token position it covers is removed from
  * every document, which is then re-joined from its surviving tokens.
  *
  * Scale posture (100 TB): two corpus passes and ONE corpus-keyed
  * shuffle.
  *  - The document-frequency aggregate shuffles only (gram, doc-count)
  *    partials (map-side combine; grams, not documents, cross the
  *    wire).
  *  - The hot set is provably tiny by pigeonhole: a gram needs
  *    df ≥ minDfFrac·N, and total gram instances are ≤ G·N (G = avg
  *    grams/doc), so |hot| ≤ G / minDfFrac — INDEPENDENT of corpus
  *    size. It is always broadcast; the cover join is map-side.
  *  - Covered positions shuffle once, keyed by doc_id, to meet their
  *    document; the rebuild is a narrow projection of codegen'd array
  *    built-ins (the per-token membership probe is O(|cov|) with |cov|
  *    bounded by the doc's own length).
  */
object Boilerplate {

  /** Context-window chunking — the standard LLM-prep splitter: each
    * document becomes ⌈(len − overlap) / (window − overlap)⌉ chunks of
    * up to `window` tokens, consecutive chunks sharing `overlap`
    * tokens (stride = window − overlap). Purely narrow (split +
    * per-row transform + explode, all codegen'd built-ins, zero
    * shuffle): at 100 TB this is a map over the corpus whose output
    * row count is ~len/stride per doc.
    *
    * @return (doc_id, chunk_idx, n_chunk_tokens, chunk_text); docs
    *         with ≤ window tokens yield exactly one whole-doc chunk.
    */
  /** Chunk count for a token array under [[chunkWindows]]' policy —
    * chunk starts 0, stride, 2·stride, … while start + overlap < len
    * (equivalently the last chunk is the first one whose END reaches
    * the doc's end — no degenerate all-overlap tail chunk). ONE copy:
    * [[lineDedup]]'s removed-count invariant (n_removed = this −
    * n_kept) depends on agreeing with the splitter exactly. */
  private def chunkCount(toks: org.apache.spark.sql.Column,
                         window: Int, overlap: Int)
      : org.apache.spark.sql.Column =
    greatest(lit(1),
      ceil((size(toks) - lit(overlap)).cast("double") / (window - overlap))
        .cast("int"))

  def chunkWindows(docs: DataFrame, idCol: String, textCol: String,
                   window: Int = 64, overlap: Int = 16): DataFrame = {
    require(window > overlap && overlap >= 0,
      s"need window > overlap >= 0, got $window/$overlap")
    val stride = window - overlap
    val toks = split(col(textCol), " ")
    val nChunks = chunkCount(toks, window, overlap)
    docs.select(col(idCol).as("doc_id"), toks.as("toks"), nChunks.as("nc"))
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), col("nc") - 1),
          i => struct(i.as("chunk_idx"),
            slice(col("toks"), i * stride + 1, lit(window)).as("ct")))).as("c"))
      .select(col("doc_id"), col("c.chunk_idx").as("chunk_idx"),
        size(col("c.ct")).as("n_chunk_tokens"),
        array_join(col("c.ct"), " ").as("chunk_text"))
  }

  /** @return (doc_id, n_tokens, n_removed, scrubbed_text), one row per
    *         input document (text non-null by table contract).
    */
  def scrub(docs: DataFrame, idCol: String, textCol: String,
            n: Int = 2, minDfFrac: Double = 0.06): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
      split(col(textCol), " ").as("toks"))
    // (doc_id, pos, gram) for starts 0..size-n; docs shorter than n
    // contribute no grams (they can't carry cross-document boilerplate)
    val posGrams = base.select(col("doc_id"),
      explode(
        when(size(col("toks")) >= n,
          transform(sequence(lit(0), size(col("toks")) - n),
            i => struct(i.as("pos"),
              concat_ws(" ", slice(col("toks"), i + 1, lit(n))).as("g"))))
        .otherwise(array().cast("array<struct<pos:int,g:string>>"))).as("pg"))
      .select(col("doc_id"), col("pg.pos").as("pos"), col("pg.g").as("g"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val hot = PlanHints.withScalars(
        posGrams.groupBy(col("g"))
          .agg(countDistinct(col("doc_id")).as("df")), nDocs)
      .filter(col("df") >= ceil(lit(minDfFrac) * col("n_docs")))
      .select(col("g"))
    val covered = posGrams.join(broadcast(hot), "g")
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (n - 1))).as("p"))
      .groupBy(col("doc_id"))
      .agg(collect_set(col("p")).as("cov"))
    base.join(covered, Seq("doc_id"), "left")
      .withColumn("cov", coalesce(col("cov"), array().cast("array<int>")))
      .select(col("doc_id"),
        size(col("toks")).as("n_tokens"),
        size(col("cov")).as("n_removed"),
        array_join(
          filter(col("toks"), (_, i) => !array_contains(col("cov"), i)),
          " ").as("scrubbed_text"))
  }

  /** C4-style GLOBAL line dedup: of all occurrences of a line across
    * the whole corpus, only the first (lowest (doc_id, line_idx))
    * survives; every document is rebuilt from its surviving lines.
    * C4 splits on newline — this engine's documents are single-line,
    * so a "line" is a disjoint `span`-token window ([[chunkWindows]]
    * with overlap 0, the same split the chunkers use).
    *
    * Scale shape — deliberately NOT first-occurrence-via-window: a
    * window over `partitionBy(line_text)` puts every copy of a hot
    * line (exactly the boilerplate this removes) in one task. Instead
    * the keeper per line is `min(struct(doc_id, line_idx))`, a
    * map-side-combinable aggregate: each input partition contributes
    * ONE candidate per distinct line, so the line-keyed shuffle
    * carries distinct-lines rows regardless of duplication skew.
    * Rebuilding then needs only the keepers (removed occurrences are
    * absent by construction, counted as n_lines − n_kept), so there is
    * no join back on the skewed line key at all: one line-hash
    * shuffle, one doc-keyed assembly, both skew-immune.
    *
    * @return (doc_id, n_lines, n_removed, cleaned_text), one row per
    *         input document; a document whose every line lost keeps
    *         cleaned_text = "".
    */
  def lineDedup(docs: DataFrame, idCol: String, textCol: String,
                span: Int = 16): DataFrame = {
    val lines = chunkWindows(docs, idCol, textCol, window = span, overlap = 0)
      .select(col("doc_id"), col("chunk_idx").as("line_idx"),
        col("chunk_text").as("line_text"))
    val keepers = lines.groupBy(col("line_text"))
      .agg(min(struct(col("doc_id"), col("line_idx"))).as("k"))
      .select(col("k.doc_id").as("doc_id"), col("k.line_idx").as("line_idx"),
        col("line_text"))
    val rebuilt = keepers.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(array_sort(collect_list(
          struct(col("line_idx"), col("line_text")))).getField("line_text"),
          " ").as("cleaned_text"))
    val nLines = chunkCount(split(col(textCol), " "), span, 0)
    docs.select(col(idCol).as("doc_id"), nLines.as("n_lines"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_lines"),
        (col("n_lines") - coalesce(col("n_kept"), lit(0L))).cast("int")
          .as("n_removed"),
        coalesce(col("cleaned_text"), lit("")).as("cleaned_text"))
  }
}
