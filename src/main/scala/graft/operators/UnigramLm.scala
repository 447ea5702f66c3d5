package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) subword tokenizer — the second
  * tokenizer family of the pipeline brief beside [[BpeTrain]]: instead
  * of greedy merge rules, a piece VOCABULARY with log-probabilities,
  * applied by Viterbi segmentation (the max-likelihood split of each
  * word). Kudo 2018 (arXiv:1804.10959) trains the probabilities by EM;
  * this implementation is the deterministic hard variant a distributed
  * oracle-checked pipeline wants:
  *  - candidate pieces = all word substrings up to `maxPieceLen`,
  *    frequency-weighted by word counts (one corpus pass);
  *  - vocabulary = top `vocabMulti` multi-char pieces by (freq desc,
  *    piece asc) plus ALL single chars (segmentation always feasible);
  *  - piece scores are QUANTIZED-INTEGER log-probs,
  *    qlp = round(ln(freq/total)·10⁶) as a long — the one transcendental
  *    evaluates once per VOCAB ENTRY (a vocab-sized driver artifact,
  *    never per token), and the ≤1-ulp ln divergence between engines
  *    flips a rounded unit only within ~10⁻¹⁰ of a half boundary;
  *  - Viterbi runs on exact longs: maximize Σqlp, tie-break fewer
  *    pieces, encoded lexicographically as PieceBase·Σqlp − nPieces — both
  *    engines agree bit-for-bit, so even near-tie segmentations hash
  *    identically.
  *
  * Scale shape: the word-count table is vocabulary-bounded (not
  * corpus-bounded) after one map-side-combinable groupBy; piece
  * candidates explode the WORD table, not the corpus; the final vocab
  * is a broadcastable artifact; apply is one narrow kernel map over
  * documents with a per-partition word→segmentation memo.
  */
object UnigramLm {

  val QScale = 1000000L
  /** Score for a single char absent from the vocabulary (never hit
    * when applying to the training corpus; defined for robustness). */
  val UnkQlp: Long = -30L * QScale

  final case class VocabEntry(piece: String, freq: Long, qlp: Long)

  private def r0(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  /** Distinct-word counts: (word, n). One corpus pass, combinable. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    TextAnalysis.explodedWords(docs, textCol)
      .groupBy(col("word")).agg(count(lit(1)).as("n"))

  /** Train the vocabulary. Returns the entries sorted by piece — a
    * vocab-sized artifact (collect is bounded by `vocabMulti` + the
    * alphabet, never the corpus).
    */
  def train(docs: DataFrame, textCol: String, vocabMulti: Int = 256,
            maxPieceLen: Int = 4): Array[VocabEntry] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val pieces = wordCounts(docs, textCol).as[(String, Long)]
      .mapPartitions(_.flatMap { case (w, n) =>
        // CODEPOINT indexing, matching the DuckDB oracle's substr
        // semantics (UTF-16 units would split surrogate pairs into
        // mangled half-pieces on astral text — the SubstringDedup
        // precedent)
        val cps = w.codePoints.toArray
        for {
          i <- (0 until cps.length).iterator
          m <- 1 to math.min(maxPieceLen, cps.length - i)
        } yield (new String(cps, i, m), n)
      })
      .toDF("piece", "n")
      .groupBy(col("piece")).agg(sum(col("n")).as("freq"))
    val single = pieces.filter(length(col("piece")) === 1)
    val multi = pieces.filter(length(col("piece")) > 1)
      .orderBy(col("freq").desc, col("piece").asc)
      .limit(vocabMulti)
    val selected = single.unionByName(multi)
      .as[(String, Long)].collect().sortBy(_._1)
    val total = selected.map(_._2).sum
    selected.map { case (p, f) =>
      VocabEntry(p, f, r0(math.log(f.toDouble / total) * QScale))
    }
  }

  /** Training as a DataFrame (the `text_unigram_train` contract). */
  def trainDf(docs: DataFrame, textCol: String, vocabMulti: Int = 256,
              maxPieceLen: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    spark.createDataset(train(docs, textCol, vocabMulti, maxPieceLen).toSeq)
      .toDF("piece", "freq", "qlp")
  }

  /** Packing base for the combined Viterbi value (PieceBase·Σqlp −
    * nPieces): nPieces must stay below it or the mod-decode wraps to a
    * silently-wrong count — and the oracle replays the same wrap, so
    * the error would verify green. Words are therefore REQUIRED
    * shorter than this (loud failure beats agreeing wrongness);
    * pre-split pathological unspaced runs upstream. Overflow margin:
    * 4095 pieces · |UnkQlp| = 1.2e11, ×4096 ≈ 5e14 ≪ 2^63.
    */
  val PieceBase = 4096L

  /** Viterbi piece count for one word under the model: maximize
    * PieceBase·Σqlp − nPieces over all segmentations into vocab pieces
    * (chars absent from the vocab score [[UnkQlp]]); returns the
    * winning segmentation's piece count, which the combined value
    * determines uniquely (nPieces = (−best) mod PieceBase since
    * nPieces ≤ word length < PieceBase).
    */
  private[operators] def viterbiPieces(word: String,
      qlp: collection.Map[String, Long], maxPieceLen: Int): Int = {
    val cps = word.codePoints.toArray // codepoint indexing (see train)
    val n = cps.length
    require(n < PieceBase,
      s"word of ${n} chars ≥ $PieceBase: piece-count decode would wrap")
    val best = new Array[Long](n + 1) // combined PieceBase·score − pieces
    var k = 1
    while (k <= n) {
      var b = Long.MinValue
      var m = 1
      while (m <= math.min(maxPieceLen, k)) {
        val q = qlp.getOrElse(new String(cps, k - m, m),
          if (m == 1) UnkQlp else Long.MinValue)
        if (q != Long.MinValue) {
          val c = best(k - m) + PieceBase * q - 1L
          if (c > b) b = c
        }
        m += 1
      }
      best(k) = b
      k += 1
    }
    (-(best(n) % PieceBase)).toInt
  }

  /** Apply: per-document Viterbi piece accounting under a trained
    * vocabulary. One narrow kernel map; the vocab artifact broadcasts;
    * per-partition word→pieces memo. The memo is bounded by the
    * DISTINCT words the partition sees — natural-language partitions
    * keep it small, but an ID-heavy corpus grows it, so it resets at
    * 2^20 entries (a pure cache: resets never change results).
    *
    * @return (doc_id, n_words, n_pieces, avg_pieces rounded 4dp).
    */
  def tokenize(docs: DataFrame, idCol: String, textCol: String,
               vocab: Array[VocabEntry], maxPieceLen: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(
      vocab.map(v => v.piece -> v.qlp).toMap)
    def r4(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val qlp = bc.value
        val memo = new java.util.HashMap[String, Int]()
        it.map { case (id, text) =>
          val words = if (text == null) Array.empty[String]
                      else text.split(" ", -1).filter(_.nonEmpty)
          var pieces = 0L
          words.foreach { w =>
            var p = memo.getOrDefault(w, -1)
            if (p < 0) {
              p = viterbiPieces(w, qlp, maxPieceLen)
              if (memo.size >= (1 << 20)) memo.clear()
              memo.put(w, p)
            }
            pieces += p
          }
          val nw = words.length.toLong
          (id, nw, pieces,
            if (nw == 0) 0.0 else r4(pieces.toDouble / nw))
        }
      }.toDF("doc_id", "n_words", "n_pieces", "avg_pieces")
  }
}
