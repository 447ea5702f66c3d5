package graft.queries

import graft.{Env, Q}
import graft.syntax._
import graft.operators.UnigramLm
import org.apache.spark.sql.DataFrame

/** Unigram-LM tokenizer queries — see [[graft.operators.UnigramLm]].
  * The oracle replays training (substring counts → top-256 multi-char
  * + all single chars → quantized log-probs) and brute-forces Viterbi
  * by enumerating EVERY segmentation of each distinct word with a
  * recursive CTE, maximizing the same PieceBase·Σqlp − nPieces
  * integer. NOTE the enumeration is EXPONENTIAL in word length
  * (~1.93^len compositions into parts ≤ 4) — fine for this corpus's
  * ≤ 8-char vocabulary and oracle-side only (the engine runs an
  * O(len·maxPieceLen) DP per memoized word at any length), but a
  * corpus with long unspaced tokens would need a DP-unrolled oracle
  * instead.
  */
object UnigramQueries {

  private val VMulti = 256
  private val MaxLen = 4

  /** Shared training CTE chain ending in `sel`+`tot` (selected vocab
    * with frequencies and the total). */
  private val trainCte: String =
    s"""wtok AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
       |wc AS (SELECT word, CAST(count(*) AS BIGINT) AS n
       |       FROM wtok WHERE word <> '' GROUP BY word),
       |cand AS (
       |  SELECT substr(word, CAST(u.i AS INT), CAST(v.m AS INT)) AS piece, n
       |  FROM wc, unnest(range(1, length(word) + 1)) AS u(i),
       |       unnest(range(1, ${MaxLen + 1})) AS v(m)
       |  WHERE u.i + v.m - 1 <= length(word)),
       |pf AS (SELECT piece, CAST(sum(n) AS BIGINT) AS freq
       |       FROM cand GROUP BY piece),
       |multi AS (SELECT piece, freq FROM pf WHERE length(piece) > 1
       |          ORDER BY freq DESC, piece ASC LIMIT $VMulti),
       |sel AS (SELECT piece, freq FROM pf WHERE length(piece) = 1
       |        UNION ALL SELECT piece, freq FROM multi),
       |tot AS (SELECT CAST(sum(freq) AS BIGINT) AS total FROM sel),
       |vq AS (SELECT piece, freq,
       |         CAST(round(ln(CAST(freq AS DOUBLE) / total) * 1000000)
       |              AS BIGINT) AS qlp
       |       FROM sel, tot)""".stripMargin

  def textUnigramTrain(env: Env): DataFrame =
    UnigramLm.trainDf(env.documents, "text", VMulti, MaxLen)
      .orderBy($"piece")

  def textUnigramTokens(env: Env): DataFrame = {
    val vocab = UnigramLm.train(env.documents, "text", VMulti, MaxLen)
    UnigramLm.tokenize(env.spread(env.documents), "doc_id", "text",
        vocab, MaxLen)
      .orderBy($"doc_id")
  }

  /** Per-source fertility under the trained unigram-LM vocabulary —
    * the companion to `text_bpe_fertility`, so the BPE-vs-Unigram
    * pieces-per-word trade reads side by side per corpus slice. Same
    * scale shape as the tokens entry (vocab-sized broadcast, per-word
    * Viterbi memo) plus one source-keyed combinable rollup. */
  def textUnigramFertility(env: Env): DataFrame = {
    import org.apache.spark.sql.functions.{round, sum}
    val vocab = UnigramLm.train(env.documents, "text", VMulti, MaxLen)
    UnigramLm.tokenize(env.spread(env.documents), "doc_id", "text",
        vocab, MaxLen)
      .join(env.documents.select($"doc_id", $"source"), Seq("doc_id"))
      .groupBy($"source")
      .agg(sum($"n_words").cast("long").as("n_words"),
           sum($"n_pieces").cast("long").as("n_pieces"))
      .select($"source", $"n_words", $"n_pieces",
        round($"n_pieces".cast("double") / $"n_words", 6).as("fertility"))
      .orderBy($"source")
  }

  /** Shared Viterbi-replay chain (dw/dwf/uw/wp/sp/seg/best/wnp/per)
    * — consumed by the per-doc tokens entry and the per-source
    * fertility rollup. */
  private val tokensCte: String =
    s"""      |dw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
      |       FROM documents),
      |dwf AS (SELECT doc_id, word FROM dw WHERE word <> ''),
      |uw AS (SELECT DISTINCT word FROM dwf),
      |wp AS (
      |  SELECT word, CAST(u.i AS INT) AS i, CAST(v.m AS INT) AS m,
      |         substr(word, CAST(u.i AS INT), CAST(v.m AS INT)) AS pc
      |  FROM uw, unnest(range(1, length(word) + 1)) AS u(i),
      |       unnest(range(1, ${MaxLen + 1})) AS v(m)
      |  WHERE u.i + v.m - 1 <= length(word)),
      |sp AS (
      |  SELECT wp.word, wp.i, wp.m,
      |         coalesce(q.qlp, CASE WHEN wp.m = 1 THEN ${UnigramLm.UnkQlp}
      |                              ELSE NULL END) AS q
      |  FROM wp LEFT JOIN vq q ON q.piece = wp.pc),
      |seg(word, pos, score, np) AS (
      |  SELECT word, 0, CAST(0 AS BIGINT), 0 FROM uw
      |  UNION
      |  SELECT s.word, s.pos + p.m, s.score + p.q, s.np + 1
      |  FROM seg s JOIN sp p ON p.word = s.word AND p.i = s.pos + 1
      |  WHERE p.q IS NOT NULL),
      |best AS (
      |  SELECT word, max(score * ${UnigramLm.PieceBase} - np) AS v
      |  FROM seg WHERE pos = length(word) GROUP BY word),
      |wnp AS (SELECT word,
      |          CAST(-(v % ${UnigramLm.PieceBase}) AS BIGINT) AS np
      |        FROM best),
      |per AS (
      |  SELECT d.doc_id, CAST(count(*) AS BIGINT) AS nw,
      |         CAST(sum(w.np) AS BIGINT) AS np
      |  FROM dwf d JOIN wnp w USING (word) GROUP BY d.doc_id)""".stripMargin

  val entries: Seq[Q] = Seq(
    Q.sql("text_unigram_train", textUnigramTrain,
      s"""WITH $trainCte
         |SELECT piece, freq, qlp FROM vq ORDER BY piece""".stripMargin),

    Q.sql("text_unigram_tokens", textUnigramTokens,
      s"""WITH RECURSIVE $trainCte,
         |${tokensCte.linesIterator.mkString("\n         |")}
         |SELECT doc.doc_id,
         |       coalesce(p.nw, 0) AS n_words,
         |       coalesce(p.np, 0) AS n_pieces,
         |       CASE WHEN p.nw IS NULL THEN 0.0
         |            ELSE round(CAST(p.np AS DOUBLE) / p.nw, 4)
         |       END AS avg_pieces
         |FROM documents doc LEFT JOIN per p USING (doc_id)
         |ORDER BY doc.doc_id""".stripMargin),

    // per-source rollup of the same replay — the tokenizer-selection
    // table next to text_bpe_fertility (unigram vs BPE pieces/word)
    Q.sql("text_unigram_fertility", textUnigramFertility,
      s"""WITH RECURSIVE $trainCte,
         |${tokensCte.linesIterator.mkString("\n         |")},
         |psrc AS (SELECT doc.source, coalesce(p.nw, 0) AS nw,
         |                coalesce(p.np, 0) AS np
         |         FROM documents doc LEFT JOIN per p USING (doc_id))
         |SELECT source, CAST(sum(nw) AS BIGINT) AS n_words,
         |       CAST(sum(np) AS BIGINT) AS n_pieces,
         |       round(CAST(sum(np) AS DOUBLE) / sum(nw), 6) AS fertility
         |FROM psrc GROUP BY source
         |ORDER BY source""".stripMargin)
  )
}