package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) vocabulary training — the
  * tokenizer-learning step of an LLM data pipeline (Sennrich et al.
  * 2016, the algorithm behind GPT-2/SentencePiece merge tables).
  *
  * Shape, which is also how industrial trainers scale: the corpus is
  * touched EXACTLY ONCE, by a map-side-combinable word-count pass; the
  * merge loop then runs entirely on the distinct-word table, which is
  * Zipf-bounded (≈10⁶–10⁷ rows at 100 TB — driver-trivial). Each of
  * the `merges` iterations is one vocab-sized pair-count aggregate, a
  * 1-row top-1 collect (count desc, pair asc — the deterministic
  * tie-break), and a literal `replace` over the symbol sequences. No
  * iteration ever rescans the corpus, so at 100 TB the cost is one
  * scan + k vocab-sized shuffles.
  *
  * Symbol sequences are DOUBLE-delimiter-framed strings
  * (`␟␟s1␟␟s2␟␟…`) rather than arrays so the merge step is ONE
  * codegen'd literal `replace`. The framing is what makes a plain
  * replace equal textbook greedy merging: the pair pattern
  * `␟l␟␟r␟` consumes the inner boundary fully but only the inner
  * HALVES of the outer boundaries, so back-to-back occurrences
  * (`c b c b`, or a `ccccc` run merging (c,c)) touch disjoint
  * characters and the engines' left-to-right non-overlapping scan
  * (Spark UTF8String.replace ≡ DuckDB replace) merges exactly the
  * pairs greedy BPE merges — single-delimiter framing provably
  * under-merges runs (pass 1 consumes the shared delimiter), which is
  * how Round9PropertySpec's greedy replay caught it. A `raise_error`
  * guard rejects corpora containing the delimiter (the Sampling
  * reserved-value pattern).
  *
  * Reference scope: the reference engine has no tokenizer surface —
  * this is part of the beyond-reference training-data brief.
  */
object BpeTrain {

  /** Framing delimiter for symbol sequences (U+241F SYMBOL FOR UNIT
    * SEPARATOR — not a plausible corpus character; guarded anyway). */
  val Delim = "␟"

  /** Max merges learned per pair-count job by the batched selection
    * (the non-interacting-prefix rule in [[trainState]]): 256 merges
    * cost ~256/8 = 32 corpus-free vocab jobs instead of 256 — the
    * standard batched-BPE trick, here with the conservative cut that
    * keeps the learned table bit-identical to sequential greedy. */
  val SelectBatch = 8

  /** Learn `merges` BPE merges over the whitespace words of `textCol`.
    *
    * @return one row per learned merge:
    *         (step INT, lhs STRING, rhs STRING, merged STRING,
    *          pair_count BIGINT) — `merges.txt` as a DataFrame. Stops
    *         early (fewer rows) if no adjacent pair remains.
    */
  def trainMerges(docs: DataFrame, textCol: String,
                  merges: Int = 6): DataFrame =
    trainState(docs, textCol, merges)._1

  /** Per-document BPE token counts under the vocabulary learned by
    * [[trainMerges]] over the SAME corpus — the apply step. The
    * trained word→piece-count table is vocab-sized, so it broadcasts
    * to the corpus-sized word stream (at a 10⁷-word vocabulary swap
    * the broadcast for a shuffled join; the synthetic vocab is tiny).
    *
    * @return (doc_id, n_words, n_bpe_tokens) — whitespace word count
    *         and the BPE piece count after `merges` merges.
    */
  def tokenizedCounts(docs: DataFrame, idCol: String, textCol: String,
                      merges: Int = 6): DataFrame = {
    val seqs = trainState(docs, textCol, merges)._2
    val pieces = seqs.select(col("word"),
      size(symbolsOf(col("seq"))).cast("long").as("n_pieces"))
    docs.select(col(idCol).cast("long").as("doc_id"),
        explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .join(broadcast(pieces), Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nw"), sum(col("n_pieces")).as("n_bpe_tokens"))
      .select(col("doc_id"), col("nw").cast("int").as("n_words"),
        col("n_bpe_tokens"))
  }

  /** Framed sequence → its symbols, in order (split on the delimiter,
    * drop the boundary empties). */
  private def symbolsOf(seq: org.apache.spark.sql.Column) =
    filter(split(seq, java.util.regex.Pattern.quote(Delim), -1),
      s => s =!= "")

  /** The shared training loop: returns the merge table AND the final
    * per-word symbol sequences (word, seq, wc) the apply step reads. */
  private def trainState(docs: DataFrame, textCol: String,
                         merges: Int): (DataFrame, DataFrame) = {
    require(merges > 0, s"BpeTrain: merges must be positive ($merges)")
    val spark = docs.sparkSession
    val d = Delim
    val dd = d + d

    val words = TextAnalysis.explodedWords(docs, textCol)
      .groupBy(col("word")).agg(count(lit(1)).as("wc"))
      .select(
        when(col("word").contains(d),
          raise_error(concat(
            lit(s"BpeTrain: word contains reserved delimiter: "),
            col("word"))))
          .otherwise(col("word")).as("word"),
        col("wc"))

    // "ab" → "␟␟a␟␟b␟␟": single-char symbols, double-delim boundaries.
    var seqs = words
      .select(col("word"),
        concat(lit(dd),
          regexp_replace(col("word"), "(.)", "$1" + dd)).as("seq"),
        col("wc"))
      .localCheckpoint(eager = false)

    val learned = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    var step = 0
    var exhausted = false
    while (step < merges && !exhausted) {
      // adjacent pairs over the in-order symbol list. The size guard
      // matters: Spark's sequence(1, x) DESCENDS when x < 1 instead of
      // being empty.
      val pairs = seqs
        .select(col("wc"), symbolsOf(col("seq")).as("t"))
        .select(col("wc"), explode(
            when(size(col("t")) >= 2,
              transform(sequence(lit(1), size(col("t")) - 1),
                i => struct(element_at(col("t"), i).as("l"),
                  element_at(col("t"), i + 1).as("r"))))
              .otherwise(array().cast(
                "array<struct<l:string,r:string>>"))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("wc")).as("cnt"))
      // BATCHED selection (one count job learns up to `SelectBatch`
      // merges): take the sorted prefix and accept pairs while they
      // are pairwise NON-INTERACTING — then sequential greedy would
      // have picked exactly the same pairs in the same order, so the
      // merge table (and the DuckDB oracle's sequential replay) is
      // bit-identical. The proof obligations, each enforced below:
      //  - accepted pairs share no symbol and no merged-string
      //    collision → their counts are invariant under each other's
      //    replaces (a replace only destroys pairs touching l/r, and
      //    only creates pairs containing the merged symbol);
      //  - a created pair (x, l·r) needs an original adjacency (x, l)
      //    — an INTERACTING pair present in the count table — so every
      //    created count is ≤ the first interacting row's count
      //    (`cutCount`, where the scan stops); trimming accepted rows
      //    that TIE cutCount makes the bound strict, and interacting
      //    originals can only lose count, so nothing overtakes the
      //    accepted prefix mid-batch;
      //  - the one hole in that bound is a self-pair (l == r): its
      //    bounding pair (r, l) is ITSELF, so its creations (e.g.
      //    (cc,cc) from a c-run) are not cut-bounded — self-pairs
      //    therefore always run as singleton steps (old behavior);
      //  - a singleton batch is trivially sequential, the fallback
      //    whenever trimming empties the prefix.
      val want = math.min(SelectBatch, merges - step)
      val top = pairs
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(want + 1).collect()
        .map(t => (t.getString(0), t.getString(1), t.getLong(2)))
      if (top.isEmpty) exhausted = true
      else {
        val accepted = scala.collection.mutable.ArrayBuffer
          .empty[(String, String, Long)]
        var cutCount = -1L // -1 = pair table exhausted, no bound needed
        var halted = false
        val it = top.iterator
        while (!halted && it.hasNext) {
          val (cl, cr, cnt) = it.next()
          val interacting = (cl == cr && accepted.nonEmpty) ||
            accepted.exists { case (al, ar, _) =>
              cl == al || cl == ar || cr == al || cr == ar ||
              al + ar == cl || al + ar == cr ||
              cl + cr == al || cl + cr == ar || al + ar == cl + cr
            }
          if (accepted.size == want || interacting) {
            cutCount = cnt; halted = true
          } else {
            accepted += ((cl, cr, cnt))
            if (cl == cr) halted = true // self-pair: singleton step
          }
        }
        val kept0 =
          if (accepted.nonEmpty && accepted.head._1 == accepted.head._2)
            accepted.take(1) // self-pair singleton, never trimmed away
          else if (cutCount >= 0)
            accepted.takeWhile(_._3 > cutCount)
          else accepted
        val kept = if (kept0.isEmpty) accepted.take(1) else kept0
        // `␟l␟␟r␟` → `␟lr␟`: consumes only the inner halves of the
        // outer boundaries, so adjacent occurrences are
        // character-disjoint and one replace pass IS greedy. Batched
        // replaces apply in selection order — exactly the sequence of
        // states sequential training walks through.
        seqs = kept.foldLeft(seqs) { case (s, (l, r, c)) =>
          learned += ((step, l, r, l + r, c))
          step += 1
          s.select(col("word"),
            replace(col("seq"),
              lit(d + l + dd + r + d), lit(d + l + r + d)).as("seq"),
            col("wc"))
        }.localCheckpoint(eager = false)
      }
    }
    import spark.implicits._
    (spark.createDataset(learned.toSeq)
      .toDF("step", "lhs", "rhs", "merged", "pair_count"), seqs)
  }

  /** The DuckDB replay of [[trainMerges]] for `merges` iterations,
    * unrolled — each iteration re-derives the pair counts, takes the
    * same (count desc, pair asc) top-1, and applies the same literal
    * half-boundary replace. Kept next to the operator so the two
    * evolve together.
    */
  private def oraclePrefix(table: String, textCol: String,
                           merges: Int): String = {
    val d = Delim
    val head =
      s"""WITH w AS (
         |  SELECT word, CAST(count(*) AS BIGINT) AS wc
         |  FROM (SELECT unnest(string_split($textCol, ' ')) AS word
         |        FROM $table)
         |  WHERE word <> '' GROUP BY word),
         |s0 AS (SELECT word,
         |         '$d$d' || regexp_replace(word, '(.)', '\\1$d$d', 'g')
         |         AS seq, wc FROM w)""".stripMargin
    val steps = (0 until merges).map { k =>
      s"""y$k AS (SELECT word, wc,
         |  list_filter(string_split(seq, '$d'), x -> x <> '') AS t
         |  FROM s$k),
         |p$k AS (SELECT t[i] AS l, t[i + 1] AS r,
         |  CAST(sum(wc) AS BIGINT) AS cnt
         |  FROM y$k, unnest(range(1, len(t))) AS u(i)
         |  GROUP BY 1, 2),
         |b$k AS (SELECT $k AS step, l AS lhs, r AS rhs, l || r AS merged,
         |  cnt AS pair_count FROM p$k
         |  ORDER BY cnt DESC, l, r LIMIT 1),
         |s${k + 1} AS (SELECT word,
         |  coalesce(
         |    replace(seq, '$d' || b.lhs || '$d$d' || b.rhs || '$d',
         |            '$d' || b.lhs || b.rhs || '$d'), seq) AS seq, wc
         |  FROM s$k LEFT JOIN b$k b ON TRUE)""".stripMargin
    }.mkString(",\n")
    s"$head,\n$steps"
  }

  def oracleSql(table: String, textCol: String, merges: Int): String = {
    val union = (0 until merges).map(k => s"SELECT * FROM b$k")
      .mkString("\nUNION ALL ")
    s"${oraclePrefix(table, textCol, merges)}\n$union\nORDER BY step"
  }

  /** DuckDB replay of [[tokenizedCounts]]: same unrolled training
    * prefix, then piece counts off the final segmentation joined back
    * to the corpus word stream. */
  def tokenizeOracleSql(table: String, idCol: String, textCol: String,
                        merges: Int): String = {
    val d = Delim
    s"""${oraclePrefix(table, textCol, merges)},
       |pieces AS (SELECT word,
       |  CAST(len(list_filter(string_split(seq, '$d'), x -> x <> ''))
       |       AS BIGINT) AS n_pieces
       |  FROM s$merges),
       |dw AS (SELECT $idCol AS doc_id, word
       |  FROM (SELECT $idCol, unnest(string_split($textCol, ' ')) AS word
       |        FROM $table)
       |  WHERE word <> '')
       |SELECT doc_id, CAST(count(*) AS INT) AS n_words,
       |  CAST(sum(p.n_pieces) AS BIGINT) AS n_bpe_tokens
       |FROM dw JOIN pieces p USING (word)
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin
  }

  /** DuckDB replay of the per-source fertility card: the tokenize
    * replay's piece counts rolled up by document source. Fertility
    * (pieces per word) is one division of exact longs — correctly
    * rounded IEEE, so bit-identical across engines.
    */
  def fertilityOracleSql(table: String, idCol: String, textCol: String,
                         sourceCol: String, merges: Int): String = {
    val d = Delim
    s"""${oraclePrefix(table, textCol, merges)},
       |pieces AS (SELECT word,
       |  CAST(len(list_filter(string_split(seq, '$d'), x -> x <> ''))
       |       AS BIGINT) AS n_pieces
       |  FROM s$merges),
       |dw AS (SELECT $idCol AS doc_id, word
       |  FROM (SELECT $idCol, unnest(string_split($textCol, ' ')) AS word
       |        FROM $table)
       |  WHERE word <> ''),
       |per AS (SELECT d.$sourceCol AS source,
       |  CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(p.n_pieces) AS BIGINT) AS n_bpe_tokens
       |FROM dw JOIN pieces p USING (word)
       |JOIN $table d ON d.$idCol = dw.doc_id
       |GROUP BY d.$sourceCol)
       |SELECT source, n_words, n_bpe_tokens,
       |  round(CAST(n_bpe_tokens AS DOUBLE) / n_words, 6) AS fertility
       |FROM per
       |ORDER BY source""".stripMargin
  }
}
