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
  * Symbol sequences are delimiter-framed strings (`␟s1␟s2␟…␟`) rather
  * than arrays so the merge step is a single codegen'd literal
  * `replace` — left-to-right non-overlapping in both Spark
  * (UTF8String.replace) and DuckDB, which IS greedy BPE pair
  * application, and lets the oracle replay every iteration verbatim.
  * A `raise_error` guard rejects corpora containing the delimiter
  * (the Sampling reserved-value pattern).
  *
  * Reference scope: the reference engine has no tokenizer surface —
  * this is part of the beyond-reference training-data brief.
  */
object BpeTrain {

  /** Framing delimiter for symbol sequences (U+241F SYMBOL FOR UNIT
    * SEPARATOR — not a plausible corpus character; guarded anyway). */
  val Delim = "␟"

  /** Learn `merges` BPE merges over the whitespace words of `textCol`.
    *
    * @return one row per learned merge:
    *         (step INT, lhs STRING, rhs STRING, merged STRING,
    *          pair_count BIGINT) — `merges.txt` as a DataFrame. Stops
    *         early (fewer rows) if no adjacent pair remains.
    */
  def trainMerges(docs: DataFrame, textCol: String,
                  merges: Int = 6): DataFrame = {
    require(merges > 0, s"BpeTrain: merges must be positive ($merges)")
    val spark = docs.sparkSession
    import spark.implicits._
    val d = Delim

    val words = docs
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("wc"))
      .select(
        when(col("word").contains(d),
          raise_error(concat(
            lit(s"BpeTrain: word contains reserved delimiter: "),
            col("word"))))
          .otherwise(col("word")).as("word"),
        col("wc"))

    // "ab" → "␟a␟b␟": every char becomes a framed single-char symbol.
    var seqs = words
      .select(concat(lit(d),
          regexp_replace(col("word"), "(.)", "$1" + d)).as("seq"),
        col("wc"))
      .localCheckpoint(eager = false)

    val learned = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    var step = 0
    var exhausted = false
    while (step < merges && !exhausted) {
      // split keeps the leading/trailing empties ("␟a␟b␟" → ["","a","b",""]),
      // so symbols live at 1-based positions 2..size-1 and adjacent pairs
      // at (i, i+1) for i ∈ [2, size-2]. The size guard matters: Spark's
      // sequence(2, x) DESCENDS when x < 2 instead of being empty.
      val t = split(col("seq"), java.util.regex.Pattern.quote(d), -1)
      val pairs = seqs
        .select(col("wc"), t.as("t"))
        .select(col("wc"), explode(
            when(size(col("t")) >= 4,
              transform(sequence(lit(2), size(col("t")) - 2),
                i => struct(element_at(col("t"), i).as("l"),
                  element_at(col("t"), i + 1).as("r"))))
              .otherwise(array().cast(
                "array<struct<l:string,r:string>>"))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("wc")).as("cnt"))
      val top = pairs
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, c) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        learned += ((step, l, r, l + r, c))
        seqs = seqs
          .select(replace(col("seq"),
              lit(d + l + d + r + d), lit(d + l + r + d)).as("seq"),
            col("wc"))
          .localCheckpoint(eager = false)
        step += 1
      }
    }
    spark.createDataset(learned.toSeq)
      .toDF("step", "lhs", "rhs", "merged", "pair_count")
  }

  /** The DuckDB replay of [[trainMerges]] for `merges` iterations,
    * unrolled — each iteration re-derives the pair counts, takes the
    * same (count desc, pair asc) top-1, and applies the same literal
    * replace. Kept next to the operator so the two evolve together.
    */
  def oracleSql(table: String, textCol: String, merges: Int): String = {
    val d = Delim
    val head =
      s"""WITH w AS (
         |  SELECT word, CAST(count(*) AS BIGINT) AS wc
         |  FROM (SELECT unnest(string_split($textCol, ' ')) AS word
         |        FROM $table)
         |  WHERE word <> '' GROUP BY word),
         |s0 AS (SELECT '$d' || regexp_replace(word, '(.)', '\\1$d', 'g')
         |         AS seq, wc FROM w)""".stripMargin
    val steps = (0 until merges).map { k =>
      s"""p$k AS (SELECT t[i] AS l, t[i + 1] AS r,
         |  CAST(sum(wc) AS BIGINT) AS cnt
         |  FROM (SELECT string_split(seq, '$d') AS t, wc FROM s$k),
         |       unnest(range(2, len(t) - 1)) AS u(i)
         |  GROUP BY 1, 2),
         |b$k AS (SELECT $k AS step, l AS lhs, r AS rhs, l || r AS merged,
         |  cnt AS pair_count FROM p$k
         |  ORDER BY cnt DESC, l, r LIMIT 1),
         |s${k + 1} AS (SELECT replace(seq, '$d' || b.lhs || '$d' || b.rhs || '$d',
         |  '$d' || b.lhs || b.rhs || '$d') AS seq, wc FROM s$k, b$k b)""".stripMargin
    }.mkString(",\n")
    val union = (0 until merges).map(k => s"SELECT * FROM b$k")
      .mkString("\nUNION ALL ")
    s"$head,\n$steps\n$union\nORDER BY step"
  }
}
