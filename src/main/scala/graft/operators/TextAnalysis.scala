package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline brief:
  * token counting, quality scoring, language identification, and
  * document fingerprinting. All pure Column expressions (codegen'd,
  * engine-portable) so every result is SQL-oracle-checkable.
  */
object TextAnalysis {

  def tokens(text: Column): Column = split(text, " ")

  /** One row per non-empty whitespace token, keeping `keyCols` — THE
    * tokenization pipeline shared by the word-count/training operators
    * ([[graft.operators.UnigramLm]], [[graft.operators.NaiveBayes]],
    * and the [[graft.operators.BpeTrain]] word table): all their
    * oracles replay DuckDB `string_split(text, ' ')` + empty filter,
    * so the Spark side must mean exactly this in exactly one place.
    */
  def explodedWords(docs: DataFrame, textCol: String,
                    keyCols: String*): DataFrame =
    docs.select(keyCols.map(col) :+
        explode(split(col(textCol), " ")).as("word"): _*)
      .filter(col("word") =!= "")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword token count: word/number/symbol pieces via regex,
    * the standard pre-tokenizer split (letters runs, digit runs, and
    * single non-alphanumeric marks each count as one piece), plus the
    * ~4-chars-per-token budget estimate used for LLM sizing.
    */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  def bpeEstimate(text: Column): Column =
    ceil(length(text).cast("double") / 4.0).cast("long")

  /** English-ish stopword markers present in any corpus. */
  val StopwordsEn: Seq[String] = Seq("a", "the", "and", "of", "to", "in", "is")

  def stopwordCount(text: Column, stopwords: Seq[String] = StopwordsEn): Column = {
    val set = stopwords.toSet
    size(filter(tokens(text), t => set.map(s => t === s).reduce(_ || _)))
  }

  /** Blocklist hits — the C4-style "bad words" gate. Token-exact (no
    * substring false positives: "dupe" doesn't hit "dup"), pure
    * codegen'd array ops. */
  def badwordHits(text: Column, words: Seq[String]): Column = {
    require(words.nonEmpty, "badwordHits: empty blocklist")
    stopwordCount(text, words) // same token-set membership count
  }

  /** Adjacent-bigram phrase hits for a two-token blocklist phrase. */
  def badPhraseHits(text: Column, first: String, second: String): Column = {
    val s = tokens(text)
    // sequence(1, x) descends when x < 1 — guard single-token docs
    when(size(s) >= 2,
      size(filter(sequence(lit(1), size(s) - 1),
        j => element_at(s, j) === first && element_at(s, j + 1) === second)))
      .otherwise(lit(0))
  }

  /** Gopher rule-card ingredients (Rae et al. 2021, arXiv 2112.11446,
    * Table A1 document filters). Each ingredient is an exact integer
    * count so every rule becomes a cross-multiplied integer predicate —
    * no FP ratio ever computed, hence bit-identical across engines.
    * All three are codegen'd higher-order array ops (zero shuffle).
    */
  def wordCharCount(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, x) => acc + length(x))

  /** Words containing at least one ASCII-alphabetic character. */
  def alphaWordCount(text: Column): Column =
    size(filter(tokens(text), x => x.rlike("[A-Za-z]"))).cast("long")

  /** "Symbol" words per Gopher: hash marks or ellipses. */
  def symbolWordCount(text: Column): Column =
    size(filter(tokens(text), x => x.contains("#") || x.contains("...")))
      .cast("long")

  /** The Gopher rule card over a document table: per-doc counts, the
    * five per-rule verdicts, and the combined keep. See
    * `TextQueries.textGopherGates` for the registry entry + oracle.
    */
  def gopherGates(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val text = col(textCol)
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      tokenCount(text).cast("long").as("n_words"),
      wordCharCount(text).as("n_word_chars"),
      alphaWordCount(text).as("n_alpha_words"),
      symbolWordCount(text).as("n_symbol_words"),
      stopwordCount(text).cast("long").as("n_stopwords"))
    val passWc = col("n_words") >= 50 && col("n_words") <= 100000L
    val passMwl = col("n_word_chars") >= col("n_words") * 3 &&
      col("n_word_chars") <= col("n_words") * 10
    val passSym = col("n_symbol_words") * 10 <= col("n_words")
    val passAlpha = col("n_alpha_words") * 5 >= col("n_words") * 4
    val passStop = col("n_stopwords") >= 2
    base.select(col("doc_id"), col("n_words"), col("n_word_chars"),
      passWc.as("pass_word_count"),
      passMwl.as("pass_mean_word_len"),
      passSym.as("pass_symbol_ratio"),
      passAlpha.as("pass_alpha_frac"),
      passStop.as("pass_stopwords"),
      (passWc && passMwl && passSym && passAlpha && passStop).as("kept"))
  }

  /** Quality score ∈ [0,1]: weighted blend of
    *  - length factor   (prefers 200–4000 chars),
    *  - stopword ratio  (natural text has some),
    *  - mean word length (penalizes gibberish extremes).
    * Deterministic rational arithmetic; rounded to 6 dp at the edge.
    */
  def qualityScore(text: Column): Column = {
    val nChars = length(text).cast("double")
    val nToks = tokenCount(text).cast("double")
    val lengthFactor = least(nChars / 200.0, lit(1.0)) *
      least(lit(4000.0) / greatest(nChars, lit(1.0)), lit(1.0))
    val stopRatio = stopwordCount(text).cast("double") / greatest(nToks, lit(1.0))
    val meanWordLen = nChars / greatest(nToks, lit(1.0))
    val wordLenFactor = when(meanWordLen.between(3.0, 10.0), 1.0).otherwise(0.5)
    round(lit(0.4) * lengthFactor + lit(0.3) * least(stopRatio * 5.0, lit(1.0)) +
      lit(0.3) * wordLenFactor, 6)
  }

  /** Language marker sets: tiny per-language stopword lists (public
    * common-word lists). Deterministic argmax with alphabetical
    * tie-break via the score tuple ordering.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "nicht", "ist"),
    "en" -> Seq("the", "and", "of", "to", "a", "is"),
    "es" -> Seq("el", "la", "los", "que", "y", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有"))

  /** N-gram/stopword-heuristic language ID: score each language by
    * marker-token hits; predict the highest scorer (ties → first
    * alphabetically, since candidates are evaluated in sorted order and
    * only a STRICTLY greater score replaces the leader).
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = LangMarkers.map { case (lang, markers) =>
      val set = markers.toSet
      (lang, size(filter(toks, t => set.map(s => t === s).reduce(_ || _))))
    }
    // fold: (bestLang, bestScore) — strict > keeps the alphabetical
    // leader on ties
    scores.tail.foldLeft((lit(scores.head._1), scores.head._2)) {
      case ((bl, bs), (lang, s)) =>
        (when(s > bs, lit(lang)).otherwise(bl), when(s > bs, s).otherwise(bs))
    }._1
  }

  /** Rolling-hash document fingerprints over the 3-gram shingle set:
    *  - `fpMin`: lexicographic min of shingle md5s (1-permutation
    *    MinHash — cheap near-dup prefilter key);
    *  - `fpFull`: md5 of the sorted shingle set (exact content
    *    identity, order-insensitive).
    */
  def fpMin(text: Column, n: Int = 3): Column =
    array_min(transform(TextDedup.shingles(text, n), s => md5(s)))

  def fpFull(text: Column, n: Int = 3): Column =
    TextDedup.shingleFingerprint(text, n)

  /** Batch form of [[fpMin]]/[[fpFull]] as ONE partition kernel —
    * per-shingle md5 through a higher-order `transform` evaluates an
    * interpreted lambda + digest allocation per element (measured
    * 6.2 s at sf0.1 for the two-column projection); the kernel hashes
    * the same shingle set with one reused MessageDigest (~0.4 s).
    * Semantics are column-form-identical: single-space split keeping
    * empties, order-preserving distinct, whole-text fallback for short
    * docs, lowercase-hex md5, byte-order min / sort.
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
                   n: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        def hex(s: String): String = {
          md.reset()
          md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
        }
        it.map { case (id, text) =>
          if (text == null) (id, null: String, null: String)
          else {
            val toks = text.split(" ", -1)
            val grams: Array[String] =
              if (toks.length >= n)
                (0 to toks.length - n).iterator
                  .map(i => toks.slice(i, i + n).mkString(" "))
                  .toArray.distinct
              else Array(toks.mkString(" "))
            val fpMin = grams.iterator.map(hex).min
            val fpFull = hex(grams.sorted(CodepointOrdering).mkString("|"))
            (id, fpMin, fpFull)
          }
        }
      }.toDF("doc_id", "fp_min", "fp_full")
  }

  /** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken
    * 2003 — the MOSS algorithm): hash every token k-gram, slide a
    * w-window over the hash sequence, and keep each window's minimum
    * (rightmost on ties). Guarantees: any shared substring of at
    * least w+k-1 tokens yields a shared fingerprint (the detection
    * floor), and selected positions are never more than w apart (the
    * density ceiling) — the position-robust middle ground between
    * one-per-doc MinHash ([[fpMin]]) and every-position ExactSubstr.
    *
    * Determinism/oracle: hashes are the first 13 md5 hex digits as a
    * long (the repo's h52 recipe — replayed in DuckDB as
    * CAST('0x'||substr(md5(g),1,13) AS BIGINT)), windows are pure
    * integer index arithmetic, and the tie rule is (hash asc, pos
    * desc) — all engine-exact. Scale shape: one narrow mapPartitions
    * kernel with a reused MessageDigest, output bounded by ~n/2
    * fingerprints per doc (expected n·2/(w+1)), zero shuffles.
    *
    * @return (doc_id, pos, fp) — 1-based k-gram position and its
    *         52-bit fingerprint, the distinct selected set per doc.
    */
  def winnowFingerprints(docs: DataFrame, idCol: String, textCol: String,
                         k: Int = 3, w: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        // top 52 bits of the digest (== the first 13 hex chars parsed
        // base-16, taken directly from the bytes — no per-position hex
        // format/parse allocation)
        def h52(s: String): Long = {
          md.reset()
          val d = md.digest(s.getBytes("UTF-8"))
          ((d(0) & 0xffL) << 44) | ((d(1) & 0xffL) << 36) |
            ((d(2) & 0xffL) << 28) | ((d(3) & 0xffL) << 20) |
            ((d(4) & 0xffL) << 12) | ((d(5) & 0xffL) << 4) |
            ((d(6) & 0xf0L) >>> 4)
        }
        it.flatMap { case (id, text) =>
          if (text == null) Iterator.empty
          else {
            val toks = text.split(" ", -1)
            val grams: Array[String] =
              if (toks.length >= k)
                (0 to toks.length - k)
                  .map(i => toks.slice(i, i + k).mkString(" ")).toArray
              else Array(toks.mkString(" "))
            val hs = grams.map(h52)
            val ng = hs.length
            val nw = math.max(ng - w + 1, 1)
            val sel = scala.collection.mutable.LinkedHashMap.empty[Int, Long]
            // monotonic deque sliding minimum, O(n) amortized for any
            // w: indices with strictly increasing hashes; pushing pops
            // every back entry ≥ the new hash, so among equal hashes
            // only the LATEST survives — the front is exactly the
            // rightmost window minimum the winnowing paper selects
            val dq = new java.util.ArrayDeque[Int]()
            var i = 0
            var wp = 0
            while (wp < nw) {
              val end = math.min(wp + w, ng)
              while (i < end) {
                while (!dq.isEmpty && hs(dq.peekLast) >= hs(i)) dq.pollLast()
                dq.addLast(i)
                i += 1
              }
              while (dq.peekFirst < wp) dq.pollFirst()
              sel.update(dq.peekFirst, hs(dq.peekFirst))
              wp += 1
            }
            sel.iterator.map { case (p, h) => (id, p + 1, h) }
          }
        }
      }
      .toDF("doc_id", "pos", "fp")
  }

  /** Codepoint-order String comparator — Spark's string sort
    * (array_sort included) and DuckDB's both compare UTF-8 bytes,
    * which equals codepoint order; Java's natural String ordering
    * compares UTF-16 code units, which ranks supplementary-plane
    * codepoints (surrogates 0xD800+) BELOW U+E000..U+FFFF. Any kernel
    * that must sort like the column form sorts with this.
    */
  private[graft] object CodepointOrdering extends Ordering[String] {
    def compare(a: String, b: String): Int = {
      val la = a.length; val lb = b.length
      var i = 0
      while (i < la && i < lb) {
        val ca = a.codePointAt(i); val cb = b.codePointAt(i)
        if (ca != cb) return Integer.compare(ca, cb)
        i += Character.charCount(ca)
      }
      Integer.compare(la - i, lb - i)
    }
  }

  /** Repetition statistics for quality filtering (the Gopher-rule
    * family): duplicate-token fraction (1 − distinct/total) and the
    * fraction of 2-gram occurrences taken by the single most frequent
    * 2-gram — high values mark boilerplate/degenerate text.
    *
    * One compiled partition map, ZERO shuffle: per-doc gram counts are
    * bounded by doc length, so a per-row hash map beats exploding the
    * corpus into gram rows and shuffling twice (the expression form
    * measured 3.8s vs ~0.4s at sf0.1). Rounding matches Spark's
    * `round` (BigDecimal HALF_UP) so the DuckDB oracle stays
    * hash-identical.
    */
  def repetitionStats(docs: DataFrame, idCol: String,
                      textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    def r6(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    docs.select(col(idCol).cast("long").as("doc_id"),
                col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          // match split()/string_split: limit -1 keeps empty tokens
          val toks = (if (text == null) "" else text).split(" ", -1)
          val distinct = new java.util.HashSet[String]()
          toks.foreach(distinct.add)
          val counts = new java.util.HashMap[String, Int](toks.length * 2)
          var top = 0
          var total = 0
          if (toks.length >= 2) {
            var i = 0
            while (i < toks.length - 1) {
              val g = toks(i) + " " + toks(i + 1)
              val c = counts.merge(g, 1, Integer.sum)
              if (c > top) top = c
              total += 1
              i += 1
            }
          } else { top = 1; total = 1 } // short-doc whole-text gram
          (id,
           r6(1.0 - distinct.size.toDouble / toks.length),
           r6(top.toDouble / total))
        }
      }
      .toDF("doc_id", "dup_token_frac", "top_2gram_frac")
  }

  /** Corpus-LM perplexity scoring — the n-gram-LM quality filter of
    * the CCNet/C4 lineage, with the LM trained on the corpus itself:
    * a bigram model with add-one smoothing, p(w₂|w₁) =
    * (c(w₁w₂)+1)/(c(w₁·)+V), scores every document by perplexity
    * exp(−(1/n)·Σ ln p). Low-probability documents are the
    * quality-filter outliers (degenerate or off-distribution text).
    *
    * Scale shape: the two count tables are map-side-combinable
    * aggregates (bigram instances shuffle once as count partials); the
    * probability join is a plain equi-join on the bigram key (AQE
    * skew-splits a hot function word); V rides in as a
    * [[PlanHints.withScalars]] scalar; the per-doc fold is a groupBy
    * bounded by document length. Nothing quadratic, nothing collected.
    *
    * Cross-engine determinism: every probability is a division of
    * exact longs (bit-identical in any IEEE engine). Only the per-doc
    * ln-fold touches transcendentals; it runs as ONE sequential
    * position-ordered sum per doc and the result is rounded once at
    * the end (4 dp), so the known ≤1-ulp ln/exp divergence between
    * libm and the JVM (measured: 1 value in 2·10⁴ differs by 1 ulp)
    * is ~10⁻¹² relative before rounding — far inside the rounding
    * guard band.
    *
    * @return (doc_id, n_tokens, n_bigrams, ppl); docs with < 2 tokens
    *         have no bigrams and a NULL ppl.
    */
  def perplexity(docs: DataFrame, idCol: String,
                 textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    def r4(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      split(col(textCol), " ").as("s"))
    val bg = base.select(col("doc_id"),
      explode(when(size(col("s")) >= 2,
          transform(sequence(lit(0), size(col("s")) - 2),
            i => struct((i + 1).as("pos"),
              element_at(col("s"), i + 1).as("w1"),
              element_at(col("s"), i + 2).as("w2"))))
        .otherwise(array().cast("array<struct<pos:int,w1:string,w2:string>>")))
        .as("b"))
      .select(col("doc_id"), col("b.pos").as("pos"),
        col("b.w1").as("w1"), col("b.w2").as("w2"))
      // consumed three times (both count tables + the probe side of
      // the prob join): pin the explode so it computes once, the
      // TextDedup shingle-frame pattern
      .localCheckpoint(eager = false)
    val vocab = base.select(explode(col("s")).as("w"))
      .agg(count_distinct(col("w")).as("vocab"))
    val cb = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("cb"))
    val cu = bg.groupBy(col("w1")).agg(count(lit(1)).as("cu"))
    val probs = PlanHints.withScalars(
        bg.join(cb, Seq("w1", "w2")).join(cu, Seq("w1")), vocab)
      .select(col("doc_id"), col("pos"),
        ((col("cb") + 1).cast("double") / (col("cu") + col("vocab"))
          .cast("double")).as("p"))
    val scored = probs.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nb"),
           collect_list(struct(col("pos"), col("p"))).as("ps"))
      .as[(Long, Long, Seq[(Int, Double)])]
      .map { case (id, nb, ps) =>
        var s = 0.0
        ps.sortBy(_._1).foreach { case (_, p) => s += math.log(p) }
        (id, nb, r4(math.exp(-(s / nb))))
      }
      .toDF("doc_id", "nb", "ppl")
    base.select(col("doc_id"), size(col("s")).as("n_tokens"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("nb"), lit(0L)).cast("int").as("n_bigrams"),
        col("ppl"))
  }

  /** Inverted-index build — the search-index artifact over a corpus:
    * per term its document frequency, collection frequency, and the
    * top-`topK` postings by term frequency (one output row per
    * (term, rank); a production index would write the full postings
    * partitioned by term — the capped form keeps the artifact
    * oracle-sized while exercising the same plan).
    *
    * Scale shape: one explode + two map-side-combinable aggregates,
    * then a rank-filter window BY TERM that Spark rewrites to
    * partial-per-partition group limits (WindowGroupLimit) — a
    * stopword's million-doc posting list is pruned to topK per
    * partition before the shuffle, so term skew never concentrates in
    * one task's sort. The stats join is term-sized, not posting-sized.
    */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
                    topK: Int = 5): DataFrame = {
    require(topK > 0, s"topK must be positive, got $topK")
    import org.apache.spark.sql.expressions.Window
    val tf = docs.select(col(idCol).cast("long").as("doc_id"),
        explode(split(col(textCol), " ")).as("term"))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(eager = false)
    val stats = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("cf"))
    val w = Window.partitionBy(col("term"))
      .orderBy(col("tf").desc, col("doc_id").asc)
    tf.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .join(stats, "term")
      .select(col("term"), col("df"), col("cf"),
        col("rank").cast("int").as("rank"), col("doc_id"), col("tf"))
  }

  /** Hashed-feature linear quality classifier INFERENCE — the
    * fasttext/CCNet filtering shape: each token hashes into one of
    * `buckets` feature buckets, the model is a weight per bucket, a
    * document's score is the mean weight of its token stream, and the
    * keep decision is score > 0. The weights here are a deterministic
    * md5-derived stand-in for a trained model (this engine ships
    * inference, not training); what is REAL and load-bearing is the
    * plumbing — hash → bucket → broadcast weight lookup → associative
    * integer sum — which is exactly how a trained table would run.
    *
    * Exactness: weights are INTEGER micro-units in [−10⁶, 10⁶]
    * (wµ = 52-bit md5 prefix of the bucket id mod 2·10⁶+1, minus
    * 10⁶), so the per-doc sum is exact long arithmetic — associative,
    * map-side combinable — and only the final mean is one correctly
    * rounded double division per engine. The same derivation is one
    * SQL expression over range(buckets), so the oracle rebuilds the
    * identical model.
    *
    * Scale shape: the model is a `buckets`-row broadcast (a real
    * trained table would broadcast the same way); the token explode
    * feeds a partial-aggregated groupBy on the document id — the
    * shuffle carries one partial sum per doc per partition, not
    * tokens. (split(" ") yields [""] for empty text, so every doc has
    * ≥ 1 token and the inner join never drops a document.)
    */
  def qualityClassifier(docs: DataFrame, idCol: String, textCol: String,
                        buckets: Int = 256, salt: String = "graft-qc")
      : DataFrame = {
    val spark = docs.sparkSession
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val weights = spark.range(buckets.toLong).toDF("f")
      .select(col("f").cast("int").as("f"),
        (pmod(conv(substring(md5(concat(lit(s"$salt-w|"), col("f"))), 1, 13),
                   16, 10).cast("long"), lit(2000001L)) - lit(1000000L))
          .as("w_mu"))
    qualityClassifierWith(docs, idCol, textCol, weights, buckets, salt)
  }

  /** The INFERENCE half of the hashed linear classifier, generic over
    * the weight table: token → bucket → broadcast weight lookup →
    * associative integer sum (+ optional bias) → mean score + keep
    * decision. The md5 stand-in ([[qualityClassifier]]) and the
    * centroid-TRAINED model ([[qualityTrainCentroid]]) run this
    * identical code path — a learned weight table feeds the
    * classifier unchanged.
    *
    * @param weights (f: int, w_mu: long) — one integer weight per
    *   bucket, plus an OPTIONAL bias row at f = −1 (a trained decision
    *   threshold; every document implicitly carries one unit of it).
    *   Whatever the training provenance, the per-doc sum stays exact
    *   long arithmetic and `score` is the micro-unit mean.
    */
  /** `md5_bucket(salt|, tok) % buckets` as the native codegen'd
    * [[graft.plans.Md5Bucket]] expression — bit-equal to the builtin
    * `pmod(conv(substring(md5(concat(..)), 1, 13), 16, 10), buckets)`
    * chain the oracles replay, without materializing a 32-char hex
    * string per token (this runs once per token of the corpus). */
  private def md5BucketCol(salt: String, tok: Column, buckets: Int): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.plans.Md5Bucket(
      ColumnBridge.expression(lit(s"$salt|")),
      ColumnBridge.expression(tok), buckets))
  }

  def qualityClassifierWith(docs: DataFrame, idCol: String, textCol: String,
                            weights: DataFrame, buckets: Int = 256,
                            salt: String = "graft-qc"): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val w = weights.select(col("f").cast("int").as("f"),
      col("w_mu").cast("long").as("w_mu"))
    // always exactly one row, zero when no bias entry is present — the
    // md5 stand-in path adds an exact long 0 and stays bit-identical
    val bias = w.filter(col("f") === -1)
      .agg(coalesce(sum(col("w_mu")), lit(0L)).as("bias"))
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
        explode(split(col(textCol), " ")).as("tok"))
      .withColumn("f", md5BucketCol(salt, col("tok"), buckets))
    val sums = toks.join(broadcast(w.filter(col("f") >= 0)), "f")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"), sum(col("w_mu")).as("s_mu"))
    PlanHints.withScalars(sums, bias)
      .select(col("doc_id"), col("n_toks").cast("int").as("n_toks"),
        ((col("s_mu") + col("bias")).cast("double") / 1e6 / col("n_toks"))
          .as("score"),
        (col("s_mu") + col("bias") > 0).as("keep"))
  }

  /** Hashed-feature token counts per document — the design matrix of
    * the quality classifier family: every whitespace token
    * (split(" ") — empty text yields one "" token, so no document
    * drops out) hashes to one of `buckets` features; cnt is the exact
    * integer token count per (doc, feature). */
  private def hashedFeatures(docs: DataFrame, idCol: String, textCol: String,
                             buckets: Int, salt: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
        explode(split(col(textCol), " ")).as("tok"))
      .withColumn("f", md5BucketCol(salt, col("tok"), buckets))
      .groupBy(col("doc_id"), col("f"))
      .agg(count(lit(1)).as("cnt"))

  /** Nearest-centroid (Rocchio) TRAINER for the hashed linear quality
    * classifier — the real counterpart to [[qualityClassifier]]'s
    * stand-in weights. This is the CCNet/fastText filtering shape
    * trained for real: a labeled document set (`labelCol`, boolean —
    * e.g. an expensive gate cascade's verdict being distilled into one
    * cheap broadcastable scorer, or a curated-vs-crawl bucket label)
    * supervises a linear model over the SAME hashed bag-of-words
    * features the inference path uses, so the learned table feeds
    * [[qualityClassifierWith]] unchanged.
    *
    * Model, all-integer and closed-form (no optimizer loop):
    *  - direction: w_f = sp_f·Nn − sn_f·Np where sp_f/sn_f are the
    *    positive/negative classes' token counts in bucket f and Np/Nn
    *    the class document counts — the class-mean difference
    *    (μ⁺ − μ⁻) scaled by Np·Nn so it stays exact long arithmetic;
    *  - threshold: project every labeled doc onto w (s_d = Σ x_df·w_f)
    *    and pick the cut c maximizing training accuracy — a prefix-sum
    *    scan over the distinct projected scores (ties: smallest cut;
    *    the "predict none positive" sentinel included). The model's
    *    bias row is f = −1, w = 1 − c, so the serving decision
    *    s + bias > 0 ⇔ s ≥ c.
    *
    * Everything is exact long arithmetic — associative, partial-
    * aggregable, bit-reproducible on any partitioning — and unrolls to
    * join+aggregate+window ANSI SQL for the DuckDB oracle. Products
    * stay in range for labeled sets up to ~10⁷ docs; a quality-filter
    * training set is a bounded curated sample by construction
    * (reference analog: the classification sweeps of
    * /root/reference/monitor.py:30-96 run over bounded identifier
    * batches, not the full corpus).
    *
    * Scale shape: one groupBy(f) whose output is `buckets` rows, one
    * broadcast scoring join + per-doc partial aggregation, then the
    * threshold scan as a DISTRIBUTED prefix sum with no global-order
    * window: range-repartition the (score, np, nn) table, take
    * per-partition windows keyed by spark_partition_id, and add
    * cross-partition offsets from a partition-count-bounded broadcast
    * self-join — no single-partition exchange anywhere, no driver
    * collect.
    *
    * @param labelCol boolean column on `docs`: true = positive class.
    * @return (f: int, w: long) — dense rows f ∈ [0, buckets) (zeros
    *   kept) plus the f = −1 bias row; feed directly to
    *   [[qualityClassifierWith]].
    */
  def qualityTrainCentroid(docs: DataFrame, idCol: String, textCol: String,
                           labelCol: String, buckets: Int = 256,
                           salt: String = "graft-qc"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    require(buckets > 0, s"buckets must be positive, got $buckets")
    // design matrix + labels each feed two consumers — pin them once
    val x = hashedFeatures(docs, idCol, textCol, buckets, salt)
      .localCheckpoint(eager = false)
    val y = docs.select(col(idCol).cast("long").as("doc_id"),
        col(labelCol).as("pos"))
      .localCheckpoint(eager = false)
    val counts = y.agg(
      sum(when(col("pos"), 1L).otherwise(0L)).as("np"),
      sum(when(col("pos"), 0L).otherwise(1L)).as("nn"))
    val perF = x.join(y, "doc_id")
      .groupBy(col("f"))
      .agg(sum(when(col("pos"), col("cnt")).otherwise(0L)).as("sp"),
           sum(when(col("pos"), 0L).otherwise(col("cnt"))).as("sn"))
    val wDense = PlanHints.withScalars(
        spark.range(buckets.toLong).select(col("id").cast("int").as("f"))
          .join(perF, Seq("f"), "left"), counts)
      .select(col("f"),
        (coalesce(col("sp"), lit(0L)) * col("nn")
          - coalesce(col("sn"), lit(0L)) * col("np")).as("w"))
      .localCheckpoint(eager = false) // feeds scoring + model output
    val s = x.join(broadcast(wDense), "f")
      .groupBy(col("doc_id")).agg(sum(col("cnt") * col("w")).as("s"))
    val byScore = s.join(y, "doc_id")
      .groupBy(col("s"))
      .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("np_s"),
           sum(when(col("pos"), 0L).otherwise(1L)).as("nn_s"))
    // ---- distributed exclusive prefix sum over ascending score ----
    // pid is only meaningful under the checkpoint: both consumers must
    // see the one materialized assignment
    val prefixParts = 8
    val parted = byScore.repartitionByRange(prefixParts, col("s"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint(eager = false)
    // cross-partition offsets: each partition's totals contribute to
    // every LATER pid — an explode to the (constant, bounded) later
    // pid list + equi-join, never a non-equi pid×pid join
    val offsets = parted.groupBy(col("pid"))
      .agg(sum(col("np_s")).as("tp"), sum(col("nn_s")).as("tn"))
      .filter(col("pid") < prefixParts - 1)
      .select(explode(sequence(col("pid") + 1, lit(prefixParts - 1)))
          .as("pid"), col("tp"), col("tn"))
      .groupBy(col("pid"))
      .agg(sum(col("tp")).as("off_np"), sum(col("tn")).as("off_nn"))
    val win = Window.partitionBy(col("pid")).orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = parted.join(broadcast(offsets), Seq("pid"), "left")
      .select(col("s"),
        (coalesce(col("off_np"), lit(0L))
          + coalesce(sum(col("np_s")).over(win), lit(0L))).as("cum_np"),
        (coalesce(col("off_nn"), lit(0L))
          + coalesce(sum(col("nn_s")).over(win), lit(0L))).as("cum_nn"))
    // correct(cut = s): positives at/above the cut + negatives below;
    // sentinel cut above max = "keep nothing" (correct = Nn)
    val cand = PlanHints.withScalars(cum, counts)
      .select(col("s").as("cut"),
        (col("np") - col("cum_np") + col("cum_nn")).as("correct"))
      .unionByName(PlanHints.withScalars(
          byScore.agg(max(col("s")).as("max_s")), counts)
        .select((col("max_s") + 1L).as("cut"), col("nn").as("correct")))
    val best = cand.orderBy(col("correct").desc, col("cut").asc).limit(1)
    wDense.unionByName(
      best.select(lit(-1).cast("int").as("f"), (lit(1L) - col("cut")).as("w")))
  }
}
