package graft.queries

import graft.{Env, Q}
import graft.syntax._
import graft.operators.{AsOfJoin, Decontaminate, Funnel, RangeJoin, Sampling, SequencePack, Sessionize}
import org.apache.spark.sql.DataFrame

/** Round-4 pipeline additions over `documents`/`events`: benchmark
  * decontamination (13-gram collision check) and gap-based
  * sessionization. Both fully oracle-verified.
  */
object CorpusQueries {

  /** Every 5th document plays the benchmark set; the rest is the
    * training corpus. Collisions surface exactly the planted
    * near/exact duplicates (random-vocabulary 13-grams don't collide
    * by chance). */
  def textDecontaminate(env: Env): DataFrame = {
    val docs = env.documents
    val bench = docs.filter($"doc_id" % 5 === 0)
    val train = docs.filter($"doc_id" % 5 =!= 0)
    Decontaminate.contaminated(train, bench, "doc_id", "text", n = 13)
      .orderBy($"doc_id")
  }

  /** FUZZY decontamination — the near-duplicate contamination stage
    * the exact 13-gram check misses (a lightly-paraphrased benchmark
    * document shares few verbatim 13-grams but sits at high Jaccard):
    * every training doc with a bench near-dup at shingle Jaccard
    * ≥ 0.8, via the banded increment×base machinery of
    * [[graft.operators.TextDedup.minhashNearDupAgainst]] (bench plays
    * the persisted base; the corpus is the increment — never a corpus
    * self-join). Per-doc removal verdict: bench-match count + the
    * strongest match. Same split as [[textDecontaminate]], so the two
    * entries together are the exact+fuzzy cascade a real corpus build
    * runs.
    */
  def textDecontaminateFuzzy(env: Env): DataFrame = {
    import org.apache.spark.sql.functions.{count => cnt, lit, max, round}
    val docs = env.documents
    val bench = docs.filter($"doc_id" % 5 === 0)
    val train = docs.filter($"doc_id" % 5 =!= 0)
    graft.operators.TextDedup
      .minhashNearDupAgainst(bench, train, "doc_id", "text", threshold = 0.8)
      .groupBy($"inc_id".as("doc_id"))
      .agg(cnt(lit(1)).as("n_bench_matches"),
           max(round($"jaccard", 6)).as("max_jaccard"))
      .orderBy($"doc_id")
  }

  /** Shared DuckDB chunking fragment (window 64 / overlap 16, mirrors
    * [[graft.operators.Boilerplate.chunkWindows]]) — one copy for the
    * chunk-windows oracle and the passage-near-dup oracle so they
    * cannot drift (the [[graft.queries.DedupQueries]] shingleCte
    * precedent). */
  private val chunkCte: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS s FROM documents),
      |n AS (SELECT doc_id, s,
      |        greatest(1, CAST(ceil((len(s) - 16) / CAST(48 AS DOUBLE))
      |                         AS INT)) AS nc
      |      FROM t),
      |c AS (SELECT doc_id, CAST(u.i AS INT) AS chunk_idx,
      |        list_slice(s, u.i * 48 + 1, u.i * 48 + 64) AS ct
      |      FROM n, unnest(range(0, nc)) AS u(i))""".stripMargin

  private[queries] val decontaminateSql: String =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS s
      |              FROM documents),
      |g AS (SELECT doc_id,
      |        CASE WHEN len(s) >= 13
      |             THEN list_distinct(list_transform(range(1, len(s) - 11),
      |                    i -> md5(array_to_string(list_slice(s, i, i + 12), ' '))))
      |             ELSE [md5(array_to_string(s, ' '))] END AS gs
      |      FROM toks),
      |tg AS (SELECT doc_id, unnest(gs) AS g FROM g WHERE doc_id % 5 <> 0),
      |bg AS (SELECT doc_id AS bench_id, unnest(gs) AS g
      |       FROM g WHERE doc_id % 5 = 0)
      |SELECT tg.doc_id,
      |       CAST(count(DISTINCT tg.g) AS BIGINT) AS n_hits,
      |       CAST(count(DISTINCT bg.bench_id) AS BIGINT) AS n_bench_docs
      |FROM tg JOIN bg USING (g)
      |GROUP BY tg.doc_id
      |ORDER BY doc_id""".stripMargin

  /** Same split as [[textDecontaminate]] through the Bloom-prefilter
    * scale path — the verify join makes the output exactly equal to
    * the exact form, so this shares its oracle verbatim. */
  def textDecontaminateBloom(env: Env): DataFrame = {
    val docs = env.documents
    val bench = docs.filter($"doc_id" % 5 === 0)
    val train = docs.filter($"doc_id" % 5 =!= 0)
    Decontaminate.contaminatedBloom(train, bench, "doc_id", "text", n = 13)
      .orderBy($"doc_id")
  }

  /** 30-minute-gap sessions over the events stream table (`ts` is
    * long nanoseconds via the nanosAsLong scan, see Env; truncated to
    * microseconds here because DuckDB's TIMESTAMP scan of the same
    * parquet truncates nanos to µs — the oracle can't see finer). */
  def eventsSessionize(env: Env): DataFrame = {
    val gapNs = 30L * 60 * 1000 * 1000 * 1000
    Sessionize.sessionize(
      env.events.select($"user_id", ($"ts" - $"ts" % 1000).as("ts"),
                        $"event_id", $"value"), gapNs)
      .orderBy($"user_id", $"session_idx")
  }

  /** 20% stratified sample of documents per (lang, source), hash-order
    * deterministic with a floor of one doc per stratum. */
  def corpusSampleStratified(env: Env): DataFrame =
    Sampling.stratified(
      env.documents.select($"doc_id", $"lang", $"source"),
      strata = Seq("lang", "source"), idCol = "doc_id", fraction = 0.2)
      .orderBy($"doc_id")

  /** As-of alignment over events: each purchase picks up the latest
    * prior-or-equal view's value per user (feature-at-example-time).
    * Timestamps µs-truncated for the oracle (see eventsSessionize);
    * views pre-aggregated to one row per (user, ts) per the operator
    * contract. */
  def eventsAsof(env: Env): DataFrame = {
    import org.apache.spark.sql.functions.max
    val ev = env.events.select($"user_id".as("key"),
      ($"ts" - $"ts" % 1000).as("ts"), $"event_type", $"value", $"event_id")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"key", $"ts", $"event_id", $"value")
    val views = ev.filter($"event_type" === "view")
      .groupBy($"key", $"ts").agg(max($"value").as("vval"))
    AsOfJoin.asOf(purchases, views, "key", "ts", Seq("vval"))
      .select($"key".as("user_id"), $"ts", $"event_id", $"value",
              $"asof_ts", $"asof_vval".as("view_value"))
      .orderBy($"user_id", $"ts", $"event_id")
  }

  /** Keyless range join: 25 disjoint 90-minute campaign windows (one
    * per nation key, spaced 25h over the events month) pick up their
    * contained events through the bucketized equi-join; per-window
    * rollup. Value sums in DECIMAL for order-independence. */
  def eventsRangeJoin(env: Env): DataFrame = {
    import org.apache.spark.sql.functions.{count, lit, sum}
    val base = 1704067200L * 1000000000L // 2024-01-01T00:00:00Z in ns
    val h25 = 25L * 3600 * 1000000000L
    val m90 = 90L * 60 * 1000000000L
    val windows = env.nation.select($"n_nationkey".cast("long").as("window_id"),
      (lit(base) + $"n_nationkey" * h25).as("w_start"),
      (lit(base) + $"n_nationkey" * h25 + m90).as("w_end"))
    val points = env.events.select(
      $"event_id", ($"ts" - $"ts" % 1000).as("ts"), $"value")
    RangeJoin.pointInInterval(points, windows, "ts", "w_start", "w_end",
        bucketWidth = 2L * 3600 * 1000000000L)
      .groupBy($"window_id")
      .agg(count(lit(1)).as("n_events"),
           sum($"value".cast("decimal(18,2)")).cast("double").as("total_value"))
      .orderBy($"window_id")
  }

  /** Pack documents into 1000-token training sequences across 8
    * shards, greedy first-fit in doc_id order; the oracle replays the
    * sequential fill with a recursive CTE. */
  def corpusPackSequences(env: Env): DataFrame = {
    import org.apache.spark.sql.functions.{size, split}
    val withTokens = env.documents.select(
      $"doc_id", size(split($"text", " ")).as("n_tokens"))
    SequencePack.packSequences(withTokens, "doc_id", "n_tokens",
        shards = 8, capacity = 1000L)
      .orderBy($"doc_id")
  }

  /** Packing-efficiency data card over [[corpusPackSequences]]: per
    * shard, the bin count and fill rate (token mass over bin
    * capacity) — the wasted-padding view a training run watches. Runs
    * on the packer's output joined back to the token counts; exact
    * integer sums plus one correctly-rounded division. */
  def corpusPackEfficiency(env: Env): DataFrame = {
    import org.apache.spark.sql.functions.{count, countDistinct, lit, round, size, split, sum}
    val withTokens = env.documents.select(
      $"doc_id", size(split($"text", " ")).as("n_tokens"))
    SequencePack.packSequences(withTokens, "doc_id", "n_tokens",
        shards = 8, capacity = 1000L)
      .join(withTokens, Seq("doc_id"))
      .groupBy($"shard")
      .agg(countDistinct($"seq_id").as("n_bins"),
        count(lit(1)).as("nd"),
        sum($"n_tokens".cast("long")).as("total_tokens"))
      .select($"shard", $"n_bins", $"nd".cast("int").as("n_docs"),
        $"total_tokens",
        round($"total_tokens".cast("double")
          / ($"n_bins" * 1000L).cast("double"), 4).as("fill_rate"))
      .orderBy($"shard")
  }

  /** Context-window chunking: 64-token windows, 16-token overlap
    * (stride 48) — the LLM-prep splitter as a zero-shuffle narrow map
    * (see [[graft.operators.Boilerplate.chunkWindows]]). */
  def corpusChunkWindows(env: Env): DataFrame =
    graft.operators.Boilerplate.chunkWindows(env.documents, "doc_id", "text",
        window = 64, overlap = 16)
      .orderBy($"doc_id", $"chunk_idx")

  /** Passage-level near-dup: chunk every document into context windows
    * (the [[corpusChunkWindows]] splitter), then banded-MinHash the
    * CHUNKS and keep cross-document pairs at Jaccard ≥ 0.8 — finds
    * duplicated passages inside otherwise-distinct documents, the case
    * whole-document dedup misses. Pure composition of two verified
    * operators; chunk ids pack as doc_id·2²⁰ + chunk_idx (2²⁰ chunks ≈
    * a 50M-token document — a guard raises rather than silently
    * colliding into the next doc's id space past that). Adjacent
    * same-doc windows share only the overlap (Jaccard ≈ 0.13 ≪ 0.8);
    * the cross-doc filter drops intra-doc repeats on both engines
    * identically. */
  def corpusChunkNearDup(env: Env): DataFrame = {
    import org.apache.spark.sql.functions.{concat, expr, lit, raise_error, round, when}
    val pack = 1L << 20
    val chunks = graft.operators.Boilerplate
      .chunkWindows(env.documents, "doc_id", "text", window = 64, overlap = 16)
      .select(
        when($"chunk_idx" >= pack,
             raise_error(concat(
               lit("corpus_chunk_neardup: chunk_idx overflows id packing: "),
               $"chunk_idx".cast("string"))))
          .otherwise($"doc_id" * pack + $"chunk_idx").as("chunk_id"),
        $"chunk_text".as("text"))
    graft.operators.TextDedup
      .minhashNearDupPairs(chunks, "chunk_id", "text", threshold = 0.8)
      .filter(expr(s"doc_a DIV $pack") =!= expr(s"doc_b DIV $pack"))
      .select($"doc_a".as("chunk_a"), $"doc_b".as("chunk_b"),
              round($"jaccard", 6).as("jaccard"))
      .orderBy($"chunk_a", $"chunk_b")
  }

  /** Mixture reweighting over sources: src0 kept at 50%, src1 at 25%,
    * the long tail at 10% — per-source hash-order sampling. */
  def corpusMixture(env: Env): DataFrame = {
    import org.apache.spark.sql.functions.when
    val frac = when($"source" === "src0", 0.5)
      .when($"source" === "src1", 0.25)
      .otherwise(0.1)
    Sampling.stratifiedByFraction(
      env.documents.select($"doc_id", $"source"),
      strata = Seq("source"), idCol = "doc_id", fraction = frac)
      .orderBy($"doc_id")
  }

  /** 20% threshold sample — the map-side, shuffle-free scale path of
    * [[graft.operators.Sampling]]: expected 20% of every (lang, source)
    * stratum with zero data movement. */
  def corpusSampleThreshold(env: Env): DataFrame =
    Sampling.stratifiedThreshold(
      env.documents.select($"doc_id", $"lang", $"source"),
      strata = Seq("lang", "source"), idCol = "doc_id", fraction = 0.2)
      .orderBy($"doc_id")

  /** Mixture reweighting in threshold form: per-source keep bounds
    * (50% / 25% / 10%) as a `when` ladder of precomputed hex literals —
    * the same mixture as corpus_mixture but shuffle-free. */
  def corpusMixtureThreshold(env: Env): DataFrame = {
    import org.apache.spark.sql.functions.{lit, when}
    val bound = when($"source" === "src0", lit(Sampling.hexBound(0.5)))
      .when($"source" === "src1", lit(Sampling.hexBound(0.25)))
      .otherwise(lit(Sampling.hexBound(0.1)))
    Sampling.thresholdByBound(
      env.documents.select($"doc_id", $"source"),
      strata = Seq("source"), idCol = "doc_id", bound = bound)
      .orderBy($"doc_id")
  }

  /** Temperature-rebalanced language mixture (α = 0.5, corpus-wide
    * target 30%): English (44% of the corpus) samples at ~0.21, the
    * rare languages at ~0.36–0.39 — the multilingual upsampling rule,
    * shuffle-free. The oracle recomputes counts, the sorted Σ√n fold,
    * the clamped fraction chain, and the 15-hex bounds, then replays
    * the hash filter. */
  def corpusMixtureTemperature(env: Env): DataFrame =
    Sampling.temperatureThreshold(
      env.documents.select($"doc_id", $"lang"),
      stratum = "lang", idCol = "doc_id", target = 0.3)
      .orderBy($"doc_id")

  /** Token-budget corpus composition: 5000 tokens total, 40/30/20/10%
    * from src0–src3, every other source excluded — the mixture stated
    * as a token budget instead of keep fractions (see
    * [[Sampling.tokenBudgetThreshold]]). One tiny mass aggregate,
    * then the shuffle-free hash filter. */
  def corpusTokenBudget(env: Env): DataFrame = {
    import org.apache.spark.sql.functions.{size, split}
    Sampling.tokenBudgetThreshold(
      env.documents.select($"doc_id", $"source", $"text"),
      stratum = "source", idCol = "doc_id",
      tokenCol = size(split($"text", " ")),
      budgetTokens = 5000L,
      shares = Seq("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2,
                   "src3" -> 0.1))
      .select($"doc_id", $"source")
      .orderBy($"doc_id")
  }

  /** Deterministic 80/10/10 train/val/test assignment over every
    * document, with each split's realized size and token volume — the
    * eval-holdout step. The per-doc assignment (not just the counts)
    * is what the oracle checks: both sides emit doc_id → split. */
  def corpusSplitAssign(env: Env): DataFrame =
    Sampling.splitAssign(
      env.documents.select($"doc_id", $"lang"),
      idCol = "doc_id",
      splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select($"doc_id", $"lang", $"split")
      .orderBy($"doc_id")

  /** Length-weighted corpus draw — 50 documents selected by PRIORITY
    * SAMPLING with weight = n_chars (a long document is proportionally
    * more likely to be drawn, the token-mass-fair way to subsample for
    * inspection or eval-set construction). The priority is exact
    * cross-engine (52-bit hash / integer weight, one IEEE division),
    * so the oracle replays key, order, and cut identically. */
  def corpusSampleWeighted(env: Env): DataFrame =
    Sampling.weightedPriority(
      env.documents.select($"doc_id", $"n_chars"),
      idCol = "doc_id", weightCol = "n_chars", k = 50)
      .orderBy($"priority", $"doc_id")

  /** Deterministic training-order shuffle into 32 shards — shard
    * assignment + within-shard position for the corpus, the step that
    * turns a cleaned corpus into trainer files (see
    * [[Sampling.shuffleShard]] for the scale contract: one hash
    * Exchange, per-shard sorts, no global sort). */
  def corpusShuffleShard(env: Env): DataFrame =
    Sampling.shuffleShard(
      env.documents.select($"doc_id", $"source"),
      idCol = "doc_id", shards = 32)
      .select($"shard", $"pos", $"doc_id", $"source")
      .orderBy($"shard", $"pos")

  /** Curriculum sharding: the trainer-file step with within-shard
    * curriculum order — shards stay an md5-balanced random partition,
    * but each file presents its documents best-quality-first by the
    * hashed-feature classifier score (see
    * [[Sampling.curriculumShard]]). */
  def corpusCurriculumShard(env: Env): DataFrame = {
    val scored = graft.operators.TextAnalysis
      .qualityClassifier(env.documents, "doc_id", "text")
      .select($"doc_id", $"score")
    Sampling.curriculumShard(scored, "doc_id", shards = 16,
        orderCols = Seq($"score".desc))
      .select($"shard", $"pos", $"doc_id", $"score")
      .orderBy($"shard", $"pos")
  }

  /** Corpus data card: the composition report every corpus release
    * ships — document counts, token volumes, and mean document length
    * for every (source × lang) cell PLUS the per-source, per-lang, and
    * grand-total margins, in one pass via CUBE (Expand + one
    * map-side-combinable aggregate — the margins cost no extra scans
    * or joins). gid disambiguates margin rows from data rows
    * (bit i = 1 ⇔ that grouping column is aggregated away). */
  def corpusDatacard(env: Env): DataFrame = {
    import org.apache.spark.sql.functions.{count, grouping_id, lit, round, size, split, sum}
    env.documents
      .select($"source", $"lang",
        size(split($"text", " ")).cast("long").as("toks"), $"n_chars")
      .cube($"source", $"lang")
      .agg(grouping_id().cast("int").as("gid"),
           count(lit(1)).as("n_docs"),
           sum($"toks").as("n_tokens"),
           round(sum($"n_chars").cast("double") / count(lit(1)), 6)
             .as("avg_chars"))
      .select($"gid", $"source", $"lang", $"n_docs", $"n_tokens",
              $"avg_chars")
      .orderBy($"gid", $"source", $"lang")
  }

  /** Three-stage strict-order funnel over the events stream: view →
    * click → purchase, earliest completion chain per user. Timestamps
    * µs-truncated for oracle visibility (see [[eventsSessionize]]). */
  def eventsFunnel(env: Env): DataFrame =
    Funnel.funnel(
      env.events.select($"user_id", $"event_type",
                        ($"ts" - $"ts" % 1000).as("ts")),
      "user_id", "event_type", "ts", Seq("view", "click", "purchase"))
      .orderBy($"user_id")

  /** Cohort retention triangle: users grouped by the day of their
    * first event, counted on each later day they were active. */
  def eventsCohortRetention(env: Env): DataFrame =
    Funnel.cohortRetention(
      env.events.select($"user_id", ($"ts" - $"ts" % 1000).as("ts")),
      "user_id", "ts", dayUnit = 86400000000000L)
      .orderBy($"cohort_day", $"day_offset")

  /** PageRank over the item-transition graph: consecutive events by
    * the same user form a directed edge between their `props.k`
    * items, and three exact-integer power iterations rank the items
    * (see [[graft.operators.GraphRank]] — damping as the rational
    * 17/20, every step integral arithmetic, so the oracle's unrolled
    * replay matches to the micro-unit). */
  def eventsItemPagerank(env: Env): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{get_json_object, lead}
    val raw = env.events.select($"user_id", $"ts", $"event_id",
      get_json_object($"props", "$.k").cast("long").as("item"))
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val edges = raw
      .select($"item".as("src"), lead($"item", 1).over(w).as("dst"))
      .filter($"dst".isNotNull)
    graft.operators.GraphRank.pageRank(edges, "src", "dst", iterations = 3)
      .select($"node".as("item"), $"rank_mu", $"rank")
      .orderBy($"rank_mu".desc, $"item")
  }

  /** Per-event-type daily activity with a 7-day rolling event total —
    * the time-series health view over the stream. The rolling window
    * is a RANGE frame over the DAY-GRAIN aggregate (day-cardinality
    * rows per type, never event-sized), partitioned by event type, so
    * no single task ever holds more than one type's day series. The
    * ns→day floor divides by a multiple of 1000, so DuckDB's
    * µs-truncated timestamps land in the same day. */
  def eventsRollingActive(env: Env): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{count, countDistinct, expr, lit, sum}
    val daily = env.events
      .select($"event_type", expr("ts div 86400000000000").as("day"),
        $"user_id")
      .groupBy($"event_type", $"day")
      .agg(count(lit(1)).as("n_events"),
           countDistinct($"user_id").as("n_users"))
    val w = Window.partitionBy($"event_type").orderBy($"day")
      .rangeBetween(-6, 0)
    daily.withColumn("roll7_events", sum($"n_events").over(w))
      .orderBy($"event_type", $"day")
  }

  /** Anomalous-day detection over the event stream — the monitoring
    * companion to [[eventsRollingActive]]: a day is anomalous for a
    * type when its count sits > 2 sample standard deviations from the
    * trailing-7-day baseline (current day excluded). The z-test is
    * evaluated in EXACT integer arithmetic — (n·x − s)²·(n−1) >
    * 4·n·(n·q − s²) with s/q the windowed sum and sum-of-squares —
    * so no engine-varying sqrt/float variance enters the verdict
    * (counts are day-grain, so the squared terms stay far inside
    * long range). Window frames are day-grain per type, never
    * event-sized. */
  def eventsAnomalyDays(env: Env): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{count, expr, lit, sum}
    val daily = env.events
      .select($"event_type", expr("ts div 86400000000000").as("day"))
      .groupBy($"event_type", $"day")
      .agg(count(lit(1)).as("x"))
    val w = Window.partitionBy($"event_type").orderBy($"day")
      .rangeBetween(-7, -1)
    daily
      .withColumn("n", count($"x").over(w))
      .withColumn("s", sum($"x").over(w))
      .withColumn("q", sum($"x" * $"x").over(w))
      .select($"event_type", $"day", $"x".as("n_events"),
        $"n".as("base_days"),
        ($"n" >= 3 &&
          ($"n" * $"x" - $"s") * ($"n" * $"x" - $"s") * ($"n" - 1)
            > lit(4L) * $"n" * ($"n" * $"q" - $"s" * $"s"))
          .as("is_anomaly"))
      .orderBy($"event_type", $"day")
  }

  /** Trending items per day — top-3 by count with a deterministic
    * (count desc, item asc) tie-break. The batch leg of the streaming
    * trending pattern: the count stage is the watermark-windowed
    * aggregate [[graft.streaming.Streams.windowedEventCounts]] runs as
    * a real stream (StreamsSpec pins stream ≡ batch), and ranking
    * applies per CLOSED window downstream — ranking is not
    * stream-incrementalizable, so production ranks sealed windows in
    * foreachBatch exactly like this. Top-3 plans as WindowGroupLimit:
    * per-partition partial limits prune before the shuffle. */
  def eventsTrendingTopk(env: Env): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{count, expr, get_json_object, lit, row_number}
    val daily = env.events
      .select(expr("ts div 86400000000000").as("day"),
        get_json_object($"props", "$.k").cast("long").as("item"))
      .filter($"item".isNotNull)
      .groupBy($"day", $"item").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy($"day").orderBy($"n".desc, $"item")
    daily.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 3)
      .select($"day", $"rank".cast("int").as("rank"), $"item", $"n")
      .orderBy($"day", $"rank")
  }

  /** Per-user basket cap for [[eventsItemPmi]]'s pair leg. */
  val PmiBasketCap = 48

  /** Item co-occurrence lift over user baskets: for every item pair
    * seen together in ≥ 5 distinct users' histories,
    * lift = n_ab·N / (n_a·n_b) (> 1 ⟺ positive association — the
    * PMI argument without the engine-varying logarithm; the single
    * division of two exact longs is correctly rounded identically in
    * both engines). The basket self-join is per-user, and the PAIR
    * leg is capped: each user contributes only their
    * [[PmiBasketCap]] (=48) most-popular distinct items (global
    * frequency desc, item id tie-break — fully deterministic), the
    * standard basket-truncation guard of production co-occurrence
    * pipelines. Without it a single bot/power user with a B-item
    * history emits B²/2 pairs — skew-quadratic at 100× (the round-10
    * audit wart); with it the pair volume is ≤ U·C²/2 at ANY basket
    * skew. Marginals (n_users, n_i) stay computed over the FULL
    * basket set so the lift denominator is unbiased — the cap only
    * bounds pair enumeration. The rank filter plans as
    * WindowGroupLimit (partial per-partition limits before the
    * window shuffle), the capped basket is lazily checkpointed so the
    * window runs ONCE for both self-join sides, counts are map-side
    * combinable, and the total-user scalar attaches through the
    * codegen-safe [[graft.operators.PlanHints.withScalars]]. */
  def eventsItemPmi(env: Env): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{count, countDistinct, get_json_object, lit, row_number}
    val ui = env.events
      .select($"user_id",
        get_json_object($"props", "$.k").cast("long").as("item"))
      .filter($"item".isNotNull)
      .distinct()
      .localCheckpoint(eager = false)
    val stats = ui.agg(countDistinct($"user_id").as("n_users"))
    val ia = ui.groupBy($"item").agg(count(lit(1)).as("n_i"))
    val w = Window.partitionBy($"user_id").orderBy($"n_i".desc, $"item")
    val capped = ui
      .join(ia, "item")
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= PmiBasketCap)
      .select($"user_id", $"item")
      .localCheckpoint(eager = false)
    val pairs = capped.as("a")
      .join(capped.as("b"),
        $"a.user_id" === $"b.user_id" && $"a.item" < $"b.item")
      .groupBy($"a.item".as("item_a"), $"b.item".as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter($"n_ab" >= 5)
    val joined = pairs
      .join(ia.select($"item".as("item_a"), $"n_i".as("n_a")), "item_a")
      .join(ia.select($"item".as("item_b"), $"n_i".as("n_b")), "item_b")
    graft.operators.PlanHints.withScalars(joined, stats)
      .select($"item_a", $"item_b", $"n_ab",
        (($"n_ab" * $"n_users").cast("double")
          / ($"n_a" * $"n_b").cast("double")).as("lift"))
      .orderBy($"lift".desc, $"item_a", $"item_b")
  }

  /** Z-order layout key over (user, item): the data-layout
    * optimization pass — events re-ordered by the Morton interleave of
    * their two scan dimensions so file-level min/max statistics prune
    * on either (see [[graft.operators.ZOrder]]). Inputs are masked to
    * 21 bits (collision-as-locality, fine for a layout key); the
    * output order IS the layout. */
  def eventsZorderLayout(env: Env): DataFrame = {
    import org.apache.spark.sql.functions.get_json_object
    val mask = (1L << 21) - 1
    val base = env.events.select($"event_id", $"user_id",
      get_json_object($"props", "$.k").cast("long").as("item"))
    base.withColumn("zcode",
        graft.operators.ZOrder.zorderCode(
          $"user_id".bitwiseAND(mask), $"item".bitwiseAND(mask)))
      .select($"event_id", $"user_id", $"item", $"zcode")
      .orderBy($"zcode", $"event_id")
  }

  /** Per-source distinctive terms — the "domain signature" data card:
    * top-5 terms per source by frequency lift (p(term|source) /
    * p(term)), the PMI argument without the engine-varying logarithm
    * (ordering by the ratio orders identically). The ratio is
    * (a/b)/(c/d) over exact longs — three correctly-rounded IEEE ops,
    * no long·long product to overflow at corpus scale. Count tables:
    * per-(source,term) is the only corpus-keyed aggregate (map-side
    * combinable); per-source and per-term tables broadcast; the top-5
    * window plans as WindowGroupLimit (partial per-partition limits,
    * so a stopword's source-spanning rows prune before the shuffle). */
  /** Per-source lexical-diversity card — distinct-1 / distinct-2 of
    * Li et al. 2016 ("A Diversity-Promoting Objective Function"):
    * distinct n-grams over total n-grams, per corpus slice. A
    * collapsing ratio is the data-card smell test for template spam
    * and over-deduplication targets. Exact integer counts (two
    * combinable count-distinct aggregates keyed by source); the two
    * ratios are single correctly-rounded divisions. One explode pass
    * per gram order, nothing quadratic, nothing collected.
    */
  def corpusDistinctNgrams(env: Env): DataFrame = {
    import org.apache.spark.sql.functions.{array, concat_ws, count,
      countDistinct, element_at, explode, lit, round, sequence, size,
      split, transform, when}
    val toks = env.documents.select($"source", split($"text", " ").as("s"))
      .localCheckpoint(eager = false) // feeds both gram orders
    val uni = toks.select($"source", explode($"s").as("w"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_unigrams"),
           countDistinct($"w").as("d_unigrams"))
    val bi = toks.select($"source",
        explode(when(size($"s") >= 2,
            transform(sequence(lit(1), size($"s") - 1),
              j => concat_ws(" ", element_at($"s", j), element_at($"s", j + 1))))
          .otherwise(array())).as("g"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_bigrams"),
           countDistinct($"g").as("d_bigrams"))
    uni.join(bi, Seq("source"), "left")
      .select($"source", $"n_unigrams", $"d_unigrams",
        round($"d_unigrams".cast("double") / $"n_unigrams", 6)
          .as("distinct1"),
        $"n_bigrams", $"d_bigrams",
        round($"d_bigrams".cast("double") / $"n_bigrams", 6)
          .as("distinct2"))
      .orderBy($"source")
  }

  def corpusDomainTerms(env: Env): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{broadcast, count, explode, lit, row_number, split}
    val toks = env.documents
      .select($"source", explode(split($"text", " ")).as("term"))
      .localCheckpoint(eager = false) // four aggregates off one pass
    val tfs = toks.groupBy($"source", $"term").agg(count(lit(1)).as("tf_s"))
    val perSource = toks.groupBy($"source").agg(count(lit(1)).as("t_s"))
    val perTerm = toks.groupBy($"term").agg(count(lit(1)).as("tf_all"))
    val total = toks.agg(count(lit(1)).as("t_all"))
    val scored = graft.operators.PlanHints.withScalars(
        tfs.join(broadcast(perSource), Seq("source"))
          .join(broadcast(perTerm), Seq("term")), total)
      .select($"source", $"term", $"tf_s",
        (($"tf_s".cast("double") / $"t_s".cast("double"))
          / ($"tf_all".cast("double") / $"t_all".cast("double"))).as("lift"))
    val w = Window.partitionBy($"source").orderBy($"lift".desc, $"term")
    scored.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5)
      .select($"source", $"rank", $"term", $"tf_s", $"lift")
      .orderBy($"source", $"rank")
  }

  /** Duplicated-13-gram accounting over the whole corpus — the
    * intra-corpus counterpart of [[textDecontaminate]] (same gram
    * kernel, corpus vs itself instead of corpus vs bench): per-doc
    * coverage by grams that also occur in another document. */
  def textGramDedup(env: Env): DataFrame =
    graft.operators.TextDedup
      .duplicatedGramStats(env.spread(env.documents), "doc_id", "text") // see Env.spread
      .orderBy($"doc_id")

  /** Gopher-rule repetition stats over every document. */
  def textRepetition(env: Env): DataFrame =
    graft.operators.TextAnalysis
      .repetitionStats(env.documents, "doc_id", "text")
      .orderBy($"doc_id")

  /** DSIR importance weights with src0 as the target domain — the
    * data-selection scorer (see [[graft.operators.Dsir]]); feed
    * `logw` to the weighted samplers to complete the resample. */
  def corpusDsirWeights(env: Env): DataFrame =
    graft.operators.Dsir.importanceWeights(
        env.documents, "doc_id", "text", $"source" === "src0")
      .orderBy($"doc_id")

  /** UniMax budget split across the 20 sources at ≤2 epochs each,
    * budget = one epoch of the whole corpus (see
    * [[graft.operators.Unimax]]); the supply aggregate is the only
    * corpus-sized stage. */
  def corpusUnimaxEpochs(env: Env): DataFrame = {
    import org.apache.spark.sql.functions.{size, split, sum}
    val supplies = env.documents
      .groupBy($"source")
      .agg(sum(size(split($"text", " ")).cast("long")).as("supply"))
    graft.operators.Unimax.epochAllocation(supplies, "source", "supply",
        maxEpochs = 2)
      .withColumnRenamed("key", "source")
      .orderBy($"source")
  }

  /** Corpus drift card — which terms moved between two snapshots: the
    * per-term contributions to KL(A‖B) over smoothed unigram
    * distributions (the crawl-over-crawl drift monitor a training-data
    * pipeline runs before admitting a new snapshot; CCNet/Gopher-style
    * corpus QA). Snapshot split stands in as even/odd doc_ids.
    *
    * Exactness: with add-one smoothing over the JOINT vocabulary,
    * contribution p_a·(ln p_a − ln p_b) is RANKED by the integer
    * surrogate (n_a+1)·(qlp_a − qlp_b) — p_a scaled by the constant
    * (N_a+V), order-preserving — where qlp is the NB family's
    * round(ln·10⁶) quantization. Every output column is an exact
    * long, so the card hash-matches; the only float step is the two
    * qlp logs, the pattern every trained-model oracle already relies
    * on. Scale shape: one exploded-word aggregate (map-side
    * combinable), a vocabulary-sized counts table, scalar totals via
    * the constant-key broadcast, and a TakeOrdered top-20 — no
    * windows, no corpus-sized collect. */
  def corpusDriftTerms(env: Env): DataFrame = {
    import org.apache.spark.sql.functions.{count, lit, log, round, sum, when}
    val words = graft.operators.TextAnalysis
      .explodedWords(env.spread(env.documents), "text", "doc_id")
      .withColumn("side_a", $"doc_id" % 2 === 0)
    val counts = words.groupBy($"word")
      .agg(sum(when($"side_a", 1L).otherwise(0L)).as("n_a"),
           sum(when($"side_a", 0L).otherwise(1L)).as("n_b"))
      .localCheckpoint(eager = false) // feeds totals + the select
    val tot = counts.agg(sum($"n_a").as("ta"), sum($"n_b").as("tb"),
      count(lit(1)).as("v"))
    def qlp(num: org.apache.spark.sql.Column,
            den: org.apache.spark.sql.Column) =
      round(log(num.cast("double") / den.cast("double")) * 1e6, 0)
        .cast("long")
    graft.operators.PlanHints.withScalars(counts, tot)
      .select($"word", $"n_a", $"n_b",
        (($"n_a" + 1L) * (qlp($"n_a" + 1L, $"ta" + $"v")
          - qlp($"n_b" + 1L, $"tb" + $"v"))).as("contrib_mu"))
      .orderBy($"contrib_mu".desc, $"word")
      .limit(20)
  }

  val entries: Seq[Q] = Seq(
    Q.sql("corpus_drift_terms", corpusDriftTerms,
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |           FROM documents),
        |wf AS (SELECT doc_id, word FROM w WHERE word <> ''),
        |c AS (SELECT word,
        |        CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)
        |             AS BIGINT) AS n_a,
        |        CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 END)
        |             AS BIGINT) AS n_b
        |      FROM wf GROUP BY word),
        |tot AS (SELECT CAST(sum(n_a) AS BIGINT) AS ta,
        |               CAST(sum(n_b) AS BIGINT) AS tb,
        |               CAST(count(*) AS BIGINT) AS v
        |        FROM c)
        |SELECT word, n_a, n_b,
        |  (n_a + 1) * (CAST(round(ln(CAST(n_a + 1 AS DOUBLE)
        |                              / CAST(ta + v AS DOUBLE)) * 1000000)
        |                    AS BIGINT)
        |             - CAST(round(ln(CAST(n_b + 1 AS DOUBLE)
        |                              / CAST(tb + v AS DOUBLE)) * 1000000)
        |                    AS BIGINT)) AS contrib_mu
        |FROM c CROSS JOIN tot
        |ORDER BY contrib_mu DESC, word LIMIT 20""".stripMargin),

    Q.sql("events_anomaly_days", eventsAnomalyDays,
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |         CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT event_type, day, x,
        |        CAST(count(x) OVER w AS BIGINT) AS n,
        |        CAST(sum(x) OVER w AS BIGINT) AS s,
        |        CAST(sum(x * x) OVER w AS BIGINT) AS q
        |      FROM daily
        |      WINDOW w AS (PARTITION BY event_type ORDER BY day
        |                   RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, day, x AS n_events, n AS base_days,
        |       n >= 3 AND (n * x - s) * (n * x - s) * (n - 1)
        |                  > 4 * n * (n * q - s * s) AS is_anomaly
        |FROM b ORDER BY event_type, day""".stripMargin),

    Q.sql("events_trending_topk", eventsTrendingTopk,
      """WITH e AS (SELECT epoch_us(ts) // 86400000000 AS day,
        |             CAST(json_extract_string(props, '$.k') AS BIGINT)
        |               AS item
        |           FROM events),
        |d AS (SELECT day, item, CAST(count(*) AS BIGINT) AS n
        |      FROM e WHERE item IS NOT NULL GROUP BY 1, 2),
        |r AS (SELECT day, item, n,
        |        CAST(row_number() OVER (PARTITION BY day
        |          ORDER BY n DESC, item) AS INT) AS rank
        |      FROM d)
        |SELECT day, rank, item, n
        |FROM r WHERE rank <= 3
        |ORDER BY day, rank""".stripMargin),

    Q.sql("corpus_distinct_ngrams", corpusDistinctNgrams,
      """WITH t AS (SELECT source, string_split(text, ' ') AS s
        |           FROM documents),
        |u AS (SELECT source, unnest(s) AS w FROM t),
        |uni AS (SELECT source, CAST(count(*) AS BIGINT) AS n_unigrams,
        |          CAST(count(DISTINCT w) AS BIGINT) AS d_unigrams
        |        FROM u GROUP BY source),
        |b AS (SELECT source,
        |        unnest(CASE WHEN len(s) >= 2
        |               THEN list_transform(range(1, len(s)),
        |                      i -> s[i] || ' ' || s[i+1])
        |               ELSE [] END) AS g
        |      FROM t),
        |bi AS (SELECT source, CAST(count(*) AS BIGINT) AS n_bigrams,
        |         CAST(count(DISTINCT g) AS BIGINT) AS d_bigrams
        |       FROM b GROUP BY source)
        |SELECT uni.source, n_unigrams, d_unigrams,
        |       round(CAST(d_unigrams AS DOUBLE) / n_unigrams, 6) AS distinct1,
        |       n_bigrams, d_bigrams,
        |       round(CAST(d_bigrams AS DOUBLE) / n_bigrams, 6) AS distinct2
        |FROM uni LEFT JOIN bi USING (source)
        |ORDER BY uni.source""".stripMargin),

    Q.sql("corpus_domain_terms", corpusDomainTerms,
      """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS term
        |             FROM documents),
        |tfs AS (SELECT source, term, CAST(count(*) AS BIGINT) AS tf_s
        |        FROM tok GROUP BY 1, 2),
        |tsrc AS (SELECT source, CAST(count(*) AS BIGINT) AS t_s
        |         FROM tok GROUP BY 1),
        |tterm AS (SELECT term, CAST(count(*) AS BIGINT) AS tf_all
        |          FROM tok GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS t_all FROM tok),
        |sc AS (SELECT tfs.source, tfs.term, tfs.tf_s,
        |         (CAST(tf_s AS DOUBLE) / CAST(t_s AS DOUBLE))
        |         / (CAST(tf_all AS DOUBLE) / CAST(t_all AS DOUBLE)) AS lift
        |       FROM tfs JOIN tsrc USING (source)
        |            JOIN tterm USING (term), tot),
        |r AS (SELECT source, term, tf_s, lift,
        |        CAST(row_number() OVER (PARTITION BY source
        |          ORDER BY lift DESC, term) AS INT) AS rank
        |      FROM sc)
        |SELECT source, rank, term, tf_s, lift
        |FROM r WHERE rank <= 5
        |ORDER BY source, rank""".stripMargin),

    Q.sql("corpus_unimax_epochs", corpusUnimaxEpochs,
      """WITH s AS (SELECT source,
        |             CAST(sum(len(string_split(text, ' '))) AS BIGINT)
        |               AS supply
        |           FROM documents GROUP BY source),
        |c AS (SELECT source, supply, supply * 2 AS cap FROM s),
        |t AS (SELECT CAST(sum(supply) AS BIGINT) AS budget,
        |             CAST(count(*) AS BIGINT) AS m FROM c),
        |o AS (SELECT c.source, c.supply, c.cap, t.budget, t.m,
        |        CAST(row_number() OVER (ORDER BY cap, source) AS BIGINT) AS i,
        |        CAST(sum(cap) OVER (ORDER BY cap, source
        |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |      FROM c, t),
        |k AS (SELECT
        |        coalesce(max(CASE WHEN cap * (m - i) + cum <= budget
        |                          THEN i END), 0) AS kk,
        |        coalesce(max(CASE WHEN cap * (m - i) + cum <= budget
        |                          THEN cum END), 0) AS cumk
        |      FROM o),
        |a AS (SELECT o.source, o.supply, o.cap,
        |        CASE WHEN o.i <= k.kk THEN o.cap
        |             ELSE (o.budget - k.cumk) // (o.m - k.kk)
        |                  + CASE WHEN o.i - k.kk
        |                              <= (o.budget - k.cumk) % (o.m - k.kk)
        |                         THEN 1 ELSE 0 END END AS alloc
        |      FROM o, k)
        |SELECT source, supply, cap, CAST(alloc AS BIGINT) AS alloc,
        |       round(CAST(alloc AS DOUBLE) / CAST(supply AS DOUBLE), 4)
        |         AS epochs
        |FROM a ORDER BY source""".stripMargin),

    Q.sql("corpus_dsir_weights", corpusDsirWeights,
      """WITH t AS (SELECT doc_id, source = 'src0' AS is_target,
        |             string_split(text, ' ') AS s FROM documents),
        |g AS (
        |  SELECT doc_id, is_target, CAST(u.i AS INT) AS pos,
        |         substr(md5(s[u.i]), 1, 2) AS bucket
        |  FROM t, unnest(range(1, len(s) + 1)) AS u(i)
        |  UNION ALL
        |  SELECT doc_id, is_target, CAST(len(s) + u.j AS INT) AS pos,
        |         substr(md5(s[u.j] || ' ' || s[u.j + 1]), 1, 2) AS bucket
        |  FROM t, unnest(range(1, len(s))) AS u(j)),
        |ct AS (SELECT bucket, CAST(count(*) AS BIGINT) AS ct FROM g
        |       WHERE is_target GROUP BY bucket),
        |cr AS (SELECT bucket, CAST(count(*) AS BIGINT) AS cr FROM g
        |       GROUP BY bucket),
        |tot AS (SELECT CAST(count(*) FILTER (is_target) AS BIGINT) AS tot_t,
        |               CAST(count(*) AS BIGINT) AS tot_r FROM g),
        |p AS (SELECT g.doc_id, g.pos,
        |        (CAST(coalesce(ct.ct, 0) + 1 AS DOUBLE)
        |           / CAST(tot.tot_t + 256 AS DOUBLE))
        |        / (CAST(cr.cr + 1 AS DOUBLE)
        |           / CAST(tot.tot_r + 256 AS DOUBLE)) AS ratio
        |      FROM g JOIN cr USING (bucket) LEFT JOIN ct USING (bucket), tot),
        |d AS (SELECT doc_id, CAST(count(*) AS INT) AS n_grams,
        |        round(list_sum(list_transform(list(ratio ORDER BY pos),
        |          x -> ln(x))), 4) AS logw
        |      FROM p GROUP BY doc_id)
        |SELECT t.doc_id, t.is_target, d.n_grams, d.logw
        |FROM t JOIN d USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin),

    Q.sql("corpus_mixture", corpusMixture,
      """WITH d AS (
        |  SELECT doc_id, source,
        |    CASE WHEN source = 'src0' THEN 0.5
        |         WHEN source = 'src1' THEN 0.25
        |         ELSE 0.1 END AS frac,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5('graft-strat' || '|' || COALESCE(source, '␀')
        |                   || '|' || doc_id)) AS rn,
        |    count(*) OVER (PARTITION BY source) AS n_stratum
        |  FROM documents)
        |SELECT doc_id, source
        |FROM d
        |WHERE rn <= greatest(CAST(ceil(frac * n_stratum) AS BIGINT), 1)
        |ORDER BY doc_id""".stripMargin),

    Q.sql("corpus_pack_sequences", corpusPackSequences,
      """WITH RECURSIVE d AS (
        |  SELECT doc_id, doc_id % 8 AS shard,
        |    -- COALESCE mirrors the operator's null-packs-as-0 contract
        |    -- (a bare NULL would poison the whole shard's running fill)
        |    CAST(COALESCE(len(string_split(text, ' ')), 0) AS BIGINT) AS n_tokens,
        |    row_number() OVER (PARTITION BY doc_id % 8
        |                       ORDER BY doc_id) AS rn
        |  FROM documents),
        |pack(shard, rn, doc_id, seq_id, fill) AS (
        |  SELECT shard, rn, doc_id, CAST(1 AS BIGINT), n_tokens
        |  FROM d WHERE rn = 1
        |  UNION ALL
        |  SELECT d.shard, d.rn, d.doc_id,
        |    CASE WHEN p.fill + d.n_tokens > 1000
        |         THEN p.seq_id + 1 ELSE p.seq_id END,
        |    CASE WHEN p.fill + d.n_tokens > 1000
        |         THEN d.n_tokens ELSE p.fill + d.n_tokens END
        |  FROM pack p JOIN d ON d.shard = p.shard AND d.rn = p.rn + 1)
        |SELECT doc_id, shard, seq_id
        |FROM pack
        |ORDER BY doc_id""".stripMargin),

    Q.sql("corpus_pack_efficiency", corpusPackEfficiency,
      """WITH RECURSIVE d AS (
        |  SELECT doc_id, doc_id % 8 AS shard,
        |    CAST(COALESCE(len(string_split(text, ' ')), 0) AS BIGINT) AS n_tokens,
        |    row_number() OVER (PARTITION BY doc_id % 8
        |                       ORDER BY doc_id) AS rn
        |  FROM documents),
        |pack(shard, rn, doc_id, seq_id, fill) AS (
        |  SELECT shard, rn, doc_id, CAST(1 AS BIGINT), n_tokens
        |  FROM d WHERE rn = 1
        |  UNION ALL
        |  SELECT d.shard, d.rn, d.doc_id,
        |    CASE WHEN p.fill + d.n_tokens > 1000
        |         THEN p.seq_id + 1 ELSE p.seq_id END,
        |    CASE WHEN p.fill + d.n_tokens > 1000
        |         THEN d.n_tokens ELSE p.fill + d.n_tokens END
        |  FROM pack p JOIN d ON d.shard = p.shard AND d.rn = p.rn + 1)
        |SELECT p.shard,
        |  CAST(count(DISTINCT p.seq_id) AS BIGINT) AS n_bins,
        |  CAST(count(*) AS INT) AS n_docs,
        |  CAST(sum(d.n_tokens) AS BIGINT) AS total_tokens,
        |  round(CAST(sum(d.n_tokens) AS DOUBLE)
        |    / CAST(count(DISTINCT p.seq_id) * 1000 AS DOUBLE), 4)
        |    AS fill_rate
        |FROM pack p JOIN d ON d.shard = p.shard AND d.rn = p.rn
        |GROUP BY p.shard
        |ORDER BY p.shard""".stripMargin),

    Q.sql("events_asof", eventsAsof,
      """WITH e AS (SELECT user_id AS key, epoch_ns(ts) AS ts,
        |             event_type, value, event_id
        |           FROM events),
        |p AS (SELECT key, ts, event_id, value FROM e
        |      WHERE event_type = 'purchase'),
        |v AS (SELECT key, ts, max(value) AS vval FROM e
        |      WHERE event_type = 'view' GROUP BY key, ts)
        |SELECT p.key AS user_id, p.ts, p.event_id, p.value,
        |       v.ts AS asof_ts, v.vval AS view_value
        |FROM p ASOF LEFT JOIN v ON p.key = v.key AND v.ts <= p.ts
        |ORDER BY user_id, p.ts, event_id""".stripMargin),

    Q.sql("events_range_join", eventsRangeJoin,
      """WITH w AS (SELECT CAST(n_nationkey AS BIGINT) AS window_id,
        |             1704067200000000000 + n_nationkey * 90000000000000
        |               AS w_start,
        |             1704067200000000000 + n_nationkey * 90000000000000
        |               + 5400000000000 AS w_end
        |           FROM nation),
        |e AS (SELECT event_id, epoch_ns(ts) AS ts, value FROM events)
        |SELECT window_id, CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |         AS total_value
        |FROM e JOIN w ON e.ts BETWEEN w.w_start AND w.w_end
        |GROUP BY window_id
        |ORDER BY window_id""".stripMargin),

    Q.sql("text_repetition", textRepetition,
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS s
        |              FROM documents),
        |g AS (SELECT doc_id, len(s) AS n_tokens,
        |        len(list_distinct(s)) AS n_distinct,
        |        unnest(CASE WHEN len(s) >= 2
        |               THEN list_transform(range(1, len(s)),
        |                      i -> s[i] || ' ' || s[i+1])
        |               ELSE [array_to_string(s, ' ')] END) AS g
        |      FROM toks),
        |c AS (SELECT doc_id, n_tokens, n_distinct, g, count(*) AS cnt
        |      FROM g GROUP BY doc_id, n_tokens, n_distinct, g)
        |SELECT doc_id,
        |  round(1.0 - CAST(n_distinct AS DOUBLE) / n_tokens, 6)
        |    AS dup_token_frac,
        |  round(CAST(max(cnt) AS DOUBLE) / sum(cnt), 6) AS top_2gram_frac
        |FROM c
        |GROUP BY doc_id, n_tokens, n_distinct
        |ORDER BY doc_id""".stripMargin),

    Q.sql("corpus_sample_threshold", corpusSampleThreshold,
      s"""SELECT doc_id, lang, source
        |FROM documents
        |WHERE substring(md5('graft-strat' || '|' || COALESCE(lang, '␀')
        |        || '|' || COALESCE(source, '␀') || '|' || doc_id), 1, 15)
        |      < '${Sampling.hexBound(0.2)}'
        |ORDER BY doc_id""".stripMargin),

    Q.sql("corpus_mixture_threshold", corpusMixtureThreshold,
      s"""SELECT doc_id, source
        |FROM documents
        |WHERE substring(md5('graft-strat' || '|' || COALESCE(source, '␀')
        |        || '|' || doc_id), 1, 15)
        |      < CASE WHEN source = 'src0' THEN '${Sampling.hexBound(0.5)}'
        |             WHEN source = 'src1' THEN '${Sampling.hexBound(0.25)}'
        |             ELSE '${Sampling.hexBound(0.1)}' END
        |ORDER BY doc_id""".stripMargin),

    // replays Sampling.hexBound exactly: (f * 2^60).toLong truncates
    // toward zero for positive f = floor; %015x zero-padded lowercase
    Q.sql("corpus_mixture_temperature", corpusMixtureTemperature,
      """WITH c AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n
        |  FROM documents GROUP BY lang),
        |tot AS (
        |  SELECT CAST(sum(n) AS DOUBLE) AS ntot,
        |         list_sum(list(sqrt(CAST(n AS DOUBLE)) ORDER BY lang)) AS s
        |  FROM c),
        |b AS (
        |  SELECT c.lang,
        |         least(1.0, 0.3 * t.ntot * (sqrt(CAST(c.n AS DOUBLE)) / t.s)
        |                    / CAST(c.n AS DOUBLE)) AS f
        |  FROM c, tot t),
        |bb AS (
        |  SELECT lang,
        |         CASE WHEN f >= 1 THEN 'g'
        |              WHEN f <= 0 THEN '000000000000000'
        |              ELSE printf('%015x',
        |                     CAST(floor(f * 1152921504606846976) AS BIGINT))
        |         END AS bound
        |  FROM b)
        |SELECT d.doc_id, d.lang
        |FROM documents d JOIN bb USING (lang)
        |WHERE substring(md5('graft-strat' || '|' || COALESCE(d.lang, '␀')
        |        || '|' || d.doc_id), 1, 15) < bb.bound
        |ORDER BY d.doc_id""".stripMargin),

    // epoch_us // 86400e6 equals Spark's ns div 86400e9 because the
    // divisor is a multiple of the µs truncation
    Q.sql("events_rolling_active", eventsRollingActive,
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |         CAST(count(*) AS BIGINT) AS n_events,
        |         CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, day, n_events, n_users,
        |  CAST(sum(n_events) OVER (PARTITION BY event_type ORDER BY day
        |         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS roll7_events
        |FROM daily ORDER BY event_type, day""".stripMargin),

    // pair leg reads the capped basket (top-48 per user by global
    // frequency desc, item tie-break); marginals read the full one
    Q.sql("events_item_pmi", eventsItemPmi,
      s"""WITH ui0 AS (
        |  SELECT DISTINCT user_id,
        |    CAST(json_extract_string(props, '$$.k') AS BIGINT) AS item
        |  FROM events),
        |ui AS (SELECT user_id, item FROM ui0 WHERE item IS NOT NULL),
        |nu AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |       FROM ui),
        |ia AS (SELECT item, CAST(count(*) AS BIGINT) AS n_i
        |       FROM ui GROUP BY item),
        |capped AS (
        |  SELECT user_id, item FROM (
        |    SELECT ui.user_id, ui.item,
        |      row_number() OVER (PARTITION BY ui.user_id
        |                         ORDER BY ia.n_i DESC, ui.item) AS rk
        |    FROM ui JOIN ia USING (item))
        |  WHERE rk <= $PmiBasketCap),
        |p AS (SELECT a.item AS item_a, b.item AS item_b,
        |        CAST(count(*) AS BIGINT) AS n_ab
        |      FROM capped a JOIN capped b
        |        ON a.user_id = b.user_id AND a.item < b.item
        |      GROUP BY 1, 2 HAVING count(*) >= 5)
        |SELECT p.item_a, p.item_b, p.n_ab,
        |  CAST(p.n_ab * nu.n_users AS DOUBLE)
        |    / CAST(x.n_i * y.n_i AS DOUBLE) AS lift
        |FROM p JOIN ia x ON x.item = p.item_a
        |       JOIN ia y ON y.item = p.item_b, nu
        |ORDER BY lift DESC, item_a, item_b""".stripMargin),

    // the interleave replays bit-for-bit with >> & << | on BIGINTs
    Q.sql("events_zorder_layout", eventsZorderLayout,
      s"""SELECT event_id, user_id,
         |  CAST(json_extract_string(props, '$$.k') AS BIGINT) AS item,
         |  ${graft.operators.ZOrder.zorderSql(
               "(user_id & 2097151)",
               "(CAST(json_extract_string(props, '$.k') AS BIGINT) & 2097151)")}
         |    AS zcode
         |FROM events
         |ORDER BY zcode, event_id""".stripMargin),

    // three unrolled exact-integer iterations: '//' (floor div) equals
    // Spark's 'div' (trunc) because every operand is non-negative
    Q.sql("events_item_pagerank", eventsItemPagerank,
      """WITH raw AS (
        |  SELECT user_id, ts, event_id,
        |         CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
        |  FROM events),
        |ord AS (
        |  SELECT item AS src,
        |         lead(item) OVER (PARTITION BY user_id
        |                          ORDER BY ts, event_id) AS dst
        |  FROM raw),
        |e AS (SELECT src, dst, CAST(count(*) AS BIGINT) AS w
        |      FROM ord WHERE dst IS NOT NULL GROUP BY src, dst),
        |o AS (SELECT src, CAST(sum(w) AS BIGINT) AS outw FROM e GROUP BY src),
        |nd AS (SELECT DISTINCT node FROM
        |        (SELECT src AS node FROM e UNION SELECT dst AS node FROM e)),
        |c AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nd),
        |r0 AS (SELECT node, 1000000000000 // c.n AS r FROM nd, c),
        |s1 AS (SELECT e.dst AS node, CAST(sum((r0.r // o.outw) * e.w) AS BIGINT) AS s
        |       FROM e JOIN o USING (src) JOIN r0 ON r0.node = e.src
        |       GROUP BY e.dst),
        |r1 AS (SELECT nd.node,
        |         (1000000000000 * 3 // 20) // c.n
        |           + (COALESCE(s1.s, 0) * 17) // 20 AS r
        |       FROM nd LEFT JOIN s1 USING (node), c),
        |s2 AS (SELECT e.dst AS node, CAST(sum((r1.r // o.outw) * e.w) AS BIGINT) AS s
        |       FROM e JOIN o USING (src) JOIN r1 ON r1.node = e.src
        |       GROUP BY e.dst),
        |r2 AS (SELECT nd.node,
        |         (1000000000000 * 3 // 20) // c.n
        |           + (COALESCE(s2.s, 0) * 17) // 20 AS r
        |       FROM nd LEFT JOIN s2 USING (node), c),
        |s3 AS (SELECT e.dst AS node, CAST(sum((r2.r // o.outw) * e.w) AS BIGINT) AS s
        |       FROM e JOIN o USING (src) JOIN r2 ON r2.node = e.src
        |       GROUP BY e.dst),
        |r3 AS (SELECT nd.node,
        |         (1000000000000 * 3 // 20) // c.n
        |           + (COALESCE(s3.s, 0) * 17) // 20 AS r
        |       FROM nd LEFT JOIN s3 USING (node), c)
        |SELECT node AS item, CAST(r AS BIGINT) AS rank_mu,
        |       CAST(r AS DOUBLE) / 1000000000000.0 AS rank
        |FROM r3 ORDER BY rank_mu DESC, item""".stripMargin),

    // every factor is forced to DOUBLE so DuckDB's DECIMAL literal
    // arithmetic cannot diverge from the driver's double fraction
    // chain; the bound replay is the temperature-mixture idiom
    Q.sql("corpus_token_budget", corpusTokenBudget,
      """WITH c AS (
        |  SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS m
        |  FROM documents GROUP BY source),
        |sh(source, share) AS (VALUES
        |  ('src0', CAST(0.4 AS DOUBLE)), ('src1', CAST(0.3 AS DOUBLE)),
        |  ('src2', CAST(0.2 AS DOUBLE)), ('src3', CAST(0.1 AS DOUBLE))),
        |b AS (
        |  SELECT sh.source,
        |         least(1.0, sh.share * CAST(5000 AS DOUBLE)
        |                    / CAST(c.m AS DOUBLE)) AS f
        |  FROM sh JOIN c USING (source)),
        |bb AS (
        |  SELECT source,
        |         CASE WHEN f >= 1 THEN 'g'
        |              WHEN f <= 0 THEN '000000000000000'
        |              ELSE printf('%015x',
        |                     CAST(floor(f * 1152921504606846976) AS BIGINT))
        |         END AS bound
        |  FROM b)
        |SELECT d.doc_id, d.source
        |FROM documents d JOIN bb USING (source)
        |WHERE substring(md5('graft-strat' || '|' || COALESCE(d.source, '␀')
        |        || '|' || d.doc_id), 1, 15) < bb.bound
        |ORDER BY d.doc_id""".stripMargin),

    Q.sql("corpus_split_assign", corpusSplitAssign,
      s"""SELECT doc_id, lang,
        |  CASE WHEN substring(md5('graft-split' || '|' || doc_id), 1, 15)
        |            < '${Sampling.hexBound(0.8)}' THEN 'train'
        |       WHEN substring(md5('graft-split' || '|' || doc_id), 1, 15)
        |            < '${Sampling.hexBound(0.9)}' THEN 'val'
        |       ELSE 'test' END AS split
        |FROM documents
        |ORDER BY doc_id""".stripMargin),

    Q.sql("corpus_sample_stratified", corpusSampleStratified,
      """WITH d AS (
        |  SELECT doc_id, lang, source,
        |    row_number() OVER (PARTITION BY lang, source
        |      ORDER BY md5('graft-strat' || '|' || COALESCE(lang, '␀')
        |                   || '|' || COALESCE(source, '␀')
        |                   || '|' || doc_id)) AS rn,
        |    count(*) OVER (PARTITION BY lang, source) AS n_stratum
        |  FROM documents)
        |SELECT doc_id, lang, source
        |FROM d
        |WHERE rn <= greatest(CAST(ceil(0.2 * n_stratum) AS BIGINT), 1)
        |ORDER BY doc_id""".stripMargin),

    Q.sql("corpus_chunk_windows", corpusChunkWindows,
      s"""$chunkCte
         |SELECT doc_id, chunk_idx,
         |       CAST(len(ct) AS INT) AS n_chunk_tokens,
         |       array_to_string(ct, ' ') AS chunk_text
         |FROM c
         |ORDER BY doc_id, chunk_idx""".stripMargin),

    // short-chunk fallback mirrors TextDedup.shingles: a chunk under 3
    // tokens contributes one whole-text shingle (unreachable with the
    // current ≥10-token corpus, but the oracle must not diverge if the
    // generator changes)
    Q.sql("corpus_chunk_neardup", corpusChunkNearDup,
      s"""$chunkCte,
         |sh AS (SELECT doc_id * 1048576 + chunk_idx AS cid,
         |         CASE WHEN len(ct) >= 3
         |              THEN list_distinct(list_transform(range(1, len(ct) - 1),
         |                     i -> ct[i] || ' ' || ct[i+1] || ' ' || ct[i+2]))
         |              ELSE [array_to_string(ct, ' ')] END AS g
         |       FROM c)
        |SELECT a.cid AS chunk_a, b.cid AS chunk_b,
        |       round(CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
        |             / len(list_distinct(list_concat(a.g, b.g))), 6) AS jaccard
        |FROM sh a JOIN sh b
        |  ON a.cid < b.cid AND a.cid // 1048576 <> b.cid // 1048576
        |WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
        |      / len(list_distinct(list_concat(a.g, b.g))) >= 0.8
        |ORDER BY chunk_a, chunk_b""".stripMargin),

    // classifier scores (the text_quality_classifier model rebuild)
    // feed a score-ordered variant of the shuffle-shard replay
    Q.sql("corpus_curriculum_shard", corpusCurriculumShard,
      """WITH w AS (
        |  SELECT CAST(f AS INT) AS f,
        |    CAST('0x' || substring(md5('graft-qc-w' || '|' || f), 1, 13)
        |         AS BIGINT) % 2000001 - 1000000 AS w_mu
        |  FROM range(256) t(f)),
        |t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |      FROM documents),
        |ft AS (SELECT doc_id,
        |         CAST(CAST('0x' || substring(md5('graft-qc' || '|' || tok), 1, 13)
        |                   AS BIGINT) % 256 AS INT) AS f
        |       FROM t),
        |a AS (SELECT doc_id, CAST(count(*) AS INT) AS n_toks,
        |        CAST(sum(w.w_mu) AS BIGINT) AS s_mu
        |      FROM ft JOIN w USING (f) GROUP BY doc_id),
        |sc AS (SELECT doc_id,
        |         CAST(s_mu AS DOUBLE) / 1000000.0 / n_toks AS score
        |       FROM a),
        |d AS (SELECT doc_id, score,
        |        md5('graft-shard' || '|' || doc_id) AS key,
        |        CAST(CAST('0x' || substring(md5('graft-shard' || '|' || doc_id), 1, 13)
        |                  AS BIGINT) % 16 AS INT) AS shard
        |      FROM sc)
        |SELECT shard,
        |  CAST(row_number() OVER (PARTITION BY shard
        |                          ORDER BY score DESC, key, doc_id)
        |       AS INT) AS pos,
        |  doc_id, score
        |FROM d ORDER BY shard, pos""".stripMargin),

    // shard = 52-bit md5 prefix mod 32 (non-negative, so % ≡ pmod);
    // within-shard order is the full md5 key — both engines replay it
    Q.sql("corpus_shuffle_shard", corpusShuffleShard,
      """WITH d AS (
        |  SELECT doc_id, source,
        |    md5('graft-shard' || '|' || doc_id) AS key,
        |    CAST(CAST('0x' || substring(md5('graft-shard' || '|' || doc_id), 1, 13)
        |              AS BIGINT) % 32 AS INT) AS shard
        |  FROM documents)
        |SELECT shard,
        |  CAST(row_number() OVER (PARTITION BY shard ORDER BY key, doc_id)
        |       AS INT) AS pos,
        |  doc_id, source
        |FROM d ORDER BY shard, pos""".stripMargin),

    // '0x'-prefixed VARCHAR → BIGINT cast parses the md5 prefix as the
    // same 52-bit integer Spark's conv(hex, 16, 10) produces; the
    // single division is correctly rounded in both engines
    Q.sql("corpus_sample_weighted", corpusSampleWeighted,
      """WITH d AS (
        |  SELECT doc_id, n_chars,
        |    CAST(CAST('0x' || substring(md5('graft-wrs' || '|' || doc_id), 1, 13)
        |              AS BIGINT) AS DOUBLE) / n_chars AS priority
        |  FROM documents)
        |SELECT doc_id, n_chars, priority
        |FROM d ORDER BY priority, doc_id LIMIT 50""".stripMargin),

    // GROUPING_ID bit order (first column = MSB, 1 = aggregated) is the
    // same convention in Spark and DuckDB; within each gid slice the
    // null pattern of (source, lang) is constant, so ASC ordering never
    // compares NULL against a value and the engines' opposite NULL
    // placement defaults cannot diverge
    Q.sql("corpus_datacard", corpusDatacard,
      """SELECT CAST(GROUPING_ID(source, lang) AS INT) AS gid, source, lang,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
        |  round(CAST(sum(n_chars) AS DOUBLE) / count(*), 6) AS avg_chars
        |FROM documents
        |GROUP BY CUBE(source, lang)
        |ORDER BY gid, source, lang""".stripMargin),

    // the g CTE mirrors decontaminateSql's gram extraction (same
    // kernel on the Spark side: Decontaminate.gramHashes)
    Q.sql("text_gram_dedup", textGramDedup,
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS s
        |              FROM documents),
        |g AS (SELECT doc_id,
        |        CASE WHEN len(s) >= 13
        |             THEN list_distinct(list_transform(range(1, len(s) - 11),
        |                    i -> md5(array_to_string(list_slice(s, i, i + 12), ' '))))
        |             ELSE [md5(array_to_string(s, ' '))] END AS gs
        |      FROM toks),
        |tg AS (SELECT doc_id, unnest(gs) AS g FROM g),
        |dup AS (SELECT g FROM tg GROUP BY g HAVING count(*) > 1)
        |SELECT tg.doc_id,
        |  CAST(count(*) AS BIGINT) AS n_grams,
        |  CAST(count(dup.g) AS BIGINT) AS n_dup_grams,
        |  round(CAST(count(dup.g) AS DOUBLE) / count(*), 6) AS dup_frac,
        |  round(CAST(count(dup.g) AS DOUBLE) / count(*), 6) >= 0.5 AS flagged
        |FROM tg LEFT JOIN dup ON tg.g = dup.g
        |GROUP BY tg.doc_id
        |ORDER BY doc_id""".stripMargin),

    Q.sql("text_decontaminate", textDecontaminate, decontaminateSql),

    // bit-identical to the exact form by construction (bloom false
    // positives die in the verify join) — same oracle
    Q.sql("text_decontaminate_bloom", textDecontaminateBloom, decontaminateSql),

    // fuzzy leg of the decontamination cascade: brute-force Jaccard
    // ground truth on the same 5-way split (oracle-side quadratic
    // only; the Spark side pairs via the banded increment×base join).
    // EXACT-equality precondition: the 16×4 banding misses a pair at
    // jaccard j with prob (1−j⁴)¹⁶ over the hash seeds (~2e-4 at the
    // 0.8 threshold; ≈1.5e-7 at the corpus's lowest real pair,
    // j = 0.889) — and with the fixed md5 seeds the outcome is FROZEN
    // per corpus: a pair either always bands together or never does.
    // DedupQueriesSpec.bandingPrecondition pins banded recall == 1
    // against the brute pair set, so a testdata regeneration that
    // strands a marginal pair fails in CI before the driver flakes.
    Q.sql("text_decontaminate_fuzzy", textDecontaminateFuzzy,
      // fallback-aware shingle CTE: docs with < 3 tokens get the
      // whole-text shingle, matching TextDedup.shingles (the shared
      // DedupQueries CTE yields an empty list there, which would make
      // a 2-token exact dup invisible to the oracle: 0/0 = NULL)
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS s
         |             FROM documents),
         |sh AS (SELECT doc_id,
         |         CASE WHEN len(s) >= 3
         |              THEN list_distinct(list_transform(range(1, len(s) - 1),
         |                i -> s[i] || ' ' || s[i+1] || ' ' || s[i+2]))
         |              ELSE [array_to_string(s, ' ')] END AS g
         |       FROM toks)
         |SELECT t.doc_id AS doc_id,
         |       CAST(count(*) AS BIGINT) AS n_bench_matches,
         |       max(round(CAST(len(list_intersect(t.g, b.g)) AS DOUBLE)
         |             / len(list_distinct(list_concat(t.g, b.g))), 6))
         |         AS max_jaccard
         |FROM sh t JOIN sh b
         |  ON t.doc_id % 5 <> 0 AND b.doc_id % 5 = 0
         |WHERE CAST(len(list_intersect(t.g, b.g)) AS DOUBLE)
         |      / len(list_distinct(list_concat(t.g, b.g))) >= 0.8
         |GROUP BY t.doc_id
         |ORDER BY doc_id""".stripMargin),

    Q.sql("events_funnel", eventsFunnel,
      """WITH e AS (SELECT user_id, event_type, epoch_ns(ts) AS ts
        |           FROM events),
        |u AS (SELECT DISTINCT user_id FROM e),
        |s1 AS (SELECT user_id, min(ts) AS t_view FROM e
        |       WHERE event_type = 'view' GROUP BY user_id),
        |a1 AS (SELECT u.user_id, s1.t_view FROM u LEFT JOIN s1 USING (user_id)),
        |s2 AS (SELECT a1.user_id, a1.t_view, min(e.ts) AS t_click
        |       FROM a1 LEFT JOIN e ON e.user_id = a1.user_id
        |         AND e.event_type = 'click' AND e.ts > a1.t_view
        |       GROUP BY a1.user_id, a1.t_view),
        |s3 AS (SELECT s2.user_id, s2.t_view, s2.t_click, min(e.ts) AS t_purchase
        |       FROM s2 LEFT JOIN e ON e.user_id = s2.user_id
        |         AND e.event_type = 'purchase' AND e.ts > s2.t_click
        |       GROUP BY s2.user_id, s2.t_view, s2.t_click)
        |SELECT user_id, t_view, t_click, t_purchase,
        |  CAST(CASE WHEN t_view IS NULL THEN 0
        |            WHEN t_click IS NULL THEN 1
        |            WHEN t_purchase IS NULL THEN 2 ELSE 3 END AS INT)
        |    AS n_stages
        |FROM s3 ORDER BY user_id""".stripMargin),

    Q.sql("events_cohort_retention", eventsCohortRetention,
      """WITH e AS (SELECT user_id,
        |             epoch_ns(ts) // 86400000000000 AS day FROM events),
        |c AS (SELECT user_id, min(day) AS cohort_day FROM e GROUP BY user_id)
        |SELECT c.cohort_day, e.day - c.cohort_day AS day_offset,
        |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
        |FROM e JOIN c USING (user_id)
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin),

    Q.sql("events_sessionize", eventsSessionize,
      """WITH e AS (SELECT user_id, epoch_ns(ts) AS ts, event_id, value
        |           FROM events),
        |f AS (SELECT *,
        |        CASE WHEN lag(ts) OVER w IS NULL
        |                  OR ts - lag(ts) OVER w > 1800000000000
        |             THEN 1 ELSE 0 END AS new_sess
        |      FROM e
        |      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT *,
        |        CAST(sum(new_sess) OVER (PARTITION BY user_id
        |          ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |          AS session_idx
        |      FROM f)
        |SELECT user_id, session_idx,
        |  min(ts) AS session_start, max(ts) AS session_end,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM s
        |GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin),
  )
}
