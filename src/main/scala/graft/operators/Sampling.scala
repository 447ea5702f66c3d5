package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling for corpus construction: keep a
  * fraction of every stratum (e.g. (lang, source)), choosing members by
  * md5 hash — engine-portable and reproducible (the same trick as the
  * W5 hash-order sample).
  *
  * Two forms, two scale regimes:
  *
  *  - [[stratifiedThreshold]] / [[thresholdByBound]] — the 100 TB
  *    DEFAULT. A pure map-side filter: keep rows whose hash prefix
  *    compares below a fraction-scaled hex bound. ZERO shuffle, zero
  *    window, no per-stratum serialization — a 90%-crawl dominant
  *    stratum costs the same per row as a rare one. Quotas are exact in
  *    expectation (error < 2^-60 per row), not exact per stratum.
  *
  *  - [[stratified]] / [[stratifiedByFraction]] — exact per-stratum
  *    quotas (ceil(fraction · stratum size), floor of 1) via one
  *    shuffle + one window. The window partitions by stratum, so a
  *    dominant stratum serializes through few tasks: use ONLY when
  *    exact quotas / the rare-stratum floor are required, at stratum
  *    cardinalities where the largest stratum fits a task.
  *
  * Contract (enforced, not assumed — both forms): ids must be
  * non-null, strata values must not contain the `|` delimiter; either
  * violation raises at execution rather than silently perturbing the
  * hash order relative to the SQL oracle (concat_ws would skip a NULL
  * id where SQL `||` propagates it; an embedded `|` would alias
  * against a neighboring stratum key). NULL strata values hash as a
  * sentinel, matching COALESCE(col, '␀') on the SQL side.
  */
object Sampling {

  /** md5(salt|strata…|id) — the shared deterministic sampling key. */
  private def hashKey(strata: Seq[String], idCol: String, salt: String): Column = {
    val parts = strata.map { s =>
      val c = col(s).cast("string")
      when(c.contains("|"),
           raise_error(concat(
             lit(s"Sampling: stratum '$s' value contains reserved '|': "), c)))
        .otherwise(coalesce(c, lit("␀")))
    }
    val id = when(col(idCol).isNull,
                  raise_error(lit(s"Sampling: NULL $idCol (ids must be non-null)")))
      .otherwise(col(idCol).cast("string"))
    md5(concat_ws("|", lit(salt) +: parts :+ id: _*))
  }

  /** 15-hex-digit keep bound for a fraction: a row survives when its
    * hash prefix (uniform over 16^15 values) compares below the bound,
    * so P(keep) = floor(f·16^15)/16^15 — within 2^-60 of f. Computed
    * ONCE here and embedded as a literal in both the Spark plan and
    * the SQL oracle, so float rounding can never diverge between
    * engines. f ≤ 0 keeps nothing; f ≥ 1 keeps all ('g' sorts above
    * every lowercase hex string). */
  def hexBound(fraction: Double): String =
    if (fraction <= 0) "0" * 15
    else if (fraction >= 1) "g"
    else f"${(fraction * (1L << 60)).toLong}%015x"

  /** Map-side threshold sample: expected `fraction` of every stratum,
    * zero shuffle. The scale path — see object doc. */
  def stratifiedThreshold(df: DataFrame, strata: Seq[String], idCol: String,
                          fraction: Double, salt: String = "graft-strat")
      : DataFrame =
    thresholdByBound(df, strata, idCol, lit(hexBound(fraction)), salt)

  /** Mixture form of the threshold sample: `bound` is a per-row STRING
    * column of 15-hex bounds (typically a `when` ladder of
    * [[hexBound]] literals over the source column) so each stratum is
    * sampled at its own rate with no shuffle. */
  def thresholdByBound(df: DataFrame, strata: Seq[String], idCol: String,
                       bound: Column, salt: String = "graft-strat")
      : DataFrame =
    df.filter(substring(hashKey(strata, idCol, salt), 1, 15) < bound)

  /** Exact stratified sample: ceil(fraction · stratum size) rows per
    * stratum, hash order, floor of 1. Emits the input columns. */
  def stratified(df: DataFrame, strata: Seq[String], idCol: String,
                 fraction: Double, salt: String = "graft-strat")
      : DataFrame =
    stratifiedByFraction(df, strata, idCol, lit(fraction), salt)

  /** Mixture reweighting with exact quotas: per-ROW fraction expression
    * (typically a `when` ladder over a domain/source column) so each
    * stratum is sampled at its own rate — the data-mixture step of
    * corpus construction (upweight curated domains, downsample crawl).
    * Same hash-order determinism and per-stratum floor of 1. Prefer
    * [[thresholdByBound]] at scale when approximate quotas suffice. */
  def stratifiedByFraction(df: DataFrame, strata: Seq[String], idCol: String,
                           fraction: Column, salt: String = "graft-strat")
      : DataFrame = {
    // same contract-enforcement posture as the '|' / NULL-id guards:
    // withColumn would silently REPLACE a pre-existing rn/n_stratum and
    // the final drop would then delete the caller's column
    val reserved = Seq("rn", "n_stratum").filter(df.columns.contains)
    require(reserved.isEmpty,
      s"Sampling: input columns ${reserved.mkString(", ")} are reserved " +
        "by the windowed sample (would be overwritten and dropped)")
    val parts: Seq[Column] = strata.map(col)
    val w = Window.partitionBy(parts: _*)
      .orderBy(hashKey(strata, idCol, salt))
    val wAll = Window.partitionBy(parts: _*)
    df.withColumn("rn", row_number().over(w))
      .withColumn("n_stratum", count(lit(1)).over(wAll))
      .filter(col("rn") <= greatest(ceil(fraction * col("n_stratum")), lit(1)))
      .drop("rn", "n_stratum")
  }

  /** Temperature-scaled mixture sampling — the multilingual /
    * multi-source rebalancing rule (sample stratum s proportionally to
    * n_s^α instead of n_s): keep fraction f_s = min(1,
    * target·N·w_s/n_s) with w_s = n_s^α / Σ_t n_t^α. α = 1 is the
    * plain proportional `target` sample; α → 0 approaches
    * uniform-over-strata (maximum upsampling of rare strata). The
    * realized corpus-wide rate is `target` except for what the f ≤ 1
    * clamp on heavily-boosted rare strata forgoes.
    *
    * Scale shape: one map-side-combinable count aggregate collects
    * #strata rows to the driver (strata are a bounded vocabulary by
    * contract — languages, sources), the per-stratum bounds become a
    * literal `when` ladder, and the sample itself is
    * [[thresholdByBound]]'s pure map-side filter: zero shuffle over
    * the corpus, skew-immune by construction.
    *
    * Oracle determinism: Σ n^α accumulates in stratum-sorted order
    * (replayable as an ORDER BY list fold); the f_s expression chain
    * is pinned IEEE-double; α = 0.5 routes through `sqrt`
    * (correctly-rounded in every IEEE engine, unlike `pow`) — the
    * oracle-exact temperature; other α carry pow's cross-engine
    * 1-ulp risk into a hexBound (~2⁻⁶⁰ of keep-probability mass).
    * NULL strata are rejected (a real mixture config names its
    * strata).
    */
  def temperatureThreshold(df: DataFrame, stratum: String, idCol: String,
                           target: Double, alpha: Double = 0.5,
                           salt: String = "graft-strat"): DataFrame = {
    require(target > 0 && target <= 1,
      s"Sampling: target must be in (0,1] (got $target)")
    require(alpha > 0 && alpha <= 1,
      s"Sampling: alpha must be in (0,1] (got $alpha)")
    val counts = df.groupBy(col(stratum)).agg(count(lit(1)).as("n"))
      .collect()
      .map { r =>
        require(!r.isNullAt(0),
          s"Sampling: NULL $stratum (temperature strata must be non-null)")
        (r.get(0).toString, r.getLong(1))
      }
      .sortBy(_._1)
    def powA(x: Double): Double =
      if (alpha == 0.5) math.sqrt(x)
      else if (alpha == 1.0) x
      else math.pow(x, alpha)
    val ntot = counts.map(_._2).sum.toDouble
    var sumW = 0.0
    counts.foreach { case (_, n) => sumW += powA(n.toDouble) }
    val fractions = counts.map { case (s, n) =>
      (s, math.min(1.0, target * ntot * (powA(n.toDouble) / sumW) / n.toDouble))
    }
    val ladder = fractions.tail
      .foldLeft(when(col(stratum) === fractions.head._1,
        lit(hexBound(fractions.head._2)))) { case (acc, (s, f)) =>
        acc.when(col(stratum) === s, lit(hexBound(f)))
      }
      .otherwise(lit(hexBound(0.0))) // unreachable: strata enumerated above
    thresholdByBound(df, Seq(stratum), idCol, ladder, salt)
  }

  /** Token-budget domain reweighting — the corpus-composition step
    * stated the way trainers state it: "B tokens total, share_s of
    * them from domain s" (the DoReMi/Pile recipe shape), rather than
    * per-domain keep fractions. Each listed domain's keep fraction is
    * min(1, share_s·B / tokens_s) — derived from ONE tiny
    * (stratum → token mass) aggregate collected to the driver — and
    * the filter itself is the shuffle-free hash-threshold form.
    * Domains not listed in `shares` are excluded (bound 0), which is
    * the recipe semantic: an unlisted domain has a zero token budget.
    *
    * A domain whose mass is under its budget keeps everything
    * (clamped at 1) — the sampler cannot mint tokens; rebalancing the
    * shortfall across other domains is a policy choice left to the
    * caller. Realized token mass is exact in expectation (each row
    * keeps independently at the stratum rate; token counts are
    * row-level weights, so the expected kept mass is
    * fraction·tokens_s ≈ share_s·B).
    *
    * Scale shape: one map-side-combinable aggregate over the corpus
    * (stratum cardinality rows reach the driver), then the zero-
    * shuffle threshold filter — the same two-phase shape as
    * [[temperatureThreshold]]. */
  def tokenBudgetThreshold(df: DataFrame, stratum: String, idCol: String,
                           tokenCol: Column, budgetTokens: Long,
                           shares: Seq[(String, Double)],
                           salt: String = "graft-strat"): DataFrame = {
    require(budgetTokens > 0,
      s"Sampling: budgetTokens must be positive (got $budgetTokens)")
    require(shares.nonEmpty && shares.forall(_._2 > 0),
      "Sampling: shares must be non-empty with positive weights")
    require(math.abs(shares.map(_._2).sum - 1.0) < 1e-9,
      s"Sampling: shares must sum to 1 (got ${shares.map(_._2).sum})")
    val masses = df.groupBy(col(stratum))
      .agg(sum(tokenCol.cast("long")).as("m"))
      .collect()
      .map { r =>
        require(!r.isNullAt(0),
          s"Sampling: NULL $stratum (budget strata must be non-null)")
        (r.get(0).toString, r.getLong(1))
      }.toMap
    val fractions = shares.map { case (s, share) =>
      val m = masses.getOrElse(s, 0L)
      (s, if (m == 0L) 0.0
          else math.min(1.0, share * budgetTokens / m.toDouble))
    }
    val ladder = fractions.tail
      .foldLeft(when(col(stratum) === fractions.head._1,
        lit(hexBound(fractions.head._2)))) { case (acc, (s, f)) =>
        acc.when(col(stratum) === s, lit(hexBound(f)))
      }
      .otherwise(lit(hexBound(0.0))) // unlisted domain: zero budget
    thresholdByBound(df, Seq(stratum), idCol, ladder, salt)
  }

  /** Deterministic train/val/test split assignment — the eval-holdout
    * step of corpus construction. Adds a `split` column naming the
    * partition each row belongs to; weights are cumulative hash-prefix
    * intervals of the same 15-hex key as [[stratifiedThreshold]], so
    * the assignment is:
    *
    *  - a pure map-side projection (zero shuffle, zero window — the
    *    100 TB shape by construction);
    *  - disjoint and exhaustive (intervals tile [0,1); the last split
    *    takes the ELSE branch so float dust can never orphan a row);
    *  - stable under corpus growth: a document's split depends only on
    *    (salt, id), so re-running after ingesting new data never moves
    *    an old document across the train/test boundary — the property
    *    that keeps a frozen eval set uncontaminated across refreshes.
    *
    * Weights must sum to 1 (enforced); realized fractions are exact in
    * expectation with per-row error < 2^-60, like the threshold
    * sampler. */
  def splitAssign(df: DataFrame, idCol: String,
                  splits: Seq[(String, Double)],
                  salt: String = "graft-split"): DataFrame = {
    require(splits.nonEmpty, "Sampling: at least one split required")
    require(splits.forall(_._2 > 0), "Sampling: split weights must be > 0")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"Sampling: split weights must sum to 1 (got ${splits.map(_._2).sum})")
    require(!df.columns.contains("split"),
      "Sampling: input column 'split' is reserved by splitAssign")
    val h = substring(hashKey(Nil, idCol, salt), 1, 15)
    // cumulative bounds accumulate in EXACT decimal (shortest-repr
    // BigDecimal), not double: 0.7+0.2 as doubles is 0.8999999999999999,
    // whose hexBound differs from hexBound(0.9) by ~128 hash values —
    // an oracle author writing the natural literal would diverge from
    // the engine on ids landing in that window. Decimal accumulation
    // makes the interval bound equal hexBound(<the literal you'd
    // write>) for every decimal weight vector, preserving hexBound's
    // computed-once contract.
    val cum = splits
      .scanLeft(java.math.BigDecimal.ZERO) { case (acc, (_, w)) =>
        acc.add(java.math.BigDecimal.valueOf(w))
      }
      .tail.map(_.doubleValue())
    val assigned =
      if (splits.size == 1) lit(splits.head._1)
      else {
        val first = when(h < lit(hexBound(cum.head)), lit(splits.head._1))
        splits.tail.init.zip(cum.tail.init)
          .foldLeft(first) { case (acc, ((name, _), c)) =>
            acc.when(h < lit(hexBound(c)), lit(name))
          }
          .otherwise(lit(splits.last._1))
      }
    df.withColumn("split", assigned)
  }

  /** Weighted sample without replacement — PRIORITY SAMPLING
    * (Duffield–Lund–Thorup): every row draws the deterministic
    * uniform h = first 13 hex digits of md5(salt|id) — a 52-bit
    * integer, EXACTLY representable as an IEEE double — and competes
    * on priority = h / weight. The k smallest priorities win, so
    * inclusion probability grows ∝ weight: the quality-weighted /
    * length-weighted corpus draw (upweight long or high-quality
    * documents without a per-stratum config).
    *
    * Oracle exactness: h and any integral weight < 2⁵³ are exact
    * doubles and the priority is ONE correctly-rounded IEEE division,
    * so the key is bit-identical in every IEEE engine. This is why
    * priority sampling is chosen over Efraimidis–Spirakis u^(1/w)
    * keys (same ∝-weight intent, different order): pow and ln are not
    * correctly rounded and differ across libm implementations, so an
    * ES key could not be SQL-oracle-verified bit-for-bit. doc-id
    * tie-break makes even the measure-zero equal-priority case
    * deterministic.
    *
    * Scale shape: a narrow map computes the key; the global bottom-k
    * is TakeOrderedAndProject — per-partition top-k heaps, only k
    * rows per partition reach the driver-side merge, NO global sort
    * shuffle (plan-pinned in OperatorPlanShapeSpec). k is a result
    * set by contract (plan-audit posture of the W1 page). */
  def weightedPriority(df: DataFrame, idCol: String, weightCol: String,
                       k: Int, salt: String = "graft-wrs"): DataFrame = {
    require(!df.columns.contains("priority"),
      "Sampling: input column 'priority' is reserved by weightedPriority")
    val w = col(weightCol).cast("double")
    val wGuard = when(col(weightCol).isNull || w <= 0 || w >= math.pow(2, 53),
        raise_error(concat(
          lit(s"Sampling: weight $weightCol must be in (0, 2^53): "),
          col(weightCol).cast("string"))))
      .otherwise(w)
    val h = conv(substring(hashKey(Nil, idCol, salt), 1, 13), 16, 10)
      .cast("long").cast("double")
    df.withColumn("priority", h / wGuard)
      .orderBy(col("priority"), col(idCol))
      .limit(k)
  }

  /** Deterministic global training-order shuffle + shard assignment —
    * the step between "cleaned corpus" and "files the trainer reads".
    * Each row gets shard = (52-bit md5 prefix of its id) mod `shards`
    * and a 1-based position within its shard in hash order, so the
    * corpus is written as `shards` independently-ordered files whose
    * concatenation is a reproducible pseudo-random permutation —
    * stable under re-runs, engine-replayable (md5 + one mod, no RNG
    * state), and mixing-quality (adjacent source rows land in
    * unrelated shards and positions).
    *
    * Scale shape: one hash Exchange on the shard key + one
    * in-partition sort; no global sort, no single-partition window.
    * Shards are md5-balanced (no skew by construction), and `shards`
    * is the parallelism/file-count knob — at 100 TB pick it so a
    * shard is one trainer file (the within-shard sort is per-task).
    */
  def shuffleShard(df: DataFrame, idCol: String, shards: Int,
                   salt: String = "graft-shard"): DataFrame =
    shardBy(df, idCol, shards, salt, Nil)

  /** Curriculum variant of [[shuffleShard]]: same md5-balanced shard
    * assignment, but within-shard order follows `orderCols` (e.g. a
    * difficulty or quality score, easiest first) before the hash
    * tie-break — each trainer file presents its documents in
    * curriculum order while the shards stay a balanced random
    * partition of the corpus. */
  def curriculumShard(df: DataFrame, idCol: String, shards: Int,
                      orderCols: Seq[Column],
                      salt: String = "graft-shard"): DataFrame =
    shardBy(df, idCol, shards, salt, orderCols)

  private def shardBy(df: DataFrame, idCol: String, shards: Int,
                      salt: String, orderCols: Seq[Column]): DataFrame = {
    require(shards > 0, s"Sampling: shards must be positive, got $shards")
    Seq("_key", "shard", "pos").foreach(c =>
      require(!df.columns.contains(c),
        s"Sampling: input column '$c' is reserved by shuffleShard"))
    val key = hashKey(Nil, idCol, salt)
    val shard = pmod(conv(substring(key, 1, 13), 16, 10).cast("long"),
      lit(shards.toLong)).cast("int")
    val w = Window.partitionBy(col("shard"))
      .orderBy(orderCols :+ col("_key").asc :+ col(idCol).asc: _*)
    df.withColumn("_key", key)
      .withColumn("shard", shard)
      .withColumn("pos", row_number().over(w))
      .drop("_key")
  }
}
