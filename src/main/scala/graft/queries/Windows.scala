package graft.queries

import graft.{Env, Q}
import graft.syntax._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window / sort / limit / top-k operators from SURVEY.md §2.5.
  *
  * Scale notes: the per-group windows (W2/W3/W4/W7) partition by their
  * group key — one shuffle, parallel across groups, no global sort. The
  * global-order windows (W1 pagination) are inherently single-ordered-
  * stream semantics (an API page); Spark executes them as one-partition
  * windows, which is correct and cheap AFTER pushed-down filters cut the
  * input — at 100 TB a feed endpoint paginates keyset-style instead:
  * [[w1PageKeyset]] (`WHERE id > last_seen ORDER BY id LIMIT k`) is
  * that form, window-free with the cursor pushed into the scan.
  */
object Windows {

  /** W1 order + offset/limit pagination (ref `controller.py:429-438`,
    * `scripts.py:85-96`): page 3 of the orders feed, page size 35. */
  def w1Page(env: Env): DataFrame = {
    val w = Window.orderBy($"o_orderkey")
    env.orders
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" > 70 && $"rn" <= 105)
      .orderBy($"rn")
  }

  /** W1 keyset pagination — the 100 TB form of the same feed endpoint
    * (ref `controller.py:429-438` ordering semantics): the page AFTER a
    * cursor is `WHERE id > last_seen ORDER BY id LIMIT k`. The cursor
    * predicate pushes into the parquet scan (min/max row-group pruning
    * skips everything before the cursor) and TakeOrderedAndProject
    * keeps a k-row heap per partition — no global window, no
    * single-partition sort, constant memory at any depth. Same page-35
    * contract as [[w1Page]], cursor-addressed: both plans embed the
    * same literal cursor, as an API would replay its `last_seen`. */
  def w1PageKeyset(env: Env, afterKey: Long = 280L, k: Int = 35): DataFrame =
    env.orders
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .filter($"o_orderkey" > afterKey)
      .orderBy($"o_orderkey")
      .limit(k)

  /** W2 first()-by-id-order (ref `viaf.py:780-782` — earliest duplicate
    * contributor with the same VIAF): earliest event per user; event_id
    * breaks ts ties deterministically. */
  def w2FirstByOrder(env: Env): DataFrame = {
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    env.events
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_id", $"event_type")
      .orderBy($"user_id")
  }

  /** W3 top-1 by popularity (ref `viaf.py:613-614` most_common(1)): the
    * most frequent event_type per user, ties broken lexicographically. */
  def w3Top1(env: Env): DataFrame = {
    val counts = env.events
      .groupBy($"user_id", $"event_type")
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy($"user_id").orderBy($"cnt".desc, $"event_type".asc)
    counts
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_type".as("top_event_type"), $"cnt")
      .orderBy($"user_id")
  }

  /** W4 candidate ranking (ref `viaf.py:416-450`): rank candidates by
    * encounter order (here: event time), score = value − 10·rank
    * (popularity prior, ref `viaf.py:497`), pick the best-scoring
    * candidate per user. */
  def w4CandidateRank(env: Env): DataFrame = {
    val encounter = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val best = Window.partitionBy($"user_id").orderBy($"score".desc, $"event_id".asc)
    env.events
      .filter($"event_type" === "purchase")
      .withColumn("rank", row_number().over(encounter))
      .withColumn("score", round($"value" - lit(10.0) * $"rank", 2))
      .withColumn("rn", row_number().over(best))
      .filter($"rn" === 1)
      .select($"user_id", $"event_id", $"score")
      .orderBy($"user_id")
  }

  /** W5 random-sample limit (ref `scripts.py:381-382`
    * `order_by(func.random()).limit(n)`). Sampling order is the md5 of
    * a salted key instead of a PRNG: statistically uniform like
    * func.random(), but REPRODUCIBLE across engines and runs — which
    * turns the round-2 rows-only check into a full hash-verified
    * oracle, and at scale makes sampled jobs rerunnable/resumable
    * (same sample every attempt). */
  def w5RandomSample(env: Env): DataFrame =
    env.orders
      .select($"o_orderkey", $"o_custkey")
      .orderBy(md5(concat(lit("w5-seed-42|"), $"o_orderkey")), $"o_orderkey")
      .limit(20)

  /** W7 shortest-candidate selection (ref `canonicalize.py:301-326` —
    * min by len(name) among matching candidates): per brand, the
    * shortest part name above a match threshold; name breaks length
    * ties. */
  def w7MinByLength(env: Env): DataFrame = {
    val w = Window.partitionBy($"p_brand").orderBy(length($"p_name").asc, $"p_name".asc)
    env.part
      .filter($"p_retailprice" > 950.0)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"p_brand", $"p_name".as("shortest_name"))
      .orderBy($"p_brand")
  }

  val entries: Seq[Q] = Seq(
    Q.sql("w1_page", w1Page,
      """SELECT o_orderkey, o_custkey, o_totalprice, CAST(rn AS INT) AS rn
        |FROM (
        |  SELECT o_orderkey, o_custkey, o_totalprice,
        |         row_number() OVER (ORDER BY o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn > 70 AND rn <= 105
        |ORDER BY rn""".stripMargin),

    Q.sql("w1_page_keyset", w1PageKeyset(_),
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |WHERE o_orderkey > 280
        |ORDER BY o_orderkey
        |LIMIT 35""".stripMargin),

    Q.sql("w2_first_by_order", w2FirstByOrder,
      """SELECT user_id, event_id, event_type
        |FROM (
        |  SELECT user_id, event_id, event_type,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events)
        |WHERE rn = 1
        |ORDER BY user_id""".stripMargin),

    Q.sql("w3_top1", w3Top1,
      """SELECT user_id, event_type AS top_event_type, cnt
        |FROM (
        |  SELECT user_id, event_type, count(*) AS cnt,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY count(*) DESC, event_type ASC) AS rn
        |  FROM events GROUP BY user_id, event_type)
        |WHERE rn = 1
        |ORDER BY user_id""".stripMargin),

    Q.sql("w4_candidate_rank", w4CandidateRank,
      """SELECT user_id, event_id, score
        |FROM (
        |  SELECT user_id, event_id, score,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY score DESC, event_id ASC) AS rn
        |  FROM (
        |    SELECT user_id, event_id,
        |           round(value - 10.0 * row_number() OVER (
        |             PARTITION BY user_id ORDER BY ts, event_id), 2) AS score
        |    FROM events WHERE event_type = 'purchase'))
        |WHERE rn = 1
        |ORDER BY user_id""".stripMargin),

    Q.sql("w5_random_sample", w5RandomSample,
      """SELECT o_orderkey, o_custkey
        |FROM orders
        |ORDER BY md5('w5-seed-42|' || o_orderkey), o_orderkey
        |LIMIT 20""".stripMargin),

    Q.sql("w7_min_by_length", w7MinByLength,
      """SELECT p_brand, p_name AS shortest_name
        |FROM (
        |  SELECT p_brand, p_name,
        |         row_number() OVER (PARTITION BY p_brand
        |                            ORDER BY length(p_name) ASC, p_name ASC) AS rn
        |  FROM part WHERE p_retailprice > 950.0)
        |WHERE rn = 1
        |ORDER BY p_brand""".stripMargin),
  )
}
