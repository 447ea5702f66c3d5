package graft.operators

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** M7 — the author-name canonicalization cascade (ref
  * `canonicalize.py:88-193`): a chain of resolution stages where each
  * stage only computes rows the previous stages left unresolved, and
  * the final answer is the first non-null through the chain.
  *
  * Stages here (the in-database subset of the reference's five —
  * external-service stages become snapshot-table joins with the same
  * shape):
  *  1. exact display-name match against the contributors table
  *     (`canonicalize.py:195-246`);
  *  2. blocked fuzzy match ≥ 60 — best ratio, then shortest, then
  *     lexicographic (ref threshold `canonicalize.py:320-321`; the
  *     reference picks the shortest >60 candidate, we add the
  *     deterministic ratio/name tie-breaks a distributed run needs);
  *  3. heuristic display→sort conversion fallback
  *     (`canonicalize.py:126-129`).
  *
  * Set-oriented: the whole cascade is left joins + one window — no
  * per-request loop, and stage 2's candidate space is bounded by the
  * blocking key, never a full cross join.
  */
object Canonicalize {

  /** @param requests     (request_id, display_name)
    * @param contributors (display_name, sort_name)
    * @param blockKey     blocking expression over a display-name column
    *                     — stage 2 only compares names in equal blocks.
    */
  def canonicalizeSortNames(requests: DataFrame, contributors: DataFrame,
                            blockKey: Column => Column,
                            fuzzyThreshold: Int = 60): DataFrame = {
    // Deterministic contributor view: one row per display_name
    // (min sort_name) — otherwise a duplicated display name fans each
    // matching request out to several stage-1 rows while stage 2's
    // window picks exactly one.
    val canon = contributors
      .groupBy(col("display_name"))
      .agg(min(col("sort_name")).as("sort_name"))

    // Stage 1: exact
    val exact = requests
      .join(canon.select(col("display_name"),
              col("sort_name").as("exact_sort")),
            Seq("display_name"), "left")

    // Stage 2: blocked fuzzy, only where stage 1 missed
    val unresolved = exact.filter(col("exact_sort").isNull)
      .select(col("request_id"), col("display_name"),
              blockKey(col("display_name")).as("blk"))
    val cands = canon.select(
      col("display_name").as("cand_name"), col("sort_name").as("cand_sort"),
      blockKey(col("display_name")).as("blk"))
    val ratio = graft.functions.ColumnFunctions.levenshteinRatio(
      col("display_name"), col("cand_name"))
    val w = Window.partitionBy(col("request_id"))
      .orderBy(col("ratio").desc, length(col("cand_name")).asc, col("cand_name").asc)
    val fuzzy = unresolved.join(cands, Seq("blk"))
      .withColumn("ratio", ratio)
      .filter(col("ratio") >= fuzzyThreshold)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("request_id"), col("cand_sort").as("fuzzy_sort"))

    // Stage 3: heuristic fallback + first-non-null through the chain
    exact
      .join(fuzzy, Seq("request_id"), "left")
      .select(col("request_id"), col("display_name"),
        coalesce(col("exact_sort"), col("fuzzy_sort"),
                 GraftFunctions.displayToSort(col("display_name"))).as("sort_name"),
        when(col("exact_sort").isNotNull, "exact")
          .when(col("fuzzy_sort").isNotNull, "fuzzy")
          .otherwise("heuristic").as("method"))
  }
}
