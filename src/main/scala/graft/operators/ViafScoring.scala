package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** M2/M3 — the VIAF cluster scorer and popularity override (ref
  * `viaf.py:144-231` weigh_contributor, `viaf.py:393-450`
  * order_candidates). The reference scores each candidate cluster with
  * a weighted evidence sum and re-sorts; here the whole candidate set
  * is scored in one vectorized pass (pure Column arithmetic — exactly
  * the "single vectorizable arithmetic expression" SURVEY.md §2.8 M2
  * calls for) and the per-request winner comes from one rank window.
  */
object ViafScoring {

  /** Evidence weights (ref `viaf.py:183-214`). */
  val SortNameWeight = 2.0
  val DisplayNameWeight = 0.5
  val UnimarcWeight = 0.3
  val GuessedSortWeight = 0.5
  val AlternateWeight = 0.2
  val PopularityPenalty = -10.0
  val DataQualityBonus = 0.2
  val AcceptThreshold = 70.0 // ref viaf.py:821-824

  /** M2 — the evidence sum. Null evidence contributes nothing; strict
    * mode zeroes the score when the sort-name match is below the
    * "sure match" bar of 90 (ref `viaf.py:189-194`).
    */
  def weigh(sortNameMatch: Column, displayNameMatch: Column,
            unimarcMatch: Column, guessedSortMatch: Column,
            alternateMatch: Column, libraryPopularity: Column,
            hasDisplayName: Column, hasViaf: Column, titleEvidence: Column,
            strict: Boolean = false,
            ignorePopularity: Column = lit(false)): Column = {
    def z(c: Column): Column = coalesce(c.cast("double"), lit(0.0))
    val total =
      when(ignorePopularity || libraryPopularity.isNull, 0.0)
        .otherwise(lit(PopularityPenalty) * libraryPopularity) +
      z(sortNameMatch) * SortNameWeight +
      z(displayNameMatch) * DisplayNameWeight +
      z(unimarcMatch) * UnimarcWeight +
      z(guessedSortMatch) * GuessedSortWeight +
      z(alternateMatch) * AlternateWeight +
      when(hasDisplayName, DataQualityBonus).otherwise(0.0) +
      when(hasViaf, DataQualityBonus).otherwise(0.0) +
      z(titleEvidence)
    if (strict)
      when(sortNameMatch.isNotNull && sortNameMatch < 90, 0.0).otherwise(total)
    else total
  }

  /** The title-evidence term of M2 (ref `viaf.py:235-273` weigh_titles):
    * for each known title, the FIRST contributor title (cluster
    * document order) that matches contributes — 0.8·90 for an
    * unfluffed periods-insensitive exact match, else 0.6·ratio when the
    * plain title ratio exceeds 80 — and contributions ACCUMULATE across
    * known titles (the reference's outer loop keeps scanning). Strict
    * mode instead stops entirely at the first exact membership hit
    * (0.8·100), matching the reference's outer-loop break.
    */
  def weighTitles(knownTitles: Seq[String], contributorTitles: Seq[String],
                  strict: Boolean = false): Double = {
    import graft.functions.{Fuzzy, TextNorm}
    if (knownTitles == null || contributorTitles == null) return 0.0
    // accumulate integer TENTHS (0.8·90 → 720, 0.6·r → 6r): every
    // contribution has one decimal digit, so the single final division
    // is exactly reproducible across engines (oracle float-equality)
    var tenths = 0L
    var stop = false
    knownTitles.foreach { kt =>
      if (!stop && kt != null) {
        if (strict) {
          if (contributorTitles.contains(kt)) { tenths += 800L; stop = true }
        } else {
          val ktUnfluffed = TextNorm.unfluffTitle(kt)
          var done = false
          contributorTitles.foreach { ct =>
            if (!done && ct != null) {
              if (Fuzzy.nameMatches(TextNorm.unfluffTitle(ct), ktUnfluffed)) {
                tenths += 720L; done = true
              } else {
                val r = Fuzzy.titleMatchRatio(kt, ct)
                if (r > 80) { tenths += 6L * r; done = true }
              }
            }
          }
        }
      }
    }
    tenths / 10.0
  }

  /** M3 — per-request popularity override (ref `viaf.py:416-440`): when
    * the MOST popular candidate (library_popularity = 1) is a bad name
    * match (sort/guessed < 50, or neither present), popularity is
    * ignored for the WHOLE request. Computed as a window flag broadcast
    * from the rank-1 row to its group.
    */
  def ignorePopularityFlag(requestCol: Column, libraryPopularity: Column,
                           sortNameMatch: Column,
                           guessedSortMatch: Column): Column = {
    val w = Window.partitionBy(requestCol)
      .orderBy(libraryPopularity.asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val topBad =
      (sortNameMatch.isNotNull && sortNameMatch < 50) ||
      (guessedSortMatch.isNotNull && guessedSortMatch < 50) ||
      (sortNameMatch.isNull && guessedSortMatch.isNull)
    first(when(libraryPopularity === 1, topBad), ignoreNulls = true).over(w)
  }

  /** Score a candidate frame and pick the per-request winner
    * (score desc, popularity asc tie-break), keeping only accepted
    * scores (≥ 70). Expected columns: request_id, candidate_id,
    * library_popularity (1-based encounter order), sort_name_match,
    * guessed_sort_match, has_display_name, has_viaf, title_evidence;
    * optional evidence columns display_name_match / unimarc_match /
    * alternate_match are scored when present (null-weight otherwise).
    */
  def rankCandidates(candidates: DataFrame, strict: Boolean = false): DataFrame = {
    def opt(name: String): Column =
      if (candidates.columns.contains(name)) col(name) else lit(null)
    val ignorePop = ignorePopularityFlag(col("request_id"),
      col("library_popularity"), col("sort_name_match"),
      col("guessed_sort_match"))
    val scored = candidates
      .withColumn("ignore_pop", coalesce(ignorePop, lit(false)))
      .withColumn("score", round(weigh(
        col("sort_name_match"), opt("display_name_match"), opt("unimarc_match"),
        col("guessed_sort_match"), opt("alternate_match"), col("library_popularity"),
        col("has_display_name"), col("has_viaf"), col("title_evidence"),
        strict, col("ignore_pop")), 2))
    val w = Window.partitionBy(col("request_id"))
      .orderBy(col("score").desc, col("library_popularity").asc)
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("score") >= AcceptThreshold)
      .select(col("request_id"), col("candidate_id"), col("score"),
              col("ignore_pop"))
  }
}
