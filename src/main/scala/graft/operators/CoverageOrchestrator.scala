package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** M8 — coverage orchestration (ref `coverage_provider.py:184-354`):
  * the reference resolves each identifier by fanning out to every
  * provider whose `can_cover` matches (identifier type / collection
  * protocol), records per-provider CoverageRecords, and marks the work
  * presentation-ready when at least one provider succeeds.
  *
  * Spark-first inversion: the fan-out is over PROVIDERS, not rows —
  * each provider is one idempotent set-oriented batch job over its
  * applicable identifier set (a filter), and the per-identifier
  * "any success ⇒ work ready" fold is a grouped aggregation. The
  * driver-side loop is over the (small, fixed) provider list only —
  * never over identifiers (SURVEY.md §2.8 M8).
  */
object CoverageOrchestrator {

  /** One provider: name, the identifier types it can cover (ref
    * `can_cover`, `coverage_provider.py:328-354`), and its batch
    * process — a whole-DataFrame transform returning
    * (identifier, success). */
  final case class CoverageProvider(
      name: String,
      inputTypes: Set[String],
      process: DataFrame => DataFrame)

  /** Run every provider over its applicable identifiers; returns the
    * per-(identifier, provider) coverage results —
    * the CoverageRecord rows this round would write. */
  def runProviders(identifiers: DataFrame,
                   providers: Seq[CoverageProvider]): DataFrame =
    providers.map { p =>
      val applicable = identifiers
        .filter(col("identifier_type").isin(p.inputTypes.toSeq: _*))
      p.process(applicable)
        .select(col("identifier"), lit(p.name).as("provider"),
                col("success"))
    }.reduce(_ unionByName _)

  /** Fold coverage results per identifier (ref
    * `coverage_provider.py:304-319`: any success ⇒
    * `calculate_work` + `set_presentation_ready`). */
  def resolutionStatus(results: DataFrame): DataFrame =
    results.groupBy(col("identifier"))
      .agg(
        count(lit(1)).cast("int").as("n_providers"),
        sum(when(col("success"), 1).otherwise(0)).cast("int").as("n_success"),
        max(when(col("success"), 1).otherwise(0) === 1).as("presentation_ready"))
}
