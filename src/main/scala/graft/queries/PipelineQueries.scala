package graft.queries

import graft.{Env, Q}
import graft.syntax._
import graft.operators.{CoverageOrchestrator, MetadataMerge}
import graft.operators.CoverageOrchestrator.CoverageProvider
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end wrangler flow (SURVEY.md §3.1/§3.2) as ONE composed
  * plan — identifiers register for coverage, a provider resolves them
  * against a snapshot source, resolved metadata merges onto editions,
  * each work pool elects its presentation edition, and the result is
  * served as a feed page with an opensearch total. Every stage is the
  * operator verified individually elsewhere (M8 → M1 → M6 → T2); this
  * query proves they compose into a single lazy DataFrame program with
  * no driver-side materialization between stages.
  */
object PipelineQueries {

  def pipelineResolve(env: Env): DataFrame = {
    // 1. Identifier batch (ref §3.1 step 3: parse + register).
    val identifiers = env.customer.select(
      $"c_custkey".as("key"),
      $"c_custkey".cast("string").as("identifier"),
      lit("isbn").as("identifier_type"))

    // 2. Coverage fan-out (M8): the classify provider succeeds for
    //    keys not divisible by 3.
    val providers = Seq(
      CoverageProvider("classify", Set("isbn"),
        df => df.select($"identifier", ($"key" % 3 =!= 0).as("success"))))
    val coverage = CoverageOrchestrator.resolutionStatus(
      CoverageOrchestrator.runProviders(identifiers, providers))

    // 3. Snapshot-source metadata for successful resolutions → merge
    //    onto stub editions (M1 shape: coalesce fills the null title).
    val editions = identifiers
      .join(coverage.filter($"presentation_ready"), Seq("identifier"))
      .select($"key", $"identifier",
        concat(lit("T"), $"key").as("title"),
        when($"key" % 7 =!= 0, concat(lit("A"), $"key")).as("author"))

    // 4. Presentation election per work pool (M6): authored beats
    //    titled-only, lowest key wins ties.
    val elected = MetadataMerge.electPresentationEdition(
        editions.select(($"key" % 50).as("pool_id"), $"key".as("editionId"),
                        $"title", $"author"))

    // 5. Feed page with broadcast total (T2/S10 shape).
    val total = elected.agg(count(lit(1)).as("total_results"))
    graft.operators.PlanHints.withScalars(elected, total)
      .select($"pool_id", $"editionId", $"title", $"author", $"total_results")
      .orderBy($"pool_id")
      .limit(25)
  }

  val entries: Seq[Q] = Seq(
    Q.sql("pipeline_resolve", pipelineResolve,
      """WITH resolved AS (
        |  SELECT c_custkey AS key FROM customer WHERE c_custkey % 3 <> 0),
        |editions AS (
        |  SELECT key, key % 50 AS pool_id,
        |         'T' || key AS title,
        |         CASE WHEN key % 7 <> 0 THEN 'A' || key END AS author
        |  FROM resolved),
        |elected AS (
        |  SELECT pool_id, key AS editionId, title, author,
        |         row_number() OVER (PARTITION BY pool_id ORDER BY
        |           CASE WHEN author IS NOT NULL THEN 1 ELSE 0 END DESC,
        |           1 DESC, key ASC) AS rn
        |  FROM editions)
        |SELECT pool_id, editionId, title, author,
        |       (SELECT count(*) FROM elected WHERE rn = 1) AS total_results
        |FROM elected WHERE rn = 1
        |ORDER BY pool_id
        |LIMIT 25""".stripMargin),
  )
}
