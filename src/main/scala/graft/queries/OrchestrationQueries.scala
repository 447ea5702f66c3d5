package graft.queries

import graft.{Env, Q}
import graft.syntax._
import graft.operators.CoverageOrchestrator
import graft.operators.CoverageOrchestrator.CoverageProvider
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** M8 through the driver contract: a three-provider coverage DAG over
  * identifiers synthesized from customers — provider applicability by
  * identifier type, deterministic per-provider success, any-success ⇒
  * presentation-ready. Oracle computes the same outcome constructively.
  */
object OrchestrationQueries {

  def m8CoverageDag(env: Env): DataFrame = {
    val identifiers = env.customer.select(
      $"c_custkey".cast("string").as("identifier"),
      when($"c_custkey" % 2 === 0, "isbn").otherwise("overdrive")
        .as("identifier_type"),
      $"c_custkey".as("key"))
    val providers = Seq(
      CoverageProvider("oclc_classify", Set("isbn"),
        df => df.select($"identifier", ($"key" % 3 =!= 0).as("success"))),
      CoverageProvider("viaf", Set("isbn", "overdrive"),
        df => df.select($"identifier", ($"key" % 5 =!= 0).as("success"))),
      CoverageProvider("overdrive", Set("overdrive"),
        df => df.select($"identifier", lit(true).as("success"))))
    val results = CoverageOrchestrator.runProviders(identifiers, providers)
    CoverageOrchestrator.resolutionStatus(results)
      .withColumn("identifier", $"identifier".cast("long"))
      .orderBy($"identifier")
  }

  val entries: Seq[Q] = Seq(
    Q.sql("m8_coverage_dag", m8CoverageDag,
      """SELECT c_custkey AS identifier,
        |  CAST(CASE WHEN c_custkey % 2 = 0 THEN 2 ELSE 2 END AS INT)
        |    AS n_providers,
        |  CAST(CASE WHEN c_custkey % 2 = 0
        |       THEN (CASE WHEN c_custkey % 3 <> 0 THEN 1 ELSE 0 END)
        |          + (CASE WHEN c_custkey % 5 <> 0 THEN 1 ELSE 0 END)
        |       ELSE (CASE WHEN c_custkey % 5 <> 0 THEN 1 ELSE 0 END) + 1
        |       END AS INT) AS n_success,
        |  CASE WHEN c_custkey % 2 = 0
        |       THEN (c_custkey % 3 <> 0 OR c_custkey % 5 <> 0)
        |       ELSE TRUE END AS presentation_ready
        |FROM customer
        |ORDER BY identifier""".stripMargin),
  )
}
