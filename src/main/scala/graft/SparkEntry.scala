package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates the per-module registries; each module contributes `Seq[Q]`
  * (Spark impl + DuckDB oracle), see `graft.Q`.
  */
object SparkEntry {

  private def registry: Seq[Q] =
    _root_.graft.queries.RelationalRegistry.entries ++
    _root_.graft.queries.Windows.entries ++
    _root_.graft.queries.Aggregates.entries ++
    _root_.graft.queries.Functions.entries ++
    _root_.graft.queries.Graph.entries ++
    _root_.graft.queries.DedupQueries.entries ++
    _root_.graft.queries.AnnQueries.entries ++
    _root_.graft.queries.TextQueries.entries ++
    _root_.graft.queries.MergeQueries.entries ++
    _root_.graft.queries.SourceQueries.entries ++
    _root_.graft.queries.MultimodalQueries.entries ++
    _root_.graft.queries.OrchestrationQueries.entries ++
    _root_.graft.queries.GapQueries.entries ++
    _root_.graft.queries.ScoringQueries.entries ++
    _root_.graft.queries.SourceQueries2.entries ++
    _root_.graft.queries.LookupQueries.entries ++
    _root_.graft.queries.PipelineQueries.entries ++
    _root_.graft.queries.SnapshotQueries.entries ++
    _root_.graft.queries.StreamQueries.entries ++
    _root_.graft.queries.CorpusQueries.entries ++
    _root_.graft.queries.ComplaintQueries.entries ++
    _root_.graft.queries.SubstringQueries.entries ++
    _root_.graft.queries.UnigramQueries.entries ++
    _root_.graft.queries.NbQueries.entries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    _root_.graft.queries.Relational.j2Multiway(Env(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name ->
      ((s: SparkSession, dir: String) => q.run(Env(s, dir)))).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
