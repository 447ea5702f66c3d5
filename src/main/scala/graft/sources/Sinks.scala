package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** S11 — report sinks (ref `scripts.py:374-416` CSV dashboards,
  * `monitor.py:100-155` kids-without-age-range report). Thin,
  * convention-setting wrappers: headered CSV for human reports, and
  * parquet for anything a downstream job reads (columnar, prunable —
  * the S8 consolidated-cache convention).
  */
object Sinks {

  /** Human-facing CSV report: single header, gzip, overwrite. The
    * `coalesce(1)` mirrors the reference's one-file reports and is
    * intentionally NOT for big outputs — large extracts use
    * `writeParquet` with natural partitioning. */
  def writeCsvReport(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode(SaveMode.Overwrite)
      .option("header", "true")
      .option("compression", "gzip")
      .csv(path)

  def readCsvReport(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** Machine-facing materialization (S8 pattern). */
  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)
}
