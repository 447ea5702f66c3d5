package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** S7/S8 — N-Triples scans for the FAST / LCSH authority files (ref
  * `fast.py:22` and `fast.py:145` regexes, `fast.py:62-136` load +
  * consolidated-cache flow). The reference regex-scans gz/zip `.nt`
  * files line by line and materializes a consolidated CSV; here the
  * lines DataFrame comes from `spark.read.text` (which already handles
  * gz) and the materialization is a write-once parquet — columnar, so
  * the "cache" is also predicate/projection-prunable.
  */
object NTriples {

  // Ref fast.py:22 — FAST subject headings.
  val FastTripleRe = """^<http://id\.worldcat\.org/fast/([0-9]+)> <http://schema\.org[#/]name> "([^"]+)""""

  // Ref fast.py:145 — LCSH authoritative labels (@en only).
  val LcshTripleRe = """^<http://id\.loc\.gov/authorities/[a-zA-Z]+/([a-z]+[0-9]+)> <http://www\.loc\.gov/mads/rdf/v1#authoritativeLabel> "([^"]+)"@en"""

  /** Extract (id, name) pairs from FAST N-Triples lines. Lines that
    * don't match the subject-name shape are dropped (the reference
    * ignores them the same way). One narrow pass, fully codegen'd.
    */
  def parseFast(lines: DataFrame, lineCol: String = "value"): DataFrame =
    parseWith(lines, lineCol, FastTripleRe)

  def parseLcsh(lines: DataFrame, lineCol: String = "value"): DataFrame =
    parseWith(lines, lineCol, LcshTripleRe)

  private def parseWith(lines: DataFrame, lineCol: String, re: String): DataFrame =
    lines
      .select(
        regexp_extract(col(lineCol), re, 1).as("id"),
        regexp_extract(col(lineCol), re, 2).as("name"))
      .filter(col("id") =!= "")

  /** Generic triple split for well-formed simple lines:
    * `<subj> <pred> "literal"` or `<subj> <pred> <obj>`. */
  def parseTriples(lines: DataFrame, lineCol: String = "value"): DataFrame = {
    val re = """^<([^>]+)> <([^>]+)> (?:"([^"]*)"[^.]*|<([^>]+)>)\s*\.?\s*$"""
    lines.select(
        regexp_extract(col(lineCol), re, 1).as("subject"),
        regexp_extract(col(lineCol), re, 2).as("predicate"),
        when(regexp_extract(col(lineCol), re, 3) =!= "",
             regexp_extract(col(lineCol), re, 3))
          .otherwise(regexp_extract(col(lineCol), re, 4)).as("object"))
      .filter(col("subject") =!= "")
  }

  /** S8 — write-once consolidated cache (parquet instead of the
    * reference's gzip CSV, `fast.py:106-136`). */
  def writeConsolidated(parsed: DataFrame, path: String): Unit =
    parsed.write.mode("overwrite").parquet(path)

  def readConsolidated(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
