package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-expression counterparts of the scalar layer — shared so the
  * similarity formula lives in exactly one place (used by the blocked
  * fuzzy joins and the canonicalization cascade, and mirrored by their
  * DuckDB oracles).
  */
object ColumnFunctions {

  /** Levenshtein similarity ratio 0–100 on the codegen'd builtin
    * (the Column twin of [[Fuzzy.ratio]]). */
  def levenshteinRatio(a: Column, b: Column): Column =
    round(lit(100.0) *
      (lit(1.0) - levenshtein(a, b).cast("double") /
        greatest(length(a), length(b)))).cast("int")
}
