package graft

import org.apache.spark.sql.DataFrame

/** One verifiable query: a name, the Spark implementation, and (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle query
  * over the same parquet tables. `oracle = None` → the driver records a
  * weaker rows-only check.
  *
  * Contract notes (driver compare):
  *  - column names must match between Spark result and oracle exactly;
  *  - results must be deterministically ordered in BOTH (the compare may
  *    be order-sensitive), so every query ends with ORDER BY on a unique
  *    key or on all output columns;
  *  - integer aggregates in DuckDB (sum over INT → HUGEINT) are CAST to
  *    BIGINT in the oracle to match Spark's long.
  */
final case class Q(name: String, run: Env => DataFrame, oracle: Option[String] = None)

object Q {
  def sql(name: String, run: Env => DataFrame, oracle: String): Q =
    Q(name, run, Some(oracle))

  /** The four bit-rot rows [[graft.operators.IndexCommit.checksumCard]]
    * appends to every family fsck card, as oracle SQL UNION ALL
    * branches (all-zero on an uncorrupted index by construction —
    * the constructive part of those invariants is the stamps
    * themselves, re-hashed engine-side). Interpolate inside an
    * `s\"\"\"...\"\"\".stripMargin` oracle right before the closing
    * paren of the row union. */
  val fsckRotRows: String =
    """  UNION ALL SELECT 'segment_checksum_mismatches', CAST(0 AS BIGINT),
      |         CAST(0 AS BIGINT), TRUE
      |  UNION ALL SELECT 'segment_files_missing', CAST(0 AS BIGINT),
      |         CAST(0 AS BIGINT), TRUE
      |  UNION ALL SELECT 'segment_files_unstamped', CAST(0 AS BIGINT),
      |         CAST(0 AS BIGINT), TRUE
      |  UNION ALL SELECT 'segment_length_mismatches', CAST(0 AS BIGINT),
      |         CAST(0 AS BIGINT), TRUE""".stripMargin
}
