package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving for multi-dimensional data layout —
  * the OPTIMIZE ZORDER story: sorting a table by the interleaved code
  * of two scan keys clusters rows so min/max file statistics prune on
  * BOTH dimensions, where a lexicographic sort prunes only the
  * leading one. At 100 TB the code feeds a range-partitioned write;
  * here it is a pure Column expression (bit ops only — codegen'd,
  * engine-portable, and exactly replayable in SQL with `>> & << |`).
  *
  * Bit i of `a` lands at even position 2i, bit i of `b` at odd 2i+1,
  * so 21-bit inputs fill 42 bits — ordering-compatible with BIGINT in
  * both engines. Inputs must already be in [0, 2^bits): the operator
  * RAISES on out-of-range input rather than silently wrapping (mask
  * upstream — `id & (2^bits − 1)` — if collision-as-locality is
  * acceptable, as it is for layout keys).
  */
object ZOrder {

  def zorderCode(a: Column, b: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 31, s"ZOrder: bits must be in [1,31], got $bits")
    val lim = 1L << bits
    def guard(c: Column): Column =
      when(c.isNull || c < 0 || c >= lim,
        raise_error(concat(lit(s"ZOrder: input outside [0, $lim): "),
          c.cast("string"))))
        .otherwise(c.cast("long"))
    val ga = guard(a)
    val gb = guard(b)
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(ga, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftrightunsigned(gb, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** The same interleave as a SQL expression string over column
    * references `a` and `b` — for oracle construction. */
  def zorderSql(a: String, b: String, bits: Int = 21): String =
    (0 until bits).map { i =>
      s"((($a >> $i) & 1) << ${2 * i}) | ((($b >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")
}
