package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, rand}

/** Physical-plan steering helpers. */
object PlanHints {

  /** Nondeterministic ZERO (`rand * 0.0` — exactly +0.0 for rand ∈
    * [0,1)): adding it to a comparison bound makes the whole predicate
    * nondeterministic WITHOUT being splittable, so it cannot move.
    *
    * Why: a filter whose predicate references BOTH sides of a join gets
    * pushed into the join's non-equi condition, where it is evaluated
    * per matched pair OUTSIDE whole-stage codegen (interpreted
    * Predicate). For expensive predicates (levenshtein, array
    * intersections) that costs 10–30µs/row vs <1µs as a codegen'd
    * Filter above the join — measured on the blocked similarity joins.
    * A conjunction with a nondeterministic tautology does NOT work:
    * Catalyst splits conjuncts and pushes the deterministic half. The
    * bound perturbation is unsplittable.
    */
  def ndZero: Column = rand(7) * lit(0.0)

  /** `value >= threshold`, pinned in place (see [[ndZero]]). */
  def geqNonPushable(value: Column, threshold: Double): Column =
    value >= lit(threshold) + ndZero

  /** `value > threshold`, pinned in place (see [[ndZero]]). */
  def gtNonPushable(value: Column, threshold: Double): Column =
    value > lit(threshold) + ndZero

  /** Attach a one-row aggregate (corpus totals, thresholds) to every
    * row of `df` as a BROADCAST HASH join on a constant key instead of
    * `crossJoin(broadcast(...))`: the cross join plans as
    * BroadcastNestedLoopJoin, which BREAKS the whole-stage-codegen
    * span around it, while the constant-key hash join (one probe into
    * a one-row hash relation) stays fully codegen'd — measured
    * identical semantics, strictly better plan shape on large `df`.
    */
  def withScalars(df: org.apache.spark.sql.DataFrame,
                  scalars: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val k = "_scalar_k"
    require(!df.columns.contains(k) && !scalars.columns.contains(k),
      s"reserved column $k present")
    // the key must be column-DERIVED and not algebraically reducible
    // (pmod(hash(col), 1) ≡ 0) — a literal key constant-folds (and
    // hash·0 arithmetic-simplifies), the join condition becomes
    // trivially true, and Catalyst re-plans the cross join this
    // exists to avoid. The hashed column must itself be hashable
    // (hash() rejects MapType/VariantType) — pick the first such
    // column per frame; a frame with no hashable column falls back to
    // the plain cross join rather than failing analysis.
    def hashableCol(d: org.apache.spark.sql.DataFrame): Option[String] = {
      import org.apache.spark.sql.types._
      def ok(t: DataType): Boolean = t match {
        case _: MapType | _: VariantType => false
        case s: StructType => s.fields.forall(f => ok(f.dataType))
        case a: ArrayType => ok(a.elementType)
        case _ => true
      }
      d.schema.fields.find(f => ok(f.dataType)).map(_.name)
    }
    (hashableCol(df), hashableCol(scalars)) match {
      case (Some(dc), Some(sc)) =>
        def zeroKey(d: org.apache.spark.sql.DataFrame, c: String) =
          d.withColumn(k, org.apache.spark.sql.functions.pmod(
            org.apache.spark.sql.functions.hash(d(c)), lit(1)))
        zeroKey(df, dc)
          .join(org.apache.spark.sql.functions.broadcast(
            zeroKey(scalars, sc)), k)
          .drop(k)
      case _ =>
        df.crossJoin(org.apache.spark.sql.functions.broadcast(scalars))
    }
  }
}
