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
}
