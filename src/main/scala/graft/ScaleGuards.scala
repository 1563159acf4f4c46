package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{assert_true, expr, lit, when}

/** In-plan magnitude guards — the round-9 rule that a documented-only
  * scale envelope is not an envelope: every integer-exact query whose
  * BIGINT arithmetic has a magnitude regime asserts that regime in the
  * plan itself (the q145/q116 pattern), so a 100× scale-up fails
  * LOUDLY at the exact row that would have overflowed instead of
  * silently wrapping into a plausible wrong answer.
  *
  * The guards live here (not inline) so ONE spec exercises the exact
  * production expressions at both sides of each bound with synthetic
  * count frames — tripping a 2^63 envelope with real data would need
  * ~10^12 rows, so the testable unit is the guard expression over the
  * exact counts it reads.
  */
object ScaleGuards {

  /** `a·b ≤ bound` for nonnegative BIGINT columns, computed overflow-
    * free: b ≤ bound div a ⟺ a·b ≤ bound for a > 0 (integer floor
    * division), zero short-circuits. Stays in integer arithmetic —
    * a double-division rewrite would be 1-ulp-wrong exactly at the
    * boundary this exists to police.
    *
    * NULL inputs PASS: a global aggregate over zero rows yields NULL
    * counts, and an empty corpus is trivially within every magnitude
    * regime — without the coalesce, `assert_true(NULL)` would RAISE
    * the overflow message on a 0-row input where the query (and its
    * oracle) must emit its NULL degenerate row instead. */
  def productWithin(a: String, b: String, bound: Long): Column = {
    require(bound > 0, "bound must be positive")
    expr(s"coalesce($a = 0 OR $b = 0 OR $b <= ${bound}L div $a, true)")
  }

  /** The q145 guard shape: `value` passes through when `cond` holds,
    * the query FAILS with `msg` when it does not (assert_true returns
    * null on success, raises on failure — the `when` keeps the plan
    * type-stable). */
  def guarded(cond: Column, msg: String, value: Column): Column =
    when(assert_true(cond, lit(msg)).isNull, value)
}
