package graft.llmdata

import graft.{SparkSpec, SparkEntry}

/** Invariants of the q189 LSH parameter planner that the oracle gate
  * cannot see: the fixed-point S-curve must behave like the real
  * S-curve (endpoints, monotonicity in s, band/row shape), and the
  * chosen row must be the unique cost argmin.
  */
class PlannerSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  /** Evaluate the unrolled floor-multiply S-curve exactly as the plan
    * renders it, in plain Scala (same floor semantics as BIGINT div). */
  private def curve(sMicro: Long, b: Int, r: Int): Long = {
    def pow(x: Long, n: Int): Long =
      (2 to n).foldLeft(x)((acc, _) => acc * x / 1000000L)
    1000000L - pow(1000000L - pow(sMicro, r), b)
  }

  test("fixed-point S-curve: endpoints exact, monotone in s, band-monotone") {
    val splits = Seq(1 -> 24, 2 -> 12, 3 -> 8, 4 -> 6, 6 -> 4, 8 -> 3,
      12 -> 2, 24 -> 1)
    for ((b, r) <- splits) {
      assert(curve(0L, b, r) == 0L, s"($b,$r) at s=0")
      assert(curve(1000000L, b, r) == 1000000L, s"($b,$r) at s=1")
      val pts = (0 until 20).map(k => curve((2L * k + 1) * 25000L, b, r))
      assert(pts.zip(pts.tail).forall { case (a, c) => a <= c },
        s"($b,$r) not monotone in s: $pts")
    }
    // at fixed s, more bands (fewer rows) always admits more candidates:
    // the family is ordered, so the planner's FP/FN trade is real
    val mid = splits.map { case (b, r) => curve(500000L, b, r) }
    assert(mid.zip(mid.tail).forall { case (a, c) => a <= c },
      s"band-monotonicity broken at s=0.5: $mid")
  }

  test("q189: chosen row is the unique cost argmin; extremes trade FP for FN") {
    val rows = SparkEntry.queries("q189_lsh_parameter_plan")(spark, sf)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getInt(5)))
    assert(rows.length == 8)
    rows.foreach { case (_, _, fp, fn, cost, _) =>
      assert(cost == fp + fn && fp >= 0 && fn >= 0)
    }
    val chosen = rows.filter(_._6 == 1)
    assert(chosen.length == 1)
    val minCost = rows.map(_._5).min
    assert(chosen.head._5 == minCost)
    // deterministic tie-break: no lower-band row at the same cost
    assert(rows.filter(_._5 == minCost).map(_._1).min == chosen.head._1)
    // the grid's extremes behave like the S-curve says: the most-bands
    // split admits the most (max FP, min FN), the most-rows split the
    // least (min FP, max FN)
    val byBands = rows.sortBy(_._1)
    assert(byBands.last._3 == rows.map(_._3).max) // b=24: max FP
    assert(byBands.last._4 == rows.map(_._4).min) // b=24: min FN
    assert(byBands.head._3 == rows.map(_._3).min) // b=1: min FP
    assert(byBands.head._4 == rows.map(_._4).max) // b=1: max FN
  }
}
