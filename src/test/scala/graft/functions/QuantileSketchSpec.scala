package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Lossy-regime contract of the compactor-stack quantile sketch —
  * q86's oracle only exercises the exact regime (capacity ≥ n), so
  * the sketch guarantees are pinned here, engine-free (the state
  * transitions are pure functions). */
class QuantileSketchSpec extends AnyFunSuite {
  import QuantileSketch._

  private def build(xs: Seq[Double], cap: Int): QState =
    xs.foldLeft(empty)((s, x) => insert(s, x, cap))

  /** True rank-lower discrete quantile (DuckDB's quantile_disc). */
  private def exactQ(xs: Seq[Double], q: Double): Double = {
    val sorted = xs.sorted
    sorted((math.max(1L, math.ceil(q * xs.size).toLong) - 1).toInt)
  }

  private def rankOf(xs: Seq[Double], v: Double): Long =
    xs.count(_ <= v).toLong

  test("exact regime: capacity ≥ n reproduces quantile_disc through any merge tree") {
    val cap = 256
    val xs = (1 to 200).map(i => ((i * 7919) % 211).toDouble)
    val whole = build(xs, cap)
    for (q <- Seq(0.01, 0.1, 0.5, 0.9, 0.99)) {
      assert(quantiles(whole, Seq(q)).head === exactQ(xs, q))
    }
    for (cut <- Seq(1, 67, 199)) {
      val (l, r) = xs.splitAt(cut)
      val merged = mergeStates(build(l, cap), build(r, cap), cap)
      assert(quantiles(merged, Seq(0.5)).head === exactQ(xs, 0.5),
        s"merge at $cut diverged")
      assert(count(merged) === 200L)
    }
  }

  test("lossy regime: rank error ≤ levels·n/capacity, weight conserved") {
    val cap = 64
    val n = 20000
    val xs = (0 until n).map(i => ((i * 104729) % 99991).toDouble)
    val s = build(xs, cap)
    assert(count(s) === n.toLong)
    val levels = s.levels.length
    val bound = levels.toLong * n / cap
    for (q <- Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val est = quantiles(s, Seq(q)).head
      val target = math.ceil(q * n).toLong
      val err = math.abs(rankOf(xs, est) - target)
      assert(err <= bound,
        s"q=$q: rank error $err exceeds levels·n/c = $bound")
    }
    // memory bound: every level holds < 2·capacity items mid-flight
    assert(s.levels.forall(_.length < 2 * cap))
  }

  test("lossy regime: the bound survives adversarial merge trees") {
    val cap = 64
    val n = 16384
    val xs = (0 until n).map(i => ((i * 31337) % 65537).toDouble)
    // pathological tree: merge in chunks of 100, left-deep
    val chunked = xs.grouped(100).map(c => build(c, cap))
      .reduce((a, b) => mergeStates(a, b, cap))
    assert(count(chunked) === n.toLong)
    val bound = chunked.levels.length.toLong * n / cap
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val est = quantiles(chunked, Seq(q)).head
      val err = math.abs(rankOf(xs, est) - math.ceil(q * n).toLong)
      assert(err <= bound, s"q=$q under chunked merges: err $err > $bound")
    }
  }

  test("weight is conserved through odd-length compactions (merge concatenation shapes)") {
    val cap = 64
    // merge level-0 lengths 63 + 2 → 65 items at the level: an odd
    // compaction must leave one item behind, never promote ceil(65/2)
    val a = build((1 to 63).map(_.toDouble), cap)
    val b = build(Seq(1000.0, 2000.0), cap)
    val m = mergeStates(a, b, cap)
    assert(count(m) === 65L)
    // boundary: exactly n == capacity stays in the exact regime
    val full = build((1 to cap).map(_.toDouble), cap)
    assert(full.levels(0).length === cap, "no compaction at n == capacity")
    assert(quantiles(full, Seq(0.5)).head === exactQ((1 to cap).map(_.toDouble), 0.5))
    // odd capacity: repeated sequential inserts also conserve weight
    val odd = build((1 to 500).map(_.toDouble), 65)
    assert(count(odd) === 500L)
  }

  test("determinism: identical input and merge tree give bit-identical states") {
    val cap = 32
    val xs = (0 until 5000).map(i => ((i * 48611) % 7919).toDouble)
    val a = build(xs, cap)
    val b = build(xs, cap)
    assert(a === b)
    // estimates are always elements of the input, never interpolated
    val est = quantiles(a, Seq(0.1, 0.5, 0.9))
    assert(est.forall(xs.contains))
  }
}
