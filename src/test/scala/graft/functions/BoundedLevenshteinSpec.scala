package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based contract of the banded bounded edit distance: for
  * EVERY string pair and bound, lev_bounded(a, b, k) must equal
  * min(levenshtein(a, b), k+1) — the band and its early exits are an
  * optimization, never a semantics change.
  */
object BoundedLevenshteinProps extends Properties("BoundedLevenshtein") {

  private def u(s: String) = UTF8String.fromString(s)

  /** Reference full-matrix DP. */
  private def full(a: String, b: String): Int = {
    val m = a.length; val n = b.length
    val dp = Array.tabulate(m + 1, n + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to m; j <- 1 to n) {
      val cost = if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + cost)
    }
    dp(m)(n)
  }

  private val word = Gen.choose(0, 12).flatMap(n =>
    Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString))
  private val bound = Gen.choose(0, 6)

  property("equals min(full DP, k+1) for every pair and bound") =
    forAll(word, word, bound) { (a: String, b: String, k: Int) =>
      BoundedLevenshtein.dist(u(a), u(b), k) == math.min(full(a, b), k + 1)
    }

  property("negative bound clamps to the k=0 equality test") =
    forAll(word, word) { (a: String, b: String) =>
      BoundedLevenshtein.dist(u(a), u(b), -5) ==
        (if (a == b) 0 else 1)
    }

  // non-ASCII alphabet: exercises the toString fallback path AND the
  // pre-materialization byte-gap exit with 2-byte (é) and 3-byte (λ̄…)
  // sequences, against the same UTF-16-unit reference DP
  private val wideWord = Gen.choose(0, 12).flatMap(n =>
    Gen.listOfN(n, Gen.oneOf('a', 'é', 'λ', '中')).map(_.mkString))

  property("non-ASCII pairs match the reference over UTF-16 units") =
    forAll(wideWord, wideWord, bound) { (a: String, b: String, k: Int) =>
      BoundedLevenshtein.dist(u(a), u(b), k) == math.min(full(a, b), k + 1)
    }

  property("mixed ASCII/non-ASCII pairs (one per path) agree") =
    forAll(word, wideWord, bound) { (a: String, b: String, k: Int) =>
      BoundedLevenshtein.dist(u(a), u(b), k) == math.min(full(a, b), k + 1) &&
        BoundedLevenshtein.dist(u(b), u(a), k) == math.min(full(b, a), k + 1)
    }
}

/** Sentinel/early-exit behavior + the whole-stage-codegen SQL route. */
class BoundedLevenshteinSpec extends graft.SparkSpec {
  private def u(s: String) = UTF8String.fromString(s)

  test("distant long strings return the sentinel without full DP cost") {
    // 100k-char strings: the full matrix is 10^10 cells; the length
    // gap alone must answer instantly
    val a = "a" * 100000
    val b = "b" * 99000
    val t0 = System.nanoTime()
    assert(BoundedLevenshtein.dist(u(a), u(b), 3) == 4)
    // equal-length all-different: the first row's band exceeds the
    // bound and the scan stops after O(k·1) rows
    assert(BoundedLevenshtein.dist(u(a), u("b" * 100000), 3) == 4)
    assert((System.nanoTime() - t0) / 1e9 < 1.0,
      "banded early exit must not touch the O(m·n) matrix")
  }

  test("SQL form participates in codegen and matches the built-in") {
    val sp = spark
    import sp.implicits._
    graft.GraftExtensions.register(sp)
    val df = Seq(("small ring", "small rig"), ("red widget", "blue pen"),
      ("hot rod", "hot rod")).toDF("a", "b")
    val rows = df.selectExpr("a", "b", "lev_bounded(a, b, 3) AS d",
      "levenshtein(a, b) AS ref").collect()
    rows.foreach { r =>
      val d = r.getInt(2); val ref = r.getInt(3)
      assert(d == math.min(ref, 4), s"${r.getString(0)} vs ${r.getString(1)}")
    }
    // null propagation
    val n = sp.sql("SELECT lev_bounded(CAST(NULL AS STRING), 'x', 2)")
      .collect()(0)
    assert(n.isNullAt(0))
  }

  test("non-integral bound fails analysis, not silently NULL at runtime") {
    val sp = spark
    graft.GraftExtensions.register(sp)
    // round-7 advice: an unconditional Cast let a string bound pass
    // analysis and return NULL per-row; it must fail like the built-in
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      sp.sql("SELECT lev_bounded('a', 'b', 'abc')").collect()
    }
    assert(err.getMessage.toLowerCase.contains("lev_bounded"))
    // integral widths still widen fine
    assert(sp.sql("SELECT lev_bounded('a', 'b', CAST(2 AS BIGINT))")
      .collect()(0).getInt(0) == 1)
  }
}
