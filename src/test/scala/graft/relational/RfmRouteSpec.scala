package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Route equality for q171's RFM quintile grid: the ntile-window
  * route and the sketch-boundary scale route must emit identical
  * codes in the sketch's exactness regime (entities ≤ capacity). */
class RfmRouteSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("sketch route codes ≡ window route codes, per customer (exact regime)") {
    val sp = spark
    val rfm = Rfm.triples(graft.Tables.orders(sp, sf))
    val w = Rfm.codesWindow(rfm)
      .select("cust", "r", "f", "m").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .sortBy(_._1)
    val s = Rfm.codesSketch(rfm)
      .select("cust", "r", "f", "m").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .sortBy(_._1)
    assert(w.nonEmpty && w.length == s.length)
    assert(w.toSeq == s.toSeq,
      "sketch-boundary assignment must reproduce ntile codes exactly " +
        "in the exact regime, including (value, cust) tie-breaks")
    // the fixture must actually exercise tie-breaks at a boundary,
    // else the composite encoding is untested: some recency or
    // frequency value must straddle a quintile boundary
    val fTies = Rfm.codesWindow(rfm)
      .groupBy("frequency").agg(countDistinct(col("f")).as("nf"))
      .filter(col("nf") > 1).count()
    val rTies = Rfm.codesWindow(rfm)
      .groupBy("recency").agg(countDistinct(col("r")).as("nr"))
      .filter(col("nr") > 1).count()
    assert(fTies + rTies > 0,
      "fixture has no tie group straddling a boundary - equality proves nothing")
  }

  test("segment census identical across both forced routes and auto") {
    val sp = spark
    val orders = graft.Tables.orders(sp, sf)
    def rows(route: String) =
      Rfm.segments(orders, route).collect().map(_.toSeq).toSeq
    val w = rows("window")
    assert(w.nonEmpty)
    assert(rows("sketch") == w, "census must not depend on the route")
    assert(rows("auto") == w, "auto picks a route, never changes the answer")
  }

  test("lossy regime still yields a valid census (codes 1..5, counts sum to n)") {
    val sp = spark
    val rfm = Rfm.triples(graft.Tables.orders(sp, sf))
    val n = rfm.count()
    assert(n > 32, "fixture must exceed the tiny capacity for a lossy run")
    val codes = Rfm.codesSketch(rfm, capacity = 32)
    val bad = codes.filter(
      col("r") < 1 || col("r") > 5 || col("f") < 1 || col("f") > 5 ||
        col("m") < 1 || col("m") > 5).count()
    assert(bad == 0, "lossy boundaries must still code every row into 1..5")
    val census = Rfm.census(codes)
    val total = census.agg(sum("n_customers")).collect()(0).getLong(0)
    assert(total == n, "census partitions the entity frame")
  }

  test("sketch capacity scales with the entity frame past the route budget") {
    // below the floor: exact regime (covers every oracle-sized frame)
    assert(Rfm.autoCapacity(1000L) == (1 << 16))
    assert(Rfm.autoCapacity(1L << 16) == (1 << 16))
    // everywhere below the memory ceiling the n/cap ratio regime holds
    // (the fixed-2^16 bug: at 100M entities the ratio was 1526, not 64)
    for (n <- Seq(Rfm.WindowEntityBudget + 1, 10L * 1000 * 1000,
        60L * 1000 * 1000)) {
      val c = Rfm.autoCapacity(n)
      assert(c.toLong * Rfm.SketchRankRatio >= n,
        s"n/cap ratio regime must hold at n=$n (got cap=$c)")
    }
    assert(Rfm.autoCapacity(10L * 1000 * 1000) > (1 << 16),
      "capacity must grow with the frame, not stay a fixed 2^16")
    // memory ceiling holds at any n
    assert(Rfm.autoCapacity(Long.MaxValue / 2) == (1 << 20))
  }

  test("a monetary tie group straddling a boundary refuses loudly") {
    val sp = spark
    import sp.implicits._
    // 10 customers, all with identical monetary: every boundary falls
    // inside the one tie group - value comparison cannot reproduce the
    // cust tie-break, so the in-plan guard must raise
    val rfm = (1 to 10).map(i => (i.toLong, i.toLong, i.toLong, 42.0))
      .toDF("cust", "recency", "frequency", "monetary")
    val ex = intercept[Exception] {
      Rfm.codesSketch(rfm).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(c =>
      Option(c.getMessage).exists(_.contains("monetary tie group"))),
      s"expected the tie-guard message, got: ${ex.getMessage}")
  }

  test("composite encoding out of double-exact range refuses loudly") {
    val sp = spark
    import sp.implicits._
    // recency beyond 2^21 would make vkey*2^31 + cust inexact
    val rfm = (1 to 10).map(i =>
        ((1L << 31) + i, (1L << 22) + i, i.toLong, i * 10.0))
      .toDF("cust", "recency", "frequency", "monetary")
    val ex = intercept[Exception] {
      Rfm.codesSketch(rfm).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(c =>
      Option(c.getMessage).exists(_.contains("double-exact range"))),
      s"expected the range-guard message, got: ${ex.getMessage}")
  }
}
