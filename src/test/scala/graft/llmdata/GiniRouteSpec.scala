package graft.llmdata

import graft.Tables
import org.apache.spark.sql.functions._

/** Gates for q181's scale-aware unit-route switch (round-11: the
  * round-10 loud guard turned into an answer — the Conformal/KsDrift
  * discipline). Load-bearing properties: the nested-floor identity
  * `milli ≡ (micro div 1000)·1000` holds wherever both routes are
  * defined, the auto switch picks micro in the exact regime (pinned on
  * the PURE route function at magnitudes no test corpus can reach, the
  * overflow-free product test), and each route's own guard stays
  * loud. */
class GiniRouteSpec extends graft.SparkSpec {
  private val sf = "/root/testdata/sf0.01"

  test("milli route is the micro route floored to milli precision (nested-floor identity)") {
    val docs = Tables.documents(spark, sf)
    val m = Gini.gini(docs, "micro").collect()
    val k = Gini.gini(docs, "milli").collect()
    assert(m.length == 1 && k.length == 1)
    assert(m(0).getLong(0) == k(0).getLong(0), "n must agree")
    assert(m(0).getLong(1) == k(0).getLong(1), "total must agree")
    val micro = m(0).getLong(2)
    val milli = k(0).getLong(2)
    assert(milli == (micro / 1000L) * 1000L,
      s"floor(floor(N*10^6/D)/10^3)*10^3 must equal the milli route " +
        s"(micro=$micro, milli=$milli)")
    assert(micro > 0L, "fixture corpus must have nonzero concentration")
  }

  test("routes share one output schema") {
    val docs = Tables.documents(spark, sf)
    assert(Gini.gini(docs, "micro").schema == Gini.gini(docs, "milli").schema)
  }

  test("auto picks micro in the exact regime; the pure switch flips exactly at the bound") {
    val docs = Tables.documents(spark, sf)
    assert(Gini.gini(docs, "auto").collect().toSeq ==
      Gini.gini(docs, "micro").collect().toSeq,
      "sf0.01 is deep inside the micro regime — auto must be micro")
    // the switch point, at magnitudes only the pure function can reach
    assert(Gini.route(1L, Gini.MicroBound) == "micro")
    assert(Gini.route(1L, Gini.MicroBound + 1L) == "milli")
    assert(Gini.route(Gini.MicroBound, 1L) == "micro")
    assert(Gini.route(2L, Gini.MicroBound) == "milli")
    // overflow-free at the extremes; empty corpus degenerates to micro
    assert(Gini.route(Long.MaxValue, Long.MaxValue) == "milli")
    assert(Gini.route(0L, 0L) == "micro")
  }

  test("each route's guard stays loud past its own envelope") {
    val sp = spark
    import sp.implicits._
    def fires(body: => Any, frag: String): Unit = {
      val e = intercept[Throwable] { body }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains(frag)),
        s"expected a loud '$frag' failure, got: $e")
    }
    // expression-level probes at both sides of each bound (the
    // ScaleGuardSpec method — real data cannot reach 2^63)
    def probe(bound: Long, n: Long, total: Long, msg: String) =
      Seq((n, total)).toDF("n", "total")
        .select(graft.ScaleGuards.guarded(
          graft.ScaleGuards.productWithin("n", "total", bound),
          msg, lit(1L)).as("v")).collect()
    assert(probe(Gini.MicroBound, 1000000L, 4000000L, "x")(0)
      .getLong(0) == 1L)
    fires(probe(Gini.MicroBound, 1000000L, 46000000L,
      "q181: micro envelope"), "q181: micro envelope")
    assert(probe(Gini.MilliBound, 1000000L, 4000000000L, "x")(0)
      .getLong(0) == 1L, "1000x past the micro bound fits milli")
    fires(probe(Gini.MilliBound, 1000000000L, 46000000000L,
      "q181 milli envelope"), "q181 milli envelope")
  }
}
