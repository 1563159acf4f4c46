package graft.relational

import graft.Tables
import org.apache.spark.sql.functions._

/** Gates for q182's scale-aware arithmetic-route switch (round-11: the
  * round-10 loud guard turned into an answer — the Conformal/KsDrift
  * discipline). Load-bearing properties: the micro (BIGINT) and
  * decimal (DECIMAL(38,0)) routes are ROW-IDENTICAL in the micro
  * regime (both are exact integer arithmetic over the same operands),
  * auto picks micro there (pinned on the PURE route function at
  * magnitudes no corpus can reach), the degenerate single-class corpus
  * emits NULL on both routes (never an ANSI divide-by-zero), and each
  * route's guard stays loud past its own envelope. */
class AucRouteSpec extends graft.SparkSpec {
  private val sf = "/root/testdata/sf0.01"

  test("micro and decimal routes are row-identical in the micro regime") {
    val docs = Tables.documents(spark, sf)
    val m = Auc.auc(docs, "micro").collect()
    val d = Auc.auc(docs, "decimal").collect()
    assert(m.length == 1 && m.toSeq == d.toSeq,
      s"exact integer arithmetic must agree across carriers " +
        s"(micro=${m.toSeq}, decimal=${d.toSeq})")
    assert(m(0).getLong(4) > 0L, "fixture corpus must have signal")
  }

  test("routes share one output schema (decimal never leaks to the contract)") {
    val docs = Tables.documents(spark, sf)
    val ms = Auc.auc(docs, "micro").schema
    val ds = Auc.auc(docs, "decimal").schema
    assert(ms.fields.map(f => (f.name, f.dataType)).toSeq ==
      ds.fields.map(f => (f.name, f.dataType)).toSeq,
      "the registry float policy bans DECIMAL output columns — the " +
        "decimal route must cast every report column back to BIGINT")
  }

  test("auto picks micro in the exact regime; the pure switch flips exactly at the bound") {
    val docs = Tables.documents(spark, sf)
    assert(Auc.auc(docs, "auto").collect().toSeq ==
      Auc.auc(docs, "micro").collect().toSeq)
    assert(Auc.route(1L, Auc.MicroBound) == "micro")
    assert(Auc.route(1L, Auc.MicroBound + 1L) == "decimal")
    assert(Auc.route(2L, Auc.MicroBound) == "decimal")
    assert(Auc.route(Long.MaxValue, Long.MaxValue) == "decimal")
    assert(Auc.route(0L, Long.MaxValue) == "micro",
      "a single-class corpus has zero pairs — trivially in regime")
  }

  test("single-class corpus emits NULL auc on BOTH routes, never a divide-by-zero") {
    val sp = spark
    import sp.implicits._
    val docs = Seq((1L, "en", 10L), (2L, "en", 20L))
      .toDF("doc_id", "lang", "n_chars")
    for (route <- Seq("micro", "decimal")) {
      val r = Auc.auc(docs, route).collect()
      assert(r.length == 1, s"$route must emit the degenerate row")
      assert(r(0).isNullAt(4), s"$route must emit NULL auc_micro")
      assert(r(0).getLong(1) == 0L, "n_neg = 0")
    }
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
    def probe(bound: Long, np: Long, nn: Long, msg: String) =
      Seq((np, nn)).toDF("n_pos", "n_neg")
        .select(graft.ScaleGuards.guarded(
          graft.ScaleGuards.productWithin("n_pos", "n_neg", bound),
          msg, lit(1L)).as("v")).collect()
    // micro: ~2.4M per class passes, 10^7 per class fires
    assert(probe(Auc.MicroBound, 2400000L, 2400000L, "x")(0)
      .getLong(0) == 1L)
    fires(probe(Auc.MicroBound, 10000000L, 10000000L,
      "q182: micro envelope"), "q182: micro envelope")
    // decimal: 10^6x past the micro bound passes (3*10^9 per class);
    // past the output columns' own BIGINT bound fires
    assert(probe(Long.MaxValue, 3000000000L, 3000000000L, "x")(0)
      .getLong(0) == 1L)
    fires(probe(Long.MaxValue, Long.MaxValue / 2L, 3L,
      "q182 decimal envelope"), "q182 decimal envelope")
  }
}
