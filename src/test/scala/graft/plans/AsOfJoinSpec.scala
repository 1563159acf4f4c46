package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Filter
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {

  private def trades: DataFrame = {
    import spark.implicits._
    Seq(
      // (trade_id, sym, t)
      (1L, "A", 10L), (2L, "A", 20L), (3L, "A", 5L),
      (4L, "B", 15L), (5L, "B", 100L),
      (6L, "C", 50L), // sym with no quotes at all
      (7L, null.asInstanceOf[String], 10L), // null by: never matches
    ).toDF("trade_id", "sym", "t")
  }

  private def quotes: DataFrame = {
    import spark.implicits._
    Seq(
      // (quote_id, q_sym, q_t, px) — includes: equal-ts tie (21/22),
      // a NULL px on a latest quote (23), a null q_t (90)
      (20L, "A", Some(8L), Some(1.0)), (21L, "A", Some(10L), Some(2.0)),
      (22L, "A", Some(10L), Some(3.0)), (23L, "A", Some(19L), None),
      (30L, "B", Some(15L), Some(7.0)), (31L, "B", Some(90L), Some(9.0)),
      (90L, "B", None: Option[Long], Some(99.0)),
      (91L, null.asInstanceOf[String], Some(1L), Some(50.0)),
    ).toDF("quote_id", "q_sym", "q_t", "px")
  }

  test("backward as-of with ties, null values, and unmatched lefts (left outer)") {
    val got = AsOf.joinAsOf(trades, quotes,
        on = ("t", "q_t"), by = Seq(("sym", "q_sym")),
        tiebreak = Seq("quote_id"))
      .select("trade_id", "quote_id", "px")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2))).toSet
    assert(got == Set(
      (1L, 22L, 3.0),   // tie at t=10 → greatest tiebreak (22), same row's px
      (2L, 23L, null),  // latest quote at-or-before 20 has NULL px — the
                        // px must come from THAT row, not an older one
      (3L, null, null), // before any quote
      (4L, 30L, 7.0),   // exact-equal timestamp counts
      (5L, 31L, 9.0),
      (6L, null, null), // sym with no quotes
      (7L, null, null), // null by never matches
    ))
  }

  test("inner as-of drops unmatched lefts") {
    val got = AsOf.joinAsOf(trades, quotes,
        on = ("t", "q_t"), by = Seq(("sym", "q_sym")),
        tiebreak = Seq("quote_id"), joinType = "inner")
      .select("trade_id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 4L, 5L))
  }

  test("matches the union-and-window rendering on the events table") {
    val d = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(spark, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts").as("v_ts"), col("value").as("view_value"))
    val native = AsOf.joinAsOf(purchases, views,
        on = ("ts", "v_ts"), by = Seq(("user_id", "v_user")),
        tiebreak = Seq("view_id"))
      .select(col("event_id"), col("view_id").as("last_view_id"),
        col("view_value").as("last_view_value"))

    // q54's rendering, inlined
    val tagged = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), lit(1).as("side"),
        lit(null).cast("long").as("r_event_id"),
        lit(null).cast("double").as("r_value"))
      .unionByName(ev.filter(col("event_type") === "view")
        .select(col("event_id"), col("user_id"), col("ts"), lit(0).as("side"),
          col("event_id").as("r_event_id"), col("value").as("r_value")))
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("side"), col("r_event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val windowed = tagged
      .withColumn("lv", last(
        when(col("side") === 0, struct(col("r_event_id"), col("r_value"))),
        ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"),
        col("lv.r_event_id").as("last_view_id"),
        col("lv.r_value").as("last_view_value"))

    def canon(df: DataFrame): Set[(Long, Any, Any)] =
      df.collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2))).toSet
    val n = canon(native)
    assert(n.nonEmpty && n == canon(windowed))
  }

  test("plan: AsOfJoinExec with one exchange per side; pre-partitioned inputs add none") {
    import org.apache.spark.sql.execution.ExplainMode
    def fmt(df: DataFrame): String =
      df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    // formatted explain lists each node once in the detail section as
    // "(n) Exchange" — count those, not every textual mention
    def exchanges(p: String): Int = """\(\d+\) Exchange""".r.findAllIn(p).size
    val p = fmt(AsOf.joinAsOf(trades, quotes,
      on = ("t", "q_t"), by = Seq(("sym", "q_sym"))))
    assert(p.contains("AsOfJoin"), p)
    assert(exchanges(p) == 2, p)

    // declared (not hand-built) distribution: children already
    // hash-partitioned on the by keys satisfy it — no extra exchange
    val pre = fmt(AsOf.joinAsOf(
      trades.repartition(4, col("sym")),
      quotes.repartition(4, col("q_sym")),
      on = ("t", "q_t"), by = Seq(("sym", "q_sym"))))
    assert(exchanges(pre) == 2, pre) // the 2 explicit repartitions only
    assert(!pre.contains("ENSURE_REQUIREMENTS"), pre)
  }

  test("by-key filters push through to BOTH sides (optimizer rule)") {
    val df = AsOf.joinAsOf(trades, quotes,
        on = ("t", "q_t"), by = Seq(("sym", "q_sym")))
      .filter(col("sym") === "A")
    val optimized = df.queryExecution.optimizedPlan
    // no Filter remains above the join…
    assert(!optimized.exists {
      case Filter(_, _: AsOfJoin) => true
      case _ => false
    }, optimized.toString)
    // …the predicate reached both children (over LocalRelation the
    // optimizer evaluates the pushed filter away entirely, shrinking
    // the relations — either shape proves the push happened)
    val joinNode = optimized.collectFirst { case j: AsOfJoin => j }.get
    def filteredOrShrunk(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        nRows: Int): Boolean =
      p.exists { case _: Filter => true; case _ => false } ||
        p.collectLeaves().forall(_.maxRows.exists(_ <= nRows))
    assert(filteredOrShrunk(joinNode.left, 3), joinNode.left.toString)
    assert(filteredOrShrunk(joinNode.right, 4), joinNode.right.toString)
    // and the result is still right
    assert(df.select("trade_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 3L))
  }

  test("self-join (same source both sides) is expression-id safe") {
    import spark.implicits._
    val e = Seq((1L, "k", 10L, 1.0), (2L, "k", 20L, 2.0), (3L, "k", 30L, 3.0))
      .toDF("id", "k", "ts", "v")
    val l = e.select(col("id"), col("k"), col("ts"))
    val r = e.select(col("id").as("r_id"), col("k").as("r_k"),
      col("ts").as("r_ts"), col("v").as("r_v"))
    val got = AsOf.joinAsOf(l, r, on = ("ts", "r_ts"), by = Seq(("k", "r_k")),
        tiebreak = Seq("r_id"))
      .select("id", "r_id").collect()
      .map(r0 => (r0.getLong(0), r0.getLong(1))).toSet
    assert(got == Set((1L, 1L), (2L, 2L), (3L, 3L)))
  }

  test("rejects colliding output names and mismatched on-types loudly") {
    import spark.implicits._
    val a = Seq((1L, 1L)).toDF("id", "ts")
    val b = Seq((1L, 1L)).toDF("id", "ts2")
    val e1 = intercept[IllegalArgumentException] {
      AsOf.joinAsOf(a, b, on = ("ts", "ts2"), by = Nil)
    }
    assert(e1.getMessage.contains("disjoint"))
    val c = Seq((1L, "x")).toDF("r_id", "r_s")
    val e2 = intercept[IllegalArgumentException] {
      AsOf.joinAsOf(a, c, on = ("ts", "r_s"), by = Nil)
    }
    assert(e2.getMessage.contains("types differ"))
  }
}
