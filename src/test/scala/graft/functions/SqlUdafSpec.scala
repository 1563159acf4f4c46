package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The SQL-text surface of the sketch aggregators (§2.11): each
  * registered name must be callable from `spark.sql` and agree with
  * the typed path / exact reference in its pinned parameterization. */
class SqlUdafSpec extends SparkSpec {

  test("mg_sketch is callable from SQL and exact at k=64 ≥ distinct") {
    val sp = spark
    import sp.implicits._
    Seq(("en", "a"), ("en", "b"), ("en", "a"), ("fr", "x"))
      .toDF("lang", "w").createOrReplaceTempView("mg_in")
    val rows = sp.sql(
      """SELECT lang, hh['a'] AS a, hh['b'] AS b FROM
        |  (SELECT lang, mg_sketch(w) AS hh FROM mg_in GROUP BY lang)
        |WHERE lang = 'en'""".stripMargin).collect()
    assert(rows.length === 1)
    assert(rows(0).getLong(1) === 2L && rows(0).getLong(2) === 1L)
  }

  test("quantile_sketch is callable from SQL and exact below capacity") {
    val sp = spark
    import sp.implicits._
    (1 to 100).map(_.toDouble).toDF("x").createOrReplaceTempView("qs_in")
    val qd = sp.sql("SELECT quantile_sketch(x) AS qd FROM qs_in")
      .collect()(0).getSeq[Double](0)
    // rank-lower rule at n=100: ⌈q·n⌉-th element
    assert(qd === Seq(10.0, 50.0, 90.0, 99.0))
  }

  test("topk5 is callable from SQL and matches sort-take") {
    val sp = spark
    import sp.implicits._
    (1 to 50).map(i => (((i * 13) % 7).toDouble, i.toLong))
      .toDF("v", "id").createOrReplaceTempView("tk_in")
    val got = sp.sql(
      """SELECT inline(transform(topk5(v, id), p -> struct(p._1, p._2)))
        |FROM tk_in""".stripMargin)
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    val want = (1 to 50).map(i => (((i * 13) % 7).toDouble, i.toLong))
      .sortBy { case (v, id) => (-v, id) }.take(5)
    assert(got === want)
  }

  test("bloom_build is callable from SQL and agrees with the typed path") {
    val sp = spark
    import sp.implicits._
    val keys = (1 to 30).map(i => s"key-$i")
    keys.toDF("fp")
      .select(Bloom.positions(col("fp"), 1 << 17, 3).as("pos"))
      .createOrReplaceTempView("bl_in")
    val viaSql = sp.sql("SELECT bloom_build(pos) AS bits FROM bl_in")
      .collect()(0).getSeq[Long](0)
    val agg = udaf(new BloomAgg(1 << 17),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Int]]())
    val typed = keys.toDF("fp")
      .select(Bloom.positions(col("fp"), 1 << 17, 3).as("pos"))
      .agg(agg(col("pos")).as("bits"))
      .collect()(0).getSeq[Long](0)
    assert(viaSql === typed)
    assert(viaSql.map(java.lang.Long.bitCount).sum > 0)
  }

  test("kmv_sketch is callable from SQL; sparse regime is the sorted distinct set") {
    val sp = spark
    import sp.implicits._
    Seq("b", "a", "c", "a", "b").toDF("w")
      .createOrReplaceTempView("kmv_in")
    val got = sp.sql("SELECT kmv_sketch(w).exact FROM kmv_in")
      .collect()(0).getSeq[String](0)
    assert(got === Seq("a", "b", "c"))
  }

  test("extensions route alone exposes the aggregators: newSession resolves mg_sketch with no register() call") {
    // newSession() rebuilds sessionState from builtins + the injected
    // extensions — programmatic register() effects do NOT carry over,
    // so this is exactly the spark-submit --conf spark.sql.extensions
    // route the class scaladoc documents
    val fresh = spark.newSession()
    import fresh.implicits._
    Seq("a", "b", "a").toDF("w").createOrReplaceTempView("ext_mg_in")
    val rows = fresh.sql(
      "SELECT hh['a'] FROM (SELECT mg_sketch(w) AS hh FROM ext_mg_in)")
      .collect()
    assert(rows(0).getLong(0) === 2L)
    // and the other three resolve too
    (1 to 10).map(_.toDouble).toDF("x").createOrReplaceTempView("ext_qs_in")
    assert(fresh.sql("SELECT quantile_sketch(x) FROM ext_qs_in")
      .collect()(0).getSeq[Double](0) === Seq(1.0, 5.0, 9.0, 10.0))
    assert(fresh.sql(
      "SELECT size(topk5(x, CAST(x AS BIGINT))) FROM ext_qs_in")
      .collect()(0).getInt(0) === 5)
    assert(fresh.sql(
      "SELECT size(bloom_build(array(1, 2, 3))) FROM ext_qs_in LIMIT 1")
      .collect()(0).getInt(0) === (1 << 17) / 64)
  }

  test("wrong argument count fails at analysis time with the expected signature, not an encoder error") {
    import spark.implicits._
    Seq("a").toDF("w").createOrReplaceTempView("arity_in")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT mg_sketch(w, w) FROM arity_in").collect()
    }
    assert(e.getMessage.contains("mg_sketch(stringCol)"), e.getMessage)
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT topk5(1.0) FROM arity_in").collect()
    }
    assert(e2.getMessage.contains("topk5(doubleCol, longCol)"), e2.getMessage)
  }
}
