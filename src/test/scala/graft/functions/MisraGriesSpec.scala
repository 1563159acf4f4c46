package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The lossy-regime contract of the Misra–Gries aggregator — q81's
  * oracle only exercises the exact regime (k ≥ distinct), so the
  * sketch guarantees are pinned here. */
class MisraGriesSpec extends SparkSpec {

  private def counts(xs: Seq[String]): Map[String, Long] =
    xs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

  private def sketch(xs: Seq[String], k: Int): Map[String, Long] = {
    val mg = new MisraGries(k)
    xs.foldLeft(mg.zero)(mg.reduce)
  }

  test("exact regime: k ≥ distinct items reproduces true counts through any merge tree") {
    val mg = new MisraGries(8)
    val xs = Seq("a", "b", "a", "c", "a", "b", "d", "a")
    val whole = sketch(xs, 8)
    assert(whole === counts(xs))
    // arbitrary split points + merge must give the same answer
    for (cut <- 1 until xs.size) {
      val (l, r) = xs.splitAt(cut)
      assert(mg.merge(sketch(l, 8), sketch(r, 8)) === counts(xs),
        s"merge at $cut diverged")
    }
  }

  test("lossy regime: estimates underestimate by at most n/(k+1); true heavy hitters survive") {
    val k = 3
    val mg = new MisraGries(k)
    // 100×a, 50×b, then a spray of 60 singletons
    val xs = Seq.fill(100)("a") ++ Seq.fill(50)("b") ++
      (1 to 60).map(i => s"x$i")
    // sketch under an adversarial merge tree: chunks of 7
    val merged = xs.grouped(7).map(c => sketch(c, k)).reduce(mg.merge)
    val n = xs.size.toLong
    val bound = n / (k + 1)
    val truth = counts(xs)
    merged.foreach { case (t, est) =>
      assert(est <= truth(t), s"$t overestimated")
      assert(truth(t) - est <= bound, s"$t under by more than n/(k+1)")
    }
    // any item with true count > n/(k+1) MUST be present
    truth.filter(_._2 > bound).keys.foreach { t =>
      assert(merged.contains(t), s"heavy hitter $t evicted")
    }
  }

  test("distributed: sketch partial aggregation equals exact GROUP BY when k ≥ vocab") {
    val sp = spark
    import sp.implicits._
    val df = (1 to 1000).map(i => ("g" + (i % 3), "w" + (i % 17)))
      .toDF("g", "w").repartition(13) // force many partial buffers
    val mg = udaf(new MisraGries(32), org.apache.spark.sql.Encoders.STRING)
    val got = df.groupBy("g").agg(mg(col("w")).as("hh"))
      .select(col("g"), explode(col("hh")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val want = df.groupBy("g", "w").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(got === want)
  }
}
