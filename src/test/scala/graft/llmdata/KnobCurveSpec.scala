package graft.llmdata

import org.apache.spark.sql.functions._

import graft.{SparkSpec, SparkEntry, Tables}

/** Invariants of the knob-pricing operators (q192–q194) beyond the
  * oracle hash: budget exactness and the water-level property for the
  * allocator, monotonicity and mass conservation for the two curves.
  */
class KnobCurveSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("q192: budget spent exactly, caps respected, level flat") {
    val rows = SparkEntry.queries("q192_waterfill_mix")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getInt(3)))
    val totalAvail = Tables.documents(spark, sf)
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum("n")).collect()(0).getLong(0)
    val budget = totalAvail * 4 / 5
    // the whole point: integer-exact budget match, no float water level
    assert(rows.map(_._3).sum == budget)
    rows.foreach { case (lang, avail, alloc, capped) =>
      assert(alloc <= avail, s"$lang over-allocated")
      if (capped == 1) assert(alloc == avail, s"$lang capped but not full")
    }
    val uncapped = rows.filter(_._4 == 0).map(_._3)
    assert(uncapped.nonEmpty) // budget < total ⇒ someone is under water
    // flat water level: uncapped allocations differ by at most the
    // integer remainder unit
    assert(uncapped.max - uncapped.min <= 1)
    // every capped language genuinely sits below the water level
    val level = uncapped.min
    rows.filter(_._4 == 1).foreach { case (lang, avail, _, _) =>
      assert(avail <= level + 1, s"$lang capped above the water level")
    }
  }

  test("q193: coverage monotone in K, mass conserved per row") {
    val rows = SparkEntry.queries("q193_vocab_coverage_curve")(spark, sf)
      .orderBy("k_vocab").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 5)
    val cov = rows.map(_._3)
    assert(cov.zip(cov.tail).forall { case (a, b) => a <= b })
    assert(cov.forall(c => c >= 0 && c <= 1000000L))
    rows.foreach { case (k, used, _, _) => assert(used <= k) }
    // oov mass shrinks as the vocabulary grows
    val oov = rows.map(_._4)
    assert(oov.zip(oov.tail).forall { case (a, b) => a >= b })
  }

  test("q194: truncation + kept conserve tokens; concat chunks cover the mass") {
    val rows = SparkEntry.queries("q194_context_length_curve")(spark, sf)
      .orderBy("len_ctx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val total = Tables.documents(spark, sf)
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .agg(sum("n")).collect()(0).getLong(0)
    rows.foreach { case (l, _, lost, kept, util, chunks) =>
      assert(lost + kept == total, s"L=$l loses tokens silently")
      assert(util >= 0 && util <= 1000000L)
      assert(chunks * l >= total && (chunks - 1) * l < total,
        s"L=$l concat chunk count wrong")
    }
    // longer context ⇒ (weakly) less truncation loss
    val losses = rows.map(_._3)
    assert(losses.zip(losses.tail).forall { case (a, b) => a >= b })
  }
}
