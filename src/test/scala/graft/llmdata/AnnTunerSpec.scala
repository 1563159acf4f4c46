package graft.llmdata

import graft.SparkEntry
import org.apache.spark.sql.Row

/** Gates for the ANN index tuner (q176) and the tuned search (q177) —
  * the round-8 closure of q174's measured finding ("the default
  * 8-plane/0-probe index recalls ~nothing at k=3"): the tuner must
  * actually CHOOSE a config that meets the recall target, and the
  * chosen config must generalize to queries the tuner never saw.
  */
class AnnTunerSpec extends graft.SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def sweep(): Array[Row] =
    SparkEntry.queries("q176_ann_index_tuner")(spark, sf).collect()

  test("exhaustive anchor (8,8) is provably exact; grid covers the before-point") {
    val rows = sweep()
    assert(rows.length == Similarity.tunerGrid.length)
    val anchor = rows.find(r => r.getInt(0) == 8 && r.getInt(1) == 8).get
    // probe ball = ALL 2^8 buckets ⇒ candidates ⊇ exact top-3 by
    // construction ⇒ sum_overlap must be exactly 3·n_queries (the
    // q59/q108 exactness-gate regime, applied to the probe machinery)
    assert(anchor.getLong(2) == 3 * anchor.getLong(3),
      s"exhaustive probe must have recall 1.0, got $anchor")
    assert(anchor.getBoolean(5), "the anchor always meets the target")
    // q174's untuned default (8,0) is in the grid and fails the target
    // on this corpus — the finding the tuner exists to act on
    val before = rows.find(r => r.getInt(0) == 8 && r.getInt(1) == 0).get
    assert(!before.getBoolean(5),
      "the untuned index meeting the target would make the tuner moot")
  }

  test("chosen config: unique, meets target, cheapest among meeting configs") {
    val rows = sweep()
    val chosen = rows.filter(_.getBoolean(6))
    assert(chosen.length == 1,
      "the anchor guarantees feasibility, so exactly one config is chosen")
    val c = chosen.head
    assert(c.getBoolean(5), "chosen must meet the recall target")
    // micro-recall@3 ≥ 0.8, in the tuner's own integer arithmetic
    assert(c.getLong(2) * 10 >= 24 * c.getLong(3))
    val meeting = rows.filter(_.getBoolean(5))
    assert(meeting.forall(_.getLong(4) >= c.getLong(4)),
      "a cheaper meeting config existed — the tuner must take it")
  }

  test("tuned search runs the chosen config and generalizes to held-out queries") {
    val sweepRows = sweep()
    val c = sweepRows.filter(_.getBoolean(6)).head
    val got = SparkEntry.queries("q177_ann_tuned_search")(spark, sf)
      .collect()
    assert(got.nonEmpty, "held-out queries exist at this sf")
    // every result row carries the chosen config
    assert(got.forall(r => r.getInt(3) == c.getInt(0) &&
      r.getInt(4) == c.getInt(1)))
    // 3 ranked neighbors per held-out query, ranks 1..3
    val byQ = got.groupBy(_.getLong(0))
    assert(byQ.values.forall(_.map(_.getInt(1)).sorted.sameElements(Seq(1, 2, 3))))
    // recall@3 on the HELD-OUT set (disjoint from the tuning sample)
    // vs exact brute force: the config must generalize, not memorize.
    // Measured 0.85 on this fixture; gate at 0.75 to absorb fixture
    // regeneration noise while still far above the untuned ~0.02.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val sp = spark
    val v = graft.Tables.embeddings(sp, sf).select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    val q2 = v.filter(col("vec_id") >= 100 && col("vec_id") < 120)
      .toDF("q_id", "qv")
    val w = Window.partitionBy("q_id").orderBy(col("c").desc, col("n_id"))
    val truth = v.join(broadcast(q2), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        expr("aggregate(zip_with(qv, v, (x, y) -> x * y), 0D, " +
          "(a, e) -> a + e) / (sqrt(aggregate(transform(qv, x -> x * x)" +
          ", 0D, (a, e) -> a + e)) * sqrt(aggregate(transform(v, " +
          "x -> x * x), 0D, (a, e) -> a + e)))").as("c"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val gotPairs = got.map(r => (r.getLong(0), r.getLong(2))).toSet
    val overlap = truth.count(gotPairs.contains)
    assert(overlap * 10 >= truth.size * 75 / 10,
      s"held-out recall ${overlap.toDouble / truth.size} below 0.75")
  }

  // ---- q210/q211: the CROSS-family grid (round-9) ----

  test("ivfProbesFor always ends at nlists — the anchor survives non-power-of-two effective list counts") {
    // a small training sample can collapse an effective nlists to a
    // non-power-of-two; the powers alone would then silently drop the
    // nprobe=nlists exactness anchor (round-9 review finding)
    for (k <- Seq(1, 2, 3, 5, 8, 20, 32)) {
      val probes = Similarity.ivfProbesFor(k)
      assert(probes.last == k, s"nlists=$k must anchor at nprobe=$k")
      assert(probes == probes.distinct && probes == probes.sorted,
        s"probe grid for $k must be strictly increasing: $probes")
    }
  }

  private def familySweep(): Array[Row] =
    SparkEntry.queries("q210_ann_family_tuner")(spark, sf).collect()

  test("cross-family grid: both families present, every exactness anchor exact") {
    val rows = familySweep()
    assert(rows.length == Similarity.tunerGrid.length +
      Similarity.ivfListGrid.map(Similarity.ivfProbesFor(_).length).sum)
    // LSH anchor (8,8): every bucket probed ⇒ recall 1 by construction
    val lshAnchor = rows.find(r => r.getString(0) == "lsh" &&
      r.getInt(1) == 8 && r.getInt(2) == 8).get
    assert(lshAnchor.getLong(3) == 3 * lshAnchor.getLong(4),
      s"LSH exhaustive anchor must have recall 1.0, got $lshAnchor")
    // IVF anchors (nlists, nprobe=nlists), ONE PER TRAINED QUANTIZER:
    // every inverted list probed ⇒ candidates ⊇ exact top-3 WHATEVER
    // that quantizer's training did — the q59/q108 exactness regime
    val nlistsVals = rows.filter(_.getString(0) == "ivf")
      .map(_.getInt(1)).distinct
    assert(nlistsVals.length == Similarity.ivfListGrid.length,
      "one trained quantizer per nlists grid value")
    val ivfAnchors = nlistsVals.map(k =>
      rows.find(r => r.getString(0) == "ivf" &&
        r.getInt(1) == k && r.getInt(2) >= k).get)
    ivfAnchors.foreach(a =>
      assert(a.getLong(3) == 3 * a.getLong(4),
        s"IVF exhaustive anchor must have recall 1.0, got $a"))
    // ALL exhaustive anchors (both families, every quantizer) score
    // the same candidate set — all query–vector pairs — so their
    // integer costs must agree exactly: the cross-family cost unit is
    // the same or the argmin is rigged
    (lshAnchor +: ivfAnchors).foreach(a =>
      assert(a.getLong(5) == lshAnchor.getLong(5),
        "every exhaustive anchor must count identical cost"))
  }

  test("cross-family chosen config: unique, meets target on tuning AND validation, cheapest such") {
    val rows = familySweep()
    val chosen = rows.filter(_.getBoolean(10))
    assert(chosen.length == 1,
      "the feasible anchors guarantee exactly one cross-family choice")
    val c = chosen.head
    // chosen must clear the target on the tuning sample AND the
    // disjoint validation sample — the winner's-curse armor: the
    // argmin over 26 configs picks the luckiest measurement, so an
    // unvalidated choice systematically under-delivers held-out
    assert(c.getBoolean(8) && c.getLong(3) * 10 >= 24 * c.getLong(4))
    assert(c.getBoolean(9) && c.getLong(6) * 10 >= 24 * c.getLong(7),
      "chosen config must ALSO meet the target on the validation sample")
    val meeting = rows.filter(r => r.getBoolean(8) && r.getBoolean(9))
    assert(meeting.forall(_.getLong(5) >= c.getLong(5)),
      "a cheaper double-meeting config existed — must take it")
  }

  test("cross-family search applies the winner and generalizes to held-out queries") {
    val c = familySweep().filter(_.getBoolean(10)).head
    val got = SparkEntry.queries("q211_ann_family_search")(spark, sf)
      .collect()
    assert(got.nonEmpty)
    // every result row carries the chosen family + config — the
    // loser's leg must contribute NOTHING
    assert(got.forall(r => r.getString(3) == c.getString(0) &&
      r.getInt(4) == c.getInt(1) && r.getInt(5) == c.getInt(2)))
    val byQ = got.groupBy(_.getLong(0))
    assert(byQ.values.forall(
      _.map(_.getInt(1)).sorted.sameElements(Seq(1, 2, 3))))
    // held-out recall vs exact brute force, same gate as q177's
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val sp = spark
    val v = graft.Tables.embeddings(sp, sf).select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"))
    val q2 = v.filter(col("vec_id") >= 100 && col("vec_id") < 120)
      .toDF("q_id", "qv")
    val w = Window.partitionBy("q_id").orderBy(col("c").desc, col("n_id"))
    val truth = v.join(broadcast(q2), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        expr("aggregate(zip_with(qv, v, (x, y) -> x * y), 0D, " +
          "(a, e) -> a + e) / (sqrt(aggregate(transform(qv, x -> x * x)" +
          ", 0D, (a, e) -> a + e)) * sqrt(aggregate(transform(v, " +
          "x -> x * x), 0D, (a, e) -> a + e)))").as("c"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val gotPairs = got.map(r => (r.getLong(0), r.getLong(2))).toSet
    val overlap = truth.count(gotPairs.contains)
    assert(overlap * 10 >= truth.size * 75 / 10,
      s"held-out recall ${overlap.toDouble / truth.size} below 0.75")
  }
}
