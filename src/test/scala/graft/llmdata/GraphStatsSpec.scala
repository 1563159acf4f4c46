package graft.llmdata

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Engine-free invariants of the round-7 graph/stats operators — the
  * properties the DuckDB oracle gate cannot see: loud-guard raises,
  * the degree-orientation's hub bound, and seed clamping.
  */
class GraphStatsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("q145's Misra-Gries regime guard raises past k, not under-counts") {
    // 10 distinct keys through an MG with k = 4: decrements MUST fire,
    // the F1 invariant breaks, and the q145 guard shape raises instead
    // of emitting a silently-low self-join estimate.
    import spark.implicits._
    val mg = udaf(new graft.functions.MisraGries(4),
      org.apache.spark.sql.Encoders.STRING)
    val agg = (0 until 100).map(i => (i % 10).toString).toDF("k")
      .agg(mg(col("k")).as("m"), count(lit(1)).as("n_rows"))
      .select(when(
        assert_true(
          expr("aggregate(map_values(m), CAST(0 AS BIGINT), " +
            "(acc, v) -> acc + v)") === col("n_rows"),
          lit("regime violated")).isNull,
        col("m")).as("m"))
    val e = intercept[Exception](agg.collect())
    assert(e.getMessage.contains("regime violated"))
  }

  test("q147 orientation: a hub star yields zero wedges at the hub") {
    // K1,8: naive low-id orientation from a low-id hub would pair all
    // C(8,2)=28 leaf combinations; degree-ordering points every edge
    // AT the hub, so no vertex has 2 out-edges and the wedge join is
    // empty. This is the bound that keeps the self-join sub-quadratic
    // on hub-heavy graphs.
    import spark.implicits._
    val und = (1L to 8L).map(l => (0L, l)).toDF("src", "dst")
    val ed = und.unionAll(und.select(col("dst").as("src"),
      col("src").as("dst")))
    val deg = ed.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
    val lower = col("ds") < col("dd") ||
      (col("ds") === col("dd") && col("src") < col("dst"))
    val o = und
      .join(deg.select(col("node").as("src"), col("deg").as("ds")),
        Seq("src"))
      .join(deg.select(col("node").as("dst"), col("deg").as("dd")),
        Seq("dst"))
      .select(when(lower, col("src")).otherwise(col("dst")).as("s"),
        when(lower, col("dst")).otherwise(col("src")).as("t"))
    // every edge must point leaf → hub (hub has max degree)
    assert(o.filter(col("s") === 0L).count() == 0)
    val wedges = o.select(col("s"), col("t").as("b"))
      .join(o.select(col("s"), col("t").as("c")), Seq("s"))
      .filter(col("b") < col("c"))
    assert(wedges.count() == 0)
  }

  test("q143 label propagation clamps seeds across both rounds") {
    // every seed (doc_id % 5 = 0) appears exactly once, at round 0,
    // with its own lang — no vote ever overwrites a seed, and no node
    // is labeled twice.
    val res = graft.SparkEntry.queries("q143_label_propagation")(spark, sf)
    val seeds = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), col("lang"))
    val joined = res.join(seeds, Seq("doc_id"))
    assert(joined.count() == seeds.count())
    assert(joined.filter(col("assigned_round") =!= 0L ||
      col("label") =!= col("lang")).count() == 0)
    assert(res.groupBy("doc_id").count().filter(col("count") > 1)
      .count() == 0)
  }

  test("q142 PageRank conserves the teleport floor and node set") {
    // every node's rank ≥ the 0.15 · 10^6 teleport floor, and the
    // ranked node set is exactly the edge-bearing source set.
    val res = graft.SparkEntry.queries("q142_source_pagerank")(spark, sf)
      .collect()
    assert(res.nonEmpty)
    assert(res.forall(_.getLong(2) >= 150000L))
    assert(res.map(_.getString(0)).distinct.length == res.length)
  }

  test("q147 triangle identity: 3 · triangle-sum ≡ 0 (mod 3) and " +
    "counts stay within degree bounds") {
    val res = graft.SparkEntry.queries("q147_triangle_count")(spark, sf)
      .collect()
    val total = res.map(_.getLong(2)).sum
    assert(total % 3 == 0) // every triangle lands on exactly 3 corners
    // a node in t triangles needs ≥ t distinct neighbor pairs
    assert(res.forall { r =>
      val d = r.getLong(1); val t = r.getLong(2)
      t <= d * (d - 1) / 2
    })
  }
}
