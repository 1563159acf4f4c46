package graft.llmdata

import graft.SparkSpec

/** The set-similarity verify regimes must be interchangeable: the
  * dictionary-bitmap route (vocab fits [[Dedup.VocabBitmapBudget]])
  * and the count-join fallback (vocab over budget) are both EXACT, so
  * forcing the fallback with a zero budget must reproduce the default
  * route's output bit for bit. This is the round-5 VERDICT's top item:
  * without the auto-switch, the first open-vocabulary corpus turns the
  * broadcast dictionary into a driver OOM.
  */
class VocabFallbackSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSeq

  test("q28 jaccard: count-join fallback ≡ bitmap route") {
    assert(rows(Dedup.jaccardPairs(spark, sf, vocabBudget = 0)) ==
      rows(Dedup.jaccardPairs(spark, sf)))
  }

  test("q75 containment: count-join fallback ≡ bitmap route") {
    assert(rows(Dedup.containmentPairs(spark, sf, vocabBudget = 0)) ==
      rows(Dedup.containmentPairs(spark, sf)))
  }

  test("q29 minhash+lsh: count-join fallback ≡ bitmap route") {
    assert(rows(Dedup.minhashLsh(spark, sf, vocabBudget = 0)) ==
      rows(Dedup.minhashLsh(spark, sf)))
  }

  test("q55 clusters: distributed min-label route ≡ driver union-find route") {
    // zero edge budget forces the Pregel-style loop (the 64-bit-
    // fingerprint scale path); labels must match the union-find's
    assert(rows(Dedup.dupClusters(spark, sf, ccEdgeBudget = 0)) ==
      rows(Dedup.dupClusters(spark, sf)))
  }

  test("fallback plan carries no broadcast of a vocab dictionary") {
    // the zero-budget plan must not contain the dictionary equi-join's
    // wid column — the whole point is that no vocab table exists
    val plan = Dedup.jaccardPairs(spark, sf, vocabBudget = 0)
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("wid"), "fallback still builds the dictionary")
  }
}
