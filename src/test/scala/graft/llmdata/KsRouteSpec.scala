package graft.llmdata

import graft.Tables
import org.apache.spark.sql.functions._

/** Gates for q198's scale-aware route switch (round-10). Equality is
  * pinned where it is exact (budget ≥ side counts ⟹ stride 1 ⟹ the
  * sample route IS the exact route); the sub-budget sample is pinned
  * deterministic, budget-bounded, and exactly correct on synthetic
  * splits whose KS is known in closed form. */
class KsRouteSpec extends graft.SparkSpec {
  private val sf = "/root/testdata/sf0.01"

  test("sample route with budget >= side counts is row-identical to exact") {
    val docs = Tables.documents(spark, sf)
    val exact = KsDrift.drift(docs, "exact").collect()
    val rows = KsDrift.splitRows(docs)
    val sampleAll = KsDrift.ksFold(
      KsDrift.sampled(rows, budget = Long.MaxValue / 2)).collect()
    assert(exact.nonEmpty && exact.toSeq == sampleAll.toSeq,
      "stride 1 must be the identity — the routes share one fold")
    // auto stays on the exact route inside the micro regime
    val auto = KsDrift.drift(docs, "auto").collect()
    assert(auto.toSeq == exact.toSeq)
  }

  test("sub-budget sample is deterministic and budget-bounded") {
    val docs = Tables.documents(spark, sf)
    val a = KsDrift.drift(docs, "sample").collect()
    val b = KsDrift.drift(docs, "sample").collect()
    assert(a.toSeq == b.toSeq, "id-stride sampling must be replay-stable")
    // fixture is far below the budget, so the sample IS the corpus
    // here; bound the reported sizes against a tiny explicit budget
    val rows = KsDrift.splitRows(docs)
    val small = KsDrift.ksFold(KsDrift.sampled(rows, budget = 100L))
      .collect().head
    val (nTr, nTe) = (small.getLong(3), small.getLong(4))
    assert(nTr > 0 && nTe > 0, "a stride sample must keep both sides")
    assert(nTr <= 200 && nTe <= 200,
      s"sampled sides must honor the budget (got $nTr/$nTe for 100)")
  }

  test("sampled KS is exact on closed-form splits: disjoint supports give 10^6, identical give 0") {
    val sp = spark
    import sp.implicits._
    // n_chars depends only on the md5 split bucket: train all 10,
    // test all 1000 -> ECDFs have disjoint support -> KS = 1
    val ids = sp.range(0, 20000).select(col("id").as("doc_id"))
    val shifted = ids.withColumn("n_chars",
      when(Hygiene.bucket === 9, 1000L).otherwise(10L))
    val ksShift = KsDrift.ksFold(
      KsDrift.sampled(KsDrift.splitRows(shifted), budget = 500L))
      .collect().head
    assert(ksShift.getLong(0) == 1000000L,
      s"disjoint supports must give ks_micro = 10^6, got $ksShift")
    // identical constant distributions -> KS = 0
    val same = ids.withColumn("n_chars", lit(42L))
    val ksSame = KsDrift.ksFold(
      KsDrift.sampled(KsDrift.splitRows(same), budget = 500L))
      .collect().head
    assert(ksSame.getLong(0) == 0L,
      s"identical distributions must give ks_micro = 0, got $ksSame")
  }
}
