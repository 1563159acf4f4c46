package graft

/** Driver-contract smoke + light invariants of the LLM-data ops on the
  * sf0.001 fixture (full value-level checks are the DuckDB oracle gate). */
class EntrySpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("entry() produces rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every registered query has a distinct name; oracles cover all") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("exact dedup partitions the corpus: sum(n_copies) == total docs") {
    val res = SparkEntry.queries("q27_dedup_exact")(spark, sf)
    val total = Tables.documents(spark, sf).count()
    val sums = res.agg(org.apache.spark.sql.functions.sum("n_copies")).head().getLong(0)
    assert(sums == total)
    assert(res.select("keep_id").distinct().count() == res.count())
  }

  test("simhash emits one 16-bit fingerprint per doc") {
    val res = SparkEntry.queries("q30_simhash")(spark, sf).collect()
    assert(res.length == Tables.documents(spark, sf).count())
    assert(res.forall { r =>
      val h = r.getLong(1); h >= 0 && h < (1L << 16)
    })
  }

  test("registry determinism: two runs of every query emit identical rows") {
    // the float policy's wholesale check: no output value anywhere in
    // the registry may depend on partition order, task scheduling, or
    // any other run-to-run instability — two fresh executions (caches
    // dropped between) must match bit-for-bit, doubles included. This
    // is the property that makes the DuckDB hash gate repeatable.
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      def snap(): Seq[String] = {
        val rows = fn(spark, sf).collect().map(_.toString).sorted.toSeq
        Caches.release()
        spark.catalog.clearCache()
        rows
      }
      val a = snap()
      val b = snap()
      assert(a == b, s"$name emitted different rows across two runs")
    }
  }

  test("cosine top-k is self-exclusive and correctly ranked") {
    val res = SparkEntry.queries("q31_cosine_topk")(spark, sf).collect()
    assert(res.forall(r => r.getLong(0) != r.getLong(2))) // q_id != n_id
    val byQ = res.groupBy(_.getLong(0))
    assert(byQ.values.forall(_.map(_.getInt(1)).sorted.toSeq == (1 to 5)))
  }
}
