package graft.llmdata

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.functions._

/** METRIC proof of the round-12 probed-lists pushdown claim (round-13
  * verdict item 2, the ZOrderSpec discipline): with the lists
  * compacted GLOBALLY SORTED by list_id and the probed id set pushed
  * as a source filter, the serve's lists scan must READ (post
  * row-group pruning, by executed-plan scan metrics — not plan text,
  * which a filter that prunes nothing would still print) a small
  * fraction of what the same serve reads over an arrival-order
  * layout, with row-identical results.
  *
  * Regime: nlists = 256 (LSH, 8 planes — "production list counts"),
  * 1 probed list per query (radius 0, ≤ the nprobe ≤ 4 brief), 20
  * queries engineered into TWO buckets ⇒ 2 of 256 lists probed. The
  * registry corpus can't exercise this (all 32 lists probed at toy
  * scale — SCALE.md's recorded caveat); this synthetic corpus is the
  * production-shaped twin. Row groups are shrunk to 64 KB for the
  * index writes so the spec-scale file has production-like PRUNING
  * GRANULARITY (at 100 TB the same granularity comes from many
  * 128 MB groups); the sorted and unsorted layouts get the same
  * granularity, so the measured gap isolates the SORT + pushdown. */
class AnnIndexScanMetricSpec extends graft.SparkSpec {
  private val N = 300000L
  private val dim = 16

  // two fixed directions with distinct first-8 sign patterns — the 20
  // served query ids (100-119, the serve contract) split across them,
  // so exactly 2 of the 256 sign buckets are probed
  private val v0 = Seq(0.9, -0.7, 0.5, -0.3, 0.8, 0.6, -0.4, 0.2,
    0.1, -0.9, 0.3, 0.7, -0.2, 0.4, -0.6, 0.5)
  private val v1 = v0.map(-_)

  private lazy val corpus: String = {
    val dir = java.nio.file.Files
      .createTempDirectory("ann-scan-corpus-").toString
    val arr = (v: Seq[Double]) => s"array(${v.mkString(",")})"
    spark.range(N).select(
      col("id").as("vec_id"), lit("l").as("label"),
      expr(s"""CASE
        WHEN id BETWEEN 100 AND 109 THEN transform(${arr(v0)},
          x -> CAST(x * (1.0 + (id - 100) / 100.0) AS FLOAT))
        WHEN id BETWEEN 110 AND 119 THEN transform(${arr(v1)},
          x -> CAST(x * (1.0 + (id - 110) / 100.0) AS FLOAT))
        ELSE transform(sequence(0, ${dim - 1}),
          j -> CAST((pmod(hash(id, j), 1999) - 999) / 999.0 AS FLOAT))
        END""").as("embedding"))
      .write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  // nlists = 2^8 = 256, radius 0 ⇒ one probed list per query; the
  // artifact is constructed directly (no tuner) — the serve gates only
  // check the corpus fingerprint and the assignment fingerprint
  private lazy val fp: (Long, Long) =
    Similarity.corpusFingerprint(spark, corpus)
  private lazy val art: AnnChoice.Artifact =
    AnnChoice.Artifact(fp._1, fp._2, "lsh", 8, 0, Seq.empty)

  /** Both index layouts written under 64 KB row groups (granularity
    * emulation, scaladoc above) — sorted = ingest + marker-carrying
    * compact (the production maintenance sequence), unsorted =
    * arrival-order ingest only. */
  private lazy val (sortedIdx, unsortedIdx): (String, String) = {
    val s = java.nio.file.Files
      .createTempDirectory("ann-scan-sorted-").toString + "/idx"
    val u = java.nio.file.Files
      .createTempDirectory("ann-scan-unsorted-").toString + "/idx"
    val raw = graft.Tables.embeddings(spark, corpus)
      .select(col("vec_id"), col("embedding"))
    val hc = spark.sparkContext.hadoopConfiguration
    val prev = hc.get("parquet.block.size")
    hc.set("parquet.block.size", "65536")
    try {
      AnnIndex.ingest(spark, s, raw, art)
      AnnIndex.compact(spark, s)
      AnnIndex.ingest(spark, u, raw, art)
    } finally {
      if (prev == null) hc.unset("parquet.block.size")
      else hc.set("parquet.block.size", prev)
    }
    (s, u)
  }

  private def dedupByRef(s: Seq[FileSourceScanExec]): Seq[FileSourceScanExec] = {
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[FileSourceScanExec, java.lang.Boolean]())
    s.filter(seen.add)
  }

  /** Every file scan in the EXECUTED plan, through AQE stage wrappers
    * and reused exchanges. */
  private def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
    case q: QueryStageExec => scans(q.plan)
    case r: ReusedExchangeExec => scans(r.child)
    case f: FileSourceScanExec => Seq(f)
    case other => other.children.flatMap(scans)
  }

  /** Rows the LISTS scan emitted (post row-group pruning). MIN of two
    * fresh executions — the ZOrderSpec retry-inflation guard. */
  private def listsScanRows(root: String)(mk: => DataFrame): Long = {
    val marker = new java.io.File(root).getParentFile.getName
    def once: Long = {
      val df = mk
      df.collect()
      val mine = dedupByRef(scans(df.queryExecution.executedPlan))
        .filter(_.relation.location.rootPaths
          .exists(_.toString.contains(marker)))
      assert(mine.nonEmpty, s"no lists scan found under $root")
      mine.map(_.metrics("numOutputRows").value).sum
    }
    math.min(once, once)
  }

  test("sorted + pushed serve reads a probed-lists-bounded fraction; arrival-order reads ~all; results identical") {
    val sortedRows = listsScanRows(sortedIdx)(
      AnnIndex.searchWith(spark, corpus, fp, art, sortedIdx))
    val unsortedRows = listsScanRows(unsortedIdx)(
      AnnIndex.searchWith(spark, corpus, fp, art, unsortedIdx))
    info(s"lists scan rows: sorted+pushed=$sortedRows " +
      s"arrival-order=$unsortedRows of $N " +
      f"(fraction ${sortedRows.toDouble / N}%.4f)")
    // arrival order: every 64 KB row group spans ~all 256 lists, so
    // the pushed In(list_id, ...) prunes nothing — the layout the
    // pushdown exists to beat
    assert(unsortedRows > N * 4 / 5,
      s"arrival-order lists must read ~everything ($unsortedRows of $N)")
    // sorted: 2 of 256 lists probed ⇒ ~0.8% of rows + row-group
    // rounding. The bound is slack (5%): the claim is the
    // order-of-magnitude class, pinned absolutely and vs the baseline
    assert(sortedRows < N / 20,
      s"sorted+pushed lists scan must be probed-lists-bounded " +
        s"($sortedRows of $N)")
    assert(sortedRows * 10 < unsortedRows,
      s"sorted+pushed must read ≥10x less than arrival order " +
        s"($sortedRows vs $unsortedRows)")
    // and the layout is an optimization, never a semantics change
    val a = AnnIndex.searchWith(spark, corpus, fp, art, sortedIdx)
      .collect().toSeq
    val b = AnnIndex.searchWith(spark, corpus, fp, art, unsortedIdx)
      .collect().toSeq
    assert(a.nonEmpty && a == b,
      "sorted and arrival-order serves must be row-identical")
  }
}
