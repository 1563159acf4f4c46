package graft.streaming

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Incremental view maintenance: only partitions whose SOURCE changed
  * recompute, unchanged outputs are untouched on disk, vanished source
  * partitions expire downstream, a lost manifest degrades to a full
  * (correct) refresh, and a mid-refresh failure leaves the old output
  * readable and the work re-runnable. */
class IncrementalRefreshSpec extends SparkSpec {

  private def fs = new Path("/tmp").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def writePart(dir: String, dt: String, ids: Seq[Long]): Unit = {
    val sp = spark
    import sp.implicits._
    ids.toDF("id").write.mode("overwrite")
      .parquet(s"$dir/dt=$dt")
  }

  private def files(dir: String): Seq[String] =
    fs.listStatus(new Path(dir)).toSeq.map(_.getPath.getName)
      .filterNot(_.startsWith("_")).sorted

  private def readIds(dir: String): Seq[Long] = {
    val sp = spark
    import sp.implicits._
    sp.read.parquet(dir).select("id").as[Long].collect().toSeq.sorted
  }

  private def doubled(df: org.apache.spark.sql.DataFrame) =
    df.select((col("id") * 2).as("id"))

  test("only changed partitions recompute; unchanged outputs untouched on disk") {
    val base = java.nio.file.Files.createTempDirectory("refresh").toString
    val (src, dst) = (s"$base/src", s"$base/dst")
    writePart(src, "a", Seq(1L, 2L))
    writePart(src, "b", Seq(10L, 20L))
    val s1 = IncrementalRefresh.refresh(spark, src, dst, "dt")(doubled)
    assert(s1.refreshed.toSet === Set("dt=a", "dt=b") && s1.removed.isEmpty)
    assert(readIds(s"$dst/dt=a") === Seq(2L, 4L))
    assert(readIds(s"$dst/dt=b") === Seq(20L, 40L))
    val bFiles = files(s"$dst/dt=b")
    // second refresh with nothing changed: no work at all
    val s2 = IncrementalRefresh.refresh(spark, src, dst, "dt")(doubled)
    assert(s2.refreshed.isEmpty && s2.unchanged.toSet === Set("dt=a", "dt=b"))
    assert(files(s"$dst/dt=b") === bFiles)
    // backfill partition a only
    writePart(src, "a", Seq(3L, 4L))
    val s3 = IncrementalRefresh.refresh(spark, src, dst, "dt")(doubled)
    assert(s3.refreshed === Seq("dt=a") && s3.unchanged === Seq("dt=b"))
    assert(readIds(s"$dst/dt=a") === Seq(6L, 8L))
    assert(files(s"$dst/dt=b") === bFiles,
      "untouched partition must keep its exact files")
  }

  test("a data-file-less partition dir is skipped, not a refresh abort") {
    val base = java.nio.file.Files.createTempDirectory("refresh").toString
    val (src, dst) = (s"$base/src", s"$base/dst")
    writePart(src, "a", Seq(1L, 2L))
    // a dir with only marker files — e.g. a crashed writer left just
    // _SUCCESS/_started; reading it throws UNABLE_TO_INFER_SCHEMA, so
    // before the round-6 ADVICE fix this aborted the whole cycle
    fs.mkdirs(new Path(s"$src/dt=ghost"))
    fs.create(new Path(s"$src/dt=ghost/_SUCCESS"), true).close()
    val s1 = IncrementalRefresh.refresh(spark, src, dst, "dt")(doubled)
    assert(s1.refreshed === Seq("dt=a") && s1.removed.isEmpty)
    assert(readIds(s"$dst/dt=a") === Seq(2L, 4L))
    // a previously-materialized partition whose data files all vanish
    // (dir remains) expires downstream like a removed partition
    writePart(src, "b", Seq(10L))
    IncrementalRefresh.refresh(spark, src, dst, "dt")(doubled)
    assert(readIds(s"$dst/dt=b") === Seq(20L))
    fs.listStatus(new Path(s"$src/dt=b")).toSeq
      .filterNot(_.getPath.getName.startsWith("_"))
      .foreach(st => fs.delete(st.getPath, false))
    val s3 = IncrementalRefresh.refresh(spark, src, dst, "dt")(doubled)
    assert(s3.removed === Seq("dt=b"))
    assert(!fs.exists(new Path(s"$dst/dt=b")))
  }

  test("vanished source partitions expire downstream; lost manifest degrades to full refresh") {
    val base = java.nio.file.Files.createTempDirectory("refresh").toString
    val (src, dst) = (s"$base/src", s"$base/dst")
    writePart(src, "a", Seq(1L))
    writePart(src, "b", Seq(2L))
    IncrementalRefresh.refresh(spark, src, dst, "dt")(doubled)
    // upstream retention dropped b
    fs.delete(new Path(s"$src/dt=b"), true)
    val s2 = IncrementalRefresh.refresh(spark, src, dst, "dt")(doubled)
    assert(s2.removed === Seq("dt=b"))
    assert(!fs.exists(new Path(s"$dst/dt=b")))
    assert(readIds(s"$dst/dt=a") === Seq(2L))
    // manifest lost: everything refreshes again, output identical
    fs.delete(new Path(dst + ".refresh-manifest"), false)
    val s3 = IncrementalRefresh.refresh(spark, src, dst, "dt")(doubled)
    assert(s3.refreshed === Seq("dt=a"))
    assert(readIds(s"$dst/dt=a") === Seq(2L))
  }

  test("a failing transform aborts before the manifest: old output readable, work re-runs") {
    val base = java.nio.file.Files.createTempDirectory("refresh").toString
    val (src, dst) = (s"$base/src", s"$base/dst")
    writePart(src, "a", Seq(1L))
    IncrementalRefresh.refresh(spark, src, dst, "dt")(doubled)
    writePart(src, "a", Seq(5L))
    intercept[RuntimeException] {
      IncrementalRefresh.refresh(spark, src, dst, "dt") { _ =>
        throw new RuntimeException("boom")
      }
    }
    // old derived rows still served; tmp/trash cleaned by the swap
    assert(readIds(s"$dst/dt=a") === Seq(2L))
    // next refresh still sees the partition as stale and completes it
    val s = IncrementalRefresh.refresh(spark, src, dst, "dt")(doubled)
    assert(s.refreshed === Seq("dt=a"))
    assert(readIds(s"$dst/dt=a") === Seq(10L))
  }
}
