package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

class ClusteredSpec extends SparkSpec {

  private def writeSample(dir: String, filesPerPartition: Int = 2): Unit = {
    val sp = spark
    import sp.implicits._
    val df = (0 until 3000).map { i =>
      (i.toLong % 500, // device_id: 500 devices interleaved
        java.sql.Timestamp.valueOf(f"2025-06-${(i % 3) + 1}%02d 10:00:00"),
        i.toDouble)
    }.toDF("device_id", "event_ts", "v")
    Clustered.write(Clustered.withEventDate(df, "event_ts"), dir,
      "event_date", Seq("device_id", "event_ts"), filesPerPartition)
  }

  test("round-trip preserves rows; layout is one directory per date with bounded files") {
    val dir = java.nio.file.Files.createTempDirectory("clustered").toString
    writeSample(dir)
    val back = Clustered.read(spark, dir)
    assert(back.count() === 3000)
    assert(back.agg(sum("v")).head.getDouble(0) === (0 until 3000).map(_.toDouble).sum)
    val dates = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("event_date="))
    assert(dates.length === 3)
    dates.foreach { d =>
      val parts = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parts.length >= 1 && parts.length <= 2,
        s"${d.getName}: ${parts.length} files for filesPerPartition=2")
    }
  }

  test("date predicate prunes partitions; id predicate pushes to the scan") {
    val dir = java.nio.file.Files.createTempDirectory("clustered").toString
    writeSample(dir)
    val q = Clustered.scan(spark, dir, "event_date",
      _ === lit(java.sql.Date.valueOf("2025-06-02")),
      "device_id", _ === 42L)
    val plan = q.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("event_date"),
      s"date predicate must prune at file listing, got: $pf")
    val pushed = plan.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(pushed.contains("device_id"),
      s"id predicate must reach the parquet reader for row-group stats, got: $pushed")
    // and the pruned scan answers correctly
    assert(q.count() === 2) // 3000 rows / 3 dates / 500 devices
  }

  test("files are sorted by the cluster key (row-group min/max stay tight)") {
    val dir = java.nio.file.Files.createTempDirectory("clustered").toString
    writeSample(dir)
    val files = Clustered.read(spark, dir)
      .select(input_file_name().as("f")).distinct().collect().map(_.getString(0))
    assert(files.nonEmpty)
    files.foreach { f =>
      // single small file = single read partition: row order preserved
      val ids = spark.read.parquet(f).select("device_id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids == ids.sorted, s"file $f not sorted by device_id")
    }
  }
}
