package graft.streaming

import graft.SparkSpec

class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("text compaction preserves the exact line multiset and shrinks file count") {
    val dir = java.nio.file.Files.createTempDirectory("bronze").toString + "/bronze"
    // simulate many micro-batch appends (each append = its own file set)
    (0 until 10).foreach { b =>
      Seq.tabulate(20)(i => s"""{"batch":$b,"line":$i}""")
        .toDF("value").coalesce(2).write.mode("append").text(dir)
    }
    val before = spark.read.text(dir).as[String].collect().sorted.toSeq
    val stats = Maintenance.compactText(spark, dir)
    val after = spark.read.text(dir).as[String].collect().sorted.toSeq
    assert(after == before) // byte-for-byte archive, nothing lost or reordered-away
    assert(stats.filesBefore == 20)
    assert(stats.filesAfter < stats.filesBefore)
    assert(stats.filesAfter == 1) // 200 tiny lines ≪ target size
  }

  test("parquet compaction preserves rows + schema") {
    val dir = java.nio.file.Files.createTempDirectory("tel").toString + "/telemetry"
    (0 until 5).foreach { b =>
      Seq.tabulate(10)(i => (s"dev$b-$i", b * 10L + i))
        .toDF("deviceId", "n").coalesce(3).write.mode("append").parquet(dir)
    }
    val before = spark.read.parquet(dir).collect().map(_.toSeq).sortBy(_.toString)
    val stats = Maintenance.compactParquet(spark, dir)
    val got = spark.read.parquet(dir)
    assert(got.columns.toSeq == Seq("deviceId", "n"))
    assert(got.collect().map(_.toSeq).sortBy(_.toString).toSeq == before.toSeq)
    assert(stats.filesAfter < stats.filesBefore)
  }

  test("retention drops only expired date partitions; unparseable entries survive") {
    val dir = java.nio.file.Files.createTempDirectory("ret").toString + "/events"
    Seq(("2024-01-01", 1L), ("2024-01-02", 2L), ("2024-01-03", 3L),
        ("2024-01-04", 4L))
      .toDF("day", "n").write.partitionBy("day").parquet(dir)
    // things a retention job must never touch: another table's partition
    // naming, and a malformed date value
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir + "/other=2020-01-01"))
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir + "/day=not-a-date"))
    val stats = Maintenance.expireDatePartitions(spark, dir, "day",
      java.time.LocalDate.parse("2024-01-03"))
    assert(stats.deleted == Seq("day=2024-01-01", "day=2024-01-02"))
    assert(stats.kept == 2)
    assert(stats.skipped.contains("other=2020-01-01") &&
      stats.skipped.contains("day=not-a-date"))
    assert(fs.exists(new org.apache.hadoop.fs.Path(dir + "/other=2020-01-01")))
    // surviving data reads back intact (ignore the malformed dir we made)
    val rows = spark.read
      .option("basePath", dir)
      .parquet(dir + "/day=2024-01-03", dir + "/day=2024-01-04")
      .select("n").as[Long].collect().sorted.toSeq
    assert(rows == Seq(3L, 4L))
    // idempotent: a second run deletes nothing more
    val again = Maintenance.expireDatePartitions(spark, dir, "day",
      java.time.LocalDate.parse("2024-01-03"))
    assert(again.deleted.isEmpty && again.kept == 2)
  }

  test("retention on an absent table dir reports empty stats, not an error") {
    // schedulable before the writer's first run (and after a full expiry)
    val stats = Maintenance.expireDatePartitions(spark,
      java.nio.file.Files.createTempDirectory("ret").toString + "/never_written",
      "day", java.time.LocalDate.parse("2024-01-03"))
    assert(stats.deleted.isEmpty && stats.kept == 0 && stats.skipped.isEmpty)
  }

  test("a leftover tmp dir from a crashed run refuses, never overwrites") {
    val dir = java.nio.file.Files.createTempDirectory("crash").toString + "/bronze"
    Seq("a", "b").toDF("value").write.mode("append").text(dir)
    java.nio.file.Files.createDirectory(java.nio.file.Paths.get(dir + ".compact-tmp"))
    val e = intercept[IllegalArgumentException] {
      Maintenance.compactText(spark, dir)
    }
    assert(e.getMessage.contains("compact-tmp"))
    // original data untouched
    assert(spark.read.text(dir).count() == 2)
  }
}
