package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming CDC upsert: the maintained table must always equal the
  * batch fold of the change history, micro-batch replays must be
  * no-ops (idempotent apply — the designed contrast with the
  * append-only index sink's high-water-mark armor), and a micro-batch
  * must rewrite ONLY the buckets it touches. */
class StreamingUpsertSpec extends SparkSpec {

  private def tmpTable(): String =
    java.nio.file.Files.createTempDirectory("upsert").toString + "/t"

  private def chg(rows: Seq[(Long, Long, String, String)]): DataFrame = {
    val sp = spark
    import sp.implicits._
    rows.toDF("id", "seq", "op", "payload")
  }

  private def contents(dir: String): Seq[(Long, String)] =
    StreamingUpsert.readTable(spark, dir).get
      .select("id", "payload").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted

  test("one batch applies upserts and drops deletes") {
    val dir = tmpTable()
    StreamingUpsert.applyBatch(spark, dir, 4, chg(Seq(
      (1L, 1L, "U", "a"), (2L, 2L, "U", "b"), (3L, 3L, "U", "c"),
      (2L, 4L, "D", ""))))
    assert(contents(dir) == Seq((1L, "a"), (3L, "c")))
  }

  test("within-batch conflicts resolve by seq, cross-batch by arrival") {
    val dir = tmpTable()
    // id 5: two upserts in one batch — highest seq wins
    StreamingUpsert.applyBatch(spark, dir, 4, chg(Seq(
      (5L, 1L, "U", "old"), (5L, 9L, "U", "new"), (6L, 2L, "U", "x"))))
    assert(contents(dir) == Seq((5L, "new"), (6L, "x")))
    // next batch: update 5, delete 6, insert 7
    StreamingUpsert.applyBatch(spark, dir, 4, chg(Seq(
      (5L, 10L, "U", "newer"), (6L, 11L, "D", ""), (7L, 12L, "U", "y"))))
    assert(contents(dir) == Seq((5L, "newer"), (7L, "y")))
  }

  test("replaying a micro-batch is a no-op — apply is idempotent") {
    val dir = tmpTable()
    val b1 = Seq((1L, 1L, "U", "a"), (2L, 2L, "U", "b"))
    val b2 = Seq((1L, 3L, "U", "a2"), (3L, 4L, "U", "c"), (2L, 5L, "D", ""))
    StreamingUpsert.applyBatch(spark, dir, 4, chg(b1))
    StreamingUpsert.applyBatch(spark, dir, 4, chg(b2))
    val once = contents(dir)
    // at-least-once: the LAST batch re-runs after a crash
    StreamingUpsert.applyBatch(spark, dir, 4, chg(b2))
    assert(contents(dir) == once)
  }

  test("a micro-batch rewrites only the buckets it touches") {
    val dir = tmpTable()
    // ids 0..7 across 4 buckets (id mod 4)
    StreamingUpsert.applyBatch(spark, dir, 4,
      chg((0L to 7L).map(i => (i, i, "U", s"v$i"))))
    def listing(b: Int): Seq[(String, Long, Long)] = {
      val p = new java.io.File(s"$dir/bucket=$b")
      p.listFiles().toSeq.filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.length, f.lastModified))
        .sortBy(_._1)
    }
    val before = (0 until 4).map(listing)
    // touch only bucket 1 (id 9 mod 4 = 1)
    StreamingUpsert.applyBatch(spark, dir, 4, chg(Seq((9L, 99L, "U", "z"))))
    assert(listing(1) != before(1), "touched bucket must be rewritten")
    for (b <- Seq(0, 2, 3))
      assert(listing(b) == before(b), s"bucket $b must be byte-stable")
    assert(contents(dir).size == 9)
  }

  test("streamed changes maintain the same table the batch fold produces") {
    val sp = spark
    import sp.implicits._
    val dir = tmpTable()
    val ckpt = java.nio.file.Files.createTempDirectory("upsertck").toString
    val input = MemoryStream[(Long, Long, String, String)](sp)
    val q = StreamingUpsert.start(
      input.toDF.toDF("id", "seq", "op", "payload"), dir, ckpt,
      numBuckets = 4,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    input.addData(Seq((1L, 1L, "U", "a"), (2L, 2L, "U", "b")))
    q.processAllAvailable()
    input.addData(Seq((2L, 3L, "U", "b2"), (1L, 4L, "D", ""),
      (3L, 5L, "U", "c")))
    q.processAllAvailable()
    q.stop()
    // batch fold of the same history
    val bdir = tmpTable()
    StreamingUpsert.applyBatch(spark, bdir, 4, chg(Seq(
      (1L, 1L, "U", "a"), (2L, 2L, "U", "b"))))
    StreamingUpsert.applyBatch(spark, bdir, 4, chg(Seq(
      (2L, 3L, "U", "b2"), (1L, 4L, "D", ""), (3L, 5L, "U", "c"))))
    assert(contents(dir) == contents(bdir))
    assert(contents(dir) == Seq((2L, "b2"), (3L, "c")))
  }
}
