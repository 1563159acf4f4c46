package graft.streaming

import graft.SparkSpec
import graft.llmdata.IncrementalIndexing
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Continuous index maintenance: a streamed corpus must build the SAME
  * index a batch build produces, and at-least-once micro-batch replays
  * must not double-ingest (the append-only sink's replay armor). */
class StreamingIndexSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def served(dir: String): Seq[Seq[Any]] =
    IncrementalIndexing.bm25(
      IncrementalIndexing.readPostings(spark, dir),
      IncrementalIndexing.readDocStats(spark, dir),
      IncrementalIndexing.QueryTerms)
      .collect().toSeq.map(_.toSeq)

  test("stream-built index serves exactly the batch-built retrieval") {
    val sp = spark
    import sp.implicits._
    val dir = java.nio.file.Files.createTempDirectory("simidx")
      .toString + "/index"
    val ckpt = java.nio.file.Files.createTempDirectory("simckpt").toString
    val docs = graft.Tables.documents(sp, sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String)](sp)
    val q = StreamingIndexMaintenance.start(
      input.toDF.toDF("doc_id", "text"), dir, ckpt,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    val (a, b) = docs.splitAt(docs.length / 2)
    // one processAllAvailable per addData forces ≥2 micro-batches
    input.addData(a.toSeq); q.processAllAvailable()
    input.addData(b.toSeq); q.processAllAvailable()
    q.stop()
    // ≥2 committed segments (one per micro-batch), same serve as batch
    assert(graft.sources.AppendLog.state(sp, dir)._2.size >= 2)
    val batchDir = java.nio.file.Files.createTempDirectory("simbatch")
      .toString + "/index"
    IncrementalIndexing.ingest(sp, batchDir,
      graft.Tables.documents(sp, sf))
    assert(served(dir) == served(batchDir))
  }

  test("compactEvery bounds segment growth in-loop; mark carries; a new lineage refuses; clearStreamMark re-opens") {
    val sp = spark
    val dir = java.nio.file.Files.createTempDirectory("simcadence")
      .toString + "/index"
    val all = graft.Tables.documents(sp, sf).select("doc_id", "text")
    (0 until 6).foreach { i =>
      StreamingIndexMaintenance.ingestBatch(dir, Some(3))(
        all.filter(col("doc_id") % 6 === i), i.toLong)
      assert(graft.sources.AppendLog.state(sp, dir)._2.length <= 3,
        s"segment count must stay bounded after batch $i")
    }
    assert(IncrementalIndexing.maxStreamBatchId(sp, dir).contains(5L),
      "in-loop compactions must carry the mark")
    // full corpus ingested across the compactions: serve ≡ batch build
    val batchDir = java.nio.file.Files.createTempDirectory("simcadb")
      .toString + "/index"
    IncrementalIndexing.ingest(sp, batchDir,
      graft.Tables.documents(sp, sf))
    assert(served(dir) == served(batchDir))
    // a NEW checkpoint lineage (id 0 against mark 5) refuses loudly
    val e = intercept[IllegalStateException] {
      StreamingIndexMaintenance.ingestBatch(dir)(
        all.filter(col("doc_id") % 6 === 0), 0L)
    }
    assert(e.getMessage.contains("clearStreamMark"), s"got: $e")
    // the deliberate escape hatch
    IncrementalIndexing.clearStreamMark(sp, dir)
    assert(IncrementalIndexing.maxStreamBatchId(sp, dir).isEmpty)
  }

  test("a replayed micro-batch id is skipped — postings never double") {
    val sp = spark
    val dir = java.nio.file.Files.createTempDirectory("simreplay")
      .toString + "/index"
    val batch: DataFrame = graft.Tables.documents(sp, sf)
      .filter(col("doc_id") < 50).select("doc_id", "text")
    StreamingIndexMaintenance.ingestBatch(dir)(batch, 0L)
    val once = IncrementalIndexing.readPostings(sp, dir).count()
    assert(once > 0)
    // at-least-once replay of the same micro-batch: must be a no-op
    StreamingIndexMaintenance.ingestBatch(dir)(batch, 0L)
    assert(IncrementalIndexing.readPostings(sp, dir).count() == once)
    // the NEXT micro-batch ingests normally
    StreamingIndexMaintenance.ingestBatch(dir)(
      graft.Tables.documents(sp, sf)
        .filter(col("doc_id") >= 50 && col("doc_id") < 100)
        .select("doc_id", "text"), 1L)
    assert(IncrementalIndexing.readPostings(sp, dir).count() > once)
    assert(IncrementalIndexing.maxStreamBatchId(sp, dir).contains(1L))
  }

  test("a replayed micro-batch never triggers the in-loop compaction (round-14 advice)") {
    val sp = spark
    val dir = java.nio.file.Files.createTempDirectory("simnocompact")
      .toString + "/index"
    val docs = graft.Tables.documents(sp, sf).select("doc_id", "text")
    StreamingIndexMaintenance.ingestBatch(dir)(
      docs.filter(col("doc_id") < 50), 0L)
    StreamingIndexMaintenance.ingestBatch(dir)(
      docs.filter(col("doc_id") >= 50 && col("doc_id") < 100), 1L)
    val names0 = graft.sources.AppendLog.state(sp, dir)._2
    assert(names0.length == 2)
    // stale replay under a cadence that WOULD fire if checked: the
    // gate must see the batch was skipped and leave the segments
    // byte-identical — the pre-fix code rewrote the whole index here,
    // a full-table compaction that bounded nothing
    StreamingIndexMaintenance.ingestBatch(dir, compactEvery = Some(1))(
      docs.filter(col("doc_id") < 50), 1L)
    assert(graft.sources.AppendLog.state(sp, dir)._2 == names0,
      "a replayed batch must not rewrite the index")
  }

  test("compaction carries the replay high-water mark forward") {
    val sp = spark
    val dir = java.nio.file.Files.createTempDirectory("simhwm")
      .toString + "/index"
    val docs = graft.Tables.documents(sp, sf).select("doc_id", "text")
    StreamingIndexMaintenance.ingestBatch(dir)(
      docs.filter(col("doc_id") < 50), 0L)
    StreamingIndexMaintenance.ingestBatch(dir)(
      docs.filter(col("doc_id") >= 50 && col("doc_id") < 100), 1L)
    IncrementalIndexing.compact(sp, dir)
    assert(IncrementalIndexing.maxStreamBatchId(sp, dir).contains(1L),
      "compacted dir must keep the mark")
    val n = IncrementalIndexing.readPostings(sp, dir).count()
    // a stale replay AFTER compaction must still be recognized
    StreamingIndexMaintenance.ingestBatch(dir)(
      docs.filter(col("doc_id") < 50), 1L)
    assert(IncrementalIndexing.readPostings(sp, dir).count() == n)
  }
}
