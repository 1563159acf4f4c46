package graft.streaming

import graft.SparkSpec
import graft.llmdata.{AnnChoice, AnnIndex, Similarity}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Continuous ANN-index maintenance: a streamed corpus must build an
  * index that serves EXACTLY what the fresh-assignment serve answers
  * (the q212 parity argument), and at-least-once micro-batch replays
  * must not double-fold the coverage fingerprint — for this sink a
  * replay is not a duplicate row but a bricked serve gate. */
class StreamingAnnIndexSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def tempDir(): String =
    java.nio.file.Files.createTempDirectory("ann-stream-spec-").toString

  private def raw() = graft.Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("embedding"))

  // one real tune supplies the real validated choice (the AnnIndexSpec
  // fixture discipline) — every streamed batch assigns under it
  private lazy val stash: String = {
    val dir = tempDir()
    Similarity.annFamilyTunePersist(spark, sf, dir)
    dir
  }
  private lazy val art: AnnChoice.Artifact = AnnChoice.read(spark, stash).get

  test("stream-built index serves exactly the fresh-assignment serve (>=2 micro-batches)") {
    val sp = spark
    import sp.implicits._
    val dir = tempDir() + "/index"
    val ckpt = tempDir()
    val rows = raw().collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val input = MemoryStream[(Long, Seq[Float])](sp)
    val q = StreamingAnnIndexMaintenance.start(
      input.toDF.toDF("vec_id", "embedding"), dir, ckpt, art,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    val (a, b) = rows.splitAt(rows.length / 2)
    // one processAllAvailable per addData forces >=2 micro-batches
    input.addData(a.toSeq); q.processAllAvailable()
    input.addData(b.toSeq); q.processAllAvailable()
    q.stop()
    assert(graft.sources.AppendLog.state(sp,
      AnnIndex.currentListsDir(sp, dir).get)._2.size >= 2)
    // the streamed batches partition the corpus, counts sum and xors
    // fold, so the coverage gate passes and the serve is row-identical
    // to the fresh-assignment serve — same contract as batch ingest
    val served = AnnIndex.search(sp, sf, stash, dir).collect()
    val fresh = Similarity.annFamilySearchFrom(sp, sf, stash).collect()
    assert(served.nonEmpty && served.toSeq == fresh.toSeq)
  }

  test("a replayed micro-batch id is skipped — coverage never double-folds") {
    val sp = spark
    val dir = tempDir() + "/index"
    val maxId = raw().agg(max("vec_id")).head().getLong(0)
    val first = raw().filter(col("vec_id") <= maxId / 2)
    StreamingAnnIndexMaintenance.ingestBatch(dir, art)(first, 0L)
    val lists = AnnIndex.currentListsDir(sp, dir).get
    val once = sp.read.parquet(
      graft.sources.AppendLog.state(sp, lists)._2.map(b => s"$lists/$b"): _*)
      .count()
    assert(once > 0)
    // at-least-once replay of the same micro-batch: must be a no-op.
    // NOTE id 0 against mark 0 is the one ambiguous restart case the
    // twin deliberately keeps as a skip (see ingestBatch scaladoc)
    StreamingAnnIndexMaintenance.ingestBatch(dir, art)(first, 0L)
    assert(graft.sources.AppendLog.state(sp, lists)._2.size == 1,
      "replayed id must not commit a second batch")
    // the NEXT micro-batch ingests normally; full coverage serves green
    StreamingAnnIndexMaintenance.ingestBatch(dir, art)(
      raw().filter(col("vec_id") > maxId / 2), 1L)
    assert(AnnIndex.maxStreamBatchId(sp, dir).contains(1L))
    assert(AnnIndex.search(sp, sf, stash, dir).collect().nonEmpty)
  }

  test("compactEvery bounds batch-dir growth in-loop; replay skip and serve parity hold through it") {
    val sp = spark
    val dir = tempDir() + "/index"
    val maxId = raw().agg(max("vec_id")).head().getLong(0)
    // 6 micro-batches by id range, in-loop compaction at >= 3 dirs
    val slices = (0 until 6).map(i => raw().filter(
      col("vec_id") % 6 === i))
    slices.zipWithIndex.foreach { case (b, i) =>
      StreamingAnnIndexMaintenance
        .ingestBatch(dir, art, compactEvery = Some(3))(b, i.toLong)
      val lists = AnnIndex.currentListsDir(sp, dir).get
      assert(graft.sources.AppendLog.state(sp, lists)._2.length <= 3,
        s"dir count must stay bounded by the cadence after batch $i")
    }
    assert(AnnIndex.maxStreamBatchId(sp, dir).contains(5L),
      "in-loop compactions must carry the mark")
    // a stale replay after an in-loop compaction is still recognized
    val lists = AnnIndex.currentListsDir(sp, dir).get
    val n0 = graft.sources.AppendLog.state(sp, lists)._2.length
    StreamingAnnIndexMaintenance
      .ingestBatch(dir, art, compactEvery = Some(3))(slices(2), 2L)
    assert(graft.sources.AppendLog.state(sp, lists)._2.length == n0)
    // full coverage: the compacted index serves the fresh-serve rows
    assert(AnnIndex.search(sp, sf, stash, dir).collect().toSeq ==
      Similarity.annFamilySearchFrom(sp, sf, stash).collect().toSeq)
    assert(maxId >= 0) // anchor the fixture read
  }

  test("a replayed micro-batch never triggers the in-loop compaction (round-14 advice)") {
    val sp = spark
    val dir = tempDir() + "/index"
    val maxId = raw().agg(max("vec_id")).head().getLong(0)
    val first = raw().filter(col("vec_id") <= maxId / 2)
    StreamingAnnIndexMaintenance.ingestBatch(dir, art)(first, 0L)
    StreamingAnnIndexMaintenance.ingestBatch(dir, art)(
      raw().filter(col("vec_id") > maxId / 2), 1L)
    val lists = AnnIndex.currentListsDir(sp, dir).get
    val names0 = graft.sources.AppendLog.state(sp, lists)._2
    assert(names0.length == 2)
    // stale replay under a cadence that WOULD fire if checked: the
    // gate must see the batch was skipped and leave the lists table
    // byte-identical — the pre-fix code rewrote it here, a full
    // compaction that bounded nothing
    StreamingAnnIndexMaintenance
      .ingestBatch(dir, art, compactEvery = Some(1))(first, 1L)
    assert(graft.sources.AppendLog.state(sp, lists)._2 == names0,
      "a replayed batch must not rewrite the lists table")
  }

  test("compaction carries the replay high-water mark; serve stays green through it") {
    val sp = spark
    val dir = tempDir() + "/index"
    val maxId = raw().agg(max("vec_id")).head().getLong(0)
    StreamingAnnIndexMaintenance.ingestBatch(dir, art)(
      raw().filter(col("vec_id") <= maxId / 2), 0L)
    StreamingAnnIndexMaintenance.ingestBatch(dir, art)(
      raw().filter(col("vec_id") > maxId / 2), 1L)
    val before = AnnIndex.search(sp, sf, stash, dir).collect().toSeq
    AnnIndex.compact(sp, dir)
    assert(AnnIndex.maxStreamBatchId(sp, dir).contains(1L),
      "compacted dir must keep the mark")
    // a stale replay AFTER compaction must still be recognized
    StreamingAnnIndexMaintenance.ingestBatch(dir, art)(
      raw().filter(col("vec_id") <= maxId / 2), 1L)
    assert(graft.sources.AppendLog.state(sp,
      AnnIndex.currentListsDir(sp, dir).get)._2.size == 1,
      "stale replay after compaction must not commit")
    assert(AnnIndex.search(sp, sf, stash, dir).collect().toSeq == before)
  }
}
