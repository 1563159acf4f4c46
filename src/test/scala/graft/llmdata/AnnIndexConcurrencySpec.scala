package graft.llmdata

import org.apache.spark.sql.functions._

/** REAL-THREAD rebuild-vs-streaming-ingest race — the live twin of
  * [[AnnIndexRebuildRaceSpec]]'s hook-injected interleavings: a
  * `syncTo` thread and a streaming-ingest thread race on one index
  * with no injected synchronization, and the END STATE must satisfy
  * the serialization contract in EVERY interleaving draw.
  *
  * Stays inside the twin's documented contract: both threads use the
  * SAME choice artifact (retunes are deliberately out-of-stream — a
  * racing retune would mix `_choice` markers, which the gates refuse
  * by design). The stream carries one FOREIGN vector (an id the
  * corpus lacks), so whichever side commits first the index diverges
  * from the corpus and `syncTo` exercises its rebuild arm under live
  * ingest. The invariants, deterministic across all interleavings:
  *
  *   - no thread dies outside the two LOUD, retryable refusal classes
  *     (held ingest lock, lost liveness race) — never a silent loss;
  *   - the replay mark ends at the streamed batch id (captured
  *     pre-build, re-stamped under the lock, or stamped into the new
  *     generation directly);
  *   - a bounded number of `syncTo` calls CONVERGES: the serve is
  *     green and row-identical to fresh assignment (a foreign batch
  *     landing post-swap leaves a coverage mismatch that refuses
  *     loudly — the documented repairable class — and the next
  *     rebuild clears it; it can never refuse silently-wrong). */
class AnnIndexConcurrencySpec extends graft.SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def tempDir(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  test("a real-thread rebuild racing a streaming ingest always converges: loud refusals only, mark preserved, serve green") {
    val stash = tempDir("ann-conc-stash-")
    Similarity.annFamilyTunePersist(spark, sf, stash)
    val art = AnnChoice.read(spark, stash).get
    val idx = tempDir("ann-conc-idx-")
    assert(AnnIndex.syncTo(spark, sf, stash, idx)._2 == "rebuilt")
    val dim = graft.Tables.embeddings(spark, sf)
      .select(size(col("embedding"))).head().getInt(0)
    for (round <- 1 to 3) {
      val batchId = round.toLong // monotone stream ids across rounds
      // one foreign vector: an id the corpus lacks, so the committed
      // batch makes the index diverge and the rebuild arm engages
      val foreign = spark.range(1).select(
        (lit(10000000L) + round).as("vec_id"),
        array((0 until dim).map(j => lit(0.1f * (j % 7 + 1))): _*)
          .as("embedding"))
      val failures =
        new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val rebuild = new Thread(() =>
        try {
          val (_, action) = AnnIndex.syncTo(spark, sf, stash, idx)
          // "kept" iff the foreign batch had not committed when
          // coverage was read; "delta" is impossible (the lists are a
          // superset of the corpus ids, so the id-diff is empty)
          assert(Set("kept", "rebuilt").contains(action),
            s"unexpected syncTo action under the race: $action")
        } catch { case t: Throwable => failures.add(t) })
      val ingest = new Thread(() =>
        try {
          // the streaming caller's loop: a loud refusal (held lock,
          // lost liveness race) is RETRIED — what a restarted
          // micro-batch does — until the commit lands
          var done = false
          var tries = 0
          while (!done && tries < 200) {
            tries += 1
            try {
              graft.streaming.StreamingAnnIndexMaintenance
                .ingestBatch(idx, art)(foreign, batchId)
              done = true
            } catch {
              case e: IllegalStateException
                  if e.getMessage.contains("ingest-lock") ||
                    e.getMessage.contains("superseded generation") =>
                Thread.sleep(50)
            }
          }
          assert(done, s"ingest never landed after $tries tries")
        } catch { case t: Throwable => failures.add(t) })
      rebuild.start(); ingest.start()
      rebuild.join(120000); ingest.join(120000)
      assert(failures.isEmpty,
        s"round $round: unexpected failure class: " +
          failures.toArray.mkString("; "))
      assert(AnnIndex.maxStreamBatchId(spark, idx).contains(batchId),
        s"round $round: the mark must survive every interleaving")
      // convergence: at most 2 more syncTo calls reach a green serve
      // (one clears a foreign batch that landed post-swap; the second
      // bound is slack, loudly asserted if ever exceeded)
      var served = scala.util.Try(
        AnnIndex.search(spark, sf, stash, idx).collect())
      var repairs = 0
      while (served.isFailure && repairs < 2) {
        repairs += 1
        assert(served.failed.get.getMessage.contains("does not cover"),
          s"round $round: only the coverage refusal is a legal " +
            s"post-race failure, got: ${served.failed.get}")
        assert(AnnIndex.syncTo(spark, sf, stash, idx)._2 == "rebuilt")
        served = scala.util.Try(
          AnnIndex.search(spark, sf, stash, idx).collect())
      }
      val fresh =
        Similarity.annFamilySearchFrom(spark, sf, stash).collect()
      assert(served.isSuccess && served.get.nonEmpty &&
        served.get.toSeq == fresh.toSeq,
        s"round $round: post-race serve must converge to fresh " +
          s"assignment (repairs=$repairs)")
      assert(AnnIndex.maxStreamBatchId(spark, idx).contains(batchId),
        s"round $round: the mark must survive the repair rebuilds too")
    }
  }
}
