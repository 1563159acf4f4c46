package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.llmdata.IncrementalIndexing

/** Continuous inverted-index maintenance — the streaming twin of the
  * q132 batch seam: a document stream (crawl ingest, CDC off the doc
  * store) feeds the persisted BM25 index one micro-batch at a time,
  * so retrieval serves from an index that is never more than one
  * trigger behind the corpus, without ever re-tokenizing it.
  *
  * Wiring is `foreachBatch` → [[IncrementalIndexing.ingest]]: each
  * micro-batch appends ONE manifest-committed posting segment (the
  * same on-disk protocol batch ingests and compaction use, so all
  * three writers serialize on the AppendLog lock and a mixed
  * batch/stream/compaction history stays consistent).
  *
  * Replay contract: foreachBatch is AT-LEAST-ONCE — after a crash the
  * last micro-batch can re-run. For most sinks idempotent overwrite
  * absorbs that; an append-only index CANNOT (a double-ingested batch
  * doubles its docs' df forever). The armor is the per-segment
  * `_stream_batch_id` stamp: the ingest records the micro-batch id in
  * the committed dir, and [[ingestBatch]] skips any id at or below the
  * committed high-water mark (monotone micro-batch ids make ≤ the
  * exact replay predicate; compaction carries the mark forward).
  * Safe because a streaming query runs ONE foreachBatch at a time and
  * replays sequentially — the check-then-ingest window has no second
  * streaming writer by construction; batch/compaction writers never
  * stamp ids, so they cannot move the mark.
  */
object StreamingIndexMaintenance {

  /** The per-micro-batch ingest body — exposed so the spec can drive
    * replay scenarios directly. Skips ids already committed.
    *
    * ONE-CHECKPOINT-PER-INDEX contract (round 13, mirroring
    * [[StreamingAnnIndexMaintenance.ingestBatch]]): the replay
    * predicate assumes micro-batch ids are monotone across the index's
    * lifetime, which holds only within one checkpoint lineage — a NEW
    * query (fresh checkpointDir) restarts ids at 0, and the old
    * lineage's high-water mark would silently swallow every new batch
    * up to it, surfacing only as missing documents at retrieval time.
    * Refused loudly at the detectable first batch (id 0 against a
    * mark > 0); [[IncrementalIndexing.clearStreamMark]] is the
    * deliberate escape hatch once the old query is retired. */
  def ingestBatch(indexDir: String,
      compactEvery: Option[Int] = None)(
      batch: DataFrame, batchId: Long): Unit = {
    val s = batch.sparkSession
    val mark = IncrementalIndexing.maxStreamBatchId(s, indexDir)
    if (batchId == 0L && mark.exists(_ > 0L))
      throw new IllegalStateException(
        s"streaming index maintenance at $indexDir: micro-batch 0 " +
          s"arrived but the index's replay mark is ${mark.get} — a NEW " +
          "checkpoint lineage is writing to an index owned by an older " +
          "one, and the mark would silently skip every batch up to it. " +
          "One checkpoint per index: resume the original checkpointDir, " +
          "or retire the old query and run " +
          "IncrementalIndexing.clearStreamMark (safe only if the new " +
          "stream carries docs the index has not already committed)")
    // cadence gated on the batch actually having been INGESTED
    // (round-14 advice, mirrored from the ANN twin): a replayed batch
    // must not trigger a full-index rewrite that bounds nothing
    val ingested = !mark.exists(_ >= batchId)
    if (ingested)
      IncrementalIndexing.ingest(s, indexDir, batch, Some(batchId))
    compactEvery.foreach { n =>
      if (ingested &&
          graft.sources.AppendLog.state(s, indexDir)._2.length >= n)
        IncrementalIndexing.compact(s, indexDir)
    }
  }

  /** Start continuous maintenance of the index at `indexDir` from a
    * streaming (doc_id, text, ...) frame.
    *
    * `compactEvery = Some(n)` wires the term-sorted compaction into
    * the loop (the same cadence device as
    * [[StreamingAnnIndexMaintenance.start]]): whenever ≥ n segments
    * are committed, the micro-batch ends with one
    * [[IncrementalIndexing.compact]] — bounding segment-dir growth
    * (the serve-path union and the replay-mark read walk that list)
    * AND keeping the postings term-clustered so the q132 term filter
    * prunes at the parquet level. Same lock, the mark carries through
    * (spec-pinned); n amortizes the full-index rewrite. */
  def start(docs: DataFrame, indexDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds"),
      compactEvery: Option[Int] = None)
      : StreamingQuery =
    docs.writeStream
      .foreachBatch((b: DataFrame, id: Long) =>
        ingestBatch(indexDir, compactEvery)(b, id))
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}
