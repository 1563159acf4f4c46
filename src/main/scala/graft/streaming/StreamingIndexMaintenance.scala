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
    * replay scenarios directly. Skips ids already committed. */
  def ingestBatch(indexDir: String)(batch: DataFrame, batchId: Long)
      : Unit = {
    val s = batch.sparkSession
    if (!IncrementalIndexing.maxStreamBatchId(s, indexDir)
        .exists(_ >= batchId))
      IncrementalIndexing.ingest(s, indexDir, batch, Some(batchId))
  }

  /** Start continuous maintenance of the index at `indexDir` from a
    * streaming (doc_id, text, ...) frame. */
  def start(docs: DataFrame, indexDir: String, checkpointDir: String,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds"))
      : StreamingQuery =
    docs.writeStream
      .foreachBatch((b: DataFrame, id: Long) => ingestBatch(indexDir)(b, id))
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}
