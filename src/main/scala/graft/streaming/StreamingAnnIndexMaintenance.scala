package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.llmdata.{AnnChoice, AnnIndex}

/** Continuous maintenance of the persisted inverted-list ANN index —
  * the streaming twin of [[AnnIndex.syncTo]]'s delta step, and the ANN
  * analogue of [[StreamingIndexMaintenance]] (BM25): an embedding
  * stream (new documents embedded at crawl time, CDC off the vector
  * store) feeds the persisted lists one micro-batch at a time, so the
  * index-served search (q212) answers over a corpus that is never
  * more than one trigger behind ingestion, without ever re-assigning
  * the corpus.
  *
  * Wiring is `foreachBatch` → [[AnnIndex.ingest]]: each micro-batch
  * appends ONE manifest-committed (vec_id, list_id) batch carrying the
  * usual `_fp`/`_choice` sidecars, assigned under the SAME persisted
  * choice artifact every batch uses — batch ingests, [[AnnIndex.syncTo]]
  * deltas, streaming ingests and [[AnnIndex.compact]] all serialize on
  * the live generation's AppendLog lock, so a mixed history stays
  * consistent and the serve gates (coverage, choice consistency) hold
  * across all four writers. [[AnnIndex.syncTo]]'s REBUILD arm builds
  * its new generation outside any lock (it writes where no one else
  * does), then serializes the swap against this stream on that same
  * lock (round 14): the old generation's replay mark is re-read under
  * the lock and re-stamped into the new generation if a micro-batch
  * advanced it during the build, and an ingest that raced the swap
  * refuses loudly on the liveness recheck instead of committing into
  * a superseded generation — so a rebuild can run UNDER live ingest
  * without either silent double-ingest-on-replay or stranded rows.
  *
  * Replay contract: foreachBatch is AT-LEAST-ONCE — after a crash the
  * last micro-batch re-runs. A double-ingested batch folds its
  * fingerprint into the coverage TWICE, and the coverage gate then
  * refuses every later serve: for this sink a replay is not a
  * harmless duplicate but a bricked index. The armor is the
  * per-batch `_stream_batch_id` stamp ([[StreamingIndexMaintenance]]'s
  * device): [[ingestBatch]] skips any id at or below the committed
  * high-water mark ([[AnnIndex.maxStreamBatchId]]; monotone micro-batch
  * ids make ≤ the exact replay predicate), and [[AnnIndex.compact]]
  * carries the mark forward inside the lock. Safe because a streaming
  * query runs ONE foreachBatch at a time and replays sequentially;
  * batch/delta writers never stamp ids, so they cannot move the mark.
  *
  * Scale (100 TB, 1000 executors): the per-micro-batch cost is one
  * batch-sized assignment (broadcast centroids/planes, map-only) plus
  * one batch-sized parquet append — never a corpus pass; the serve
  * keeps probing only the lists a query ranks, so index freshness and
  * serve cost stay decoupled. Choice drift is the one thing this twin
  * deliberately does NOT handle in-stream: a retune changes every
  * assignment, which is [[AnnIndex.syncTo]]'s rebuild arm — run it
  * between stream generations, not inside a micro-batch. */
object StreamingAnnIndexMaintenance {

  /** The per-micro-batch ingest body — exposed so the spec can drive
    * replay scenarios directly. Skips ids already committed.
    *
    * ONE-CHECKPOINT-PER-INDEX contract (round-12 advice): the replay
    * predicate assumes micro-batch ids are monotone across the index's
    * lifetime, which holds only within one checkpoint lineage. A NEW
    * streaming query (fresh checkpointDir) restarts ids at 0, so the
    * old lineage's high-water mark would silently swallow every new
    * micro-batch up to it — surfacing only much later as a
    * coverage-gate refusal at serve, far from the cause. The restart
    * is detectable at its first batch (id 0 against a mark > 0) and
    * refused LOUDLY here; [[AnnIndex.clearStreamMark]] is the
    * deliberate escape hatch once the old query is retired. The one
    * ambiguous case (id 0 against mark == 0) is indistinguishable from
    * a legitimate crash replay of the very first micro-batch and keeps
    * the skip — under a fresh lineage that skip costs one batch whose
    * absence the coverage gate still reports. */
  def ingestBatch(indexDir: String, art: AnnChoice.Artifact,
      compactEvery: Option[Int] = None)(
      batch: DataFrame, batchId: Long): Unit = {
    val s = batch.sparkSession
    val mark = graft.Phases.time("replay_mark_read")(
      AnnIndex.maxStreamBatchId(s, indexDir))
    if (batchId == 0L && mark.exists(_ > 0L))
      throw new IllegalStateException(
        s"streaming ANN-index maintenance at $indexDir: micro-batch 0 " +
          s"arrived but the index's replay mark is ${mark.get} — a NEW " +
          "checkpoint lineage is writing to an index owned by an older " +
          "one, and the mark would silently skip every batch up to it. " +
          "One checkpoint per index: resume the original checkpointDir, " +
          "or retire the old query and run AnnIndex.clearStreamMark " +
          "(safe only if the new stream carries rows the index has not " +
          "already committed)")
    // the compaction cadence is gated on the batch actually having
    // been INGESTED (round-14 advice): a replayed batch must not
    // trigger a full lists-table rewrite that bounds nothing, and the
    // generation to compact is the one the ingest itself committed
    // into — re-resolving the live pointer here could race a rebuild
    // swap and rewrite a generation the cadence check never saw
    val ingestedDir: Option[String] =
      if (!mark.exists(_ >= batchId))
        Some(AnnIndex.ingest(s, indexDir, batch, art, Some(batchId)))
      else None
    for (n <- compactEvery; dir <- ingestedDir)
      if (graft.sources.AppendLog.state(s, dir)._2.length >= n)
        AnnIndex.compactLists(s, dir)
  }

  /** Start continuous maintenance of the index at `indexDir` from a
    * streaming (vec_id, embedding) frame, every batch assigned under
    * the one persisted choice artifact.
    *
    * `compactEvery = Some(n)` wires the marker-carrying compaction
    * into the loop (the [[StreamingUpsert]] `keepManifests` device
    * applied to the lists table): whenever the live generation holds
    * ≥ n committed batch dirs, the micro-batch ends with one
    * [[AnnIndex.compact]] — so a long-lived stream bounds its OWN
    * metadata instead of accumulating one dir per trigger forever
    * (8,760/year at hourly triggers; the replay-mark read and every
    * serve's manifest resolution walk that list — measured
    * 0.24 s/batch at just 40 dirs). Compaction serializes on the same
    * ingest lock, carries the coverage/choice markers AND the replay
    * high-water mark (a replayed micro-batch arriving after an
    * in-loop compaction is still recognized — spec-pinned), and a
    * crash between ingest and compaction just leaves uncompacted dirs
    * for the next round. The price is one full lists rewrite per n
    * batches — n is the amortization knob, sized so rewrite volume
    * (corpus/n per batch) stays small next to the batch itself. */
  def start(vecs: DataFrame, indexDir: String, checkpointDir: String,
      art: AnnChoice.Artifact,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds"),
      compactEvery: Option[Int] = None)
      : StreamingQuery =
    vecs.writeStream
      .foreachBatch((b: DataFrame, id: Long) =>
        ingestBatch(indexDir, art, compactEvery)(b, id))
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}
