package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental (streaming) token-budget admission — the ingest-time
  * twin of the batch data-mixture cap (q72, `llmdata/Mixing`).
  *
  * The batch op answers "which docs make the recipe" over a finished
  * corpus; a streaming intake needs the decision AT ARRIVAL: admit the
  * doc into the training mix while its source still has token budget,
  * turn it away after. One `groupByKey(source).flatMapGroupsWithState`
  * holds each source's running spend; every arriving doc gets an
  * explicit, immutable decision row (admission manifests are audit
  * artifacts, so rejections are emitted, not dropped).
  *
  * Ordering contract: admission is ARRIVAL-order across micro-batches
  * (an intake can't reorder what hasn't arrived); within a micro-batch
  * it is (md5(doc_id), doc_id) — the SAME order the batch recipe uses,
  * so one-batch processing reproduces q72 exactly (spec-pinned), and
  * partition order never leaks into decisions.
  *
  * Replay: decisions are remembered by doc id — an at-least-once
  * replay re-emits NOTHING (neither a flipped decision nor a double
  * spend). Decision memory grows with distinct arrivals per source;
  * production intakes bound it with a state TTL matched to the replay
  * horizon (checkpoint retention), same note as [[StreamingDedup]].
  *
  * Scale (100 TB intake, 1000 executors): state is keyed by source —
  * the crawl shard / feed id, open cardinality — and holds one long
  * plus the id memory per source; the shuffle is the same
  * source-keyed exchange the batch window uses. RocksDB state store
  * for corpus-scale key counts.
  */
object StreamingAdmission {

  /** An arriving document, reduced to its admission-relevant columns. */
  final case class Arrival(doc_id: Long, source: String, n_tok: Long, h: String)

  /** Per-source state: tokens spent + ids already decided. `ver` is
    * the state-schema version, checked on restore ([[StateVersion]]);
    * bump [[SourceStateVer]] on any semantic change. */
  final case class SourceState(spent: Long, decided: Set[Long],
      ver: Int = SourceStateVer)

  final val SourceStateVer = 1

  /** One immutable decision row. `cum_tok` is the source's spend AFTER
    * this decision (unchanged when rejected). */
  final case class Decision(doc_id: Long, source: String, n_tok: Long,
      admitted: Boolean, cum_tok: Long)

  /** (doc_id, source, n_tok, h) projections for a (doc_id, source,
    * text) frame — stateless, batch or streaming. */
  def arrivals(docs: DataFrame): Dataset[Arrival] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("source"),
      size(split(col("text"), " ")).cast("long").as("n_tok"),
      md5(col("doc_id").cast("string")).as("h"))
      .as[Arrival]
  }

  /** The stateful admission stage; works under a streaming query
    * (cross-batch spend) and in batch mode (each source processed
    * once — which reproduces the q72 recipe, see spec).
    *
    * Two cutoff strategies, chosen to match what the manifest is FOR:
    *  - prefix (default, q72 parity): every offered doc consumes
    *    budget whether admitted or not, so the admitted set is a
    *    strict prefix of the arrival/md5 order — the reproducible
    *    "take until the budget is reached" recipe. `cum_tok` is the
    *    offered running sum, exactly q72's column.
    *  - bestFit: only admitted docs spend; a doc that overshoots is
    *    rejected but a smaller later one may still fit — packs the
    *    budget tighter at the cost of order-dependence in WHICH docs
    *    land (the intake-efficiency trade, not the audit-recipe one). */
  def admit(in: Dataset[Arrival], budget: Long = 600,
      bestFit: Boolean = false): Dataset[Decision] = {
    import in.sparkSession.implicits._
    def fn(source: String, rows: Iterator[Arrival],
        st: GroupState[SourceState]): Iterator[Decision] = {
      val prev = st.getOption.getOrElse(SourceState(0L, Set.empty))
      StateVersion.check(prev.ver, SourceStateVer, "StreamingAdmission.admit")
      var spent = prev.spent
      var decided = prev.decided
      val out = List.newBuilder[Decision]
      // the batch recipe's order, applied within the micro-batch
      rows.toSeq.sortBy(r => (r.h, r.doc_id)).foreach { r =>
        if (!decided.contains(r.doc_id)) {
          decided += r.doc_id
          val ok = spent + r.n_tok <= budget
          if (ok || !bestFit) spent += r.n_tok
          out += Decision(r.doc_id, source, r.n_tok, ok, spent)
        }
      }
      st.update(SourceState(spent, decided))
      out.result().iterator
    }
    in.groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  /** Convenience: docs(doc_id, source, text) → decisions. */
  def admitDocs(docs: DataFrame, budget: Long = 600,
      bestFit: Boolean = false): Dataset[Decision] =
    admit(arrivals(docs), budget, bestFit)
}
