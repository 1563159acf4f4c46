package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SCD2 maintenance — the incremental twin of the batch
  * interval build (q74, `relational/EventOps`): apply a CDC event
  * stream to a type-2 dimension AT ARRIVAL, closing the previous
  * version the moment a key's tracked attribute changes.
  *
  * Batch q74 rebuilds the whole history from the full log; a live
  * dimension can't re-scan the log every refresh, so this module keys
  * state by the dimension key and holds only the OPEN version (state,
  * valid_from, version number, event count). Each change emits the
  * CLOSED row — an immutable fact safe to append to the dimension
  * table; the open versions are emitted on demand by a final batch
  * pass over the state's own source or read from the store.
  *
  * Contract:
  *  - Closed rows match batch q74 row-for-row when the same events
  *    flow through in event-time order (spec-pinned parity, any
  *    micro-batch slicing). Within a micro-batch, rows are applied in
  *    (ts, event_id) order — partition order never decides a version.
  *  - Out-of-order ACROSS batches is the CDC-log contract (ordered per
  *    key), matching the reference pipeline's per-device event-hub
  *    ordering; a violation is detectable (arriving ts < open
  *    valid_from) and surfaces as a `late` flag on the emitted row
  *    rather than silent misordering.
  *
  * Scale: state per key is O(1) — dimension-sized, not log-sized;
  * the shuffle is the same user-keyed exchange the batch windows use.
  */
object StreamingScd2 {

  /** An arriving change-log event. */
  final case class Change(user_id: Long, event_id: Long, ts: Timestamp,
      state: String)

  /** The open version held per key. `ver` is the state-schema version,
    * checked on restore ([[StateVersion]]). */
  final case class OpenVersion(state: String, valid_from: Timestamp,
      version: Long, n_events: Long, ver: Int = OpenVersionVer)

  final val OpenVersionVer = 1

  /** A CLOSED version row (append-only dimension fact). `late` flags
    * an event that arrived with ts before the open version's start —
    * a broken per-key ordering contract upstream. */
  final case class ClosedVersion(user_id: Long, version: Long, state: String,
      valid_from: Timestamp, valid_to: Timestamp, n_events: Long,
      late: Boolean)

  /** (user_id, event_id, ts, state) projections from the events
    * schema; stateless, batch or streaming. */
  def changes(events: DataFrame): Dataset[Change] = {
    import events.sparkSession.implicits._
    events.select(col("user_id"), col("event_id"), col("ts"),
      col("event_type").as("state")).as[Change]
  }

  /** The stateful maintenance stage: emits closed versions; the open
    * version per key stays in state. */
  def closedVersions(in: Dataset[Change]): Dataset[ClosedVersion] = {
    import in.sparkSession.implicits._
    def fn(user: Long, rows: Iterator[Change],
        st: GroupState[OpenVersion]): Iterator[ClosedVersion] = {
      var open = st.getOption.orNull
      if (open != null)
        StateVersion.check(open.ver, OpenVersionVer,
          "StreamingScd2.closedVersions")
      val out = List.newBuilder[ClosedVersion]
      rows.toSeq.sortBy(r => (r.ts.getTime, r.event_id)).foreach { r =>
        if (open == null)
          open = OpenVersion(r.state, r.ts, 1L, 1L)
        else if (r.state == open.state)
          open = open.copy(n_events = open.n_events + 1L)
        else {
          out += ClosedVersion(user, open.version, open.state,
            open.valid_from, r.ts, open.n_events,
            late = r.ts.before(open.valid_from))
          open = OpenVersion(r.state, r.ts, open.version + 1L, 1L)
        }
      }
      if (open != null) st.update(open)
      out.result().iterator
    }
    in.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  /** Convenience: events frame → closed version rows. */
  def closedForEvents(events: DataFrame): Dataset[ClosedVersion] =
    closedVersions(changes(events))
}
