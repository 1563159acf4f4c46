package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, OutputMode, StatefulProcessor, TimeMode, TimerValues,
  TTLConfig, ValueState}

/** Incremental (streaming) gap-fill + LOCF resampling — the cross-batch
  * twin of q107 (`relational/EventOps`): per user, one row per hour from
  * first to last activity, empty hours flagged and carrying the
  * last-observation value forward.
  *
  * This is the library's first TIMER-driven stage. Every other stateful
  * op emits only when input arrives; a gap-filler's whole point is to
  * emit WHEN NOTHING ARRIVES, so finalization is driven by the
  * event-time watermark passing an hour boundary — `flatMapGroupsWithState`
  * arms its `EventTimeTimeout` and `transformWithState` registers an
  * event-time timer (`handleExpiredTimer`), both over ONE shared fold
  * ([[advance]]), the anomaly-stage definition-sharing discipline.
  *
  * Contract (batch-q107 parity, spec-pinned):
  *  - an hour finalizes once the watermark passes its end AND the state
  *    still holds activity at or after it — so trailing hours stay open
  *    (the batch grid ends at the last event; a stream cannot know the
  *    last event has happened, it can only refuse to emit past the
  *    latest one seen);
  *  - the in-hour representative is the max-(ts, event_id) event's value
  *    (exactly q107's `max_by`); gap hours carry the previous hour's
  *    LOCF value;
  *  - events at hours the cursor has already finalized (stragglers past
  *    the configured lateness) are dropped — the standard watermark
  *    contract (T3); before anything has been emitted the grid still
  *    extends DOWNWARD to earlier in-lateness arrivals, matching the
  *    batch grid's true min hour.
  *
  * Scale: state per user is the LOCF cursor plus one entry per
  * not-yet-finalized hour — bounded by the lateness window, not the
  * stream length; the shuffle is the user-keyed exchange the batch
  * rendering uses. The TWS twin keeps pending hours in `MapState`
  * (per-entry RocksDB updates, no full-map rewrite per batch).
  */
object StreamingResample extends Serializable {
  private val HourMs = 3600000L
  private def floorHour(tsMs: Long): Long = Math.floorDiv(tsMs, HourMs) * HourMs

  final case class Ev(user_id: Long, event_id: Long, ts: Timestamp, value: Double)
  final case class HourRow(user_id: Long, hr: Timestamp, n_events: Long,
      is_gap: Int, v: Double)

  /** LOCF cursor: next hour to finalize, the carried value, whether any
    * hour has been emitted yet, and the armed event-time timer (0 =
    * none) so re-arms are delta-only. */
  final case class Cursor(hourMs: Long, locf: Double, hasEmitted: Boolean,
      armedMs: Long, ver: Int = CursorVer)

  /** State-schema version: the cursor rides inside the fMGWS
    * [[FillState]] AND is the TWS value-state, so checking it inside
    * [[advance]] covers both routes (see [[StateVersion]]). */
  final val CursorVer = 1

  /** Per-open-hour aggregate: count plus the max-(ts, event_id) value —
    * the same deterministic in-hour pick as batch q107's `max_by`. */
  final case class HourAgg(n: Long, tsMs: Long, eid: Long, v: Double)

  /** fMGWS single-value state (TWS splits cursor/pending across typed
    * handles instead). */
  final case class FillState(cursor: Cursor, pending: Map[Long, HourAgg])

  /** ONE fold for both stateful APIs: apply `rows`, then finalize every
    * hour the watermark has passed while later-or-equal activity remains
    * pending. Returns the new cursor (None ⟺ still no data), the
    * surviving pending hours, the rows to emit (hour order), and the
    * event-time timer to arm (None when nothing is pending). */
  private[streaming] def advance(key: Long, cursor0: Option[Cursor],
      pending0: Map[Long, HourAgg], rows: Seq[Ev], watermarkMs: Long)
      : (Option[Cursor], Map[Long, HourAgg], Seq[HourRow], Option[Long]) = {
    cursor0.foreach(c =>
      StateVersion.check(c.ver, CursorVer, "StreamingResample.advance"))
    val sorted = rows.sortBy(e => (e.ts.getTime, e.event_id))
    if (cursor0.isEmpty && sorted.isEmpty)
      return (None, pending0, Nil, None)
    var cur = cursor0.getOrElse(
      Cursor(floorHour(sorted.head.ts.getTime), 0.0, hasEmitted = false, 0L))
    var pending = pending0
    sorted.foreach { e =>
      val h = floorHour(e.ts.getTime)
      // before the first emission the grid still extends downward; after
      // it, h < cursor means the hour is finalized — drop (T3)
      if (h < cur.hourMs && !cur.hasEmitted) cur = cur.copy(hourMs = h)
      if (h >= cur.hourMs) {
        val tMs = e.ts.getTime
        val nxt = pending.get(h) match {
          case Some(a) =>
            val newer = tMs > a.tsMs || (tMs == a.tsMs && e.event_id > a.eid)
            HourAgg(a.n + 1,
              if (newer) tMs else a.tsMs,
              if (newer) e.event_id else a.eid,
              if (newer) e.value else a.v)
          case None => HourAgg(1L, tMs, e.event_id, e.value)
        }
        pending += h -> nxt
      }
    }
    val out = Seq.newBuilder[HourRow]
    // pending keys are always >= cursor, so nonEmpty ⟺ "later-or-equal
    // activity brackets this hour" — the batch-grid trailing bound
    while (cur.hourMs + HourMs <= watermarkMs && pending.nonEmpty) {
      val agg = pending.get(cur.hourMs)
      val locf = agg.map(_.v).getOrElse(cur.locf)
      out += HourRow(key, new Timestamp(cur.hourMs),
        agg.map(_.n).getOrElse(0L), if (agg.isEmpty) 1 else 0, locf)
      pending -= cur.hourMs
      cur = Cursor(cur.hourMs + HourMs, locf, hasEmitted = true, cur.armedMs)
    }
    val timer = if (pending.nonEmpty) Some(cur.hourMs + HourMs) else None
    (Some(cur), pending, out.result(), timer)
  }

  /** The gap-fill stage on `flatMapGroupsWithState` (event-time timeout
    * as the timer). `ds` must carry event-time `ts`; the watermark is
    * applied here.
    *
    * `retireAfterMs`: optional cursor-retirement horizon. Without it
    * the per-user LOCF cursor lives FOREVER, so state grows with total
    * distinct-user cardinality over the query lifetime even for users
    * idle for months (round-5 ADVICE) — the same unbounded-state class
    * `maxPerBucket` exists to prevent in the dedup/ANN stages. With it,
    * a user whose hours are all finalized and who stays idle while the
    * watermark advances `retireAfterMs` past their last finalized
    * activity has their state DROPPED. Trade-off (LOCF memory): a user
    * who returns after retirement starts a fresh grid at their next
    * event's hour — the idle gap is NOT emitted as gap rows and the old
    * LOCF value is forgotten, exactly as if they were a new user. Hours
    * already emitted are never re-emitted: a returning event is ≥
    * watermark − lateness, which is past the retired grid's end
    * whenever `retireAfterMs` ≥ the lateness window (keep it so). An
    * event-time horizon (not wall-clock) so replays retire
    * deterministically. */
  def fill(ds: Dataset[Ev], lateness: String = "0 seconds",
      retireAfterMs: Option[Long] = None): Dataset[HourRow] = {
    import ds.sparkSession.implicits._
    def fn(key: Long, rows: Iterator[Ev], st: GroupState[FillState])
        : Iterator[HourRow] = {
      val wm = st.getCurrentWatermarkMs()
      val prev = st.getOption
      val rs = rows.toSeq
      val (cur, pending, out, timer) = advance(key,
        prev.map(_.cursor), prev.map(_.pending).getOrElse(Map.empty),
        rs, wm)
      // a timer fired with no input, nothing to finalize, and nothing
      // pending ⟺ the RETIREMENT timer (the finalize timer always has
      // a pending hour to emit): drop the cursor — LOCF memory ends
      if (st.hasTimedOut && rs.isEmpty && out.isEmpty && pending.isEmpty
          && retireAfterMs.isDefined) {
        if (st.exists) st.remove()
        return Iterator.empty
      }
      cur.foreach(c => st.update(FillState(c, pending)))
      // arm 1 ms BEFORE the semantic boundary: event-time timeouts fire
      // only when the watermark STRICTLY exceeds the armed timestamp, so
      // arming the boundary itself would never fire for a watermark that
      // lands exactly on an hour end and then stops — while the fold's
      // finalize rule (and batch q107) includes that hour. Watermarks
      // are ms-granular, so end−1 fires exactly when wm ≥ end.
      timer match {
        case Some(t) => st.setTimeoutTimestamp(t - 1)
        case None => // all finalized: arm retirement from the current wm
          retireAfterMs.foreach(r =>
            if (cur.isDefined) st.setTimeoutTimestamp(wm + r))
      }
      out.iterator
    }
    ds.withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** The same stage on `transformWithState` — shares [[advance]]; pending
    * hours live in `MapState` so RocksDB writes are per-entry deltas.
    * `retireAfterMs` mirrors [[fill]]'s cursor retirement (an explicit
    * event-time timer, NOT `TTLConfig`: TTL is wall-clock-based, which
    * would retire nondeterministically under replay and diverge the two
    * surfaces' semantics). */
  final class ResampleProcessor(retireAfterMs: Option[Long] = None)
      extends StatefulProcessor[Long, Ev, HourRow] {
    @transient private var cursorState: ValueState[Cursor] = _
    @transient private var pendingState:
      org.apache.spark.sql.streaming.MapState[Long, HourAgg] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      cursorState = getHandle.getValueState[Cursor]("cursor",
        Encoders.product[Cursor], TTLConfig.NONE)
      pendingState = getHandle.getMapState[Long, HourAgg]("pending",
        Encoders.scalaLong, Encoders.product[HourAgg], TTLConfig.NONE)
    }

    private def run(key: Long, rows: Iterator[Ev], wmMs: Long,
        firedMs: Option[Long]): Iterator[HourRow] = {
      val cur0 = (if (cursorState.exists()) Some(cursorState.get()) else None)
        // the fired timer is gone; forget it so re-arming is clean
        .map(c => if (firedMs.contains(c.armedMs)) c.copy(armedMs = 0L) else c)
      val pending0 = pendingState.iterator().map { case (k, v) => k -> v }.toMap
      val rs = rows.toSeq
      val (cur, pending, out, timer) =
        advance(key, cur0, pending0, rs, wmMs)
      // fired timer + no input + nothing finalized + nothing pending ⟺
      // the RETIREMENT timer (same discrimination as the fMGWS path):
      // drop all state for this user
      if (firedMs.isDefined && rs.isEmpty && out.isEmpty && pending.isEmpty
          && retireAfterMs.isDefined) {
        cursorState.clear(); pendingState.clear()
        return Iterator.empty
      }
      // per-entry delta writes: finalized hours leave, touched hours update
      (pending0.keySet -- pending.keySet).foreach(pendingState.removeKey)
      pending.foreach { case (k, v) =>
        if (!pending0.get(k).contains(v)) pendingState.updateValue(k, v)
      }
      // same strict-fire guard as the fMGWS path: arm end−1 so a
      // watermark landing exactly on the hour boundary still fires;
      // with nothing pending, arm the retirement horizon instead
      val armed0 = cur0.map(_.armedMs).getOrElse(0L)
      val armed1 = timer.map(_ - 1)
        .orElse(retireAfterMs.collect { case r if cur.isDefined => wmMs + r })
        .getOrElse(0L)
      if (armed1 != armed0) {
        if (armed0 != 0L) getHandle.deleteTimer(armed0)
        if (armed1 != 0L) getHandle.registerTimer(armed1)
      }
      cur.foreach(c => cursorState.update(c.copy(armedMs = armed1)))
      out.iterator
    }

    override def handleInputRows(key: Long, rows: Iterator[Ev],
        tv: TimerValues): Iterator[HourRow] =
      run(key, rows, tv.getCurrentWatermarkInMs(), None)

    override def handleExpiredTimer(key: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[HourRow] =
      run(key, Iterator.empty, tv.getCurrentWatermarkInMs(),
        Some(info.getExpiryTimeInMs))
  }

  def fillTws(ds: Dataset[Ev], lateness: String = "0 seconds",
      retireAfterMs: Option[Long] = None): Dataset[HourRow] = {
    import ds.sparkSession.implicits._
    ds.withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .transformWithState(new ResampleProcessor(retireAfterMs),
        TimeMode.EventTime(), OutputMode.Append)
  }
}
