package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming burstiness monitor — the ingest-time twin of the batch
  * Fano-factor audit (q203, `relational/EventOps`): per event type,
  * emit the overdispersion of the daily arrival count (variance/mean;
  * 1 = Poisson, >1 bursty) after every micro-batch, so a pipeline sees
  * "this feed turned bursty" while it is happening.
  *
  * State is NOT the day→count map forever — that would grow with the
  * stream's lifetime. Instead the monitor carries q203's sufficient
  * statistics and a bounded open window:
  *
  *  - days older than `maxDay − closeAfterDays` are CLOSED: their
  *    count folds into the scalar moments (n_active, Σx, Σx²) and the
  *    map entry is dropped — state per type is 5 scalars plus at most
  *    `closeAfterDays + 1` open-day counts, bounded by the
  *    out-of-orderness horizon, never the stream;
  *  - a row for a day whose count may already sit inside the folded
  *    moments (between the observed minimum and the closure boundary)
  *    cannot be folded (the sums are not revisable), so it is COUNTED
  *    LOUDLY in `late_dropped` — the same watermark contract as the
  *    curated pipeline's Adjust clamp: late data is dropped visibly,
  *    never silently absorbed into a wrong statistic. A backfill that
  *    PREDATES the observed minimum is provably unfolded and is
  *    absorbed soundly (it widens the span, exactly as the batch
  *    census would see it).
  *
  * Every snapshot is computed over closed + open days together, so
  * with a horizon wider than the fixture the final snapshot is
  * bit-identical to q203's census over the same rows (the Fano value
  * uses q203's exact double-formula text on the same integer sums —
  * spec-pinned), and with a tight horizon an in-order stream still
  * converges to the same numbers (closure only re-buckets WHERE a
  * day's count is held).
  *
  * Replay: counting fold, same at-least-once caveat as
  * [[StreamingDrift]] — snapshots are versioned by `n_events` so a
  * replayed batch overwrites its own version rather than
  * double-alerting.
  *
  * Scale: the only shuffle is the type-keyed exchange into the fold;
  * state per key is O(horizon). A production monitor keys by
  * (type, shard) if one type's arrival rate exceeds a single task.
  */
object StreamingBurstiness extends Serializable {

  /** One arrival: event type + epoch day (pre-extracted with the same
    * `CAST(ts AS DATE)` the batch audit uses). */
  final case class Arrival(t: String, day: Long)

  final case class BurstState(closedActive: Long, closedSx: Long,
      closedSxx: Long, minDay: Long, maxDay: Long,
      open: Map[Long, Long], lateDropped: Long,
      ver: Int = BurstStateVer)

  final val BurstStateVer = 1

  /** Post-batch snapshot per type — q203's columns plus the late
    * counter. `fano` is NaN until the span exceeds one day (the batch
    * audit's 0/0 convention). */
  final case class Snapshot(event_type: String, n_days: Long,
      n_active: Long, n_events: Long, fano: Double, late_dropped: Long)

  /** q203's Fano text on exact integer sums — shared by the fold and
    * the parity spec so equality is bit-for-bit, not approximate. */
  def fano(nDays: Long, sx: Long, sxx: Long): Double =
    (nDays.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble) /
      ((nDays - 1).toDouble * sx.toDouble)

  /** The stateful monitor: one snapshot per type per micro-batch.
    * `closeAfterDays` is the out-of-orderness horizon (≥ 0); days at
    * or below `maxDay − closeAfterDays − 1` fold and drop. */
  def monitor(in: Dataset[Arrival], closeAfterDays: Long)
      : Dataset[Snapshot] = {
    import in.sparkSession.implicits._
    require(closeAfterDays >= 0, "closeAfterDays must be >= 0")
    def fn(key: String, rows: Iterator[Arrival],
        st: GroupState[BurstState]): Iterator[Snapshot] = {
      val prev = st.getOption.getOrElse(
        BurstState(0L, 0L, 0L, Long.MaxValue, Long.MinValue, Map.empty, 0L))
      StateVersion.check(prev.ver, BurstStateVer,
        "StreamingBurstiness.monitor")
      var (cAct, cSx, cSxx) = (prev.closedActive, prev.closedSx, prev.closedSxx)
      var (mn, mx) = (prev.minDay, prev.maxDay)
      var open = prev.open
      var late = prev.lateDropped
      // lateness is judged against the boundary at the PREVIOUS fold —
      // only days already folded into the scalars are irreversible. A
      // per-row moving boundary would make "late" depend on row order
      // within the batch (batching-variance), which the spec forbids.
      // A day BEFORE the observed minimum is provably unfolded even
      // when it sits below the boundary (it was never in the span), so
      // a backfill that predates history is absorbed soundly; only
      // days whose counts may already sit inside the scalars — in
      // (minDay, boundary] — are irreversible and drop loudly.
      val foldedUpTo =
        if (prev.maxDay == Long.MinValue) Long.MinValue
        else prev.maxDay - closeAfterDays - 1
      rows.foreach { r =>
        if (r.day <= foldedUpTo && r.day >= prev.minDay) late += 1L
        else {
          open = open.updated(r.day, open.getOrElse(r.day, 0L) + 1L)
          if (r.day < mn) mn = r.day
          if (r.day > mx) mx = r.day
        }
      }
      // fold newly-closed days into the scalar moments (batch end, so
      // same-batch out-of-order rows land before their day closes)
      val closedUpTo =
        if (mx == Long.MinValue) Long.MinValue
        else mx - closeAfterDays - 1
      val (toClose, stillOpen) = open.partition(_._1 <= closedUpTo)
      toClose.values.foreach { x => cAct += 1L; cSx += x; cSxx += x * x }
      open = stillOpen
      st.update(BurstState(cAct, cSx, cSxx, mn, mx, open, late))
      if (mx == Long.MinValue) Iterator.empty
      else {
        val sx = cSx + open.values.sum
        val sxx = cSxx + open.values.map(x => x * x).sum
        val n = mx - mn + 1
        Iterator.single(Snapshot(key, n, cAct + open.size, sx,
          fano(n, sx, sxx), late))
      }
    }
    in.groupByKey(_.t)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(fn)
  }
}
