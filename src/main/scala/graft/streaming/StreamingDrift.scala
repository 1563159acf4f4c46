package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming distribution-drift monitor — the ingest-time twin of the
  * batch chi-square epoch audit (q162, `relational/EventOps`): watch a
  * live event stream's categorical mix against a FIXED reference mix
  * and emit a versioned chi-square statistic after every micro-batch,
  * so a pipeline notices "the traffic changed shape" while it is
  * changing, not at the next batch audit.
  *
  * One global fold (single group key): state is the per-category count
  * map — bounded by the CATEGORY DOMAIN, not the stream — and each
  * batch emits one snapshot row with the updated χ² against the
  * reference proportions. The statistic is q162's integer-exact
  * rendering: expected = n_total · ref_share (ref shares are integer
  * mille-rates), per-cell (o−e)²/e floored to micro-units before the
  * sum, so a snapshot is bit-identical to the batch χ² over the same
  * prefix of the stream (spec-pinned).
  *
  * Replay: the fold is NOT idempotent under row replay (counts are
  * sums), so the monitor rides the same at-least-once caveat as every
  * counting sink — a production deployment keys snapshots by
  * `n_seen` so a replayed batch overwrites its own version instead of
  * double-alerting; the spec pins batch-id-keyed convergence.
  *
  * Scale: the only shuffle is the category-keyed partial count (the
  * same exchange the batch groupBy pays); state per key is one long.
  */
object StreamingDrift extends Serializable {

  /** One categorical observation. */
  final case class Obs(cat: String)

  /** Monitor state: per-category counts. `ver` is the state-schema
    * version, checked on restore ([[StateVersion]]). */
  final case class DriftState(counts: Map[String, Long],
      ver: Int = DriftStateVer)

  final val DriftStateVer = 1

  /** One post-batch snapshot: total observed, χ² in micro-units
    * against the reference mix, and the worst-deviating category. */
  final case class Snapshot(n_seen: Long, chi2_micro: Long,
      worst_cat: String, worst_dev_micro: Long)

  /** χ² in integer micro-units for observed counts vs reference
    * mille-shares — q162's per-cell-floor-then-sum rule, reused by
    * both the stream fold and the spec's batch replay. Categories
    * absent from `ref` are ignored (a production monitor would
    * dead-letter them); ref categories never observed count with
    * o = 0. */
  def chi2Micro(counts: Map[String, Long],
      refMilli: Map[String, Long]): Map[String, Long] = {
    val n = counts.iterator
      .collect { case (k, v) if refMilli.contains(k) => v }.sum
    refMilli.map { case (cat, milli) =>
      val e = n.toDouble * milli / 1000.0
      val o = counts.getOrElse(cat, 0L)
      val cell =
        if (e == 0.0) 0L
        else math.floor(1000000.0 * (o - e) * (o - e) / e).toLong
      cat -> cell
    }
  }

  /** The stateful monitor: one snapshot row per micro-batch. */
  def monitor(in: Dataset[Obs], refMilli: Map[String, Long])
      : Dataset[Snapshot] = {
    import in.sparkSession.implicits._
    require(refMilli.values.sum == 1000,
      "reference mille-shares must sum to 1000")
    def fn(key: Int, rows: Iterator[Obs],
        st: GroupState[DriftState]): Iterator[Snapshot] = {
      val prev = st.getOption.getOrElse(DriftState(Map.empty))
      StateVersion.check(prev.ver, DriftStateVer, "StreamingDrift.monitor")
      var counts = prev.counts
      rows.foreach { r =>
        if (refMilli.contains(r.cat))
          counts = counts.updated(r.cat, counts.getOrElse(r.cat, 0L) + 1L)
      }
      st.update(DriftState(counts))
      val cells = chi2Micro(counts, refMilli)
      val (worst, dev) =
        if (cells.isEmpty) ("", 0L)
        else cells.toSeq.sortBy { case (c, v) => (-v, c) }.head
      Iterator.single(Snapshot(counts.values.sum,
        cells.values.sum, worst, dev))
    }
    // ONE monitor key: the fold itself is a counting pass over the
    // micro-batch (O(1) state per category), but the exchange routes
    // the batch's rows to one task — the same per-key shape
    // StreamingAdmission pays per source. A production monitor keys
    // by (service, region, …) so each fold sees a shard, never the
    // world; Structured Streaming does not allow a pre-aggregation
    // upstream of flatMapGroupsWithState, so the reduction happens
    // inside the fold.
    in.groupByKey(_ => 0)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(fn)
  }
}
