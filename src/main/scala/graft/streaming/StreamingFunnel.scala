package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental (streaming) funnel progression — the arrival-time twin
  * of the batch sequence-pattern funnel (q88, `relational/EventOps`):
  * emit a user's step advancement (view → click → purchase) the moment
  * it happens, with O(1) state per user.
  *
  * Ordering contract: stage slots only ADVANCE — a stage timestamp is
  * written once, by the first qualifying event, and never rewritten.
  * Under per-user event-time-ordered delivery (what the curated
  * pipeline's watermark + clamp stage provides, `CuratedPipeline`),
  * this reproduces batch q88's earliest-chain semantics exactly
  * (spec-pinned): processing in ts order makes "first qualifying" ≡
  * "minimum qualifying". Under out-of-order delivery the stream can
  * only under-advance (an earlier view arriving late cannot
  * retroactively re-qualify a click) — the deterministic degradation
  * an O(1)-state funnel must accept; recompute in batch for the exact
  * answer (q88 is that batch).
  *
  * Replay: an event that cannot advance a filled slot changes nothing,
  * so at-least-once redelivery never double-emits (advancement rows
  * are keyed by the step they establish).
  *
  * Scale: state is three optional µs timestamps per user; shuffle is
  * the same user-keyed exchange the batch windows use. RocksDB state
  * store + TTL for inactive users in production.
  */
object StreamingFunnel {

  /** One arriving event, reduced to funnel-relevant columns. */
  final case class Ev(user_id: Long, event_type: String, us: Long,
      event_id: Long)

  /** Per-user state: established stage timestamps (µs). `ver` is the
    * state-schema version, checked on restore ([[StateVersion]]). */
  final case class FunnelState(t1: Option[Long], t2: Option[Long],
      t3: Option[Long], ver: Int = FunnelStateVer)

  final val FunnelStateVer = 1

  /** One advancement row: the user just reached `step` at `us`. */
  final case class Advance(user_id: Long, step: Int, us: Long)

  /** Funnel projection of an events frame — stateless, batch or
    * streaming. */
  def arrivals(events: DataFrame): Dataset[Ev] = {
    import events.sparkSession.implicits._
    events.select(col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("us"), col("event_id"))
      .as[Ev]
  }

  /** The stateful advancement stage. */
  def advance(in: Dataset[Ev]): Dataset[Advance] = {
    import in.sparkSession.implicits._
    def fn(user: Long, rows: Iterator[Ev],
        st: GroupState[FunnelState]): Iterator[Advance] = {
      var s = st.getOption.getOrElse(FunnelState(None, None, None))
      StateVersion.check(s.ver, FunnelStateVer, "StreamingFunnel.advance")
      val out = List.newBuilder[Advance]
      // within-batch order: event time then id — partition-order-proof
      rows.toSeq.sortBy(e => (e.us, e.event_id)).foreach { e =>
        (e.event_type, s) match {
          case ("view", FunnelState(None, _, _, _)) =>
            s = s.copy(t1 = Some(e.us)); out += Advance(user, 1, e.us)
          case ("click", FunnelState(Some(t1), None, _, _)) if e.us > t1 =>
            s = s.copy(t2 = Some(e.us)); out += Advance(user, 2, e.us)
          case ("purchase", FunnelState(_, Some(t2), None, _)) if e.us > t2 =>
            s = s.copy(t3 = Some(e.us)); out += Advance(user, 3, e.us)
          case _ => ()
        }
      }
      st.update(s)
      out.result().iterator
    }
    in.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  /** Convenience: events frame → advancement rows. */
  def advanceEvents(events: DataFrame): Dataset[Advance] =
    advance(arrivals(events))
}
