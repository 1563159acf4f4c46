package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming k-anonymity gate — the ingest-time twin of the batch
  * release audit (q139, `llmdata/Governance`).
  *
  * The batch op answers "which quasi-identifier groups clear k" over a
  * finished table; a privacy-gated LIVE release needs the decision at
  * arrival: a row may only flow downstream once its QI group holds at
  * least k rows, else the row alone re-identifies its subject. One
  * `groupByKey(qi).flatMapGroupsWithState` buffers each group's rows
  * while the group is SMALL (< k), releases the whole buffer the
  * moment the k-th row arrives, and passes everything through
  * immediately once the group is open. Nothing is ever dropped — rows
  * of forever-small groups stay buffered (suppressed), exactly the
  * k-anonymity suppression rule, and a group's opening retroactively
  * releases its history in deterministic (arrival-batch, id) order.
  *
  * Replay: releases are remembered by row id — an at-least-once replay
  * re-emits nothing and never double-counts a group's size (a doubled
  * count would open a group at k-1 real subjects, a privacy violation,
  * not a cosmetic bug). Id memory grows with distinct arrivals per
  * group; production gates bound it with a state TTL matched to the
  * replay horizon (checkpoint retention) — [[StreamingAdmission]]'s
  * note verbatim.
  *
  * Scale (100 TB, 1000 executors): state per QI group is ≤ k-1
  * buffered rows + the id memory — the buffer is bounded BY THE
  * PRIVACY PARAMETER, not the stream; the shuffle is the same
  * QI-keyed exchange the batch census uses (bounded by the QI domain
  * product). RocksDB state store for open group cardinalities.
  */
object StreamingGovernance {

  /** An arriving row, reduced to id + its quasi-identifier key. */
  final case class QiRow(row_id: Long, qi: String)

  /** Per-group state: rows released so far (group size for the k
    * test), buffered small-group rows, ids already seen (replay
    * armor). `ver` is the state-schema version ([[StateVersion]]). */
  final case class QiState(released: Long, buffered: List[Long],
      seen: Set[Long], ver: Int = QiStateVer)

  final val QiStateVer = 1

  /** One released row: the group's size when it left the gate. */
  final case class Released(row_id: Long, qi: String, group_n: Long)

  /** (row_id, qi) projection for a customer-shaped frame, using the
    * q139 QI tuple (nation, segment, 2000-unit balance band). */
  def customerQi(df: DataFrame): Dataset[QiRow] = {
    import df.sparkSession.implicits._
    df.select(col("c_custkey").as("row_id"),
      concat_ws("|", col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 2000).cast("long")).as("qi"))
      .as[QiRow]
  }

  /** An arriving row carrying its SENSITIVE attribute next to the QI
    * key — the l-diversity gate's input shape. */
  final case class SensRow(row_id: Long, qi: String, sens: String)

  /** One buffered small-group row (id + sensitive value). */
  final case class BufRow(row_id: Long, sens: String)

  /** Per-group state for the diversity gate: released census, buffered
    * rows (with their sensitive values — the flush needs them), id
    * replay armor, and the distinct sensitive values observed so far
    * (the l test; grows monotonically, bounded by the sensitive-value
    * DOMAIN — order status has 3 values, not 3 billion). */
  final case class DivState(released: Long, buffered: List[BufRow],
      seen: Set[Long], sens: Set[String], ver: Int = DivStateVer)

  final val DivStateVer = 1

  /** One released row: group size at release + the group's distinct
    * sensitive-value count at that moment (its l). */
  final case class ReleasedDiverse(row_id: Long, qi: String,
      group_n: Long, l: Long)

  /** (row_id, qi, sens) projection for the q140 shape: orders stream,
    * QI from the broadcast customer FK join, sensitive = order status.
    * The QI string matches [[customerQi]]'s encoding so the two gates
    * census the same groups. */
  def orderSens(orders: DataFrame, customer: DataFrame): Dataset[SensRow] = {
    import orders.sparkSession.implicits._
    val cust = customer.select(col("c_custkey"),
      concat_ws("|", col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 2000).cast("long")).as("qi"))
    orders.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey").as("row_id"), col("qi"),
        col("o_orderstatus").as("sens"))
      .as[SensRow]
  }

  /** The stateful gate; works under a streaming query (cross-batch
    * group growth) and in batch mode (one pass ⇒ exactly the q139
    * census's n ≥ k groups release, spec-pinned).
    *
    * `stateTtl` bounds the per-group state (id replay-armor + small-
    * group buffers) to the replay horizon: a group idle longer than
    * the TTL has its state dropped (round-7 advice — NoTimeout was
    * hard-coded, so state grew with distinct arrivals forever). Set it
    * to ≥ the checkpoint retention window: beyond that horizon an
    * at-least-once replay cannot happen, so dropping the armor is
    * safe. Both failure directions of an expiry are privacy-SAFE or
    * replay-bounded: a dropped SMALL group's buffered rows stay
    * suppressed (suppression is the k-anonymity rule, never a leak),
    * and a dropped OPEN group that later sees a replayed row re-emits
    * it — exactly the at-least-once contract every downstream sink
    * here already absorbs idempotently. None (the default) keeps the
    * unbounded NoTimeout behavior for bounded fixtures and batch mode
    * (batch ignores timeouts — state dies with the single pass). */
  def gate(in: Dataset[QiRow], k: Int = 5,
      stateTtl: Option[java.time.Duration] = None): Dataset[Released] = {
    import in.sparkSession.implicits._
    require(k >= 1, "k must be positive")
    require(stateTtl.forall(d => !d.isNegative && !d.isZero),
      "stateTtl must be positive when set")
    def fn(qi: String, rows: Iterator[QiRow],
        st: GroupState[QiState]): Iterator[Released] = {
      if (st.hasTimedOut) { // TTL expiry: drop the group's state
        st.remove()
        return Iterator.empty
      }
      val prev = st.getOption.getOrElse(QiState(0L, Nil, Set.empty))
      StateVersion.check(prev.ver, QiStateVer, "StreamingGovernance.gate")
      var released = prev.released
      var buffered = prev.buffered
      var seen = prev.seen
      val out = List.newBuilder[Released]
      // within a micro-batch, id order — partition order never leaks
      rows.toSeq.sortBy(_.row_id).foreach { r =>
        if (!seen.contains(r.row_id)) {
          seen += r.row_id
          buffered = r.row_id :: buffered
          if (released > 0 || buffered.size >= k) {
            // group is open (or just opened): flush in arrival order
            buffered.reverse.foreach { id =>
              released += 1
              out += Released(id, qi, released)
            }
            buffered = Nil
          }
        }
      }
      st.update(QiState(released, buffered, seen))
      stateTtl.foreach(d => st.setTimeoutDuration(d.toMillis))
      out.result().iterator
    }
    val timeoutConf = if (stateTtl.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout
    else GroupStateTimeout.NoTimeout
    in.groupByKey(_.qi)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(fn)
  }

  /** Streaming l-diversity gate — q140's arrival-time twin, and the
    * audit k alone misses: a QI group can clear k with every member
    * sharing ONE sensitive value, so releasing it publishes that value
    * for anyone known to be in the group (Machanavajjhala et al.
    * 2007). This gate releases a group's history only once BOTH
    * conditions hold: ≥ k rows AND ≥ l distinct sensitive values.
    * Both census counts grow monotonically, so open-stays-open and the
    * k-gate's retroactive-flush / replay-armor / TTL mechanics carry
    * over unchanged.
    *
    * State adds one set to the k-gate's: the distinct sensitive values
    * seen — bounded by the sensitive-value DOMAIN (for q140's order
    * status: 3), not the stream. The BUFFER bound is conditional,
    * unlike the k-gate's hard k−1: a group that has cleared k but
    * never diversifies keeps buffering (releasing would publish the
    * homogeneous value; dropping would silently un-suppress) — so an
    * adversarially hot homogeneous group grows state linearly.
    * `maxBuffered` is the loud backstop: exceeding it FAILS the query
    * (availability lost, privacy never) instead of letting the state
    * store grow until checkpointing dies; size it to the worst group
    * an operator is willing to hold, e.g. 100·k. A group that never
    * diversifies stays suppressed forever — the privacy rule, not a
    * leak. */
  def gateDiverse(in: Dataset[SensRow], k: Int = 5, l: Int = 2,
      stateTtl: Option[java.time.Duration] = None,
      maxBuffered: Option[Int] = None): Dataset[ReleasedDiverse] = {
    import in.sparkSession.implicits._
    require(k >= 1, "k must be positive")
    require(l >= 1, "l must be positive")
    require(stateTtl.forall(d => !d.isNegative && !d.isZero),
      "stateTtl must be positive when set")
    require(maxBuffered.forall(_ >= k),
      "maxBuffered below k could never release anything")
    def fn(qi: String, rows: Iterator[SensRow],
        st: GroupState[DivState]): Iterator[ReleasedDiverse] = {
      if (st.hasTimedOut) { st.remove(); return Iterator.empty }
      val prev = st.getOption.getOrElse(
        DivState(0L, Nil, Set.empty, Set.empty))
      StateVersion.check(prev.ver, DivStateVer, "StreamingGovernance.gateDiverse")
      var released = prev.released
      var buffered = prev.buffered
      var seen = prev.seen
      var sens = prev.sens
      val out = List.newBuilder[ReleasedDiverse]
      rows.toSeq.sortBy(_.row_id).foreach { r =>
        if (!seen.contains(r.row_id)) {
          seen += r.row_id
          sens += r.sens
          buffered = BufRow(r.row_id, r.sens) :: buffered
          if (released > 0 || (buffered.size >= k && sens.size >= l)) {
            val lNow = sens.size.toLong
            buffered.reverse.foreach { b =>
              released += 1
              out += ReleasedDiverse(b.row_id, qi, released, lNow)
            }
            buffered = Nil
          }
          // backstop AFTER the release test: the row that breaches the
          // cap may be the very one that satisfies (k, l) — releasing
          // it empties the buffer, so failing first would lose
          // availability one row earlier than the privacy rule requires
          maxBuffered.foreach { mb =>
            if (buffered.size > mb) throw new IllegalStateException(
              s"l-diversity buffer for QI group '$qi' exceeded " +
                s"maxBuffered=$mb while waiting for $l distinct " +
                "sensitive values - refusing to grow state further. " +
                "Raise maxBuffered, lower l, or quarantine this group.")
          }
        }
      }
      st.update(DivState(released, buffered, seen, sens))
      stateTtl.foreach(d => st.setTimeoutDuration(d.toMillis))
      out.result().iterator
    }
    val timeoutConf = if (stateTtl.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout
    else GroupStateTimeout.NoTimeout
    in.groupByKey(_.qi)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(fn)
  }
}
