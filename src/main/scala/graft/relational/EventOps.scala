package graft.relational

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Telemetry-stream parity operators, run in batch over the `events`
  * table (TESTDATA.md: events stands in for the device stream).
  *
  * Each op mirrors a reference behavior (SURVEY.md §2 ids cited per
  * query). The same column logic is reused by the streaming path in
  * `graft.streaming` — Spark's unified batch/stream DataFrame API means
  * one definition serves both; the oracle checks the batch rendering.
  */
object EventOps {
  /** Shared DuckDB CTE: the 6 h gap-session assignment
    * (`s(user_id, event_id, ts, event_type, sess_id)`) — consumed by
    * the q39/q78/q101 oracles so the session rule (gap constant,
    * tie-order, running-sum id) has exactly ONE definition. */
  private val SqlSessionCte: String =
    """g AS (
      |  SELECT user_id, event_id, ts, event_type,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 21600000000
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, event_id, ts, event_type,
      |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS sess_id
      |  FROM g)""".stripMargin

  private val D2 = "decimal(38,2)"

  /** The W1 spike-and-dip detector over events, partitioned per
    * event_type; shared by q24 (reference 60 s window) and q51 (24 h). */
  private def spikeDipPlan(s: org.apache.spark.sql.SparkSession, d: String,
      params: graft.anomaly.SpikeAndDip.Params): org.apache.spark.sql.DataFrame =
    graft.anomaly.SpikeAndDip
      .batch(Tables.events(s, d), "ts", "value",
        partitionCols = Seq("event_type"), params = params)
      .select(col("event_id"), col("event_type"),
        col("anom.isAnomaly").as("anomaly"),
        col("anom.score").as("score"))
      .orderBy("event_id")

  /** DuckDB rendering of the full SpikeAndDip.score contract
    * (anomaly/SpikeAndDip.scala): trailing event-time RANGE frame on
    * truncated-µs timestamps, most-recent-85 cap via list_slice,
    * medians written out as the exact two-middle average the Scala
    * kernel computes (NOT quantile_cont, whose lo+(hi−lo)/2 interpolation
    * can differ by 1 ulp), MAD with 1.4826 scaling, population-stddev
    * fallback, and the Acklam threshold embedded as the engine's own
    * round-trip double constant. Verified value-identical on all 10k
    * rows before registration.
    *
    * Tie caveat: the tail-85 cap consumes the frame in (engine-local)
    * timestamp order, so two SAME-(event_type, µs) events straddling
    * the cap cut could be kept differently by the two engines. The
    * events data has zero duplicate (event_type, µs) pairs at every sf
    * (checked 0.001/0.01/0.1), so the compare is deterministic here;
    * corpora with ties would need a (ts, event_id)-struct frame. */
  private def spikeDipOracle(winUs: Long): String = {
    val t = graft.anomaly.SpikeAndDip.Params().threshold // round-trip repr
    s"""WITH e AS (
      |  SELECT event_id, event_type, value, epoch_ns(ts)//1000 AS us FROM events),
      |h AS (
      |  SELECT event_id, event_type, value,
      |    list(value) OVER (PARTITION BY event_type ORDER BY us
      |      RANGE BETWEEN $winUs PRECEDING AND 1 PRECEDING) AS hist
      |  FROM e),
      |c AS (
      |  SELECT event_id, event_type, value,
      |    CASE WHEN len(hist) > 85
      |         THEN list_slice(hist, len(hist) - 84, len(hist)) ELSE hist END AS cap
      |  FROM h),
      |m AS (SELECT *, len(cap) AS n, list_sort(cap) AS srt FROM c),
      |m2 AS (
      |  SELECT *, CASE WHEN n % 2 = 1 THEN srt[(n+1)//2]
      |                 ELSE (srt[n//2] + srt[n//2+1])/2.0 END AS med
      |  FROM m),
      |m3 AS (
      |  SELECT *, list_sort(list_transform(cap, x -> abs(x - med))) AS dsrt FROM m2),
      |m4 AS (
      |  SELECT *, CASE WHEN n % 2 = 1 THEN dsrt[(n+1)//2]
      |                 ELSE (dsrt[n//2] + dsrt[n//2+1])/2.0 END AS mad
      |  FROM m3),
      |m5 AS (
      |  SELECT *, CASE WHEN mad * 1.4826 > 0 THEN mad * 1.4826
      |    ELSE (CASE WHEN sqrt(list_sum(list_transform(cap,
      |            x -> (x - list_sum(cap)/n) * (x - list_sum(cap)/n)))/n) > 0
      |      THEN sqrt(list_sum(list_transform(cap,
      |            x -> (x - list_sum(cap)/n) * (x - list_sum(cap)/n)))/n)
      |      ELSE 1e-12 END) END AS scale
      |  FROM m4),
      |s AS (
      |  SELECT event_id, event_type,
      |    CASE WHEN n < 12 OR isnan(value) THEN 0
      |         WHEN abs((value - med)/scale) > $t THEN 1 ELSE 0 END AS anomaly,
      |    CASE WHEN n < 12 OR isnan(value) THEN 0.0
      |         ELSE greatest(0.0, abs((value - med)/scale) / $t) END AS score
      |  FROM m5)
      |SELECT event_id, event_type, anomaly, CAST(score AS DOUBLE) AS score
      |FROM s ORDER BY event_id""".stripMargin
  }

  val qs: Seq[Q] = Seq(
    // ---- q20: incremental watermark scan (S5/P5/O1):
    //      SELECT ... WHERE enqueuedTime > @lastProcessedTime ORDER BY ...
    //      (reference azure-function/PushTelemetryFunction.cs:109-116) ----
    Q(
      "q20_incremental_scan",
      """SELECT event_id, ts, user_id, event_type, value FROM events
        |WHERE ts > TIMESTAMP '2024-01-25 00:00:00'
        |ORDER BY ts, event_id""".stripMargin,
    ) { (s, d) =>
      Tables.events(s, d)
        .filter(col("ts") > lit("2024-01-25 00:00:00").cast("timestamp"))
        .select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy("ts", "event_id")
    },

    // ---- q21: event-time tumbling window aggregate (streaming §2.10 T4
    //      batch rendering; window().start == hour bucket) ----
    Q(
      "q21_window_hourly",
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |  count(*) AS n, CAST(sum(CAST(value AS DECIMAL(38,2))) AS DOUBLE) AS total,
        |  min(value) AS min_v, max(value) AS max_v
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    ) { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("value").cast(D2)).cast("double").as("total"),
          min("value").as("min_v"),
          max("value").as("max_v"))
        .select(col("window.start").as("hour"), col("event_type"),
          col("n"), col("total"), col("min_v"), col("max_v"))
        .orderBy("hour", "event_type")
    },

    // ---- q22: running MAX watermark per key (A2 parity:
    //      PushTelemetryFunction.cs:127-135 running max enqueuedTime) ----
    Q(
      "q22_running_max",
      """SELECT user_id, event_id, ts,
        |  max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS high_water,
        |  CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_seen
        |FROM events ORDER BY user_id, ts, event_id""".stripMargin,
    ) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(
          col("user_id"), col("event_id"), col("ts"),
          max("value").over(w).as("high_water"),
          count(lit(1)).over(w).as("n_seen"))
        .orderBy("user_id", "ts", "event_id")
    },

    // ---- q23: trailing-history z-score anomaly flag — the oracle-checkable
    //      batch analog of W1 (AnomalyDetection_SpikeAndDip; the full
    //      detector with its 60s/85-event contract is q24, ScalaTest-pinned).
    //      Partitioned by event_type → distributed state at scale (SURVEY
    //      §7.4 deliberate deviation from the reference's global model). ----
    Q(
      "q23_anomaly_zscore",
      """SELECT event_id, event_type,
        |  CASE WHEN n >= 20 AND abs(value - m) > 3*sd THEN 1 ELSE 0 END AS anomaly
        |FROM (
        |  SELECT event_id, event_type, value,
        |    avg(value) OVER w AS m,
        |    stddev_samp(value) OVER w AS sd,
        |    count(*) OVER w AS n
        |  FROM events
        |  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
        |               ROWS BETWEEN 100 PRECEDING AND 1 PRECEDING))
        |ORDER BY event_id""".stripMargin,
    ) { (s, d) =>
      val w = Window.partitionBy("event_type").orderBy("ts", "event_id")
        .rowsBetween(-100, -1)
      Tables.events(s, d)
        .select(
          col("event_id"), col("event_type"), col("value"),
          avg("value").over(w).as("m"),
          stddev_samp("value").over(w).as("sd"),
          count(lit(1)).over(w).as("n"))
        .select(
          col("event_id"), col("event_type"),
          when(col("n") >= 20 && abs(col("value") - col("m")) > lit(3) * col("sd"), 1)
            .otherwise(0).as("anomaly"))
        .orderBy("event_id")
    },

    // ---- q24: the full spike-and-dip detector (W1: the reference's
    //      AnomalyDetection_SpikeAndDip contract — 95% confidence, 85
    //      events, 60 s trailing event-time window) over the events
    //      stream, partitioned per event_type (distributed state; the
    //      reference's global-model mode is SpikeAndDip(partitionCols=
    //      Nil)). The DuckDB oracle renders the whole detector —
    //      trailing RANGE frame, tail-85 cap, explicit two-middle
    //      median, MAD, stddev fallback, Acklam threshold constant —
    //      value-for-value; q51 re-runs it with a 24 h window so the
    //      median/MAD/cap paths are exercised on real history (the 60 s
    //      frames on this dataset hold ≤ 2 events). ----
    Q("q24_spike_dip", spikeDipOracle(60000000L)) { (s, d) =>
      spikeDipPlan(s, d, graft.anomaly.SpikeAndDip.Params())
    },

    // ---- q51: the same W1 detector with a 24 h trailing window —
    //      frames reach 89 events (capped to 85) and 9.9k/10k rows have
    //      ≥ MinHistory, so the robust-statistics core is value-checked
    //      cross-engine, not just the quiet path. ----
    Q("q51_spike_dip_day", spikeDipOracle(86400000000L)) { (s, d) =>
      spikeDipPlan(s, d,
        graft.anomaly.SpikeAndDip.Params(windowMillis = 86400000L))
    },

    // ---- q25: JSON property extraction (ingest-normalization parity,
    //      SURVEY §2.9; Spark get_json_object vs regexp oracle) ----
    Q(
      "q25_json_extract",
      """SELECT event_id,
        |  CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INT) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    ) { (s, d) =>
      Tables.events(s, d)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .orderBy("event_id")
    },

    // ---- q39: sessionization — gap-based session assignment (the batch
    //      rendering of a session window: new session when the per-user
    //      event-time gap exceeds 6 h; streaming twin is
    //      `session_window`/`flatMapGroupsWithState`). Scale: two
    //      windows + one aggregate, all partitioned by user_id. ----
    Q(
      "q39_sessionize",
      s"""WITH $SqlSessionCte
        |SELECT user_id, sess_id, count(*) AS n_events,
        |  min(ts) AS sess_start, max(ts) AS sess_end
        |FROM s GROUP BY user_id, sess_id
        |ORDER BY user_id, sess_id""".stripMargin,
    ) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val run = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("new_sess",
          when(lag("ts", 1).over(w).isNull ||
            unix_micros(col("ts")) - unix_micros(lag("ts", 1).over(w)) >
              21600000000L, 1).otherwise(0))
        .withColumn("sess_id", sum("new_sess").over(run))
        .groupBy("user_id", "sess_id")
        .agg(count(lit(1)).as("n_events"),
          min("ts").as("sess_start"), max("ts").as("sess_end"))
        .orderBy("user_id", "sess_id")
    },

    // ---- q101: native session_window — the BUILT-IN gap-session
    //      operator (same 6 h rule as q39's manual window rendering;
    //      Spark merges overlapping per-event windows per key). Kept
    //      alongside q39 deliberately: the manual form is the
    //      portable/streaming-free rendering, this is the engine
    //      operator a Spark user would reach for first — both must
    //      agree with the same DuckDB oracle. Session bounds differ
    //      from q39's output shape: session_window's `end` is
    //      last-event + gap, so the oracle adds the gap to the max
    //      event time. ----
    Q(
      "q101_session_window_native",
      s"""WITH $SqlSessionCte
        |SELECT user_id, min(ts) AS sess_start,
        |  max(ts) + INTERVAL 21600 SECOND AS sess_end,
        |  count(*) AS n_events
        |FROM s GROUP BY user_id, sess_id
        |ORDER BY user_id, sess_start""".stripMargin,
    ) { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"), session_window(col("ts"), "6 hours"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          col("session_window.start").as("sess_start"),
          col("session_window.end").as("sess_end"),
          col("n_events"))
        .orderBy("user_id", "sess_start")
    },

    // ---- q40: event-time interval join — click→purchase attribution
    //      within 24 h per user (the batch rendering of a stream-stream
    //      join with an event-time range condition; streaming twin uses
    //      watermarked `join` with time-bound predicates). Equi-key on
    //      user_id carries the shuffle; the range is a post-filter. ----
    Q(
      "q40_interval_join",
      """SELECT a.event_id AS click_id, b.event_id AS purchase_id
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND epoch_us(b.ts) >= epoch_us(a.ts)
        | AND epoch_us(b.ts) < epoch_us(a.ts) + 86400000000
        |WHERE a.event_type = 'click' AND b.event_type = 'purchase'
        |ORDER BY click_id, purchase_id""".stripMargin,
    ) { (s, d) =>
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          unix_micros(col("ts")).as("a_us"))
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"),
          col("user_id").as("b_user"), unix_micros(col("ts")).as("b_us"))
      clicks.join(buys,
        col("user_id") === col("b_user") &&
          col("b_us") >= col("a_us") &&
          col("b_us") < col("a_us") + 86400000000L)
        .select("click_id", "purchase_id")
        .orderBy("click_id", "purchase_id")
    },

    // ---- q54: as-of join — each purchase takes the latest view of the
    //      same user at-or-before its event time (the attribution as-of
    //      join; also the shape of "price as of trade time"). Spark has
    //      no ASOF operator, so this is the UNION-AND-WINDOW rendering
    //      (public pattern): tag both sides, one shuffle on user_id,
    //      `last(_, ignoreNulls)` over an unbounded-preceding frame —
    //      no per-row subquery, no range blow-up; cost is one sort per
    //      user partition regardless of how far back the match lies.
    //      Ties: a view AT the purchase instant counts (side orders
    //      views first at equal ts); equal-ts views resolve to the max
    //      event_id (frame ordered by r_event_id last). ----
    Q(
      "q54_asof_join",
      """SELECT p.event_id, p.user_id,
        |  (SELECT v.event_id FROM events v
        |   WHERE v.user_id = p.user_id AND v.event_type = 'view'
        |     AND v.ts <= p.ts
        |   ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS last_view_id,
        |  (SELECT v.value FROM events v
        |   WHERE v.user_id = p.user_id AND v.event_type = 'view'
        |     AND v.ts <= p.ts
        |   ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS last_view_value
        |FROM events p WHERE p.event_type = 'purchase'
        |ORDER BY event_id""".stripMargin,
    ) { (s, d) =>
      val ev = Tables.events(s, d)
      val tagged = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), lit(1).as("side"),
          lit(null).cast("long").as("r_event_id"),
          lit(null).cast("double").as("r_value"))
        .unionByName(ev.filter(col("event_type") === "view")
          .select(col("event_id"), col("user_id"), col("ts"), lit(0).as("side"),
            col("event_id").as("r_event_id"), col("value").as("r_value")))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("side"), col("r_event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // ONE aggregate over a (id, value) struct, not two independent
      // last(_, ignoreNulls) calls: with two, a view whose value is NULL
      // would contribute its id but not its value (the value would come
      // from an older view), diverging from the oracle's single LIMIT-1
      // subquery which returns the latest view's NULL as-is.
      tagged
        .withColumn("lv", last(
          when(col("side") === 0, struct(col("r_event_id"), col("r_value"))),
          ignoreNulls = true).over(w))
        .filter(col("side") === 1)
        .select(col("event_id"), col("user_id"),
          col("lv.r_event_id").as("last_view_id"),
          col("lv.r_value").as("last_view_value"))
        .orderBy("event_id")
    },

    // ---- q102: FORWARD as-of join — each purchase takes the EARLIEST
    //      view STRICTLY AFTER its event time (the "next touchpoint"
    //      attribution; the time-reversed twin of q54). Same
    //      union-and-window shape, mirrored: views order BEFORE
    //      purchases at equal ts (so a same-instant view is correctly
    //      EXCLUDED from the strictly-after frame), and the lookup is
    //      `first(_, ignoreNulls)` over a (current+1 → unbounded
    //      following) frame — still one user-keyed shuffle, no per-row
    //      subquery. ----
    Q(
      "q102_asof_forward",
      """SELECT p.event_id, p.user_id,
        |  (SELECT v.event_id FROM events v
        |   WHERE v.user_id = p.user_id AND v.event_type = 'view'
        |     AND v.ts > p.ts
        |   ORDER BY v.ts ASC, v.event_id ASC LIMIT 1) AS next_view_id,
        |  (SELECT v.value FROM events v
        |   WHERE v.user_id = p.user_id AND v.event_type = 'view'
        |     AND v.ts > p.ts
        |   ORDER BY v.ts ASC, v.event_id ASC LIMIT 1) AS next_view_value
        |FROM events p WHERE p.event_type = 'purchase'
        |ORDER BY event_id""".stripMargin,
    ) { (s, d) =>
      val ev = Tables.events(s, d)
      val tagged = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), lit(1).as("side"),
          lit(null).cast("long").as("r_event_id"),
          lit(null).cast("double").as("r_value"))
        .unionByName(ev.filter(col("event_type") === "view")
          .select(col("event_id"), col("user_id"), col("ts"), lit(0).as("side"),
            col("event_id").as("r_event_id"), col("value").as("r_value")))
      // views (side 0) sort BEFORE purchases at equal ts: a same-ts
      // view lands outside the strictly-following frame, matching the
      // oracle's `v.ts > p.ts`
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("side"), col("r_event_id"))
        .rowsBetween(1, Window.unboundedFollowing)
      // single struct aggregate for the same NULL-value reason as q54
      tagged
        .withColumn("nv", first(
          when(col("side") === 0, struct(col("r_event_id"), col("r_value"))),
          ignoreNulls = true).over(w))
        .filter(col("side") === 1)
        .select(col("event_id"), col("user_id"),
          col("nv.r_event_id").as("next_view_id"),
          col("nv.r_value").as("next_view_value"))
        .orderBy("event_id")
    },

    // ---- q57: the SAME as-of contract as q54, through the native
    //      Catalyst operator (graft.plans.AsOfJoin: logical node +
    //      pushdown Rule + Strategy + merge-pass exec, registered via
    //      SparkSessionExtensions). One hash shuffle per side on
    //      user_id, per-partition sort (user_id, ts), then a single
    //      O(n+m) merge holding ONE retained row — no union through
    //      the window sort, no null-padded column carry. Oracle is
    //      q54's correlated-subquery rendering verbatim. ----
    Q(
      "q57_asof_native",
      """SELECT p.event_id, p.user_id,
        |  (SELECT v.event_id FROM events v
        |   WHERE v.user_id = p.user_id AND v.event_type = 'view'
        |     AND v.ts <= p.ts
        |   ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS last_view_id,
        |  (SELECT v.value FROM events v
        |   WHERE v.user_id = p.user_id AND v.event_type = 'view'
        |     AND v.ts <= p.ts
        |   ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) AS last_view_value
        |FROM events p WHERE p.event_type = 'purchase'
        |ORDER BY event_id""".stripMargin,
    ) { (s, d) =>
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
          col("ts").as("v_ts"), col("value").as("view_value"))
      graft.plans.AsOf.joinAsOf(purchases, views,
          on = ("ts", "v_ts"), by = Seq(("user_id", "v_user")),
          tiebreak = Seq("view_id"))
        .select(col("event_id"), col("user_id"),
          col("view_id").as("last_view_id"),
          col("view_value").as("last_view_value"))
        .orderBy("event_id")
    },

    // ---- q41: approximate distinct counting (HLL). Spark's HLL++ and
    //      DuckDB's approx_count_distinct are different sketches → the
    //      estimate itself has no value-level oracle. Gate it the same
    //      way as q59/q81/q86: the accuracy claim is checked IN-ENGINE
    //      (|approx−exact|/exact ≤ 3·rsd — rsd=0.05 is HLL++'s default
    //      relative standard deviation, so 3σ holds w.p. ≈0.997 and is
    //      deterministic here: fixed input ⇒ fixed sketch), and the
    //      oracle recomputes the EXACT side plus the literal TRUE the
    //      bound must evaluate to. An HLL regression that drifts past
    //      3σ flips within_bounds to false ⇒ hash mismatch ⇒ red. ----
    Q(
      "q41_approx_distinct",
      """SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  TRUE AS within_bounds
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,
    ) { (s, d) =>
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(
          approx_count_distinct("user_id").as("approx_users"),
          countDistinct("user_id").as("exact_users"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("approx_users") - col("exact_users"))
            / col("exact_users") <= lit(0.15)).as("within_bounds"))
        .orderBy("event_type")
    },

    // ---- q110: the custom HLL aggregator (functions/HllAgg) in its
    //      SPARSE exactness regime — the value-level oracle q41's
    //      built-in cannot have: below sparseMax=4096 distinct values
    //      the buffer is the sorted distinct-value set itself, so the
    //      result IS count(DISTINCT user_id) (150/type at sf0.01,
    //      1500 at sf0.1 — well inside the regime). The dense regime
    //      (register estimate, 3σ bound, merge-tree IDENTITY — any
    //      merge order yields the same buffer, registers being a max
    //      semilattice) is HllSpec's. Plan: the sketch is the partial
    //      aggregate; the event_type shuffle carries O(sparseMax)
    //      buffers, never the user ids. ----
    Q(
      "q110_hll_exact",
      """SELECT event_type,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,
    ) { (s, d) =>
      val hll = udaf(new graft.functions.HllAgg(),
        org.apache.spark.sql.Encoders.scalaLong)
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(hll(col("user_id")).as("n_users"))
        .orderBy("event_type")
    },

    // ---- q44: pivot — daily event counts spread into one column per
    //      event type (fixed value list ⇒ deterministic schema; Spark
    //      plans a single pass, no per-type scans). Oracle uses the
    //      equivalent conditional aggregation. ----
    Q(
      "q44_pivot",
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
        |  count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |  count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
        |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        |  count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        |  count(CASE WHEN event_type = 'view' THEN 1 END) AS view
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    ) { (s, d) =>
      Tables.events(s, d)
        .groupBy(date_trunc("day", col("ts")).cast("date").as("day"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .count()
        .na.fill(0L, Seq("click", "error", "purchase", "signup", "view"))
        .orderBy("day")
    },

    // ---- q26: first-seen dedup-upsert (S3 Devices-sink semantics: PK gives
    //      at-most-one-row-per-device; we keep the earliest event-time row) ----
    Q(
      "q26_first_seen_dedup",
      """SELECT user_id, event_type AS first_event_type, ts AS first_ts FROM (
        |  SELECT user_id, event_type, ts,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    ) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type").as("first_event_type"),
          col("ts").as("first_ts"))
        .orderBy("user_id")
    },

    // ---- q74: SCD2 interval build — compress each user's event
    //      stream into type-2 slowly-changing-dimension rows: one row
    //      per run of equal `event_type`, with [valid_from, valid_to)
    //      validity and a current flag. This is the dimension-history
    //      twin of the as-of join (q54/q57): as-of probes an interval
    //      table; this op BUILDS it from a change log (classic
    //      warehouse CDC → SCD2 compaction). Plan: change flag (lag ≠
    //      current) → run id (cumulative sum) → per-run aggregate →
    //      valid_to (lead of the next run's start). All four steps key
    //      on user_id, so Catalyst plans ONE exchange and sorts reused
    //      across the windows and the aggregate; everything is exact
    //      (timestamps, ints, strings). ----
    Q(
      "q74_scd2",
      """WITH o AS (SELECT user_id, event_type, ts, event_id,
        |    CASE WHEN lag(event_type) OVER w IS NULL
        |           OR lag(event_type) OVER w <> event_type
        |         THEN 1 ELSE 0 END AS chg
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |v AS (SELECT user_id, event_type, ts,
        |    CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
        |  FROM o),
        |g AS (SELECT user_id, version, min(event_type) AS state,
        |    min(ts) AS valid_from, CAST(count(*) AS BIGINT) AS n_events
        |  FROM v GROUP BY 1, 2)
        |SELECT user_id, version, state, valid_from,
        |  lead(valid_from) OVER wv AS valid_to,
        |  CAST(lead(valid_from) OVER wv IS NULL AS INT) AS is_current,
        |  n_events
        |FROM g WINDOW wv AS (PARTITION BY user_id ORDER BY version)
        |ORDER BY user_id, version""".stripMargin,
    ) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val run = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wv = Window.partitionBy("user_id").orderBy("version")
      Tables.events(s, d)
        .withColumn("chg",
          when(lag("event_type", 1).over(w).isNull ||
            lag("event_type", 1).over(w) =!= col("event_type"), 1)
            .otherwise(0))
        .withColumn("version", sum("chg").over(run))
        .groupBy("user_id", "version")
        .agg(min("event_type").as("state"), min("ts").as("valid_from"),
          count(lit(1)).as("n_events"))
        .select(col("user_id"), col("version"), col("state"),
          col("valid_from"),
          lead("valid_from", 1).over(wv).as("valid_to"),
          lead("valid_from", 1).over(wv).isNull.cast("int").as("is_current"),
          col("n_events"))
        .orderBy("user_id", "version")
    },

    // ---- q78: session dialogue assembly — concatenate each (user,
    //      session)'s event types, in event-time order, into one
    //      training-sequence string (the SFT/interaction-data assembly
    //      pass: per-conversation turn concatenation; sessions from
    //      q39's 6 h inactivity rule). Ordering inside the string is
    //      pinned by sorting (ts, event_id, type) STRUCTS inside the
    //      aggregated array — partition-order-proof, no
    //      `collect_list`-order assumption (Spark documents it as
    //      nondeterministic). Scale: both windows and the aggregate
    //      key on user_id (one exchange); a session's turn count is
    //      bounded by user activity, never corpus size. ----
    Q(
      "q78_dialogue_pack",
      s"""WITH $SqlSessionCte
        |SELECT user_id, sess_id, CAST(count(*) AS BIGINT) AS n_turns,
        |  string_agg(event_type, ' ' ORDER BY ts, event_id) AS dialogue
        |FROM s GROUP BY user_id, sess_id
        |ORDER BY user_id, sess_id""".stripMargin,
    ) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val run = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("new_sess",
          when(lag("ts", 1).over(w).isNull ||
            unix_micros(col("ts")) - unix_micros(lag("ts", 1).over(w)) >
              21600000000L, 1).otherwise(0))
        .withColumn("sess_id", sum("new_sess").over(run))
        .groupBy("user_id", "sess_id")
        .agg(count(lit(1)).as("n_turns"),
          array_join(
            transform(
              array_sort(collect_list(
                struct(col("ts"), col("event_id"), col("event_type")))),
              x => x.getField("event_type")), " ").as("dialogue"))
        .orderBy("user_id", "sess_id")
    },

    // ---- q88: funnel analysis — earliest strictly-ordered
    //      view → click → purchase chain per user (the product-analytics
    //      staple; the batch rendering of a MATCH_RECOGNIZE-style
    //      sequence pattern). Each stage's timestamp is a conditional
    //      whole-partition window min CONDITIONED on the previous
    //      stage — three window passes and the final dedup all key on
    //      user_id, so Catalyst plans ONE exchange; no self-joins
    //      (the n-stage self-join rendering shuffles the fact table n
    //      times). Strict `>` between stages is exact integer µs both
    //      engines. ----
    Q(
      "q88_funnel",
      """WITH w1 AS (SELECT user_id, event_type, ts,
        |    min(CASE WHEN event_type = 'view' THEN ts END)
        |      OVER (PARTITION BY user_id) AS t1
        |  FROM events),
        |w2 AS (SELECT *,
        |    min(CASE WHEN event_type = 'click'
        |          AND epoch_us(ts) > epoch_us(t1) THEN ts END)
        |      OVER (PARTITION BY user_id) AS t2
        |  FROM w1),
        |w3 AS (SELECT *,
        |    min(CASE WHEN event_type = 'purchase'
        |          AND epoch_us(ts) > epoch_us(t2) THEN ts END)
        |      OVER (PARTITION BY user_id) AS t3
        |  FROM w2)
        |SELECT DISTINCT user_id,
        |  CAST(CASE WHEN t3 IS NOT NULL THEN 3
        |            WHEN t2 IS NOT NULL THEN 2
        |            WHEN t1 IS NOT NULL THEN 1 END AS INT) AS step,
        |  t1, t2, t3
        |FROM w3 WHERE t1 IS NOT NULL
        |ORDER BY user_id""".stripMargin,
    ) { (s, d) =>
      val wu = Window.partitionBy("user_id")
      Tables.events(s, d)
        .withColumn("t1",
          min(when(col("event_type") === "view", col("ts"))).over(wu))
        .withColumn("t2",
          min(when(col("event_type") === "click" &&
            unix_micros(col("ts")) > unix_micros(col("t1")), col("ts")))
            .over(wu))
        .withColumn("t3",
          min(when(col("event_type") === "purchase" &&
            unix_micros(col("ts")) > unix_micros(col("t2")), col("ts")))
            .over(wu))
        .filter(col("t1").isNotNull)
        .select(col("user_id"),
          when(col("t3").isNotNull, 3)
            .when(col("t2").isNotNull, 2)
            .otherwise(1).cast("int").as("step"),
          col("t1"), col("t2"), col("t3"))
        .distinct()
        .orderBy("user_id")
    },

    // ---- q89: retention cohorts — users grouped by first-active day,
    //      distinct-active counts per (cohort, day offset): the
    //      retention triangle every growth dashboard renders. The
    //      (user, day) dedup makes the final count a plain count(*) —
    //      no count-distinct Expand at the cohort level; the cohort
    //      assignment is a whole-partition window min over the SAME
    //      user-keyed exchange the dedup produced. Day arithmetic is
    //      exact integer dates both engines. ----
    Q(
      "q89_retention_cohorts",
      """WITH dd AS (SELECT DISTINCT user_id,
        |    CAST(date_trunc('day', ts) AS DATE) AS d FROM events),
        |c AS (SELECT user_id, d,
        |    min(d) OVER (PARTITION BY user_id) AS cohort_day FROM dd)
        |SELECT cohort_day,
        |  CAST(date_diff('day', cohort_day, d) AS INT) AS day_offset,
        |  CAST(count(*) AS BIGINT) AS n_users
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    ) { (s, d) =>
      val wu = Window.partitionBy("user_id")
      Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("d"))
        .distinct()
        .withColumn("cohort_day", min("d").over(wu))
        .groupBy(col("cohort_day"),
          datediff(col("d"), col("cohort_day")).cast("int").as("day_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_day", "day_offset")
    },

    // ---- q92: grouped top-k via the bounded-heap aggregator
    //      (functions/TopK) — "top N per key" WITHOUT the window
    //      rendering's full per-group sort: O(k) state per group,
    //      partial-aggregated map-side, merge-tree safe under the
    //      total (value desc, id asc) order — so the result is EXACT
    //      and the window-SQL oracle checks it value-for-value. The
    //      per-group twin of q07's TakeOrderedAndProject. ----
    Q(
      "q92_grouped_topk",
      """SELECT event_type, CAST(rn AS INT) AS rank, event_id, value FROM (
        |  SELECT event_type, event_id, value,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY value DESC, event_id) AS rn
        |  FROM events)
        |WHERE rn <= 5 ORDER BY event_type, rank""".stripMargin,
    ) { (s, d) =>
      val tk = udaf(new graft.functions.TopK(5),
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaDouble,
          org.apache.spark.sql.Encoders.scalaLong))
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(tk(col("value"), col("event_id")).as("top"))
        .select(col("event_type"), posexplode(col("top")).as(Seq("i", "p")))
        .select(col("event_type"), (col("i") + 1).cast("int").as("rank"),
          col("p._2").as("event_id"), col("p._1").as("value"))
        .orderBy("event_type", "rank")
    },

    // ---- q95: pure range join (NO equi-key) — every purchase within
    //      60 s after ANY error ("orders placed while an error
    //      condition was live": the incident-impact correlation that
    //      has no shared key to join on). Spark's naive plan for a
    //      keyless theta join is a broadcast-nested-loop — O(n·m)
    //      comparisons and a single-executor hotspot at scale. The
    //      scale rendering BUCKETS time at the window width: the left
    //      side replicates to the (≤ 2) buckets its window touches,
    //      the right side keeps its own bucket, and the theta
    //      condition verifies inside a bucket EQUI-join — each
    //      qualifying pair meets in exactly one bucket (the right
    //      row's), so no dedup pass. Comparisons drop from n·m to
    //      pairs-per-bucket; the bucket key is open-cardinality (time
    //      advances), so no hot partitions. PlanSpec asserts no BNLJ /
    //      cartesian survives. ----
    Q(
      "q95_range_join",
      """SELECT a.event_id AS error_id, b.event_id AS purchase_id
        |FROM events a JOIN events b
        |  ON a.event_type = 'error' AND b.event_type = 'purchase'
        | AND epoch_us(b.ts) >= epoch_us(a.ts)
        | AND epoch_us(b.ts) < epoch_us(a.ts) + 60000000
        |ORDER BY error_id, purchase_id""".stripMargin,
    ) { (s, d) =>
      val w = 60000000L
      val ev = Tables.events(s, d)
      val errs = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("error_id"), unix_micros(col("ts")).as("a_us"))
        .select(col("error_id"), col("a_us"),
          explode(array_distinct(array(
            expr(s"a_us div $w"), expr(s"(a_us + $w) div $w")))).as("bucket"))
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"),
          unix_micros(col("ts")).as("b_us"))
        .withColumn("bucket", expr(s"b_us div $w"))
      errs.join(buys, Seq("bucket"))
        .filter(col("b_us") >= col("a_us") && col("b_us") < col("a_us") + w)
        .select("error_id", "purchase_id")
        .orderBy("error_id", "purchase_id")
    },

    // ---- q107: hourly gap-fill + last-observation-carried-forward —
    //      the resampling pass every telemetry/IoT dashboard and
    //      feature-engineering job runs over an irregular event stream
    //      (the reference's own domain: Power BI charts over telemetry
    //      arriving at arbitrary times). Per user, the hour grid spans
    //      first→last activity; empty hours materialize with
    //      n_events = 0, an is_gap flag, and the value carried forward
    //      from the latest event (deterministic in-hour pick: last by
    //      (ts, event_id), rendered as max_by over the unique tuple —
    //      never a float aggregate, so LOCF values compare exactly).
    //      Plan: one (user, hour) shuffle with partial aggregation, a
    //      per-user span aggregate whose sequence() explode generates
    //      the grid (bounded by the retention window per user, never
    //      corpus-sized), one left join back, and a user-keyed LOCF
    //      window — every stage keyed on open-cardinality user_id. ----
    Q(
      "q107_resample_locf",
      """WITH hv AS (
        |  SELECT user_id, date_trunc('hour', ts) AS hr, count(*) AS n_events,
        |    last(value ORDER BY ts, event_id) AS hv
        |  FROM events GROUP BY 1, 2),
        |span AS (SELECT user_id, min(hr) AS lo, max(hr) AS hi FROM hv GROUP BY 1),
        |grid AS (SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
        |  FROM span),
        |j AS (SELECT g.user_id, g.hr, coalesce(h.n_events, 0) AS n_events, h.hv
        |  FROM grid g LEFT JOIN hv h ON h.user_id = g.user_id AND h.hr = g.hr)
        |SELECT user_id, hr, CAST(n_events AS BIGINT) AS n_events,
        |  CAST(n_events = 0 AS INT) AS is_gap,
        |  last_value(hv IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY hr
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
        |FROM j ORDER BY user_id, hr""".stripMargin,
    ) { (s, d) =>
      val hv = Tables.events(s, d)
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).as("n_events"),
          max_by(col("value"), struct(col("ts"), col("event_id"))).as("hv"))
      val grid = hv.groupBy("user_id")
        .agg(min("hr").as("lo"), max("hr").as("hi"))
        .select(col("user_id"),
          explode(sequence(col("lo"), col("hi"), expr("interval 1 hour")))
            .as("hr"))
      val w = Window.partitionBy("user_id").orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(hv, Seq("user_id", "hr"), "left")
        .select(col("user_id"), col("hr"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          (coalesce(col("n_events"), lit(0L)) === 0).cast("int").as("is_gap"),
          last("hv", ignoreNulls = true).over(w).as("v"))
        .orderBy("user_id", "hr")
    },

    // ---- q111: point-in-time dimension join — the feature-store
    //      correctness op: each training example (purchase) must read
    //      the dimension VERSION that was valid at its event time,
    //      never a later one (label leakage) and never an earlier one
    //      once superseded. The dimension is SCD2-built from the
    //      signup change-log (q74's CDC→interval pass: version =
    //      row_number, validity [valid_from, next valid_from)), and
    //      the probe is rendered through the NATIVE as-of operator
    //      (q57's plans.AsOfJoin): on contiguous, disjoint intervals,
    //      "version containing ts" ≡ "latest valid_from ≤ ts" — with
    //      the (dim_id) tiebreak resolving equal-ts versions to the
    //      max dim_id, exactly the row whose interval is non-empty.
    //      The oracle states the CONTAINMENT semantics directly
    //      (valid_from ≤ ts < valid_to), so the gate proves the as-of
    //      rendering implements true point-in-time validity, not just
    //      the q54 contract again. Plan: one user-keyed window builds
    //      the dimension (one exchange), then AsOfJoinExec's
    //      merge-pass — one hash exchange per side, ONE retained row
    //      per key, no interval blow-up join. Probes before the first
    //      version surface NULLs (left-outer as-of). ----
    Q(
      "q111_pit_features",
      """WITH dim AS (
        |  SELECT user_id, event_id AS dim_id, value AS feature,
        |    ts AS valid_from,
        |    CAST(row_number() OVER w AS BIGINT) AS version,
        |    lead(ts) OVER w AS valid_to
        |  FROM events WHERE event_type = 'signup'
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT p.event_id, p.user_id, d.version, d.feature, d.valid_from
        |FROM events p LEFT JOIN dim d
        |  ON d.user_id = p.user_id AND d.valid_from <= p.ts
        |  AND (d.valid_to IS NULL OR p.ts < d.valid_to)
        |WHERE p.event_type = 'purchase'
        |ORDER BY p.event_id""".stripMargin,
    ) { (s, d) =>
      val ev = Tables.events(s, d)
      val wv = Window.partitionBy("d_user").orderBy("valid_from", "dim_id")
      val dim = ev.filter(col("event_type") === "signup")
        .select(col("user_id").as("d_user"), col("event_id").as("dim_id"),
          col("value").as("feature"), col("ts").as("valid_from"))
        .withColumn("version", row_number().over(wv).cast("long"))
      val probes = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      graft.plans.AsOf.joinAsOf(probes, dim,
          on = ("ts", "valid_from"), by = Seq(("user_id", "d_user")),
          tiebreak = Seq("dim_id"))
        .select(col("event_id"), col("user_id"), col("version"),
          col("feature"), col("valid_from"))
        .orderBy("event_id")
    },

    // ---- q123: point-in-time join with a STALENESS tolerance — the
    //      feature-store TTL rule (Feast's `ttl`, public): a dimension
    //      version older than the bound at event time is NOT a valid
    //      feature (a day-old device profile may be, a month-old one
    //      is noise), so stale matches surface as NULLs exactly like
    //      no-match probes — downstream imputation treats both the
    //      same. Rendering: q111's native as-of probe unchanged, plus
    //      one map-side conditional projection (µs integer compare —
    //      no second join, no interval re-check); the oracle states
    //      the tolerance inside the containment predicate, proving
    //      as-of + post-filter ≡ tolerance-bounded validity. 24 h
    //      splits the test corpus three ways (fresh / stale /
    //      never-matched), so all paths are value-checked. ----
    Q(
      "q123_pit_tolerance",
      """WITH dim AS (
        |  SELECT user_id, event_id AS dim_id, value AS feature,
        |    ts AS valid_from,
        |    CAST(row_number() OVER w AS BIGINT) AS version,
        |    lead(ts) OVER w AS valid_to
        |  FROM events WHERE event_type = 'signup'
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT p.event_id, p.user_id, d.version, d.feature, d.valid_from
        |FROM events p LEFT JOIN dim d
        |  ON d.user_id = p.user_id AND d.valid_from <= p.ts
        |  AND (d.valid_to IS NULL OR p.ts < d.valid_to)
        |  AND epoch_us(p.ts) - epoch_us(d.valid_from) <= 86400000000
        |WHERE p.event_type = 'purchase'
        |ORDER BY p.event_id""".stripMargin,
    ) { (s, d) =>
      val ev = Tables.events(s, d)
      val wv = Window.partitionBy("d_user").orderBy("valid_from", "dim_id")
      val dim = ev.filter(col("event_type") === "signup")
        .select(col("user_id").as("d_user"), col("event_id").as("dim_id"),
          col("value").as("feature"), col("ts").as("valid_from"))
        .withColumn("version", row_number().over(wv).cast("long"))
      val probes = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val fresh = unix_micros(col("ts")) - unix_micros(col("valid_from")) <=
        86400000000L
      graft.plans.AsOf.joinAsOf(probes, dim,
          on = ("ts", "valid_from"), by = Seq(("user_id", "d_user")),
          tiebreak = Seq("dim_id"))
        .select(col("event_id"), col("user_id"),
          when(fresh, col("version")).as("version"),
          when(fresh, col("feature")).as("feature"),
          when(fresh, col("valid_from")).as("valid_from"))
        .orderBy("event_id")
    },

    // ---- q112: exponentially-weighted moving average with EXACT
    //      dyadic weights — the classic telemetry smoothing/anomaly
    //      baseline (EWMA control chart), made cross-engine exact by
    //      choosing α = 1/2 and truncating at 16 lags: the weights
    //      2^15..2^0 are INTEGERS after scaling by 2^16, so each
    //      contribution is an exact DECIMAL(20,2)·int product, the
    //      numerator is an exact decimal sum (order-free — no float
    //      accumulation), and the only IEEE step is ONE final division
    //      of identically-computed operands (the registry float
    //      policy). Truncation bias is 2^-16 of the oldest mass —
    //      below double precision of the data's 2-decimal values.
    //      ewma is over the 16 PRIOR events (not the current one), so
    //      the spike flag compares a value against history it is not
    //      part of; a user's first event has no history → NULL ewma,
    //      flag 0. Plan: all 16 lags share ONE user-keyed window sort
    //      (a single exchange + sort, map-side arithmetic after) —
    //      the unrolled-lag form trades expression width for zero
    //      extra shuffles at any scale. ----
    Q(
      "q112_ewma_dyadic",
      {
        val num = (1 to 16).map(k =>
          s"coalesce(CAST(lag(value, $k) OVER w AS DECIMAL(20,2)), 0) * ${1L << (16 - k)}")
          .mkString(" + ")
        val den = (1 to 16).map(k =>
          s"CASE WHEN lag(value, $k) OVER w IS NULL THEN 0 ELSE ${1L << (16 - k)} END")
          .mkString(" + ")
        s"""SELECT event_id, user_id, value, ewma,
          |  CAST(ewma IS NOT NULL AND value > 2 * ewma AS INT) AS is_spike
          |FROM (
          |  SELECT event_id, user_id, value,
          |    CAST($num AS DOUBLE) / nullif(CAST($den AS DOUBLE), 0) AS ewma
          |  FROM events
          |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
          |ORDER BY event_id""".stripMargin
      },
    ) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val num = (1 to 16).map(k =>
        coalesce(lag("value", k).over(w).cast("decimal(20,2)"),
          lit(0).cast("decimal(20,2)")) * lit(1L << (16 - k)))
        .reduce(_ + _)
      val den = (1 to 16).map(k =>
        when(lag("value", k).over(w).isNull, 0L)
          .otherwise(1L << (16 - k)))
        .reduce(_ + _)
      Tables.events(s, d)
        .withColumn("ewma",
          num.cast("double") / nullif(den.cast("double"), lit(0.0)))
        .select(col("event_id"), col("user_id"), col("value"), col("ewma"),
          (col("ewma").isNotNull && col("value") > lit(2) * col("ewma"))
            .cast("int").as("is_spike"))
        .orderBy("event_id")
    },

    // ---- q122: session co-occurrence / basket analysis — which event
    //      types appear together in a session more than chance (2-item
    //      association mining: support and LIFT, the market-basket /
    //      feature-co-occurrence primitive; public apriori family).
    //      Sessions come from the ONE shared 6 h-gap definition
    //      (q39/q78/q101's CTE); the pair join is bounded per session
    //      by DISTINCT-TYPE count (≤ 5 types ⇒ ≤ C(5,2) pair rows per
    //      session — fan-out independent of session length, the q99
    //      bounded-pair discipline), and all statistics are exact
    //      integer counts with ONE IEEE division each (support,
    //      lift = nab·n/(na·nb) — the registry float policy). The
    //      session total rides a broadcast one-row aggregate (q15). ----
    Q(
      "q122_session_cooccur",
      s"""WITH $SqlSessionCte,
        |t AS (SELECT DISTINCT user_id, sess_id, event_type FROM s),
        |n AS (SELECT count(*) AS n_sess FROM
        |  (SELECT DISTINCT user_id, sess_id FROM t)),
        |a AS (SELECT event_type, count(*) AS cnt FROM t GROUP BY 1),
        |pr AS (SELECT x.event_type AS type_a, y.event_type AS type_b,
        |    count(*) AS nab
        |  FROM t x JOIN t y ON x.user_id = y.user_id
        |    AND x.sess_id = y.sess_id AND x.event_type < y.event_type
        |  GROUP BY 1, 2)
        |SELECT pr.type_a, pr.type_b, pr.nab,
        |  aa.cnt AS na, ab.cnt AS nb,
        |  CAST(pr.nab AS DOUBLE) / n.n_sess AS support,
        |  CAST(pr.nab * n.n_sess AS DOUBLE) / (aa.cnt * ab.cnt) AS lift
        |FROM pr, n
        |JOIN a aa ON aa.event_type = pr.type_a
        |JOIN a ab ON ab.event_type = pr.type_b
        |ORDER BY type_a, type_b""".stripMargin,
    ) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val run = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val t = Tables.events(s, d)
        .withColumn("new_sess",
          when(lag("ts", 1).over(w).isNull ||
            unix_micros(col("ts")) - unix_micros(lag("ts", 1).over(w)) >
              21600000000L, 1).otherwise(0))
        .withColumn("sess_id", sum("new_sess").over(run))
        .select("user_id", "sess_id", "event_type")
        .distinct()
        .transform(graft.Caches.persist)
      val n = t.select("user_id", "sess_id").distinct()
        .agg(count(lit(1)).as("n_sess"))
      val a = t.groupBy("event_type").agg(count(lit(1)).as("cnt"))
      t.toDF("user_id", "sess_id", "type_a")
        .join(t.toDF("user_id", "sess_id", "type_b"),
          Seq("user_id", "sess_id"))
        .filter(col("type_a") < col("type_b"))
        .groupBy("type_a", "type_b").agg(count(lit(1)).as("nab"))
        .crossJoin(broadcast(n))
        .join(broadcast(a.toDF("type_a", "na")), "type_a")
        .join(broadcast(a.toDF("type_b", "nb")), "type_b")
        .select(col("type_a"), col("type_b"), col("nab"),
          col("na"), col("nb"),
          (col("nab").cast("double") / col("n_sess")).as("support"),
          ((col("nab") * col("n_sess")).cast("double") /
            (col("na") * col("nb"))).as("lift"))
        .orderBy("type_a", "type_b")
    },

    // ---- q117: shuffle-skew audit — the pre-flight every 100 TB join
    //      or aggregation wants before picking a partitioning: the
    //      top-k hottest keys with their frequency, skew ratio vs the
    //      median key, and the SALT FACTOR (ceil(cnt/med)) that would
    //      flatten each to median-sized buckets — the knob
    //      Dedup.saltedPairs and AQE's skew-split turn. Plan
    //      discipline: the profile is ONE count aggregate whose
    //      cardinality is the KEY count, never the row count; the
    //      median comes from the compactor sketch in its exact regime
    //      (q98's boundary rule — no global sort over the key
    //      profile); top-k plans as TakeOrdered (distributed, q07);
    //      the only single-partition window ranks the k RETURNED rows
    //      — bounded by k, not data. All outputs are integers plus
    //      one exact IEEE division (skew). ----
    Q(
      "q117_skew_audit",
      """WITH f AS (SELECT user_id, count(*) AS cnt FROM events
        |  GROUP BY user_id),
        |m AS (SELECT CAST(quantile_disc(cnt, 0.5) AS BIGINT) AS med FROM f),
        |t AS (SELECT user_id, cnt FROM f ORDER BY cnt DESC, user_id LIMIT 10)
        |SELECT CAST(row_number() OVER (ORDER BY cnt DESC, user_id) AS INT)
        |    AS rk,
        |  user_id, cnt, m.med,
        |  CAST(cnt AS DOUBLE) / m.med AS skew,
        |  CAST((cnt + m.med - 1) // m.med AS BIGINT) AS rec_salt
        |FROM t, m ORDER BY rk""".stripMargin,
    ) { (s, d) =>
      val f = graft.Caches.persist(Tables.events(s, d)
        .groupBy("user_id").agg(count(lit(1)).as("cnt")))
      val sk = udaf(new graft.functions.QuantileSketchAgg(1 << 16, Seq(0.5)),
        org.apache.spark.sql.Encoders.scalaDouble)
      val m = f.agg(sk(col("cnt").cast("double")).as("q"))
        .select(element_at(col("q"), 1).cast("long").as("med"))
      val w = Window.orderBy(col("cnt").desc, col("user_id"))
      f.orderBy(col("cnt").desc, col("user_id")).limit(10)
        .crossJoin(broadcast(m))
        .withColumn("rk", row_number().over(w).cast("int"))
        .select(col("rk"), col("user_id"), col("cnt"), col("med"),
          (col("cnt").cast("double") / col("med")).as("skew"),
          expr("(cnt + med - 1) div med").as("rec_salt"))
        .orderBy("rk")
    },

    // ---- q128: MAD robust outlier audit — per event_type, flag
    //      readings whose absolute deviation from the median exceeds
    //      3× the median absolute deviation (the robust z-score:
    //      unlike q23's mean/stddev, a burst of outliers cannot drag
    //      the threshold toward itself; Hampel filter, public
    //      literature). Medians are LOWER medians picked by rank —
    //      order statistics, no interpolation — so every number here
    //      is either an exact input value or an integer count, and
    //      abs(v - med) is one exact IEEE subtraction: bit-identical
    //      across engines with no float-policy caveats at all.
    //      Scale shape: two event_type-keyed window sorts + one final
    //      partial-aggregated pass; event_type is a BOUNDED domain
    //      (sensor/event kinds — dozens), so per-key sort is the
    //      honest exact rendering. For open-cardinality keys the
    //      sketch route (q86/q98 compactor quantiles) replaces the
    //      sort — same report, O(k) state. ----
    Q(
      "q128_mad_outliers",
      """WITH r AS (SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY value, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events),
        |med AS (SELECT event_type, value AS med FROM r
        |  WHERE rn = (n + 1) // 2),
        |d AS (SELECT e.event_type, abs(e.value - med.med) AS dev, med.med
        |  FROM events e JOIN med USING (event_type)),
        |r2 AS (SELECT event_type, med, dev,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY dev) AS rn, count(*) OVER (PARTITION BY event_type)
        |      AS n
        |  FROM d),
        |mad AS (SELECT event_type, med, dev AS mad FROM r2
        |  WHERE rn = (n + 1) // 2)
        |SELECT d.event_type, CAST(count(*) AS BIGINT) AS n,
        |  mad.med, mad.mad,
        |  CAST(sum(CASE WHEN d.dev > 3 * mad.mad THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers,
        |  CAST(sum(CASE WHEN d.dev > 3 * mad.mad THEN 1 ELSE 0 END)
        |    AS DOUBLE) / count(*) AS outlier_ratio
        |FROM d JOIN mad USING (event_type)
        |GROUP BY d.event_type, mad.med, mad.mad
        |ORDER BY event_type""".stripMargin,
    ) { (s, d) =>
      val ev = Tables.events(s, d).select("event_id", "event_type", "value")
      val w1 = Window.partitionBy("event_type").orderBy("value", "event_id")
      val wp = Window.partitionBy("event_type")
      val med = ev
        .withColumn("rn", row_number().over(w1))
        .withColumn("n", count(lit(1)).over(wp))
        .filter(col("rn") === expr("(n + 1) div 2"))
        .select(col("event_type"), col("value").as("med"))
      // deviations feed BOTH the MAD rank and the final audit —
      // persisted so the broadcast join + subtraction runs once
      val dev = graft.Caches.persist(ev.join(broadcast(med), "event_type")
        .select(col("event_type"), col("med"),
          abs(col("value") - col("med")).as("dev"),
          col("event_id")))
      val w2 = Window.partitionBy("event_type").orderBy("dev", "event_id")
      val mad = dev
        .withColumn("rn", row_number().over(w2))
        .withColumn("n", count(lit(1)).over(wp))
        .filter(col("rn") === expr("(n + 1) div 2"))
        .select(col("event_type"), col("dev").as("mad"))
      dev.join(broadcast(mad), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(count(lit(1)).as("n"),
          sum(when(col("dev") > lit(3) * col("mad"), 1).otherwise(0))
            .as("n_outliers"))
        .select(col("event_type"), col("n"), col("med"), col("mad"),
          col("n_outliers"),
          (col("n_outliers").cast("double") / col("n")).as("outlier_ratio"))
        .orderBy("event_type")
    },

    // ---- q148: event-path mining — the top-20 most common session
    //      journeys (first ≤ 4 event types per user-day, in time
    //      order), the path-analysis complement to q88's FIXED funnel:
    //      the funnel checks one prescribed sequence, this DISCOVERS
    //      which sequences happen. Sessions are user-day buckets
    //      (q39's gap sessionization is the other rendering; a bucket
    //      key needs no window state to assign). The per-session
    //      sequence is built by a (user, day)-PARTITIONED row_number —
    //      state per task is one session, never a global sort — then a
    //      length-capped sort_array(collect_list(struct)) fold: the
    //      struct sort makes collect_list's arrival order irrelevant
    //      (deterministic under ts ties via the event_id key), and the
    //      ≤4 cap bounds per-group state BEFORE the fold. Path counts
    //      partial-aggregate on the (tiny) path domain; top-20 rides
    //      TakeOrdered with the (count desc, path asc) tie-break. ----
    Q(
      "q148_event_paths",
      """WITH se AS (SELECT user_id, date_trunc('day', ts) AS sess,
        |    event_type,
        |    row_number() OVER (PARTITION BY user_id, date_trunc('day', ts)
        |      ORDER BY ts, event_id) AS rn
        |  FROM events),
        |p AS (SELECT user_id, sess,
        |    string_agg(event_type, '>' ORDER BY rn) AS path
        |  FROM se WHERE rn <= 4 GROUP BY 1, 2),
        |c AS (SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
        |  FROM p GROUP BY 1)
        |SELECT path, n_sessions FROM c
        |ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin,
    ) { (s, d) =>
      val w = Window.partitionBy("user_id", "sess")
        .orderBy("ts", "event_id")
      Tables.events(s, d)
        .select(col("user_id"), date_trunc("day", col("ts")).as("sess"),
          col("event_type"), col("ts"), col("event_id"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 4)
        .groupBy("user_id", "sess")
        .agg(array_join(expr(
          "transform(array_sort(collect_list(struct(rn, event_type)))," +
            " x -> x.event_type)"), ">").as("path"))
        .groupBy("path").agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("n_sessions").desc, col("path"))
        .limit(20)
    },

    // ---- q152: Markov transition matrix — first-order next-event
    //      probabilities P(next | current) estimated from within-
    //      session consecutive pairs (q148 mines whole paths; this is
    //      the model behind them — the transition structure a journey
    //      simulator or next-event predictor consumes). Consecutive
    //      pairs come from a session-PARTITIONED lead() (per-task
    //      state = one session, ties broken by event id); counts
    //      partial-aggregate on the event-type² domain, so the only
    //      full shuffle carries ≤ |types|² rows no matter the event
    //      volume; each probability is ONE division of two exact
    //      integers (bit-identical cross-engine). ----
    Q(
      "q152_markov_transitions",
      """WITH tr AS (SELECT event_type AS cur,
        |    lead(event_type) OVER (PARTITION BY user_id,
        |      date_trunc('day', ts) ORDER BY ts, event_id) AS nxt
        |  FROM events),
        |c AS (SELECT cur, nxt, CAST(count(*) AS BIGINT) AS n FROM tr
        |  WHERE nxt IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT cur, CAST(sum(n) AS BIGINT) AS n_out
        |  FROM c GROUP BY 1)
        |SELECT c.cur, c.nxt, c.n, t.n_out,
        |  CAST(c.n AS DOUBLE) / t.n_out AS p
        |FROM c JOIN tot t USING (cur) ORDER BY cur, nxt""".stripMargin,
    ) { (s, d) =>
      val w = Window.partitionBy(col("user_id"),
        date_trunc("day", col("ts"))).orderBy("ts", "event_id")
      val c = Tables.events(s, d)
        .select(col("event_type").as("cur"),
          lead(col("event_type"), 1).over(w).as("nxt"))
        .filter(col("nxt").isNotNull)
        .groupBy("cur", "nxt").agg(count(lit(1)).as("n"))
        .transform(graft.Caches.persist)
      val tot = c.groupBy("cur").agg(sum("n").as("n_out"))
      c.join(broadcast(tot), "cur")
        .select(col("cur"), col("nxt"), col("n"), col("n_out"),
          (col("n").cast("double") / col("n_out")).as("p"))
        .orderBy("cur", "nxt")
    },

    // ---- q156: last-touch attribution — credit each purchase to the
    //      most recent NON-purchase event in its session (the
    //      marketing-attribution primitive; purchases with no prior
    //      touch credit 'direct'). The lookback is a session-
    //      partitioned IGNORE-NULLS last_value over the strictly-
    //      preceding frame — per-task state = one session, no
    //      self-join, no per-purchase scan-back; credit counts
    //      partial-aggregate on the event-type domain and the share
    //      is one int/int division against a broadcast total. ----
    Q(
      "q156_attribution_credit",
      """WITH pur AS (SELECT event_type,
        |    last_value(CASE WHEN event_type <> 'purchase'
        |        THEN event_type END IGNORE NULLS)
        |      OVER (PARTITION BY user_id, date_trunc('day', ts)
        |        ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS touch
        |  FROM events),
        |c AS (SELECT coalesce(touch, 'direct') AS credited,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM pur WHERE event_type = 'purchase' GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c)
        |SELECT credited, n, CAST(n AS DOUBLE) / t.tot AS share
        |FROM c, t ORDER BY credited""".stripMargin,
    ) { (s, d) =>
      val w = Window.partitionBy(col("user_id"),
          date_trunc("day", col("ts")))
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val c = graft.Caches.persist(Tables.events(s, d)
        .select(col("event_type"),
          last(when(col("event_type") =!= "purchase", col("event_type")),
            ignoreNulls = true).over(w).as("touch"))
        .filter(col("event_type") === "purchase")
        .groupBy(coalesce(col("touch"), lit("direct")).as("credited"))
        .agg(count(lit(1)).as("n")))
      val t = c.agg(sum("n").as("tot"))
      c.crossJoin(broadcast(t))
        .select(col("credited"), col("n"),
          (col("n").cast("double") / col("tot")).as("share"))
        .orderBy("credited")
    },

    // ---- q161: CUSUM change-point — the offline mean-shift detector
    //      (Page's cumulative-sum statistic): per event type, the day
    //      t maximizing |N·S_t − t·S_N| over the daily-count series —
    //      the scaled deviation of the cumulative sum from the
    //      uniform-rate line, INTEGER-exact (the |T|·S_t form clears
    //      the mean division q23's z-score pays in doubles).
    //      Everything windows PARTITION BY event_type over the tiny
    //      per-type day series (≤ |days| rows/type — the corpus-sized
    //      work is the daily groupBy, domain-bounded); argmax via the
    //      (cusum desc, day) row_number tie-break. ----
    Q(
      "q161_changepoint",
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |cum AS (SELECT event_type, day, n,
        |    CAST(sum(n) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS st,
        |    CAST(row_number() OVER (PARTITION BY event_type
        |      ORDER BY day) AS BIGINT) AS t,
        |    CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS sn,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS nt
        |  FROM daily),
        |mx AS (SELECT event_type, day, t,
        |    CAST(abs(nt * st - t * sn) AS BIGINT) AS cusum,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY abs(nt * st - t * sn) DESC, day) AS rk
        |  FROM cum)
        |SELECT event_type, day AS change_day, t AS day_index, cusum
        |FROM mx WHERE rk = 1 ORDER BY event_type""".stripMargin,
    ) { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("n"))
      val wOrd = Window.partitionBy("event_type").orderBy("day")
      val wAll = Window.partitionBy("event_type")
      val cum = daily
        .withColumn("st", sum("n").over(wOrd
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("t", row_number().over(wOrd).cast("long"))
        .withColumn("sn", sum("n").over(wAll))
        .withColumn("nt", count(lit(1)).over(wAll))
      val cusum = abs(col("nt") * col("st") - col("t") * col("sn"))
      cum.withColumn("cusum", cusum)
        .withColumn("rk", row_number().over(Window
          .partitionBy("event_type").orderBy(cusum.desc, col("day"))))
        .filter(col("rk") === 1)
        .select(col("event_type"), col("day").as("change_day"),
          col("t").as("day_index"), col("cusum"))
        .orderBy("event_type")
    },

    // ---- q162: chi-square drift audit — the no-transcendental
    //      distribution-shift test between two corpus epochs (PSI's
    //      ln(p/q) needs logs; Pearson's χ² = Σ(o−e)²/e does not):
    //      event-type mix in days 1–15 vs 16–30 as a 2×|types|
    //      contingency table, χ² per type in integer MICRO-units
    //      (per-cell floor before the sum — q146's associativity
    //      rule; expected counts are one double product/division of
    //      exact integers). The corpus-sized work is one (type,
    //      epoch) groupBy; everything after runs on ≤ 2·|types|
    //      rows. ----
    Q(
      "q162_chisq_drift",
      """WITH c AS (SELECT event_type,
        |    CASE WHEN extract(day FROM ts) <= 15 THEN 0 ELSE 1 END
        |      AS epoch,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |tot AS (SELECT epoch, CAST(sum(n) AS BIGINT) AS ne
        |  FROM c GROUP BY 1),
        |g AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS ng
        |  FROM c GROUP BY 1),
        |all_ AS (SELECT CAST(sum(n) AS BIGINT) AS na FROM c),
        |cells AS (SELECT c.event_type, c.n,
        |    CAST(g.ng AS DOUBLE) * t.ne / a.na AS expected
        |  FROM c JOIN g USING (event_type)
        |  JOIN tot t ON c.epoch = t.epoch, all_ a)
        |SELECT event_type,
        |  CAST(sum(CAST(floor(1000000 * (n - expected) * (n - expected)
        |    / expected) AS BIGINT)) AS BIGINT) AS chi2_micro
        |FROM cells GROUP BY 1 ORDER BY event_type""".stripMargin,
    ) { (s, d) =>
      val c = graft.Caches.persist(Tables.events(s, d)
        .select(col("event_type"),
          when(dayofmonth(col("ts")) <= 15, 0).otherwise(1).as("epoch"))
        .groupBy("event_type", "epoch").agg(count(lit(1)).as("n")))
      val tot = c.groupBy("epoch").agg(sum("n").as("ne"))
      val g = c.groupBy("event_type").agg(sum("n").as("ng"))
      val na = c.agg(sum("n").as("na"))
      val expected = col("ng").cast("double") * col("ne") / col("na")
      c.join(broadcast(g), "event_type").join(broadcast(tot), "epoch")
        .crossJoin(broadcast(na))
        .withColumn("expected", expected)
        .withColumn("cell_micro",
          floor(lit(1000000) * (col("n") - col("expected"))
            * (col("n") - col("expected")) / col("expected"))
            .cast("long"))
        .groupBy("event_type")
        .agg(sum("cell_micro").as("chi2_micro"))
        .orderBy("event_type")
    },

    // ---- q163: session-concurrency curve — active sessions per hour
    //      (the "concurrent users" capacity line): fold each user-day
    //      to its [first, last] hour span (one corpus-sized groupBy),
    //      explode the span onto the hour grid (sequence + explode —
    //      codegen'd, fan-out bounded by span length ≤ 24), count per
    //      hour. The interval→grid rasterization pattern: contrast
    //      q40's interval JOIN (pairwise overlap) — a grid count is
    //      O(spans·span_len), never pairwise. ----
    Q(
      "q163_concurrency_curve",
      """WITH se AS (SELECT user_id, CAST(ts AS DATE) AS day,
        |    date_trunc('hour', min(ts)) AS h0,
        |    date_trunc('hour', max(ts)) AS h1
        |  FROM events GROUP BY 1, 2),
        |hrs AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR))
        |    AS hour
        |  FROM se)
        |SELECT hour, CAST(count(*) AS BIGINT) AS active_sessions
        |FROM hrs GROUP BY 1 ORDER BY hour""".stripMargin,
    ) { (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"), col("ts").cast("date").as("day"))
        .agg(date_trunc("hour", min("ts")).as("h0"),
          date_trunc("hour", max("ts")).as("h1"))
        .select(explode(sequence(col("h0"), col("h1"),
          expr("interval 1 hour"))).as("hour"))
        .groupBy("hour").agg(count(lit(1)).as("active_sessions"))
        .orderBy("hour")
    },

    // ---- q164: bitemporal as-of — the two-axis time-travel read
    //      (valid time = when a fact WAS true; transaction time =
    //      when we RECORDED it; Snodgrass's bitemporal model): "what
    //      did we believe at T about the state at V" for four (V, T)
    //      scenarios in one plan. The version store derives from
    //      `customer`: v1 valid [100,200) recorded at tx 10, v2
    //      valid [200,300) recorded at tx 30, and a CORRECTION of v1
    //      (balance restated) recorded at tx 50 for every 6th
    //      customer — so (150, 20) sees the original, (150, 60) the
    //      correction, (250, 20) nothing yet (v2 unrecorded at T=20),
    //      (250, 60) v2. Rows carry closed-open [from, to) on BOTH
    //      axes; the read is two range predicates against a 4-row
    //      broadcast scenario table + q118's order-free checksum.
    //      SCD2 (q74) is the valid-time-only special case. ----
    Q(
      "q164_bitemporal_asof",
      """WITH vers AS (
        |  SELECT c_custkey AS id, c_acctbal AS bal,
        |    100 AS vf, 200 AS vt, 10 AS txf,
        |    CASE WHEN c_custkey % 6 = 2 THEN 50 ELSE 999999 END AS txt
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey, c_acctbal + 100, 100, 200, 50, 999999
        |  FROM customer WHERE c_custkey % 6 = 2
        |  UNION ALL
        |  SELECT c_custkey, c_acctbal + 7, 200, 300, 30, 999999
        |  FROM customer),
        |sc AS (SELECT * FROM (VALUES (150, 20), (150, 60), (250, 20),
        |    (250, 60)) AS t(v, tx)),
        |hit AS (SELECT sc.v, sc.tx, vers.id, vers.bal
        |  FROM vers JOIN sc ON vers.vf <= sc.v AND sc.v < vers.vt
        |    AND vers.txf <= sc.tx AND sc.tx < vers.txt)
        |SELECT CAST(v AS BIGINT) AS valid_at, CAST(tx AS BIGINT)
        |    AS recorded_at,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(bit_xor(CAST(('0x' || substr(md5(id || '|'
        |      || CAST(floor(bal * 100 + 0.5) AS BIGINT)), 1, 15))
        |    AS BIGINT)) AS BIGINT) AS state_checksum
        |FROM hit GROUP BY 1, 2 ORDER BY valid_at, recorded_at""".stripMargin,
    ) { (s, d) =>
      import s.implicits._
      val cust = Tables.customer(s, d)
      val inf = lit(999999)
      val vers = cust.select(col("c_custkey").as("id"),
          col("c_acctbal").as("bal"), lit(100).as("vf"), lit(200).as("vt"),
          lit(10).as("txf"),
          when(col("c_custkey") % 6 === 2, 50).otherwise(inf).as("txt"))
        .unionAll(cust.filter(col("c_custkey") % 6 === 2)
          .select(col("c_custkey").as("id"),
            (col("c_acctbal") + 100).as("bal"), lit(100).as("vf"),
            lit(200).as("vt"), lit(50).as("txf"), inf.as("txt")))
        .unionAll(cust.select(col("c_custkey").as("id"),
          (col("c_acctbal") + 7).as("bal"), lit(200).as("vf"),
          lit(300).as("vt"), lit(30).as("txf"), inf.as("txt")))
      val sc = Seq((150, 20), (150, 60), (250, 20), (250, 60))
        .toDF("v", "tx")
      vers.join(broadcast(sc),
          col("vf") <= col("v") && col("v") < col("vt") &&
            col("txf") <= col("tx") && col("tx") < col("txt"))
        .groupBy(col("v").cast("long").as("valid_at"),
          col("tx").cast("long").as("recorded_at"))
        .agg(count(lit(1)).as("n_rows"),
          // balance digested as exact integer CENTS — a double→string
          // cast would pin the checksum to each engine's float
          // formatter (q119's lesson applied to digests)
          expr("bit_xor(CAST(conv(substring(md5(concat_ws('|', id, " +
            "CAST(floor(bal * 100 + 0.5) AS BIGINT))), 1, 15), 16, 10) " +
            "AS BIGINT))").as("state_checksum"))
        .orderBy("valid_at", "recorded_at")
    },

    // ---- q172: linear-interpolation gap fill — the lerp alternative
    //      to q107's LOCF resampling (LOCF repeats the past; lerp
    //      reconstructs a trend — the choice every sensor pipeline
    //      makes per signal): hourly sums on a fixed day-1 grid,
    //      missing cells filled as pv + (nv−pv)·(h−ph)/(nh−ph)
    //      between the nearest observed neighbors (IGNORE-NULLS
    //      last/first over strictly-preceding / strictly-following
    //      frames carry value AND position), edges fall back to
    //      nearest-observation fill, every row labeled with its fill
    //      source. Observed sums are exact DECIMAL → one double; the
    //      lerp is the same mirrored IEEE tree in both engines.
    //      Windows partition per type over the 24-cell grid — state
    //      is the grid, never the event volume. ----
    Q(
      "q172_lerp_gapfill",
      """WITH hourly AS (SELECT event_type, date_trunc('hour', ts) AS h,
        |    CAST(CAST(sum(CAST(value AS DECIMAL(18,6))) AS VARCHAR)
        |      AS DOUBLE) AS v
        |  FROM events WHERE extract(day FROM ts) = 1 GROUP BY 1, 2),
        |grid AS (SELECT e.event_type, g.h
        |  FROM (SELECT DISTINCT event_type FROM hourly) e,
        |    (SELECT unnest(generate_series(TIMESTAMP '2024-01-01 00:00:00',
        |      TIMESTAMP '2024-01-01 23:00:00', INTERVAL 1 HOUR)) AS h) g),
        |j AS (SELECT g.event_type, g.h,
        |    CAST(extract(hour FROM g.h) AS BIGINT) AS hr, hourly.v
        |  FROM grid g LEFT JOIN hourly
        |    ON g.event_type = hourly.event_type AND g.h = hourly.h),
        |w AS (SELECT event_type, h, hr, v,
        |    last_value(v IGNORE NULLS) OVER (PARTITION BY event_type
        |      ORDER BY hr ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND 1 PRECEDING) AS pv,
        |    last_value(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS)
        |      OVER (PARTITION BY event_type ORDER BY hr
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ph,
        |    first_value(v IGNORE NULLS) OVER (PARTITION BY event_type
        |      ORDER BY hr ROWS BETWEEN 1 FOLLOWING
        |      AND UNBOUNDED FOLLOWING) AS nv,
        |    first_value(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS)
        |      OVER (PARTITION BY event_type ORDER BY hr
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nh
        |  FROM j)
        |SELECT event_type, h,
        |  CASE WHEN v IS NOT NULL THEN v
        |       WHEN pv IS NULL THEN nv
        |       WHEN nv IS NULL THEN pv
        |       ELSE pv + (nv - pv) * (hr - ph) / (nh - ph) END AS value,
        |  CASE WHEN v IS NOT NULL THEN 'observed'
        |       WHEN pv IS NULL THEN 'backfill'
        |       WHEN nv IS NULL THEN 'ffill'
        |       ELSE 'interpolated' END AS source
        |FROM w ORDER BY event_type, h""".stripMargin,
    ) { (s, d) =>
      import s.implicits._
      val hourly = Tables.events(s, d)
        .filter(dayofmonth(col("ts")) === 1)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg(sum(col("value").cast("decimal(18,6)")).cast("double")
          .as("v"))
      val grid = hourly.select("event_type").distinct()
        .crossJoin(broadcast((0 until 24).toDF("hr0")))
        .select(col("event_type"),
          expr("timestamp'2024-01-01 00:00:00' " +
            "+ make_interval(0, 0, 0, 0, hr0, 0, 0)").as("h"),
          col("hr0").cast("long").as("hr"))
      val j = grid.join(hourly, Seq("event_type", "h"), "left")
      def prevF = Window.partitionBy("event_type").orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, -1)
      def nextF = Window.partitionBy("event_type").orderBy("hr")
        .rowsBetween(1, Window.unboundedFollowing)
      val w = j
        .withColumn("pv", last(col("v"), ignoreNulls = true).over(prevF))
        .withColumn("ph", last(when(col("v").isNotNull, col("hr")),
          ignoreNulls = true).over(prevF))
        .withColumn("nv", first(col("v"), ignoreNulls = true).over(nextF))
        .withColumn("nh", first(when(col("v").isNotNull, col("hr")),
          ignoreNulls = true).over(nextF))
      w.select(col("event_type"), col("h"),
          when(col("v").isNotNull, col("v"))
            .when(col("pv").isNull, col("nv"))
            .when(col("nv").isNull, col("pv"))
            .otherwise(col("pv") + (col("nv") - col("pv")) *
              (col("hr") - col("ph")) / (col("nh") - col("ph")))
            .as("value"),
          when(col("v").isNotNull, "observed")
            .when(col("pv").isNull, "backfill")
            .when(col("nv").isNull, "ffill")
            .otherwise("interpolated").as("source"))
        .orderBy("event_type", "h")
    },

    // ---- q197: Mann–Kendall trend test + Theil–Sen slope — the
    //      non-parametric "is this metric trending" primitive
    //      (Mann 1945, Kendall's tau-b numerator; Theil 1950 / Sen
    //      1968 — public literature), q161's complement: the
    //      changepoint finds WHERE a level shifts, this asks whether a
    //      monotone drift exists at all, robust to outliers a
    //      least-squares slope would chase. The corpus folds to the
    //      DAY domain first (one grouped count), so the pairwise pass
    //      is span², never event². S = Σ sign(n_j − n_i) is exact
    //      integer; the Theil–Sen slope is the lower-median of the
    //      pairwise slopes, each ONE IEEE division of identical
    //      integer operands — deliberately NOT integer-divided:
    //      slopes are routinely negative and `div`/`//` disagree on
    //      negative floors across engines (the q191 rule). Median by
    //      row_number with a deterministic (slope, i, j) tie-break on
    //      the day-pair domain. ----
    Q(
      "q197_trend_test",
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1),
        |d0 AS (SELECT min(day) AS d0 FROM daily),
        |d AS (SELECT CAST(day - d0.d0 AS BIGINT) AS di, n
        |  FROM daily, d0),
        |p AS (SELECT a.di AS i, b.di AS j, a.n AS ni, b.n AS nj
        |  FROM d a JOIN d b ON a.di < b.di),
        |sgn AS (SELECT CAST(sum(CASE WHEN nj > ni THEN 1
        |      WHEN nj < ni THEN -1 ELSE 0 END) AS BIGINT) AS s,
        |    CAST(count(*) AS BIGINT) AS n_pairs FROM p),
        |r AS (SELECT CAST(nj - ni AS DOUBLE) / (j - i) AS slope,
        |    row_number() OVER (ORDER BY
        |      CAST(nj - ni AS DOUBLE) / (j - i), i, j) AS rn
        |  FROM p),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM d)
        |SELECT sgn.s AS mk_s, nd.n_days, sgn.n_pairs,
        |  r.slope AS theil_sen_slope
        |FROM sgn, nd, r WHERE r.rn = (sgn.n_pairs + 1) // 2""".stripMargin,
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val daily = Tables.events(s, d)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("n"))
      val d0 = daily.agg(min("day").as("d0"))
      val dd = graft.Caches.persist(daily.crossJoin(broadcast(d0))
        .select(datediff(col("day"), col("d0")).cast("long").as("di"),
          col("n")))
      // day-pair domain: span² rows, never event²
      val p = graft.Caches.persist(dd.select(col("di").as("i"),
          col("n").as("ni"))
        .join(dd.select(col("di").as("j"), col("n").as("nj")),
          col("i") < col("j")))
      val sgn = p.agg(
        sum(when(col("nj") > col("ni"), 1L)
          .when(col("nj") < col("ni"), -1L).otherwise(0L)).cast("long")
          .as("mk_s"),
        count(lit(1)).as("n_pairs"))
      val slope = (col("nj") - col("ni")).cast("double") /
        (col("j") - col("i"))
      val r = p.select(slope.as("slope"), col("i"), col("j"))
        .withColumn("rn",
          row_number().over(Window.orderBy(col("slope"), col("i"),
            col("j"))))
      val nd = dd.agg(count(lit(1)).as("n_days"))
      r.crossJoin(broadcast(sgn)).crossJoin(broadcast(nd))
        .filter(col("rn") === expr("(n_pairs + 1) div 2"))
        .select(col("mk_s"), col("n_days"), col("n_pairs"),
          col("slope").as("theil_sen_slope"))
    },

    // ---- q203: Fano-factor burstiness per event type — the
    //      overdispersion detector (variance/mean of the daily count;
    //      =1 for a Poisson arrival process, >1 bursty, <1 regular),
    //      completing the arrival-statistics family: q161 finds WHERE
    //      the level shifts, q197 whether it drifts, this HOW bursty
    //      it is. Day count n is the full calendar SPAN (zero days
    //      count: they contribute x=0 to neither sum but inflate n —
    //      exactly what makes a sparse bursty type read as bursty).
    //      Moment sums are exact BIGINTs off the day-domain fold; the
    //      Fano value itself follows the q119 float policy: exact
    //      integer sums cast once to DOUBLE, one textual formula both
    //      engines evaluate identically (every IEEE op exactly
    //      rounded on identical inputs). Single-day types: n = 1 →
    //      0/0 → NaN in both engines' double division. ----
    Q(
      "q203_fano_burstiness",
      """WITH dd AS (SELECT event_type AS t, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |agg AS (SELECT t,
        |    CAST(max(day) - min(day) AS BIGINT) + 1 AS n,
        |    CAST(count(*) AS BIGINT) AS n_active,
        |    CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM dd GROUP BY 1)
        |SELECT t AS event_type, n AS n_days, n_active, sx AS n_events,
        |  (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |    / (CAST(n - 1 AS DOUBLE) * CAST(sx AS DOUBLE)) AS fano
        |FROM agg ORDER BY event_type""".stripMargin,
    ) { (s, d) =>
      val dd = Tables.events(s, d)
        .groupBy(col("event_type").as("t"),
          col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("x"))
      dd.groupBy("t")
        .agg((datediff(max("day"), min("day")).cast("long") + 1L).as("n"),
          count(lit(1)).as("n_active"),
          sum("x").cast("long").as("sx"),
          sum(col("x") * col("x")).cast("long").as("sxx"))
        .select(col("t").as("event_type"), col("n").as("n_days"),
          col("n_active"), col("sx").as("n_events"),
          ((col("n").cast("double") * col("sxx").cast("double")
            - col("sx").cast("double") * col("sx").cast("double"))
            / ((col("n") - 1).cast("double") * col("sx").cast("double")))
            .as("fano"))
        .orderBy("event_type")
    },

    // ---- q204: lag-1 autocorrelation of the daily event series —
    //      the "is today like yesterday" number (serial dependence;
    //      near 0 for memoryless arrivals, positive under regimes/
    //      weekly structure), the fourth arrival-statistics primitive
    //      after q161/q197/q203. The day series is ZERO-FILLED over
    //      the full span first (a missing day is x=0, not a skipped
    //      lag pair — without the fill, lag pairs silently jump gaps
    //      and the statistic measures the storage layout, not the
    //      process). Lag pairing is one self-join on di+1 over the
    //      span-sized fold; moment sums exact BIGINTs; the Pearson
    //      value follows q119: one textual double formula, sqrt is
    //      IEEE-exactly-rounded so both engines agree bit-for-bit. ----
    Q(
      "q204_autocorrelation",
      """WITH dd AS (SELECT CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS x FROM events GROUP BY 1),
        |mm AS (SELECT min(day) AS d0, max(day) AS d1 FROM dd),
        |days AS (SELECT unnest(range(0,
        |    CAST(mm.d1 - mm.d0 AS BIGINT) + 1)) AS di FROM mm),
        |o AS (SELECT CAST(day - mm.d0 AS BIGINT) AS di, x
        |  FROM dd, mm),
        |f AS (SELECT d.di, coalesce(o.x, 0) AS x
        |  FROM days d LEFT JOIN o ON o.di = d.di),
        |p AS (SELECT a.x AS x0, b.x AS x1
        |  FROM f a JOIN f b ON b.di = a.di + 1),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x0) AS BIGINT) AS sx, CAST(sum(x1) AS BIGINT) AS sy,
        |    CAST(sum(x0 * x0) AS BIGINT) AS sxx,
        |    CAST(sum(x1 * x1) AS BIGINT) AS syy,
        |    CAST(sum(x0 * x1) AS BIGINT) AS sxy FROM p)
        |SELECT n AS n_pairs,
        |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS acf1
        |FROM s""".stripMargin,
    ) { (s, d) =>
      val dd = graft.Caches.persist(Tables.events(s, d)
        .groupBy(col("ts").cast("date").as("day"))
        .agg(count(lit(1)).as("x")))
      val mm = dd.agg(min("day").as("d0"), max("day").as("d1"))
      val days = mm.select(explode(sequence(lit(0),
        datediff(col("d1"), col("d0")))).as("di"))
        .select(col("di").cast("long").as("di"))
      val o = dd.crossJoin(broadcast(mm))
        .select(datediff(col("day"), col("d0")).cast("long").as("di"),
          col("x"))
      // span-sized zero-filled series: everything below is day-domain
      val f = graft.Caches.persist(days
        .join(o, Seq("di"), "left")
        .select(col("di"), coalesce(col("x"), lit(0L)).as("x")))
      val p = f.as("a").join(f.as("b"),
        col("b.di") === col("a.di") + 1)
        .select(col("a.x").as("x0"), col("b.x").as("x1"))
      p.agg(count(lit(1)).as("n"),
          sum("x0").cast("long").as("sx"),
          sum("x1").cast("long").as("sy"),
          sum(col("x0") * col("x0")).cast("long").as("sxx"),
          sum(col("x1") * col("x1")).cast("long").as("syy"),
          sum(col("x0") * col("x1")).cast("long").as("sxy"))
        .select(col("n").as("n_pairs"),
          ((col("n").cast("double") * col("sxy").cast("double")
            - col("sx").cast("double") * col("sy").cast("double"))
            / (sqrt(col("n").cast("double") * col("sxx").cast("double")
              - col("sx").cast("double") * col("sx").cast("double"))
              * sqrt(col("n").cast("double") * col("syy").cast("double")
                - col("sy").cast("double") * col("sy").cast("double"))))
            .as("acf1"))
    },
  )
}
