package graft.streaming

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingBurstinessSpec extends SparkSpec {
  import StreamingBurstiness.{Arrival, Snapshot}

  private val sf = "/root/testdata/sf0.001"

  /** Drive `batches` through the monitor; return the final snapshot
    * per type (max events, then max late counter). */
  private def run(batches: Seq[Seq[Arrival]], horizon: Long,
      name: String): Map[String, Snapshot] = {
    val sp = spark
    import sp.implicits._
    val input = MemoryStream[Arrival](sp)
    val q = StreamingBurstiness.monitor(input.toDS(), horizon)
      .writeStream.format("memory").queryName(name).start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      sp.table(name).as[Snapshot].collect()
        .groupBy(_.event_type).view
        .mapValues(_.maxBy(s => (s.n_events, s.late_dropped))).toMap
    } finally q.stop()
  }

  private def fixtureArrivals(): Seq[Arrival] =
    Tables.events(spark, sf)
      .select(col("event_type"), col("ts").cast("date").as("day"))
      .collect()
      .map(r => Arrival(r.getString(0), r.getDate(1).toLocalDate.toEpochDay))
      .toSeq

  test("no-closure stream snapshot ≡ q203 batch census, bit-exact") {
    val census = SparkEntry.queries("q203_fano_burstiness")(spark, sf)
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_days"), r.getAs[Long]("n_active"),
          r.getAs[Long]("n_events"), r.getAs[Double]("fano"))).toMap
    val rows = fixtureArrivals()
    val fin = run(Seq(rows.take(300), rows.slice(300, 700), rows.drop(700)),
      horizon = 100000L, name = "burst_parity")
    assert(fin.keySet == census.keySet)
    fin.foreach { case (t, s) =>
      val (n, act, ev, f) = census(t)
      assert(s.n_days == n && s.n_active == act && s.n_events == ev,
        s"$t: integer stats")
      assert(s.fano == f, s"$t: Fano must be bit-exact (shared formula text)")
      assert(s.late_dropped == 0L)
    }
  }

  test("batching invariance in the no-closure regime") {
    val rows = fixtureArrivals()
    val once = run(Seq(rows), 100000L, "burst_once")
    val many = run(rows.grouped(97).toSeq, 100000L, "burst_many")
    assert(once == many,
      "final snapshots must depend on what arrived, not how it batched")
  }

  test("in-order stream with a tight horizon converges to the no-closure stats") {
    val rows = fixtureArrivals().sortBy(_.day)
    val tight = run(rows.grouped(200).toSeq, 0L, "burst_tight")
    val loose = run(Seq(rows), 100000L, "burst_loose")
    assert(tight.view.mapValues(_.copy(late_dropped = 0L)).toMap ==
      loose.view.mapValues(_.copy(late_dropped = 0L)).toMap,
      "closure only re-buckets where a day's count is held")
    assert(tight.values.forall(_.late_dropped == 0L),
      "an in-order stream never loses a row to closure")
  }

  test("a row for a possibly-folded day drops loudly; a pre-history backfill is absorbed") {
    val sp = spark
    import sp.implicits._
    val input = MemoryStream[Arrival](sp)
    val q = StreamingBurstiness.monitor(input.toDS(), 0L)
      .writeStream.format("memory").queryName("burst_late").start()
    try {
      input.addData(Arrival("a", 10L), Arrival("a", 10L), Arrival("a", 20L))
      q.processAllAvailable()
      val before = sp.table("burst_late").as[Snapshot].collect()
        .maxBy(_.n_events)
      // day 10 already folded (boundary 19) and ≥ min: irreversible
      input.addData(Arrival("a", 10L))
      q.processAllAvailable()
      val late = sp.table("burst_late").as[Snapshot].collect()
        .maxBy(s => (s.n_events, s.late_dropped))
      assert(before.late_dropped == 0L)
      assert(late.late_dropped == 1L, "the late row must be visible")
      assert(late.n_events == before.n_events &&
        late.n_days == before.n_days && late.fano == before.fano,
        "the late row must not corrupt the folded statistics")
      // day 5 predates the observed minimum: provably unfolded —
      // absorbed, widening the span exactly as the batch census would
      input.addData(Arrival("a", 5L))
      q.processAllAvailable()
      val back = sp.table("burst_late").as[Snapshot].collect()
        .maxBy(s => (s.n_events, s.late_dropped))
      assert(back.late_dropped == 1L, "the backfill is not late")
      assert(back.n_events == before.n_events + 1)
      assert(back.n_days == 20L - 5L + 1L, "span widens to the backfill")
      // a SECOND row for that day, in a later batch, IS late: its
      // count has folded by now
      input.addData(Arrival("a", 5L))
      q.processAllAvailable()
      val again = sp.table("burst_late").as[Snapshot].collect()
        .maxBy(s => (s.n_events, s.late_dropped))
      assert(again.late_dropped == 2L && again.n_events == back.n_events)
    } finally q.stop()
  }
}
