package graft.streaming

import java.sql.Timestamp

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingScd2Spec extends SparkSpec {
  import StreamingScd2.ClosedVersion

  private val sf = "/root/testdata/sf0.001"

  private def ev(user: Long, id: Long, sec: Long, state: String) =
    (id, new Timestamp(sec * 1000L), user, state)

  test("closed versions match batch q74's closed intervals on the events table") {
    val sp = spark
    val streamed = StreamingScd2
      .closedForEvents(graft.Tables.events(sp, sf))
      .toDF()
      .select(col("user_id"), col("version"), col("state"),
        col("valid_from"), col("valid_to"), col("n_events"))
    val batch = SparkEntry.queries("q74_scd2")(sp, sf)
      .filter(col("is_current") === 0) // open versions stay in state
      .select(col("user_id"), col("version"), col("state"),
        col("valid_from"), col("valid_to"), col("n_events"))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "one-batch streaming maintenance must equal the batch rebuild")
  }

  test("versions close across micro-batches with carried state") {
    val sp = spark
    import sp.implicits._
    val input = MemoryStream[(Long, Timestamp, Long, String)](sp)
    val events = input.toDF.toDF("event_id", "ts", "user_id", "state")
      .select(col("user_id"), col("event_id"), col("ts"), col("state"))
    val q = StreamingScd2.closedVersions(events.as[StreamingScd2.Change])
      .writeStream.format("memory").queryName("scd2_cross").start()
    try {
      input.addData(ev(7, 1, 100, "view"), ev(7, 2, 200, "view"))
      q.processAllAvailable()
      assert(sp.table("scd2_cross").count() == 0, "same state: nothing closes")
      input.addData(ev(7, 3, 300, "click"))
      q.processAllAvailable()
      val rows = sp.table("scd2_cross").as[ClosedVersion].collect()
      assert(rows.length == 1)
      val r = rows.head
      assert(r.user_id == 7 && r.version == 1 && r.state == "view" &&
        r.n_events == 2 && r.valid_from.getTime == 100000L &&
        r.valid_to.getTime == 300000L && !r.late)
    } finally q.stop()
  }

  test("an event-time regression across batches is flagged, not silently misordered") {
    val sp = spark
    import sp.implicits._
    val input = MemoryStream[(Long, Timestamp, Long, String)](sp)
    val events = input.toDF.toDF("event_id", "ts", "user_id", "state")
      .select(col("user_id"), col("event_id"), col("ts"), col("state"))
    val q = StreamingScd2.closedVersions(events.as[StreamingScd2.Change])
      .writeStream.format("memory").queryName("scd2_late").start()
    try {
      input.addData(ev(9, 1, 500, "view"))
      q.processAllAvailable()
      input.addData(ev(9, 2, 100, "click")) // ts BEFORE the open version
      q.processAllAvailable()
      val r = sp.table("scd2_late").as[ClosedVersion].collect().head
      assert(r.late, "broken per-key ordering must surface on the closed row")
    } finally q.stop()
  }
}
