package graft.streaming

import java.sql.Timestamp

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-stream interval join semantics: one definition on both
  * execution surfaces (batch ≡ q40), cross-batch matching, interval
  * bounds, and bounded join state under advancing watermarks. */
class StreamingIntervalJoinSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"
  private val H = 3600000L
  private def ts(h: Long, m: Long = 0): Timestamp = new Timestamp(h * H + m * 60000L)

  test("batch mode: the same definition reproduces q40 row-for-row") {
    val ev = Tables.events(spark, sf)
    val got = StreamingIntervalJoin.attribute(
      ev.filter(col("event_type") === "click"),
      ev.filter(col("event_type") === "purchase"))
    val batch = SparkEntry.queries("q40_interval_join")(spark, sf)
    assert(got.exceptAll(batch).isEmpty && batch.exceptAll(got).isEmpty,
      "one join definition must serve both surfaces")
    assert(got.count() > 0)
  }

  test("cross-batch attribution: purchases match clicks from earlier micro-batches; bounds hold") {
    val sp = spark
    import sp.implicits._
    val clicks = MemoryStream[(Long, Long, Timestamp)](sp)
    val buys = MemoryStream[(Long, Long, Timestamp)](sp)
    def df(m: MemoryStream[(Long, Long, Timestamp)]) =
      m.toDF.toDF("event_id", "user_id", "ts")
    val q = StreamingIntervalJoin.attribute(df(clicks), df(buys))
      .writeStream.format("memory").queryName("ssj").start()
    try {
      clicks.addData((1L, 7L, ts(10)), (2L, 8L, ts(10)))
      q.processAllAvailable()
      assert(sp.table("ssj").count() == 0)
      // next batch: in-window purchase for u7 (+2 h), out-of-window for
      // u8 (+30 h), pre-click purchase for u7 (hour 5)
      buys.addData((100L, 7L, ts(12)), (101L, 8L, ts(40)), (102L, 7L, ts(5)))
      q.processAllAvailable()
      val got = sp.table("ssj").as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 100L)),
        "only the same-user in-[0,24h) purchase may attribute")
      // state stays bounded — but only once BOTH sides advance: the
      // query watermark is the MIN over all inputs (multipleWatermarkPolicy
      // default), so a quiet side pins eviction for the whole join
      buys.addData((103L, 9L, ts(80)))
      clicks.addData((3L, 9L, ts(80)))
      q.processAllAvailable()
      buys.addData((104L, 9L, ts(81)))
      clicks.addData((4L, 9L, ts(81)))
      q.processAllAvailable()
      val state = q.lastProgress.stateOperators
      assert(state.nonEmpty)
      // hour-10 clicks and all pre-hour-80 purchases are beyond any
      // possible future match at watermark 80 — evicted
      assert(state.head.numRowsTotal < 6,
        s"join state must evict expired rows, had ${state.head.numRowsTotal}")
    } finally q.stop()
  }
}
