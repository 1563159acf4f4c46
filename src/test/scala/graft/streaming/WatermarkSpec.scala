package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** T3 (SURVEY §2.10): late data beyond the watermark tolerance is
  * dropped from windowed aggregates — the reference ASA job's 60 s
  * `events_late_arrival_max_delay` re-expressed as `withWatermark`. */
class WatermarkSpec extends SparkSpec {

  test("windowed aggregate drops events later than the watermark tolerance") {
    import spark.implicits._
    val input = MemoryStream[(java.sql.Timestamp, Long)](spark)
    val counts = input.toDF().toDF("ts", "v")
      .withWatermark("ts", "60 seconds")
      .groupBy(window(col("ts"), "1 minute"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w"), col("n"))
    val q = counts.writeStream
      .format("memory").queryName("wmtest")
      .outputMode(OutputMode.Append) // emit only finalized windows
      .trigger(Trigger.ProcessingTime(0))
      .start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    try {
      // window [10:00, 10:01): three on-time events
      input.addData(
        ts("2024-01-01 10:00:05") -> 1L,
        ts("2024-01-01 10:00:20") -> 2L,
        ts("2024-01-01 10:00:40") -> 3L)
      q.processAllAvailable()
      // advance event time far past the window + tolerance so the
      // 10:00 window finalizes (watermark = max - 60 s = 10:09)
      input.addData(ts("2024-01-01 10:10:00") -> 4L)
      q.processAllAvailable()
      // a straggler for the finalized window: > 60 s late ⇒ dropped
      input.addData(ts("2024-01-01 10:00:55") -> 5L)
      q.processAllAvailable()
      input.addData(ts("2024-01-01 10:20:00") -> 6L) // flush remaining
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("wmtest")
      .collect().map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
    // the finalized 10:00 window counts the 3 on-time events only —
    // the late straggler did not reopen or grow it
    assert(rows("2024-01-01 10:00:00.0") == 3L)
  }
}
