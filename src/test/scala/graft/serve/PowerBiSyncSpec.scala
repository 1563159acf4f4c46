package graft.serve

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class PowerBiSyncSpec extends SparkSpec {
  import PowerBiSync._

  private final class CollectSink(failAfter: Int = Int.MaxValue)
      extends HttpSink {
    val batches = new scala.collection.mutable.ArrayBuffer[String]
    def post(body: String): Boolean = {
      if (batches.length >= failAfter) false
      else { batches += body; true }
    }
  }
  private final class MemStore(var wm: java.sql.Timestamp)
      extends WatermarkStore {
    var writes = 0
    def read(): java.sql.Timestamp = wm
    def write(ts: java.sql.Timestamp): Unit = { wm = ts; writes += 1 }
  }

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def telemetry(rows: Seq[(String, String, java.lang.Long, java.lang.Double)]): DataFrame = {
    import spark.implicits._
    rows.map { case (dev, t, bat, acc) =>
      (dev, ts(t), Option(bat).map(_.toLong), Option(acc).map(_.toDouble),
        Option.empty[Double], Option.empty[Double], Option.empty[Double],
        Option(acc).map(_.toDouble), Option.empty[Double], Option.empty[Double],
        Option.empty[Int])
    }.toDF("deviceId", "enqueuedTime", "battery", "barometer", "latitude",
      "longitude", "altitude", "AccelMagnitude", "GyroMagnitude",
      "MagMagnitude", "Anomaly")
  }

  test("edge serialization: null coalescing + timestamp format (E6/E7/E8)") {
    val df = telemetry(Seq((null, "2024-03-05 06:07:08.123", null, null)))
    val sink = new CollectSink
    val store = new MemStore(ts("2024-01-01 00:00:00"))
    assert(syncOnce(df, store, sink) == 1)
    val body = sink.batches.head
    assert(body.startsWith("[") && body.endsWith("]"))
    assert(body.contains(""""deviceId":""""))                // null → ""
    assert(body.contains(""""battery":0.0"""))               // null → 0.0
    assert(body.contains(""""Anomaly":0.0"""))               // null → 0.0
    assert(body.contains(""""enqueuedTime":"2024-03-05T06:07:08.123Z""""))
    // full reference field list (BuildTelemetryObject): all 8 numerics
    for (f <- Seq("barometer", "latitude", "longitude", "altitude",
        "AccelMagnitude", "GyroMagnitude", "MagMagnitude"))
      assert(body.contains(s""""$f":"""), s"missing payload field $f")
  }

  test("incremental scan honors the watermark and advances it to max(enqueuedTime)") {
    val df = telemetry(Seq(
      ("a", "2024-01-01 00:00:01", 1L, 1.0),
      ("b", "2024-01-01 00:00:02", 2L, 2.0),
      ("c", "2024-01-01 00:00:03", 3L, 3.0)))
    val store = new MemStore(ts("2024-01-01 00:00:01")) // 'a' already pushed
    val sink = new CollectSink
    assert(syncOnce(df, store, sink) == 2) // only b, c
    assert(store.wm == ts("2024-01-01 00:00:03"))
    assert(syncOnce(df, store, sink) == 0) // idempotent: nothing re-emitted
    assert(store.writes == 1)
  }

  test("batching: 5 rows at batchSize=2 → 3 POSTs, in event-time order") {
    val df = telemetry((1 to 5).map(i => (s"d$i", s"2024-01-01 00:00:0$i", i.toLong, i.toDouble)))
    val store = new MemStore(ts("2020-01-01 00:00:00"))
    val sink = new CollectSink
    assert(syncOnce(df, store, sink, batchSize = 2) == 5)
    assert(sink.batches.length == 3)
    assert(sink.batches(0).contains("d1") && sink.batches(0).contains("d2"))
    assert(sink.batches(2).contains("d5"))
  }

  test("failed POST leaves the watermark unmoved; next tick retries the range (T6)") {
    val df = telemetry((1 to 6).map(i => (s"d$i", s"2024-01-01 00:00:0$i", i.toLong, i.toDouble)))
    val wm0 = ts("2020-01-01 00:00:00")
    val store = new MemStore(wm0)
    val failing = new CollectSink(failAfter = 1) // second batch fails
    syncOnce(df, store, failing, batchSize = 2)
    assert(store.wm == wm0)   // at-least-once: wm only moves on full success
    assert(store.writes == 0)
    val sink = new CollectSink
    assert(syncOnce(df, store, sink, batchSize = 2) == 6) // full range retried
    assert(store.wm == ts("2024-01-01 00:00:06"))
  }

  test("initial load pushes everything and seeds the watermark once") {
    val df = telemetry((1 to 7).map(i => (s"d$i", s"2024-01-01 00:00:0$i", i.toLong, i.toDouble)))
    val store = new MemStore(ts("2020-01-01 00:00:00"))
    val sink = new CollectSink
    assert(initialLoad(df, store, sink, batchSize = 3, sleep = _ => ()) == 7)
    assert(sink.batches.length == 3) // 3+3+1
    assert(store.wm == ts("2024-01-01 00:00:07"))
    assert(store.writes == 1) // single write at the end (reference behavior)
  }

  test("initial load paces 200ms after every pushed batch; sync never sleeps") {
    val df = telemetry((1 to 5).map(i => (s"d$i", s"2024-01-01 00:00:0$i", i.toLong, i.toDouble)))
    val store = new MemStore(ts("2020-01-01 00:00:00"))
    val sink = new CollectSink
    val sleeps = new scala.collection.mutable.ArrayBuffer[Long]
    initialLoad(df, store, sink, batchSize = 2, sleep = sleeps += _)
    assert(sleeps.toSeq == Seq(200L, 200L, 200L), // one per pushed batch
      s"got $sleeps")
    // a failed batch must NOT be followed by a delay (no sleep-then-retry)
    val sleeps2 = new scala.collection.mutable.ArrayBuffer[Long]
    intercept[RuntimeException] {
      initialLoad(df, new MemStore(ts("2020-01-01 00:00:00")),
        new CollectSink(failAfter = 1), batchSize = 2, sleep = sleeps2 += _)
    }
    assert(sleeps2.toSeq == Seq(200L)) // only the successful first batch
    // the incremental path has no pacing (reference: single POST, no delay)
    val store3 = new MemStore(ts("2020-01-01 00:00:00"))
    syncOnce(df, store3, sink, batchSize = 2) // would throw if it slept: no seam
  }

  test("E9 control parse: initialLoad flag with default-false on garbage") {
    assert(parseControl("""{"initialLoad": true}"""))
    assert(parseControl("""{"initialLoad": "true"}"""))  // JToken string conv
    assert(parseControl("""{"initialLoad": 1}"""))        // JToken number conv
    assert(!parseControl("""{"initialLoad": false}"""))
    assert(!parseControl("""{"initialLoad": "yes"}"""))   // unconvertible → false
    assert(!parseControl("""{"other": true}"""))          // missing key
    assert(!parseControl("""{"initialLoad": null}"""))
    assert(!parseControl(""))                             // empty body
    assert(!parseControl(null))
    assert(!parseControl("NOT JSON }{"))                  // parse error → incremental
  }

  test("handleRequest dispatches on the control body (bulk vs incremental)") {
    val df = telemetry((1 to 3).map(i => (s"d$i", s"2024-01-01 00:00:0$i", i.toLong, i.toDouble)))
    // bulk: watermark ignored on read, everything pushed
    val bulkStore = new MemStore(ts("2024-01-01 00:00:02"))
    val bulkSink = new CollectSink
    assert(handleRequest("""{"initialLoad":true}""", df, bulkStore, bulkSink,
      sleep = _ => ()) == 3)
    // garbage body → incremental: only rows past the watermark
    val incStore = new MemStore(ts("2024-01-01 00:00:02"))
    val incSink = new CollectSink
    assert(handleRequest("NOT JSON }{", df, incStore, incSink) == 1)
    assert(incSink.batches.head.contains("d3"))
  }

  test("file watermark store falls back to default on missing/corrupt state (S8)") {
    val dir = java.nio.file.Files.createTempDirectory("wm").toString
    val dflt = ts("2024-06-01 00:00:00")
    val store = new FileWatermarkStore(s"$dir/wm.txt", dflt)
    assert(store.read() == dflt) // missing file
    store.write(ts("2024-06-02 03:04:05.678"))
    assert(store.read() == ts("2024-06-02 03:04:05.678"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/wm.txt"),
      "not a timestamp".getBytes)
    assert(store.read() == dflt) // corrupt file
  }
}
