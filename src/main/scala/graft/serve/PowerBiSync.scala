package graft.serve

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The serving edge (reference: `azure-function/PushTelemetryFunction.cs`)
  * — incremental watermark-gated sync of curated telemetry to a push
  * dataset, re-expressed over the telemetry table.
  *
  * Reference semantics reproduced:
  *  - S5 incremental scan: `enqueuedTime > lastProcessedTime ORDER BY
  *    enqueuedTime` (PushTelemetryFunction.cs:109-116);
  *  - E6 timestamp format `yyyy-MM-dd'T'HH:mm:ss.SSS'Z'` (:346-354);
  *  - E7 null coalescing AT THE EDGE ONLY: numerics→0.0, deviceId→"",
  *    Anomaly→1.0/0.0 (:336-400 — upstream nulls survive untouched);
  *  - E8 compact JSON array batches of `batchSize` (default 500,
  *    :192-195) POSTed per batch (S7);
  *  - T6 watermark advances only after every batch in the tick
  *    succeeds; a failed POST leaves it unmoved so the next tick
  *    retries the same range ⇒ at-least-once;
  *  - S8 watermark store with cold-start fallback (caller supplies the
  *    default, reference uses now-1h).
  *
  * Scale note: this is a serving edge rate-limited by the downstream
  * push API (500 rows / 10 s in the reference), not a data-scale path —
  * the global ORDER BY + driver-side iteration is therefore the
  * *correct* shape (matches S6's OFFSET/FETCH pagination); the firehose
  * path at scale is `foreachPartition` HTTP fan-out, which drops the
  * global-order guarantee the reference contract requires.
  */
object PowerBiSync {

  /** Injectable POST seam (tests capture payloads; prod wraps an HTTP
    * client). Returns success. */
  trait HttpSink extends Serializable { def post(jsonArrayBody: String): Boolean }

  /** Default production sink (reference SendToPowerBI,
    * PushTelemetryFunction.cs:402-425): JSON POST via `java.net.http`,
    * `application/json`; any non-2xx status or transport/timeout
    * exception maps to `false`, which the pump turns into a held
    * watermark and a next-tick retry — never an exception. */
  final class JdkHttpSink(url: String, timeoutSeconds: Long = 30L)
      extends HttpSink {
    @transient private lazy val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(timeoutSeconds)).build()
    def post(jsonArrayBody: String): Boolean =
      try {
        val req = java.net.http.HttpRequest
          .newBuilder(java.net.URI.create(url))
          .timeout(java.time.Duration.ofSeconds(timeoutSeconds))
          .header("Content-Type", "application/json")
          .POST(java.net.http.HttpRequest.BodyPublishers
            .ofString(jsonArrayBody, java.nio.charset.StandardCharsets.UTF_8))
          .build()
        val status = client
          .send(req, java.net.http.HttpResponse.BodyHandlers.discarding())
          .statusCode()
        status >= 200 && status < 300
      } catch { case scala.util.control.NonFatal(_) => false }
  }

  /** E9: the HTTP trigger's control-body parse (cs:46-60).
    * `{"initialLoad": <v>}` selects the bulk path; empty body, garbage
    * JSON, a missing key, or an unconvertible value all default to
    * incremental (`false`). Mirrors JToken.Value<bool>'s conversions:
    * booleans as-is, "true"/"false" case-insensitively, numbers by
    * non-zeroness. */
  // shared: ObjectMapper is thread-safe for readTree and expensive to
  // construct (per-request allocation on the serving path otherwise)
  private lazy val controlMapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def parseControl(requestBody: String): Boolean =
    if (requestBody == null || requestBody.trim.isEmpty) false
    else
      try {
        val node = controlMapper.readTree(requestBody).get("initialLoad")
        if (node == null || node.isNull) false
        else if (node.isBoolean) node.asBoolean()
        else if (node.isNumber) node.doubleValue() != 0.0
        else if (node.isTextual) node.asText().trim.toLowerCase match {
          case "true" => true
          case _ => false // "false" or unconvertible → incremental
        }
        else false
      } catch { case scala.util.control.NonFatal(_) => false }

  /** The trigger's dispatch (cs:62-75): parse the control body, then
    * bulk initial load or incremental sync. Returns rows pushed. */
  def handleRequest(requestBody: String, telemetry: DataFrame,
      store: WatermarkStore, sink: HttpSink, batchSize: Int = 500,
      sleep: Long => Unit = Thread.sleep): Long =
    if (parseControl(requestBody))
      initialLoad(telemetry, store, sink, batchSize, sleep = sleep)
    else syncOnce(telemetry, store, sink, batchSize)

  /** One-row watermark state store (S8). */
  trait WatermarkStore {
    def read(): java.sql.Timestamp
    def write(ts: java.sql.Timestamp): Unit
  }

  /** File-backed store: a single ISO-8601 line; missing/corrupt file →
    * `default` (the reference's UtcNow-1h fallback, :288-306). */
  final class FileWatermarkStore(path: String, default: => java.sql.Timestamp)
      extends WatermarkStore {
    def read(): java.sql.Timestamp =
      try java.sql.Timestamp.valueOf(
        new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(path)), "UTF-8").trim)
      catch { case _: Exception => default }
    def write(ts: java.sql.Timestamp): Unit = {
      val p = java.nio.file.Paths.get(path)
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, ts.toString.getBytes("UTF-8"))
    }
  }

  /** The push-payload projection with the edge null rules (E6/E7).
    * Field list and order = the reference's BuildTelemetryObject
    * (PushTelemetryFunction.cs:336-400): deviceId, enqueuedTime, the
    * eight numeric fields, then the bool-or-number Anomaly. */
  def payload(c: String => Column = col): Column = {
    def num(n: String): Column = coalesce(c(n).cast("double"), lit(0.0))
    to_json(struct(
      coalesce(c("deviceId"), lit("")).as("deviceId"),
      date_format(c("enqueuedTime"), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")
        .as("enqueuedTime"),
      num("battery").as("battery"),
      num("barometer").as("barometer"),
      num("latitude").as("latitude"),
      num("longitude").as("longitude"),
      num("altitude").as("altitude"),
      num("AccelMagnitude").as("AccelMagnitude"),
      num("GyroMagnitude").as("GyroMagnitude"),
      num("MagMagnitude").as("MagMagnitude"),
      coalesce(c("Anomaly").cast("double"), lit(0.0)).as("Anomaly")))
  }

  /** One sync tick (reference `ProcessNewTelemetryData`). Returns rows
    * pushed. Watermark advances only if every batch POSTed. */
  def syncOnce(telemetry: DataFrame, store: WatermarkStore, sink: HttpSink,
      batchSize: Int = 500): Long = {
    val wm = store.read()
    val pending = telemetry
      .filter(col("enqueuedTime") > lit(wm))
      .orderBy("enqueuedTime")
      .select(payload().as("j"), col("enqueuedTime"))
    val (pushed, maxTs, completed) = withUtcSession(telemetry) {
      pump(pending, sink, batchSize)
    }
    // wm moves only on full success (T6); a failed batch leaves the
    // whole range to be retried next tick ⇒ at-least-once
    if (completed && pushed > 0) store.write(maxTs)
    pushed
  }

  /** payload()'s date_format renders in the session time zone but
    * stamps a literal 'Z' — pin UTC for the duration of the push (the
    * lazy toLocalIterator evaluates inside `body`) and restore the
    * caller's zone after, so a sync tick has no lasting side effect. */
  private def withUtcSession[T](df: DataFrame)(body: => T): T = {
    val conf = df.sparkSession.conf
    val prev = conf.getOption("spark.sql.session.timeZone")
    conf.set("spark.sql.session.timeZone", "UTC")
    try body
    finally prev match {
      case Some(tz) => conf.set("spark.sql.session.timeZone", tz)
      case None => conf.unset("spark.sql.session.timeZone")
    }
  }

  /** The shared batch pump: stream the sorted payload rows driver-side,
    * POST in `batchSize` JSON arrays, track max event time. Returns
    * (rowsPushed, maxTs, completedWithoutFailure). */
  private def pump(rows: DataFrame, sink: HttpSink, batchSize: Int,
      delayMillis: Long = 0L, sleep: Long => Unit = Thread.sleep)
      : (Long, java.sql.Timestamp, Boolean) = {
    var maxTs: java.sql.Timestamp = new java.sql.Timestamp(0L)
    var pushed = 0L
    val it = rows.toLocalIterator() // sorted, driver-side bounded buffer
    val buf = new scala.collection.mutable.ArrayBuffer[String](batchSize)
    def flush(): Boolean = {
      if (buf.isEmpty) true
      else {
        val ok = sink.post(buf.mkString("[", ",", "]"))
        if (ok) {
          pushed += buf.length; buf.clear()
          // bulk-load pacing (reference Task.Delay(200) after every
          // pushed batch, PushTelemetryFunction.cs:264) — downstream
          // push APIs throttle; 0 on the incremental path
          if (delayMillis > 0L) sleep(delayMillis)
        }
        ok
      }
    }
    while (it.hasNext) {
      val r = it.next()
      buf += r.getString(0)
      val ts = r.getTimestamp(1)
      if (ts != null && ts.after(maxTs)) maxTs = ts
      if (buf.length >= batchSize && !flush()) return (pushed, maxTs, false)
    }
    val ok = flush() // must run BEFORE `pushed` is read into the tuple
    (pushed, maxTs, ok)
  }

  /** Initial bulk load (reference `ProcessInitialLoad`): full sorted
    * scan in `batchSize` pages, watermark written once at the end; a
    * mid-load failure leaves it unset so a rerun restarts from scratch
    * (reference behavior, PushTelemetryFunction.cs:260,271-274). */
  def initialLoad(telemetry: DataFrame, store: WatermarkStore, sink: HttpSink,
      batchSize: Int = 500, delayMillis: Long = 200L,
      sleep: Long => Unit = Thread.sleep): Long = {
    val all = telemetry
      .orderBy("enqueuedTime")
      .select(payload().as("j"), col("enqueuedTime"))
    val (pushed, maxTs, completed) = withUtcSession(telemetry) {
      pump(all, sink, batchSize, delayMillis, sleep)
    }
    // mid-load failure throws with the watermark unset, so a rerun
    // restarts from scratch (reference behavior, :260,271-274)
    if (!completed) throw new RuntimeException(s"push failed after $pushed rows")
    if (pushed > 0) store.write(maxTs)
    pushed
  }
}
