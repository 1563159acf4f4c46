package graft.streaming

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.sources.EventStreamSource

/** The Kafka ingest boundary end to end, minus the broker — which this
  * offline container cannot host (no kafka-clients or spark-sql-kafka
  * jar resolves, zero egress; documented in SURVEY §7.4). What CAN be
  * pinned is everything on our side of the wire: a stream carrying the
  * Kafka source's exact public record schema (key/value binary, topic,
  * partition, offset, timestamp, timestampType) through
  * `EventStreamSource.fromKafkaRecords` — the projection `rawLines`
  * applies to the real source — into the full `CuratedPipeline.start`
  * three-sink fan-out, with the same assertions CuratedPipelineSpec
  * makes on its pre-projected MemoryStream.
  */
class KafkaWireSpec extends SparkSpec {

  /** One record in the Kafka source's output schema (public contract:
    * Spark's Structured Streaming Kafka integration guide). */
  private type KafkaRecord =
    (Array[Byte], Array[Byte], String, Int, Long, java.sql.Timestamp, Int)

  private def record(json: String, partition: Int, offset: Long): KafkaRecord =
    (s"key$offset".getBytes(UTF_8), json.getBytes(UTF_8), "iot-telemetry",
      partition, offset, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 0)

  private def rawJson(dev: String, ts: String, battery: Long) =
    s"""{"applicationId":"app","component":"sensors","enqueuedTime":"$ts",
       |"messageSource":"telemetry","device":{"id":"$dev","templateId":"tpl"},
       |"telemetry":[{"name":"battery","value":$battery},
       |{"name":"barometer","value":1010.0},
       |{"name":"accelerometer","value":{"x":0.1,"y":0.2,"z":0.3}},
       |{"name":"geolocation","value":{"lat":1.5,"lon":2.5,"alt":3.5}}]}"""
      .stripMargin.replace("\n", "")

  test("kafka-schema stream drives the three-sink fan-out through rawLines' projection") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("kafkawire").toString
    val input = MemoryStream[KafkaRecord](spark)
    val kafkaShaped = input.toDF().toDF("key", "value", "topic",
      "partition", "offset", "timestamp", "timestampType")
    val q = CuratedPipeline.start(
      EventStreamSource.fromKafkaRecords(kafkaShaped),
      s"$dir/bronze", s"$dir/devices", s"$dir/telemetry", s"$dir/ckpt",
      trigger = Trigger.ProcessingTime(0))
    val garbage = "NOT JSON }{"
    try {
      // records spread across partitions with non-contiguous offsets —
      // the projection must not depend on either
      input.addData(
        record(rawJson("devA", "2024-01-01T00:00:01Z", 90), 0, 7L),
        record(rawJson("devB", "2024-01-01T00:00:02Z", 80), 3, 2L))
      q.processAllAvailable()
      input.addData(
        record(rawJson("devA", "2024-01-01T00:00:03Z", 91), 1, 8L),
        record(garbage, 2, 5L)) // malformed payload bytes: bronze-only
      q.processAllAvailable()
    } finally q.stop()
    // bronze archives the UTF-8-decoded value VERBATIM — all 4 lines
    val bronze = spark.read.text(s"$dir/bronze").as[String].collect()
    assert(bronze.length == 4)
    assert(bronze.contains(garbage))
    assert(bronze.count(_.contains(""""id":"devA"""")) == 2)
    // devices dedup-merge: one row per device, across micro-batches
    val devs = spark.read.parquet(s"$dir/devices")
      .select("deviceId").as[String].collect().sorted.toSeq
    assert(devs == Seq("devA", "devB"))
    // telemetry: the 3 well-formed rows, enriched
    val tel = spark.read.parquet(s"$dir/telemetry")
    assert(tel.count() == 3)
    assert(tel.columns.contains("AccelMagnitude"))
  }

  test("fromKafkaRecords rejects a non-binary value column loudly") {
    import spark.implicits._
    // a stream already projected to string `value` (the classic
    // double-wiring mistake) fails at construction, not mid-query
    val pre = Seq("line").toDF("value")
    val e = intercept[IllegalArgumentException](
      EventStreamSource.fromKafkaRecords(pre))
    assert(e.getMessage.contains("binary"))
    val noValue = Seq(("k", 1)).toDF("key", "partition")
    intercept[IllegalArgumentException](
      EventStreamSource.fromKafkaRecords(noValue))
  }

  test("non-UTF-8 value bytes survive to bronze as a replacement-decoded line") {
    // Kafka's value is arbitrary bytes; CAST(binary AS STRING) decodes
    // UTF-8 with replacement chars — the line still lands in bronze
    // (archive-everything posture) and the curated sinks reject it.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("kafkabin").toString
    val input = MemoryStream[KafkaRecord](spark)
    val kafkaShaped = input.toDF().toDF("key", "value", "topic",
      "partition", "offset", "timestamp", "timestampType")
    val q = CuratedPipeline.start(
      EventStreamSource.fromKafkaRecords(kafkaShaped),
      s"$dir/bronze", s"$dir/devices", s"$dir/telemetry", s"$dir/ckpt",
      trigger = Trigger.ProcessingTime(0))
    try {
      input.addData((Array[Byte](1), Array[Byte](-1, -2, 0x41), "t", 0, 0L,
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 0))
      q.processAllAvailable()
    } finally q.stop()
    val bronze = spark.read.text(s"$dir/bronze").as[String].collect()
    assert(bronze.length == 1 && bronze.head.contains("A"))
    assert(!new java.io.File(s"$dir/telemetry").exists() ||
      spark.read.parquet(s"$dir/telemetry").count() == 0)
  }
}
