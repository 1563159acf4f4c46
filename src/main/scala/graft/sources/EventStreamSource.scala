package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Production stream-source wiring for `CuratedPipeline.start` — the
  * reference ingests from an Event Hub (`terraform/main-example.tf:108-118`,
  * topology `README.MD:13-30`: IoT Central export → Event Hub → stream
  * job). Spark's equivalent surface is the Kafka source; Event Hubs
  * exposes a Kafka-compatible endpoint on port 9093 (public Azure
  * contract: SASL_SSL/PLAIN with the `$ConnectionString` principal), so
  * one options-builder covers both a plain Kafka cluster and an Event
  * Hubs namespace, and the production entry point is one line:
  *
  * {{{
  * val raw = EventStreamSource.rawLines(spark,
  *   EventStreamSource.eventHubsOptions(ns = "myns", hub = "iot-telemetry",
  *     connectionString = conn))
  * CuratedPipeline.start(raw, bronzeDir, devicesDir, telemetryDir, ckptDir)
  * }}}
  *
  * Scale notes (1000-executor cluster):
  *  - input parallelism = topic partitions (the reference provisions 4,
  *    tf:112 — size the hub/topic, not the job, for throughput);
  *  - `maxOffsetsPerTrigger` bounds each micro-batch so a backlog
  *    replay cannot OOM the stateful stage — set it to
  *    (target rows/batch × partitions);
  *  - `failOnDataLoss=false` survives retention-expired offsets on
  *    reprocess, matching the reference's at-least-once posture.
  */
object EventStreamSource {

  /** Options for a plain Kafka cluster. `extra` is additive only: the
    * named parameters are the API for the core options, so an extras
    * key colliding with one (e.g. "subscribe") is rejected loudly
    * rather than silently rewiring the stream. */
  def kafkaOptions(bootstrapServers: String, topic: String,
      startingOffsets: String = "latest",
      maxOffsetsPerTrigger: Option[Long] = None,
      failOnDataLoss: Boolean = false,
      extra: Map[String, String] = Map.empty): Map[String, String] = {
    val core = Map(
      "kafka.bootstrap.servers" -> bootstrapServers,
      "subscribe" -> topic,
      "startingOffsets" -> startingOffsets,
      "failOnDataLoss" -> failOnDataLoss.toString,
    ) ++
      maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString)
    val clash = extra.keySet intersect core.keySet
    require(clash.isEmpty,
      s"extra options collide with builder-owned keys: ${clash.mkString(", ")}" +
        " — set them through the named parameters")
    core ++ extra
  }

  /** Options for an Event Hubs namespace via its Kafka surface: the
    * event hub name is the topic; auth is SASL PLAIN with user
    * `$ConnectionString` and the connection string as password. */
  def eventHubsOptions(ns: String, hub: String, connectionString: String,
      startingOffsets: String = "latest",
      maxOffsetsPerTrigger: Option[Long] = None): Map[String, String] = {
    // JAAS string values are double-quoted: a '\' or '"' inside the
    // connection string would silently corrupt the SASL config (standard
    // EH SAS keys are base64ish and safe, but the builder accepts any
    // string), so escape both before interpolating.
    val escaped = connectionString.replace("\\", "\\\\").replace("\"", "\\\"")
    val jaas = "org.apache.kafka.common.security.plain.PlainLoginModule " +
      s"""required username="$$ConnectionString" password="$escaped";"""
    kafkaOptions(
      bootstrapServers = s"$ns.servicebus.windows.net:9093",
      topic = hub,
      startingOffsets = startingOffsets,
      maxOffsetsPerTrigger = maxOffsetsPerTrigger,
      extra = Map(
        "kafka.security.protocol" -> "SASL_SSL",
        "kafka.sasl.mechanism" -> "PLAIN",
        "kafka.sasl.jaas.config" -> jaas,
        // Event Hubs closes idle Kafka connections at 240s; keep the
        // client's own timeout under that (public EH-for-Kafka guidance)
        "kafka.connections.max.idle.ms" -> "180000",
        "kafka.metadata.max.age.ms" -> "180000",
      ))
  }

  /** The raw JSON line stream `CuratedPipeline.start` consumes: Kafka's
    * binary `value` cast to string, one column named `value` (the
    * pipeline archives it VERBATIM to bronze, so no other projection
    * happens here). */
  def rawLines(spark: SparkSession, options: Map[String, String]): DataFrame =
    fromKafkaRecords(
      spark.readStream.format("kafka").options(options).load())

  /** The Kafka-source → pipeline wire contract, factored out of
    * `rawLines` so it is testable without a broker: project the source's
    * public record schema (key/value binary, topic, partition, offset,
    * timestamp, timestampType) down to the one UTF-8 `value` line the
    * pipeline consumes. Guards the `value` column's presence and binary
    * type loudly — a schema drift here (e.g. wiring a pre-projected
    * stream through twice) would otherwise surface as a runtime cast
    * error deep inside the running query.
    *
    * (This container ships no kafka-clients/spark-sql-kafka jar and has
    * no network egress, so an embedded-broker test cannot run here —
    * KafkaWireSpec instead drives `CuratedPipeline.start` through this
    * projection from a stream with the exact source schema, which is
    * everything minus the broker's own offset bookkeeping.) */
  def fromKafkaRecords(records: DataFrame): DataFrame = {
    val vt = records.schema.fields.find(_.name == "value").map(_.dataType)
    require(vt.contains(org.apache.spark.sql.types.BinaryType),
      s"expected a Kafka record stream with a binary `value` column, got: " +
        records.schema.map(f => s"${f.name}:${f.dataType.simpleString}")
          .mkString(", "))
    records.selectExpr("CAST(value AS STRING) AS value")
  }
}
