package graft.model

import org.apache.spark.sql.types._

/** Fixed schemas of the ingest path (SURVEY.md §1, FIXTURES.md §A).
  *
  * The schema system is two-phase (reference behavior: the IoT Central
  * export transformation at `iot-central/transformation.txt:3-15` operates
  * on untyped JSON, hardening into the declared envelope of
  * `iot-central/preview-output-example.json:1-20`): we keep the edge
  * dynamic (Variant) and declare the post-transform envelope explicitly.
  */
object Schemas {
  /** x/y/z vector reading (accelerometer / gyroscope / magnetometer). */
  val xyz: StructType = StructType(
    Seq("x", "y", "z").map(StructField(_, DoubleType)))

  /** lat/lon/alt (reference `raw-data-template.json` geolocation shape). */
  val geo: StructType = StructType(
    Seq("lat", "lon", "alt").map(StructField(_, DoubleType)))

  /** Fixed telemetry struct of the curated path. Nulls are first-class:
    * a telemetry entry with no `value` (reference
    * `raw-data-template.json:12-19`) must surface as an explicit null. */
  val telemetry: StructType = StructType(Seq(
    StructField("battery", LongType),
    StructField("barometer", DoubleType),
    StructField("accelerometer", xyz),
    StructField("gyroscope", xyz),
    StructField("magnetometer", xyz),
    StructField("geolocation", geo),
  ))

  /** Post-transform envelope (= ASA query input; FIXTURES.md §A2).
    * `enqueuedTime` stays a string here — the ISO source has ns precision
    * (`raw-data-template.json:3`); the cast to µs TimestampType is the
    * enrichment's documented truncation (E2). */
  val envelope: StructType = StructType(Seq(
    StructField("schema", StringType),
    StructField("applicationId", StringType),
    StructField("deviceId", StringType),
    StructField("templateId", StringType),
    StructField("messageSource", StringType),
    StructField("enqueuedTime", StringType),
    StructField("component", StringType),
    StructField("module", StringType),
    StructField("messageProperties", MapType(StringType, StringType)),
    StructField("enrichments", MapType(StringType, StringType)),
    StructField("telemetry", telemetry),
  ))

  /** Curated fact row (reference DDL README.MD:167-175 + ASA output
    * iot-stream-analytics-query.sql:64-83). */
  val telemetryRow: StructType = StructType(Seq(
    StructField("deviceId", StringType),
    StructField("enqueuedTime", TimestampType),
    StructField("battery", LongType),
    StructField("barometer", DoubleType),
    StructField("latitude", DoubleType),
    StructField("longitude", DoubleType),
    StructField("altitude", DoubleType),
    StructField("AccelMagnitude", DoubleType),
    StructField("GyroMagnitude", DoubleType),
    StructField("MagMagnitude", DoubleType),
    StructField("Anomaly", IntegerType),
  ))
}

/** Curated dimension row (reference DDL README.MD:159-165). */
final case class DeviceRow(
    deviceId: String,
    applicationId: String,
    templateId: String,
    component: String,
    module: String,
)
