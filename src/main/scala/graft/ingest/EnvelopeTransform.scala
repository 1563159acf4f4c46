package graft.ingest

import graft.model.Schemas
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The ingest normalization (reference: IoT Central export transformation,
  * `iot-central/transformation.txt:3-15`): raw device envelope → flat
  * envelope with one nested `telemetry` object.
  *
  * Reference semantics reproduced (M1/M2/M3 in SURVEY.md §2.9):
  *   - project 10 envelope fields, hoisting `device.id → deviceId` and
  *     `device.templateId → templateId`;
  *   - literal `schema: "default@v1"`;
  *   - `telemetry | map({key:.name, value:.value}) | from_entries` — the
  *     name/value array becomes an object, entries with an absent `value`
  *     becoming explicit nulls (golden pair `raw-data-template.json:12-19`
  *     → `preview-output-example.json:12-17`).
  *
  * Spark-first design: the raw JSON is *dynamically typed* (`value` is a
  * long, a double, or a nested object depending on the sensor), so the
  * edge is parsed as a Spark 4 VARIANT and extracted with `variant_get`
  * per sensor — schema-on-read hardening into the fixed envelope
  * `StructType` in one codegen'd projection. No UDFs; the whole transform
  * is a single `select`, identical in batch and streaming.
  */
object EnvelopeTransform {
  /** Entry value for sensor `name` in the raw telemetry name/value array,
    * as a variant (null when absent — from_entries null semantics).
    * `try_element_at`: a sensor entirely missing from the array (not just
    * value-less) must surface as null, not an ANSI index error. */
  private def entry(tel: Column, name: String): Column =
    variant_get(
      try_element_at(
        filter(tel, e => variant_get(e, "$.name", "string") === lit(name)),
        lit(1)),
      "$.value", "variant")

  private def xyz(v: Column): Column = struct(
    variant_get(v, "$.x", "double").as("x"),
    variant_get(v, "$.y", "double").as("y"),
    variant_get(v, "$.z", "double").as("z"))

  /** raw JSON string column → fixed envelope columns (FIXTURES.md §A2).
    * `try_parse_json`: a malformed event must not kill a streaming
    * query (PERMISSIVE semantics, SURVEY §1.3); unparseable rows become
    * a null variant and are dropped here — in production, route them to
    * a dead-letter sink before this projection instead. */
  def fromJson(raw: DataFrame, jsonCol: String = "value"): DataFrame =
    fromVariant(raw
      .select(try_parse_json(col(jsonCol)).as("v"))
      .filter(col("v").isNotNull))

  /** variant column `v` holding the raw envelope → fixed envelope.
    * `keep` columns of `parsed` are passed through untouched (e.g. the
    * verbatim raw line for a bronze archive). */
  def fromVariant(parsed: DataFrame, keep: Seq[String] = Nil): DataFrame = {
    val v = col("v")
    val tel = variant_get(v, "$.telemetry", "array<variant>")
    def sensorStruct(name: String, build: Column => Column): Column = {
      val e = entry(tel, name)
      // absent value → null struct (not a struct of nulls): matches the
      // golden output's literal `"accelerometer": null`.
      when(e.isNull, lit(null)).otherwise(build(e))
    }
    parsed.select(keep.map(col) ++ Seq(
      lit("default@v1").as("schema"),
      variant_get(v, "$.applicationId", "string").as("applicationId"),
      variant_get(v, "$.device.id", "string").as("deviceId"),
      variant_get(v, "$.device.templateId", "string").as("templateId"),
      variant_get(v, "$.messageSource", "string").as("messageSource"),
      variant_get(v, "$.enqueuedTime", "string").as("enqueuedTime"),
      variant_get(v, "$.component", "string").as("component"),
      variant_get(v, "$.module", "string").as("module"),
      variant_get(v, "$.messageProperties", "map<string,string>")
        .as("messageProperties"),
      variant_get(v, "$.enrichments", "map<string,string>").as("enrichments"),
      struct(
        variant_get(entry(tel, "battery"), "$", "bigint").as("battery"),
        variant_get(entry(tel, "barometer"), "$", "double").as("barometer"),
        sensorStruct("accelerometer", xyz).cast(Schemas.xyz).as("accelerometer"),
        sensorStruct("gyroscope", xyz).cast(Schemas.xyz).as("gyroscope"),
        sensorStruct("magnetometer", xyz).cast(Schemas.xyz).as("magnetometer"),
        sensorStruct("geolocation", g => struct(
          variant_get(g, "$.lat", "double").as("lat"),
          variant_get(g, "$.lon", "double").as("lon"),
          variant_get(g, "$.alt", "double").as("alt"))).cast(Schemas.geo)
          .as("geolocation"),
      ).as("telemetry"),
    ): _*)
  }
}
