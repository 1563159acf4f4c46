package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** No live broker in the container — the contract under test is the
  * options map the production one-liner hands to the Kafka source. */
class EventStreamSourceSpec extends AnyFunSuite {

  test("plain Kafka options: subscribe, offsets, backpressure bound") {
    val o = EventStreamSource.kafkaOptions(
      "broker1:9092,broker2:9092", "iot-telemetry",
      startingOffsets = "earliest", maxOffsetsPerTrigger = Some(200000L))
    assert(o("kafka.bootstrap.servers") == "broker1:9092,broker2:9092")
    assert(o("subscribe") == "iot-telemetry")
    assert(o("startingOffsets") == "earliest")
    assert(o("maxOffsetsPerTrigger") == "200000")
    assert(o("failOnDataLoss") == "false") // at-least-once reprocess posture
  }

  test("Event Hubs options: Kafka surface on 9093 with $ConnectionString SASL") {
    val conn = "Endpoint=sb://myns.servicebus.windows.net/;" +
      "SharedAccessKeyName=k;SharedAccessKey=secret"
    val o = EventStreamSource.eventHubsOptions("myns", "iot-telemetry", conn)
    assert(o("kafka.bootstrap.servers") == "myns.servicebus.windows.net:9093")
    assert(o("subscribe") == "iot-telemetry") // hub name is the topic
    assert(o("kafka.security.protocol") == "SASL_SSL")
    assert(o("kafka.sasl.mechanism") == "PLAIN")
    val jaas = o("kafka.sasl.jaas.config")
    assert(jaas.contains("""username="$ConnectionString""""))
    assert(jaas.contains(conn))
    assert(jaas.endsWith(";"))
    // stay under Event Hubs' 240s idle disconnect
    assert(o("kafka.connections.max.idle.ms").toLong < 240000L)
  }

  test("JAAS config escapes quotes and backslashes in the connection string") {
    val conn = """Endpoint=sb://x/;SharedAccessKey=we"ird\key"""
    val jaas = EventStreamSource.eventHubsOptions("ns", "hub", conn)(
      "kafka.sasl.jaas.config")
    // the quoted JAAS value must contain the ESCAPED forms — a raw '"'
    // would terminate the password early and silently corrupt the config
    assert(jaas.contains("""we\"ird\\key"""))
    assert(!jaas.contains(conn)) // the raw, unescaped string is gone
    // still exactly one trailing terminator
    assert(jaas.endsWith(""";"""))
  }

  test("extra options override nothing silently: user extras are additive") {
    val o = EventStreamSource.kafkaOptions("b:9092", "t",
      extra = Map("kafka.group.id" -> "graft"))
    assert(o("kafka.group.id") == "graft")
    assert(o("subscribe") == "t")
    // a collision with a builder-owned key is rejected loudly, not
    // silently rewired
    val e = intercept[IllegalArgumentException] {
      EventStreamSource.kafkaOptions("b:9092", "t",
        extra = Map("subscribe" -> "other-topic"))
    }
    assert(e.getMessage.contains("subscribe"))
  }
}
