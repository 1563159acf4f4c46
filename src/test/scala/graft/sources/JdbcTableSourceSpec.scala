package graft.sources

import graft.SparkSpec
import graft.serve.PowerBiSync
import org.apache.spark.sql.SaveMode

/** JDBC seam against a real in-JVM database (Derby, on Spark's own
  * classpath): proves the serving path (`PowerBiSync.syncOnce`) runs
  * UNCHANGED when `telemetry` is a JDBC table instead of parquet —
  * the reference's actual topology (Azure SQL → function → push API,
  * PushTelemetryFunction.cs:104-116) — and that the write seam lands
  * rows a plain JDBC client can read back. */
class JdbcTableSourceSpec extends SparkSpec {
  private val url = "jdbc:derby:memory:graftjdbc;create=true"

  private def withConn[A](body: java.sql.Connection => A): A = {
    val c = java.sql.DriverManager.getConnection(url)
    try body(c) finally c.close()
  }

  private def exec(sql: String): Unit = withConn { c =>
    val st = c.createStatement(); try st.execute(sql) finally st.close()
  }

  private final class CollectSink extends PowerBiSync.HttpSink {
    val batches = new scala.collection.mutable.ArrayBuffer[String]
    def post(body: String): Boolean = { batches += body; true }
  }
  private final class MemStore(var wm: java.sql.Timestamp)
      extends PowerBiSync.WatermarkStore {
    def read(): java.sql.Timestamp = wm
    def write(ts: java.sql.Timestamp): Unit = { wm = ts }
  }

  // quoted identifiers: Derby folds unquoted names to upper case, and
  // the serving projection addresses camelCase columns by exact name —
  // the same DDL shape the reference's SQL schema uses
  private def createTelemetry(): Unit = {
    try exec("DROP TABLE telemetry") catch { case _: java.sql.SQLException => () }
    exec("""CREATE TABLE telemetry (
      |  "deviceId" VARCHAR(64), "enqueuedTime" TIMESTAMP,
      |  "battery" DOUBLE, "barometer" DOUBLE, "latitude" DOUBLE,
      |  "longitude" DOUBLE, "altitude" DOUBLE, "AccelMagnitude" DOUBLE,
      |  "GyroMagnitude" DOUBLE, "MagMagnitude" DOUBLE, "Anomaly" DOUBLE)"""
      .stripMargin)
    withConn { c =>
      val ps = c.prepareStatement(
        "INSERT INTO telemetry VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?)")
      try {
        for (i <- 1 to 5) {
          ps.setString(1, s"dev$i")
          ps.setTimestamp(2,
            java.sql.Timestamp.valueOf(s"2024-01-01 00:00:0$i"))
          (3 to 10).foreach(j => ps.setDouble(j, i + j / 10.0))
          ps.setDouble(11, if (i == 3) 1.0 else 0.0)
          ps.addBatch()
        }
        ps.executeBatch()
      } finally ps.close()
    }
  }

  test("syncOnce runs unchanged on a JDBC telemetry table") {
    createTelemetry()
    val telemetry = JdbcTableSource.read(spark,
      JdbcTableSource.options(url, "telemetry"))
    val sink = new CollectSink
    val store = new MemStore(
      java.sql.Timestamp.valueOf("2024-01-01 00:00:02")) // 1,2 already sent
    assert(PowerBiSync.syncOnce(telemetry, store, sink, batchSize = 2) == 3)
    assert(store.wm == java.sql.Timestamp.valueOf("2024-01-01 00:00:05"))
    val all = sink.batches.mkString
    assert(!all.contains("dev1") && !all.contains("dev2"))
    assert(all.contains(""""deviceId":"dev3"""") && all.contains("dev5"))
    assert(all.contains(""""Anomaly":1.0"""))
    assert(all.contains(""""enqueuedTime":"2024-01-01T00:00:03.000Z""""))
  }

  test("watermark filter pushes down into the JDBC scan (server-side WHERE)") {
    createTelemetry()
    val telemetry = JdbcTableSource.read(spark,
      JdbcTableSource.options(url, "telemetry"))
    val plan = telemetry
      .filter(org.apache.spark.sql.functions.col("enqueuedTime") >
        java.sql.Timestamp.valueOf("2024-01-01 00:00:02"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("enqueuedTime"),
      s"watermark predicate not pushed to the database:\n$plan")
  }

  test("partitioned read splits the scan without changing results") {
    createTelemetry()
    val part = JdbcTableSource.read(spark,
      JdbcTableSource.options(url, "telemetry",
        partition = Some(JdbcTableSource.Partitioning(
          "\"enqueuedTime\"",
          "2024-01-01 00:00:00", "2024-01-01 00:00:06", 3))))
    assert(part.rdd.getNumPartitions == 3)
    assert(part.count() == 5) // bounds steer splits, never filter rows
  }

  test("write seam round-trips rows a plain JDBC client can read") {
    import spark.implicits._
    try exec("DROP TABLE devices_out") catch { case _: java.sql.SQLException => () }
    val df = Seq(("d1", "model-a"), ("d2", "model-b"))
      .toDF("deviceId", "model")
    JdbcTableSource.write(df, url, "devices_out",
      mode = SaveMode.Overwrite, batchSize = 2)
    val n = withConn { c =>
      val st = c.createStatement()
      try {
        val rs = st.executeQuery("SELECT count(*) FROM devices_out")
        rs.next(); rs.getInt(1)
      } finally st.close()
    }
    assert(n == 2)
  }
}
