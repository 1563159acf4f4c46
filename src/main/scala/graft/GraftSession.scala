package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the configs this engine depends on.
  *
  * Scale notes (100 TB target): these settings are the local-mode
  * equivalents of a production cluster profile — AQE on (runtime
  * re-planning, skew-join splitting, dynamic coalescing of shuffle
  * partitions), shuffle partitions sized to the executor core count
  * (32 locally; thousands on a real cluster), and UTC session time so
  * event-time semantics are zone-independent.
  */
object GraftSession {
  def builder(cores: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // testdata events.parquet carries TIMESTAMP(NANOS) which Spark's
      // parquet reader rejects; read as raw Long ns and normalize in
      // Tables.events (truncate to µs, matching the DuckDB oracle).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  def local(cores: Int = 32): SparkSession = {
    val s = builder(cores).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    tune(s)
    s
  }

  /** Apply runtime confs to an externally-created session (Verify/Bench
    * build their own); idempotent. */
  def tune(s: SparkSession): SparkSession = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.conf.set("spark.sql.session.timeZone", "UTC")
    s.conf.set("spark.sql.adaptive.enabled", "true")
    // custom SQL functions for sessions built without the extensions
    // config (Verify/Bench construct their own session)
    GraftExtensions.register(s)
    s
  }
}
