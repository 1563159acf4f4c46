package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Production JDBC table wiring — the reference reads its telemetry
  * from Azure SQL over JDBC (`azure-function/PushTelemetryFunction
  * .cs:104-116`) and its stream job writes curated rows to SQL tables
  * (`iot-stream-analytics-query.sql:53-83`). Every graft operator is
  * table-format-agnostic (they consume/produce `DataFrame`s), so the
  * only missing piece was this seam: an options-builder mirroring
  * [[EventStreamSource]] plus `read`/`write` one-liners over Spark's
  * JDBC source, e.g.
  *
  * {{{
  * val telemetry = JdbcTableSource.read(spark,
  *   JdbcTableSource.options(url, "dbo.telemetry",
  *     partition = Some(JdbcTableSource.Partitioning(
  *       "id", "0", "100000000", 64))))
  * PowerBiSync.syncOnce(telemetry, store, sink)   // unchanged
  * }}}
  *
  * Scale notes (1000-executor cluster):
  *  - an UNPARTITIONED JDBC read is ONE task pulling the whole table
  *    through one connection — always pass `partition` for fact-sized
  *    tables: Spark splits the scan into `numPartitions` range
  *    predicates on `column`, one connection each;
  *  - pushdown still applies: Catalyst compiles filters and column
  *    pruning into the generated server-side SELECT, so e.g.
  *    `syncOnce`'s watermark filter becomes an indexed range scan in
  *    the database (the reference's own query shape, cs:109-116) —
  *    never a full-table pull filtered Spark-side;
  *  - writes batch `batchSize` rows per INSERT round-trip
  *    (`batchsize` option); at high volume prefer more write
  *    partitions over a bigger batch (per-connection commit latency
  *    dominates).
  */
object JdbcTableSource {

  /** Range-split spec for parallel reads. Bounds are strings so
    * numeric AND timestamp partition columns both work (Spark parses
    * them against the column type). Bounds only steer the split
    * points — rows outside them are still read (Spark's contract). */
  final case class Partitioning(
      column: String, lowerBound: String, upperBound: String,
      numPartitions: Int)

  /** Options for a JDBC table. `extra` is additive only (driver
    * properties, `sessionInitStatement`, …): a key colliding with a
    * builder-owned one is rejected loudly rather than silently
    * rewiring the scan — same contract as
    * [[EventStreamSource.kafkaOptions]]. */
  def options(url: String, table: String,
      user: Option[String] = None, password: Option[String] = None,
      driver: Option[String] = None,
      fetchSize: Int = 1000,
      partition: Option[Partitioning] = None,
      extra: Map[String, String] = Map.empty): Map[String, String] = {
    val core = Map(
      "url" -> url,
      "dbtable" -> table,
      // row-streaming page size: the JDBC default (0) makes some
      // drivers buffer the whole result set per task
      "fetchsize" -> fetchSize.toString,
    ) ++
      user.map("user" -> _) ++
      password.map("password" -> _) ++
      driver.map("driver" -> _) ++
      partition.toSeq.flatMap(p => Seq(
        "partitionColumn" -> p.column,
        "lowerBound" -> p.lowerBound,
        "upperBound" -> p.upperBound,
        "numPartitions" -> p.numPartitions.toString))
    val clash = extra.keySet intersect core.keySet
    require(clash.isEmpty,
      s"extra options collide with builder-owned keys: ${clash.mkString(", ")}" +
        " — set them through the named parameters")
    core ++ extra
  }

  /** A JDBC table as a DataFrame (filters/pruning push down into the
    * server-side SELECT; partitioned when `options` carries a
    * [[Partitioning]]). */
  def read(spark: SparkSession, options: Map[String, String]): DataFrame =
    spark.read.format("jdbc").options(options).load()

  /** Append/overwrite a DataFrame into a JDBC table. Overwrite issues
    * TRUNCATE only when `truncate` (preserves indexes/grants) —
    * otherwise DROP+CREATE, Spark's default contract. */
  def write(df: DataFrame, url: String, table: String,
      mode: SaveMode = SaveMode.Append,
      user: Option[String] = None, password: Option[String] = None,
      batchSize: Int = 1000, truncate: Boolean = false,
      extra: Map[String, String] = Map.empty): Unit = {
    val core = Map(
      "url" -> url,
      "dbtable" -> table,
      "batchsize" -> batchSize.toString,
      "truncate" -> truncate.toString,
    ) ++ user.map("user" -> _) ++ password.map("password" -> _)
    val clash = extra.keySet intersect core.keySet
    require(clash.isEmpty,
      s"extra options collide with builder-owned keys: ${clash.mkString(", ")}" +
        " — set them through the named parameters")
    df.write.format("jdbc").mode(mode).options(core ++ extra).save()
  }
}
