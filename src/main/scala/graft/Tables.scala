package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All loaders are plain `spark.read.parquet` scans — column pruning and
  * predicate pushdown happen in the caller's plan and reach the scan via
  * Catalyst (verify with `.explain`: `PushedFilters`, `ReadSchema`).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String)   = table(s, d, "region")
  def nation(s: SparkSession, d: String)   = table(s, d, "nation")
  def customer(s: SparkSession, d: String) = table(s, d, "customer")
  def supplier(s: SparkSession, d: String) = table(s, d, "supplier")
  def part(s: SparkSession, d: String)     = table(s, d, "part")
  def orders(s: SparkSession, d: String)   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String) = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String)  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String) = table(s, d, "embeddings")

  /** Partition-count floor for CPU-bound per-row stages (tokenize,
    * fingerprint, shingle): when the scan under-splits — a single small
    * file, or one parquet row group, the local test regime — every
    * downstream map runs SERIAL no matter how many cores exist
    * (measured: q75's tokenize+fp stage, 4.4 s on 1 task at sf0.1).
    * The round-robin repartition only ever engages when the corpus fits
    * in fewer splits than cores, so the shuffle it introduces is by
    * construction tiny; at production scale file splits exceed the core
    * count and this is a no-op (`getNumPartitions` inspects the planned
    * scan — no job). Filters/pruning still reach the scan: Catalyst
    * pushes both through a Repartition. */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** [[documents]] with the [[spread]] floor — the loader for operators
    * whose first stage does heavy per-row work on the raw text. */
  def documentsSpread(s: SparkSession, d: String): DataFrame =
    spread(documents(s, d))

  /** `events.ts` normalization to µs `TimestampType`, robust to the two
    * physical encodings the driver has generated:
    *
    *  - TIMESTAMP(NANOS) (rounds ≤5): Spark cannot read it natively;
    *    with `spark.sql.legacy.parquet.nanosAsLong=true` it arrives as
    *    Long nanoseconds, which we truncate (integer `div`, not double
    *    `/` — ns-epoch values overflow a double mantissa) to µs,
    *    exactly matching DuckDB's ns→µs truncation.
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false) (round 6+): arrives
    *    as TIMESTAMP_NTZ; under the UTC session timezone the cast to
    *    `TimestampType` is wall-clock-preserving, i.e. the same
    *    instant DuckDB reads from the naive µs column.
    *
    * Dispatch is on the ARRIVING schema, not the directory, so both
    * vintages (and a plain TimestampType rewrite) normalize to the
    * identical column. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
}
