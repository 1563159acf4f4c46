package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Partition + sort-clustered layout for the append-heavy fact tables
  * (telemetry, events, documents): the data-SKIPPING technique that
  * complements [[Bucketed]]'s shuffle elimination.
  *
  * Layout: directory-partition by a coarse, low-cardinality key (a
  * date derived from event time — the key every retention/backfill/
  * incremental job filters on), and SORT WITHIN each written file by
  * the hot point-lookup key (device/user id, then time). What that
  * buys at 100 TB:
  *
  *  - '''Partition pruning''': a date predicate never touches
  *    non-matching directories — `PartitionFilters` in the scan node,
  *    enforced at file listing, before any IO.
  *  - '''Row-group skipping''': parquet stores min/max stats per
  *    row group; with files sorted by id, each row group covers a
  *    narrow id range, so an id predicate reads a handful of row
  *    groups instead of the whole partition. The predicate must reach
  *    the scan as `PushedFilters` — free with declarative plans.
  *  - '''Bounded file count''': `filesPerPartition` caps files per
  *    date (repartition before write), keeping listing and driver
  *    file-index memory flat as days accumulate — the same failure
  *    mode `streaming/Maintenance.compact` repairs after the fact,
  *    avoided at write time for batch (re)writes.
  *
  * The write shuffles once (repartition on the partition key + a
  * range-exchange-free in-partition sort) — paid at write, amortized
  * over every later scan, exactly like bucketing. Use [[Bucketed]]
  * when the win is a repeated equi-JOIN on the key; use this when the
  * win is selective SCANS (incremental syncs, device drill-downs,
  * date-ranged training-data pulls).
  */
object Clustered {

  /** Write `df` date-partitioned by `partitionCol` (must already be a
    * date/low-cardinality column) and sorted by `sortCols` within each
    * file. */
  def write(df: DataFrame, dir: String, partitionCol: String,
      sortCols: Seq[String], filesPerPartition: Int = 1): Unit = {
    require(sortCols.nonEmpty, "sortCols must name the in-file sort key")
    df
      // shuffle key = (partition value, file slot): each date's rows
      // land in ~filesPerPartition tasks, while distinct dates spread
      // across the cluster — no single-task-per-write bottleneck, no
      // fixed task count. The slot is a HASH of the sort key, so each
      // file spans the full id range; skipping happens at ROW-GROUP
      // granularity via the in-file sort (footer min/max per row
      // group), not at file level. A range-based slot would add
      // file-level pruning but needs the id distribution up front —
      // row-group skipping buys most of the IO win without it.
      .repartition(col(partitionCol),
        pmod(hash(sortCols.map(col): _*), lit(filesPerPartition)))
      .sortWithinPartitions(col(partitionCol) +: sortCols.map(col): _*)
      .write
      .mode(SaveMode.Overwrite)
      .partitionBy(partitionCol)
      .parquet(dir)
  }

  /** Derive the standard event-date partition column. */
  def withEventDate(df: DataFrame, tsCol: String,
      dateCol: String = "event_date"): DataFrame =
    df.withColumn(dateCol, to_date(col(tsCol)))

  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** The canonical pruned scan: date range + id point/range predicate.
    * Shape-only helper — any filter on the read frame prunes the same
    * way; ClusteredSpec asserts both pruning layers on the plan. */
  def scan(spark: SparkSession, dir: String, dateCol: String,
      datePred: Column => Column, idCol: String,
      idPred: Column => Column): DataFrame = {
    val t = read(spark, dir)
    t.filter(datePred(col(dateCol)) && idPred(col(idCol)))
  }
}
