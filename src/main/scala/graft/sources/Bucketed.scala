package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table storage: the shuffle-elimination technique for
  * repeated big-big joins at scale (SURVEY §4 partitioning row).
  *
  * Writing both sides of a hot join bucketed by the join key (same
  * bucket count) lets Catalyst plan a SortMergeJoin with NO Exchange on
  * either side — the shuffle is paid once at write time and amortized
  * over every subsequent join/aggregation on that key. At 100 TB this
  * is the difference between re-shuffling the fact table per query and
  * never shuffling it at all (lineitem⋈orders on orderkey is the
  * canonical case; BucketedJoinSpec proves the Exchange-free plan).
  *
  * Buckets also bound task input size: pick `numBuckets` so each bucket
  * of the largest table fits comfortably in executor memory
  * (~128-256 MB compressed at cluster scale).
  */
object Bucketed {

  /** Write `df` as a bucketed (and optionally sorted) managed table. */
  def write(df: DataFrame, table: String, bucketCols: Seq[String],
      numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Read a bucketed table back (bucket metadata comes from the
    * catalog, which is what makes the join Exchange-free). */
  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
