package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustered layout — multi-dimensional data
  * skipping for the scans [[Clustered]] cannot serve. A single-column
  * sort is optimal for predicates on THAT column and worthless for any
  * other: at 100 TB, a telemetry table sorted by device_id answers
  * device drill-downs from a handful of row groups but full-scans for
  * a temperature-band audit. Interleaving the bits of several columns'
  * RANK buckets (Morton order — public literature; the technique behind
  * Delta/Iceberg OPTIMIZE ZORDER) makes file and row-group min/max
  * ranges narrow in EVERY interleaved dimension at once, so any
  * conjunction or single-dimension predicate over the z-columns skips
  * most of the table: near-optimal everywhere instead of optimal in one
  * dimension and useless in the rest.
  *
  * Mechanics:
  *  - '''Rank buckets, not raw values''': each z-column is mapped to a
  *    `2^bits`-bucket rank via quantile boundaries from ONE sampled
  *    pass (`approxQuantile`, all columns together). Rank-based
  *    interleaving is distribution-robust — a skewed column still
  *    spreads evenly over its bits, where value-scaling would collapse
  *    onto a few codes. The driver holds `(2^bits − 1)` doubles per
  *    column — an aggregate result, independent of row count.
  *  - '''One range shuffle''': `repartitionByRange` on the z-value
  *    gives every output file a contiguous z-run, and the in-partition
  *    sort orders rows inside each file, so parquet footer min/max per
  *    file AND per row group are tight in every z-column. Paid once at
  *    write (the same bargain as [[Clustered]] and [[Bucketed]]).
  *  - '''Plain reads''': consumers just `spark.read.parquet` + filter;
  *    skipping engages through `PushedFilters` row-group pruning — no
  *    reader-side cooperation, no stored z column (`__z` is dropped
  *    before write; the LAYOUT is the index).
  *
  * ZOrderSpec proves the skip with scan metrics, not plan text: on a
  * two-column layout, a y-band predicate reads <25% of rows where the
  * x-sorted layout reads ~everything, an x-band still reads <50%, and
  * a 2-D box reads <10% — with results identical across layouts.
  */
object ZOrder {

  /** Write `df` z-ordered by `zCols` into `numFiles` files. `bits` is
    * the per-column bucket resolution (z-code width = bits·|zCols|);
    * 6 bits/column already separates 64 rank bands per dimension and
    * keeps the bucketing expression cheap. z-columns must be numeric
    * (cast yourself for dates/timestamps). */
  def write(df: DataFrame, dir: String, zCols: Seq[String],
      bits: Int = 6, numFiles: Int = 32): Unit = {
    require(zCols.size >= 2,
      "z-ordering one column is just a sort — use Clustered.write")
    require(bits * zCols.size <= 62, "z-code must fit a long")
    val nCuts = (1 << bits) - 1
    val probs = (1 to nCuts).map(_.toDouble / (nCuts + 1)).toArray
    // one sampled pass computes every column's boundaries together
    val bounds = df.stat.approxQuantile(zCols.toArray, probs, 0.001)
    val buckets = zCols.zip(bounds).map { case (c, bs) =>
      bucketOf(col(c).cast("double"), bs)
    }
    df.withColumn("__z", interleave(buckets, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(dir)
  }

  /** Rank bucket of `c` under sorted cut points `bs`: the count of
    * boundaries ≤ value — a fold of comparisons, fully codegen'd (no
    * HOF, no UDF). NULLs land in bucket 0 (parquet stats treat nulls
    * separately, so they never widen a file's min/max range). */
  private def bucketOf(c: Column, bs: Array[Double]): Column =
    bs.foldLeft(lit(0)) { (acc, b) =>
      acc + when(c >= lit(b), 1).otherwise(0)
    }

  /** Morton interleave: bit i of dimension d lands at z-bit
    * `i·nDims + d`, so every dimension contributes equally at every
    * scale of the curve. */
  private def interleave(buckets: Seq[Column], bits: Int): Column = {
    val n = buckets.size
    val terms = for {
      i <- 0 until bits
      (b, d) <- buckets.zipWithIndex
    } yield shiftleft(shiftright(b, i).bitwiseAND(lit(1)), i * n + d)
    terms.reduce(_ + _).cast("long")
  }

  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** OPTIMIZE ZORDER for an EXISTING table: rewrite `dir` z-ordered by
    * `zCols` behind [[graft.streaming.Maintenance.atomicSwap]]'s
    * two-rename protocol — readers see the old layout or the new one,
    * never a half-written directory, and a crash leaves the original
    * data recoverable (the same guarantee the compaction and Devices
    * merge paths already carry). The use case is the lakehouse
    * maintenance cycle (Delta/Iceberg `OPTIMIZE ... ZORDER BY`):
    * ingest appends in arrival order all week, a scheduled optimize
    * re-clusters so multi-dimensional scans skip again. Both passes
    * over the old data (the quantile sample and the rewrite) read
    * `dir` while it is still intact — the swap happens only after the
    * rewrite has fully committed to the tmp path. */
  def optimize(spark: SparkSession, dir: String, zCols: Seq[String],
      bits: Int = 6, numFiles: Int = 32): Unit = {
    val df = spark.read.parquet(dir)
    graft.streaming.Maintenance.atomicSwap(spark, dir, "zorder") { tmp =>
      write(df, tmp, zCols, bits, numFiles)
    }
  }
}
