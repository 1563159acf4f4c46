package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming CDC upsert into an id-bucketed keyed table — the
  * unbounded twin of q135's batch MERGE (`llmdata/Snapshots`): a
  * change stream (op ∈ U upsert / D delete, plus a caller-supplied
  * monotone `seq` for within-batch conflict resolution) continuously
  * maintains a table that always holds the LATEST version of each key.
  *
  * Layout is `<table>/bucket=<id mod numBuckets>/` — the partition
  * discovery layout, so `readTable` is a plain parquet read. Each
  * micro-batch rewrites ONLY the buckets its changes touch, each
  * behind [[Maintenance.atomicSwap]]'s two-rename protocol: readers
  * of a bucket see old-or-new, never truncated; untouched buckets are
  * byte-stable on disk (the IncrementalRefresh discipline). At 100 TB
  * the rewrite unit is `corpus/numBuckets`, not the corpus — the knob
  * a real table sizes so a micro-batch's rewrite amortizes against
  * its change volume.
  *
  * Replay contract — the DESIGNED contrast with
  * [[StreamingIndexMaintenance]]'s append-only sink: upsert-apply is
  * IDEMPOTENT (applying the same resolved changes to a bucket that
  * already absorbed them reproduces the same bucket), and a streaming
  * query replays only its most recent uncommitted micro-batch (batch
  * ids are monotone past the commit point), so at-least-once delivery
  * needs NO high-water-mark armor here. A crash mid-batch leaves some
  * buckets new and some old until the replay completes the rest —
  * per-bucket atomicity, batch-level convergence; a reader needing a
  * cross-bucket snapshot reads behind a manifest (out of scope here,
  * `sources/AppendLog` is the in-repo pattern). Two concurrent
  * writers on one bucket hit atomicSwap's tmp guard and fail loudly —
  * single-writer stays the contract, satisfied by a streaming query's
  * one-foreachBatch-at-a-time execution.
  *
  * Within-batch resolution: a key may appear several times in one
  * micro-batch; the row with the highest (`seq`, `op`) wins BEFORE
  * apply (one id-keyed window on the BATCH, never on the table).
  * `seq` ties on one key resolve deterministically (D sorts above U)
  * but indicate a producer bug — give keys unique sequence numbers.
  */
object StreamingUpsert {

  /** Deterministic id → bucket assignment (non-negative mod). */
  private def bucketOf(id: Column, numBuckets: Int): Column =
    pmod(id, lit(numBuckets.toLong))

  /** Current table contents: plain parquet read over the bucket
    * layout (partition discovery supplies `bucket`, dropped here).
    * Absent or empty table → None. */
  def readTable(s: SparkSession, tableDir: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(tableDir)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p) || fs.listStatus(p).isEmpty) None
    else Some(s.read.parquet(tableDir).drop("bucket"))
  }

  /** Apply one micro-batch of changes. `changes` columns: `id` LONG,
    * `seq` LONG, `op` STRING (U/D), payload = every other column.
    * Exposed so specs (and batch backfills) can drive it directly. */
  def applyBatch(s: SparkSession, tableDir: String, numBuckets: Int,
      changes: DataFrame): Unit = {
    val payloadCols = changes.columns.toSeq
      .filterNot(Set("id", "seq", "op"))
    val storedCols = "id" +: payloadCols
    // within-batch last-writer-wins, then bucket assignment
    val w = Window.partitionBy("id")
      .orderBy(col("seq").desc, col("op").desc)
    val resolved = changes
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
      .withColumn("__b", bucketOf(col("id"), numBuckets))
    // touched-bucket list: bounded by numBuckets — a documented,
    // by-construction-small driver collect (the q55/IVF discipline)
    val touched = resolved.select("__b").distinct()
      .collect().map(_.getLong(0)).sorted
    val fs = new org.apache.hadoop.fs.Path(tableDir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    touched.foreach { b =>
      val bucketDir = s"$tableDir/bucket=$b"
      val chg = resolved.filter(col("__b") === b)
      val applied = readTable0(s, fs, bucketDir, changes) match {
        case None =>
          chg.filter(col("op") =!= "D")
            .select(storedCols.map(col): _*)
        case Some(cur) =>
          // ONE full-outer id join + a row-local CASE — q135's apply
          // shape, scoped to this bucket
          val joined = cur.join(
            chg.select((col("id") +: col("op") +:
              payloadCols.map(c => col(c).as(s"__c_$c"))): _*),
            Seq("id"), "full_outer")
          joined
            .filter(col("op").isNull || col("op") =!= "D")
            .select(col("id") +: payloadCols.map(c =>
              when(col("op").isNull, col(c))
                .otherwise(col(s"__c_$c")).as(c)): _*)
      }
      Maintenance.atomicSwap(s, bucketDir, "upsert") { tmp =>
        applied.write.parquet(tmp)
      }
    }
  }

  /** Bucket read for the apply path: absent bucket → None; present
    * bucket reads with the STORED schema (no partition discovery —
    * we're below the partition root here). */
  private def readTable0(s: SparkSession, fs: org.apache.hadoop.fs.FileSystem,
      bucketDir: String, changes: DataFrame): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(bucketDir)
    if (!fs.exists(p)) None else Some(s.read.parquet(bucketDir))
  }

  /** Start continuous maintenance of the table from a change stream. */
  def start(changes: DataFrame, tableDir: String, checkpointDir: String,
      numBuckets: Int = 64,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds"))
      : StreamingQuery =
    changes.writeStream
      .foreachBatch((b: DataFrame, _: Long) =>
        applyBatch(b.sparkSession, tableDir, numBuckets, b))
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}
