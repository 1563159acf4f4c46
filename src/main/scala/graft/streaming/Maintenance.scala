package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Table maintenance for the pipeline's append-only sinks.
  *
  * The bronze archive appends one file set per 10 s micro-batch
  * (reference trigger cadence, BASELINE.md) — ~8.6k file sets/day.
  * At 100 TB that file count, not the bytes, becomes the bottleneck:
  * every downstream scan pays listing + per-file open overhead, and
  * the driver's `InMemoryFileIndex` holds every path. Compaction
  * rewrites a directory into ~`targetBytes` files.
  *
  * Swap protocol (plain-directory tables have no transaction log):
  * write the compacted copy to `<dir>.compact-tmp`, then
  * `dir → <dir>.compact-trash`, `tmp → dir`, delete trash. The swap
  * window is two renames; writers must be paused across `compact*`
  * (for the streaming sinks: stop the query or schedule between
  * triggers). A crashed run leaves `.compact-tmp` behind and the next
  * call refuses until it is inspected/removed — never silently
  * overwritten.
  *
  * '''Filesystem assumption''': the swap protocol relies on `rename`
  * being an atomic metadata operation — true on HDFS, local FS, and
  * hierarchical-namespace (HNS) ADLS Gen2. On flat object stores
  * (S3A/GCS/WASB) "rename" is a non-atomic copy+delete, so the
  * two-rename window is NOT crash-safe there; `compact` rejects the
  * known-flat schemes up front. The scheme check is best-effort:
  * `abfs://` on a NON-HNS storage account is also flat but
  * indistinguishable by scheme — only run this against HNS-enabled
  * accounts. For object-store tables use a transactional table
  * format (Delta/Iceberg `OPTIMIZE`) instead.
  *
  * Crash recovery: if a run died between the two renames, the data is
  * intact in `<dir>.compact-trash` — restore it with
  * `hadoop fs -mv <dir>.compact-trash <dir>` and delete
  * `<dir>.compact-tmp`.
  */
object Maintenance {

  final case class CompactionStats(
      filesBefore: Long, filesAfter: Long, bytes: Long)

  /** Compact the verbatim-line bronze archive (text). */
  def compactText(spark: SparkSession, dir: String,
      targetBytes: Long = 128L * 1024 * 1024): CompactionStats =
    compact(spark, dir, "text", targetBytes)

  /** Compact a parquet sink directory (devices / telemetry). */
  def compactParquet(spark: SparkSession, dir: String,
      targetBytes: Long = 128L * 1024 * 1024): CompactionStats =
    compact(spark, dir, "parquet", targetBytes)

  private def compact(spark: SparkSession, dir: String, format: String,
      targetBytes: Long): CompactionStats = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)

    val files = fs.listFiles(path, true)
    var (nFiles, bytes) = (0L, 0L)
    while (files.hasNext) {
      val f = files.next()
      if (f.isFile && !f.getPath.getName.startsWith("_")) {
        nFiles += 1; bytes += f.getLen
      }
    }
    val nParts = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt

    // the read pins the CURRENT file listing; rows are copied verbatim
    // (same format in and out — text keeps lines byte-for-byte, parquet
    // keeps the schema)
    atomicSwap(spark, dir, "compact") { tmp =>
      spark.read.format(format).load(dir)
        .repartition(nParts)
        .write.format(format).mode("overwrite").save(tmp)
    }

    val after = fs.listFiles(path, true)
    var nAfter = 0L
    while (after.hasNext) {
      val f = after.next()
      if (f.isFile && !f.getPath.getName.startsWith("_")) nAfter += 1
    }
    CompactionStats(nFiles, nAfter, bytes)
  }

  /** The two-rename atomic-swap protocol, shared by [[compact]] and
    * `CuratedPipeline.mergeDevices`: `write` materializes the table's
    * NEW contents at the tmp path (`<dir>.<suffix>-tmp`), then
    * `dir → <dir>.<suffix>-trash`, `tmp → dir`, delete trash. Readers
    * see the old table or the new one, never a mixture or a truncated
    * directory. An ABSENT `dir` (first write) degrades to the single
    * `tmp → dir` rename — still atomic.
    *
    * Failure posture:
    *  - `write` throws → tmp is deleted (nothing was renamed, the
    *    original table is untouched) and the error propagates;
    *  - crash between the renames → the data is intact in trash and
    *    the NEXT call refuses loudly with the recovery command — never
    *    a silent rebuild from empty;
    *  - leftover tmp from a crashed run → refuse, never overwrite;
    *  - a second concurrent writer hits the tmp guard or loses the
    *    rename race and throws — loud failure instead of lost rows
    *    (single-writer remains the contract; streaming's one
    *    foreachBatch at a time satisfies it).
    * Flat object stores are rejected up front ([[requireAtomicFs]]). */
  private[graft] def atomicSwap(spark: SparkSession, dir: String,
      suffix: String)(write: String => Unit): Unit = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    requireAtomicFs(fs, suffix,
      "atomic rename (the two-rename swap window)")
    val tmp = new Path(dir + s".$suffix-tmp")
    val trash = new Path(dir + s".$suffix-trash")
    require(!fs.exists(tmp),
      s"$tmp exists — a previous $suffix crashed mid-write; inspect and remove it")
    require(!fs.exists(trash),
      s"$trash exists — a previous $suffix crashed mid-swap; the original " +
        s"data is intact there. Recover with: hadoop fs -mv $trash $path " +
        s"(then remove $tmp if present)")
    try write(tmp.toString)
    catch {
      case e: Throwable =>
        fs.delete(tmp, true) // pre-rename: tmp is garbage, dir untouched
        throw e
    }
    if (fs.exists(path)) {
      if (!fs.rename(path, trash))
        throw new java.io.IOException(s"$suffix swap failed: $path -> $trash")
      if (!fs.rename(tmp, path)) {
        fs.rename(trash, path) // best-effort rollback
        throw new java.io.IOException(s"$suffix swap failed: $tmp -> $path")
      }
      fs.delete(trash, true)
    } else if (!fs.rename(tmp, path))
      throw new java.io.IOException(s"$suffix first-write failed: $tmp -> $path")
  }

  /** Flat object stores fake both rename (copy+delete) and recursive
    * directory delete (per-object batches) — neither is the atomic
    * metadata operation the maintenance protocols here rely on. Shared
    * guard for [[compact]]'s swap and [[expireDatePartitions]]'s
    * partition drops; best-effort by scheme (see class scaladoc for
    * the non-HNS `abfs://` caveat). */
  private def requireAtomicFs(fs: org.apache.hadoop.fs.FileSystem,
      op: String, needs: String): Unit = {
    val flatSchemes =
      Set("s3", "s3a", "s3n", "gs", "oss", "cos", "wasb", "wasbs")
    val scheme = Option(fs.getUri.getScheme).getOrElse("file")
    require(!flatSchemes.contains(scheme.toLowerCase),
      s"$op requires $needs; '$scheme' is a flat object store — " +
        "use a transactional table format there")
  }

  final case class RetentionStats(
      deleted: Seq[String], kept: Long, skipped: Seq[String])

  /** Enforce a retention window on a date-partitioned directory table
    * ([[graft.sources.Clustered]] layout: `dir/<col>=<yyyy-MM-dd>/…`):
    * delete every partition whose date is strictly before `cutoff`.
    *
    * Dropping whole partition directories is the only retention shape
    * that needs no data rewrite — a predicate delete on unpartitioned
    * files would rewrite everything (that is what transactional table
    * formats add delete logs for). This is the batch analog of the
    * reference's bounded retentions (Event Hub 1 day, Power BI
    * `defaultRetentionPolicy=basicFIFO` — BASELINE.md).
    *
    * Safety: only first-level directories named exactly
    * `<partitionCol>=<parseable ISO date>` are candidates; anything
    * else (other columns' partitions, `_SUCCESS`, stray files,
    * malformed values) is reported in `skipped` and NEVER deleted —
    * a retention job must not destroy what it cannot interpret.
    * Idempotent and crash-safe ON HDFS-LIKE FILESYSTEMS, where a
    * recursive directory delete is one atomic namenode operation: each
    * partition delete is then independent and a partial run is itself
    * a valid retention state. Flat object stores delete per object — a
    * crash mid-partition would leave a TORN partition that scans as
    * silently-partial data — so they are rejected up front, like
    * [[compact]]'s swap. */
  def expireDatePartitions(spark: SparkSession, dir: String,
      partitionCol: String, cutoff: java.time.LocalDate): RetentionStats = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    requireAtomicFs(fs, "expireDatePartitions",
      "atomic recursive delete (per-partition drop)")
    // A table whose first write has not happened yet (or that a prior
    // run expired entirely) is an empty retention state, not an error —
    // the retention job must be schedulable before the writer runs.
    if (!fs.exists(path)) return RetentionStats(Nil, 0L, Nil)
    val prefix = partitionCol + "="
    val deleted = Seq.newBuilder[String]
    val skipped = Seq.newBuilder[String]
    var kept = 0L
    fs.listStatus(path).foreach { st =>
      val name = st.getPath.getName
      if (!st.isDirectory || !name.startsWith(prefix)) skipped += name
      else scala.util.Try(java.time.LocalDate.parse(
          name.substring(prefix.length))).toOption match {
        case Some(d) if d.isBefore(cutoff) =>
          if (fs.delete(st.getPath, true)) deleted += name
          else throw new java.io.IOException(s"retention delete failed: ${st.getPath}")
        case Some(_) => kept += 1
        case None => skipped += name
      }
    }
    RetentionStats(deleted.result().sorted, kept, skipped.result().sorted)
  }
}
