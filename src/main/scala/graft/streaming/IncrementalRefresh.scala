package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Incremental derived-table refresh — the view-maintenance seam of
  * the maintenance family ([[Maintenance]] compacts and expires;
  * this REBUILDS). A derived table (cleaned docs, enriched telemetry,
  * per-partition profiles) over a date-partitioned source goes stale
  * one partition at a time: the backfill of 2024-03-07 lands, and
  * everything else is still correct. Recomputing the whole derived
  * table per change is the O(table) habit that stops working at
  * 100 TB; this runs `transform` over ONLY the partitions whose
  * source changed.
  *
  * Staleness is detected from file METADATA, not data: a partition's
  * signature is a hash of its sorted (name, length, mtime) file list
  * — the Delta/Iceberg-style listing fingerprint, priced at a
  * directory listing per partition, never a scan. The signatures of
  * the last successful refresh live in a manifest file NEXT TO the
  * derived table (`<dst>.refresh-manifest`), written with the
  * write-tmp-then-rename protocol, so the manifest is always a
  * consistent snapshot: it describes exactly the source state the
  * current derived partitions were computed from. An unreadable or
  * absent manifest degrades to a FULL refresh (correct, just not
  * incremental) — never to a wrong answer.
  *
  * Each stale partition rewrites through [[Maintenance.atomicSwap]]'s
  * two-rename protocol: readers of `dst/<part>` see the old or the
  * new rows, never a half-written directory, and a crash leaves the
  * previous output recoverable. The manifest is written LAST, only
  * after every stale partition has committed — a crash mid-refresh
  * re-runs those partitions next time (idempotent: `transform` is
  * required to be deterministic per partition).
  *
  * `transform` contract: PARTITION-SCOPED — it receives one source
  * partition's rows and must produce that partition's derived rows
  * from them alone (map/filter/per-partition aggregate). Cross-
  * partition logic (global joins, corpus-wide stats) has no
  * incremental decomposition at this seam; run those as full jobs. */
object IncrementalRefresh {

  final case class RefreshStats(
      refreshed: Seq[String], unchanged: Seq[String], removed: Seq[String])

  /** Refresh `dstDir` = `transform(partition)` for every stale
    * `partitionCol=value` partition of `srcDir`. Derived partitions
    * whose source partition vanished are REMOVED (the retention case:
    * expired upstream ⇒ expired downstream). */
  def refresh(spark: SparkSession, srcDir: String, dstDir: String,
      partitionCol: String)(transform: DataFrame => DataFrame)
      : RefreshStats = {
    val src = new Path(srcDir)
    val fs = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prefix = partitionCol + "="
    val parts: Seq[String] =
      if (!fs.exists(src)) Nil
      else fs.listStatus(src).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
        .map(_.getPath.getName).sorted
    // a partition dir with NO data files (markers only — e.g. a crashed
    // writer's leftover) is treated as absent, not refreshed: reading
    // it would throw UNABLE_TO_INFER_SCHEMA and abort the whole cycle
    // (round-6 ADVICE); if it was previously materialized it falls into
    // `removed` below and its derived output is dropped
    val sigs: Map[String, Long] = parts.flatMap { p =>
      val files = fs.listStatus(new Path(src, p)).toSeq
        .filterNot(_.getPath.getName.startsWith("_"))
        .map(s => (s.getPath.getName, s.getLen, s.getModificationTime))
        .sortBy(_._1)
      if (files.isEmpty) None
      else Some(p -> files.foldLeft(17L) { case (acc, (n, l, m)) =>
        var h = acc * 31 + n.hashCode
        h = h * 31 + java.lang.Long.hashCode(l)
        h * 31 + java.lang.Long.hashCode(m)
      })
    }.toMap
    val live = parts.filter(sigs.contains)
    val prev = readManifest(fs, dstDir)
    val stale = live.filter(p => !prev.get(p).contains(sigs(p)))
    val removed = prev.keys.toSeq.filterNot(sigs.contains).sorted
    stale.foreach { p =>
      val in = spark.read.parquet(new Path(src, p).toString)
      Maintenance.atomicSwap(spark, new Path(dstDir, p).toString,
        "refresh") { tmp =>
        transform(in).write.mode(SaveMode.Overwrite).parquet(tmp)
      }
    }
    removed.foreach { p => fs.delete(new Path(dstDir, p), true) }
    // manifest LAST: it must only ever describe committed outputs
    writeManifest(fs, dstDir, sigs)
    RefreshStats(stale, live.diff(stale), removed)
  }

  private def manifestPath(dstDir: String) =
    new Path(dstDir + ".refresh-manifest")

  /** Unreadable/absent manifest ⇒ empty map ⇒ full refresh — the safe
    * degradation (correct, just not incremental). */
  private def readManifest(fs: org.apache.hadoop.fs.FileSystem,
      dstDir: String): Map[String, Long] =
    try {
      val in = fs.open(manifestPath(dstDir))
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      txt.linesIterator.filter(_.nonEmpty).map { line =>
        val Array(p, h) = line.split("\t", 2)
        p -> h.toLong
      }.toMap
    } catch { case _: Exception => Map.empty }

  private def writeManifest(fs: org.apache.hadoop.fs.FileSystem,
      dstDir: String, sigs: Map[String, Long]): Unit = {
    val path = manifestPath(dstDir)
    val tmp = new Path(path.toString + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(sigs.toSeq.sorted
      .map { case (p, h) => s"$p\t$h" }.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    if (fs.exists(path) && !fs.delete(path, false))
      throw new java.io.IOException(s"cannot replace $path")
    if (!fs.rename(tmp, path))
      throw new java.io.IOException(s"manifest rename failed: $tmp -> $path")
  }
}
