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
  * Layout (round 8 — closes the torn-snapshot gap round 7 documented
  * as out of scope): immutable per-bucket GENERATION dirs
  * `bucket-<b>-g<v>/` plus a table-level `manifest-<v>` mapping each
  * bucket to its current generation, written once via tmp + rename
  * (`sources/AppendLog`'s manifest discipline applied to a keyed
  * table). A micro-batch writes a NEW generation for every bucket it
  * touches, then commits ONE manifest referencing the new generations
  * — so a reader resolves the manifest once and reads an immutable,
  * CROSS-BUCKET-CONSISTENT snapshot: mid-apply it sees the previous
  * batch's complete table, never some buckets new and some old (the
  * one consistency gap the previous in-place-swap layout had).
  * Untouched buckets keep their generation dirs byte-stable (the
  * IncrementalRefresh discipline). At 100 TB the rewrite unit is
  * `corpus/numBuckets`, not the corpus — the knob a real table sizes
  * so a micro-batch's rewrite amortizes against its change volume.
  *
  * Replay contract — the DESIGNED contrast with
  * [[StreamingIndexMaintenance]]'s append-only sink: upsert-apply is
  * IDEMPOTENT and DETERMINISTIC against the manifest it read
  * (generation names derive from the manifest version, so a crashed
  * attempt's partial generation dirs are uncommitted garbage that the
  * replay deletes and rewrites byte-for-byte), and a streaming query
  * replays only its most recent uncommitted micro-batch, so
  * at-least-once delivery needs NO high-water-mark armor here. A
  * crash anywhere before the manifest rename leaves readers on the
  * old snapshot; the rename itself is the commit point.
  *
  * Writers: SINGLE-writer by contract (satisfied by a streaming
  * query's one-foreachBatch-at-a-time execution), ENFORCED at the
  * commit point rather than by a lock file: manifests are never
  * overwritten, so the second of two racing writers fails its rename
  * loudly instead of corrupting the table — and crash recovery stays
  * fully automatic (no stale lock to clean), which an apply that runs
  * every few seconds needs more than an hourly index ingest does.
  *
  * Retention: each apply keeps the newest `keepGenerations` (default
  * 2) generation dirs per touched bucket and deletes older ones
  * best-effort AFTER the commit, bounding garbage to one extra table
  * copy while giving in-flight readers a full batch interval of
  * grace. Old manifests are tiny but a long-lived table accumulates
  * one per apply — [[expireManifests]] is the drop-only GC that
  * bounds them; [[readVersion]] time-travels to any KEPT version
  * whose generations still exist and fails loudly (missing files) on
  * vacuumed or expired ones, the q137 contract.
  */
object StreamingUpsert {

  /** Deterministic id → bucket assignment (non-negative mod). */
  private def bucketOf(id: Column, numBuckets: Int): Column =
    pmod(id, lit(numBuckets.toLong))

  private def fsOf(s: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)

  /** (current manifest version, bucket → generation-dir name) —
    * (0, empty) for a fresh table. */
  def state(s: SparkSession, tableDir: String): (Int, Map[Long, String]) = {
    val fs = fsOf(s, tableDir)
    val dir = new org.apache.hadoop.fs.Path(tableDir)
    if (!fs.exists(dir)) return (0, Map.empty)
    val versions = fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("manifest-"))
      .flatMap(n => scala.util.Try(n.stripPrefix("manifest-").toInt).toOption)
    if (versions.isEmpty) (0, Map.empty) else (versions.max, readManifest(s, tableDir, versions.max))
  }

  private def readManifest(s: SparkSession, tableDir: String,
      v: Int): Map[Long, String] = {
    val fs = fsOf(s, tableDir)
    val in = fs.open(new org.apache.hadoop.fs.Path(tableDir, s"manifest-$v"))
    val text =
      try new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
      finally in.close()
    text.split("\n").filter(_.nonEmpty).map { line =>
      val Array(b, d) = line.split("\t", 2)
      b.toLong -> d
    }.toMap
  }

  /** The current committed snapshot: resolve the manifest once, read
    * exactly the generation dirs it lists — consistent across buckets
    * no matter what an in-flight apply is doing. Absent/empty table →
    * None. */
  def readTable(s: SparkSession, tableDir: String): Option[DataFrame] = {
    val (v, buckets) = state(s, tableDir)
    if (v == 0 || buckets.isEmpty) None
    else Some(s.read.parquet(
      buckets.values.toSeq.sorted.map(d => s"$tableDir/$d"): _*))
  }

  /** Time travel: the snapshot as of manifest version `v` (q137's
    * contract on the streaming table). Fails loudly when `v` was never
    * committed or its generations have been vacuumed. */
  def readVersion(s: SparkSession, tableDir: String, v: Int)
      : Option[DataFrame] = {
    val buckets = readManifest(s, tableDir, v)
    if (buckets.isEmpty) None
    else Some(s.read.parquet(
      buckets.values.toSeq.sorted.map(d => s"$tableDir/$d"): _*))
  }

  /** Writes `manifest-(v+1)` via tmp + atomic publish. The publish is
    * the snapshot commit point and must be EXCLUSIVE — exactly one of
    * two racing writers may own version v+1. A check-then-rename is
    * not enough on local filesystems: POSIX rename(2) atomically
    * REPLACES an existing target, so both racers would "succeed" and
    * the loser's generation dirs (same `-g(v+1)` names) would tear the
    * winner's snapshot. So:
    *  - local (`file:`) scheme: publish via `Files.createLink` —
    *    link(2) is atomic create-exclusive, the loser gets
    *    `FileAlreadyExistsException`, never an overwrite. Mounts
    *    without hard-link support (overlayfs, some NFS) throw
    *    `UnsupportedOperationException`/`FileSystemException` instead;
    *    those fall back to the exists-check + rename protocol below —
    *    weaker (a check/rename window exists on POSIX rename), but the
    *    single-writer contract already makes a true race operator
    *    error, and a loud fallback beats an opaque commit failure.
    *    Note the NIO link bypasses Hadoop's ChecksumFileSystem: the
    *    published manifest carries no `.crc` sidecar (harmless — the
    *    manifest is re-read through the same raw path);
    *  - distributed schemes (HDFS contract): rename refuses an
    *    existing destination, so exists-check + rename fails the loser
    *    loudly there.
    * A crashed attempt's leftover tmp is uncommitted garbage — deleted
    * and rewritten on the next attempt. */
  private[streaming] def commitManifest(s: SparkSession, tableDir: String,
      v: Int, buckets: Map[Long, String]): Unit = {
    val fs = fsOf(s, tableDir)
    val dir = new org.apache.hadoop.fs.Path(tableDir)
    val tmp = new org.apache.hadoop.fs.Path(dir, s".manifest-${v + 1}.tmp")
    if (fs.exists(tmp)) fs.delete(tmp, false)
    val os = fs.create(tmp, false)
    try os.write(buckets.toSeq.sortBy(_._1)
      .map { case (b, d) => s"$b\t$d" }.mkString("\n").getBytes("UTF-8"))
    finally os.close()
    val mf = new org.apache.hadoop.fs.Path(dir, s"manifest-${v + 1}")
    // When the link publish fails for a reason OTHER than "loser of the
    // race", the fallback may also fail — in that case the thrown error
    // must carry the ORIGINAL exception as its cause, or an unrelated
    // I/O problem (AccessDenied, disk-full — both surface as
    // FileSystemException subtypes, same as the no-hard-links case)
    // gets misdiagnosed as a concurrent second writer.
    var linkFailure: Throwable = null
    val committed =
      if (fs.getUri.getScheme == "file") {
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(fs.makeQualified(mf).toUri.getPath),
            java.nio.file.Paths.get(fs.makeQualified(tmp).toUri.getPath))
          fs.delete(tmp, false)
          true
        } catch {
          // NB: FileAlreadyExistsException extends FileSystemException —
          // the loser-case match must come first
          case _: java.nio.file.FileAlreadyExistsException => false
          case e @ (_: UnsupportedOperationException |
               _: java.nio.file.FileSystemException) =>
            // mount lacks hard links (EPERM/EXDEV render as
            // FileSystemException, indistinguishable by type from a
            // genuine permissions/disk failure): fall back to the
            // distributed-scheme protocol (see scaladoc), remembering
            // the original failure for the error's cause
            linkFailure = e
            !fs.exists(mf) && fs.rename(tmp, mf)
        }
      } else !fs.exists(mf) && fs.rename(tmp, mf)
    if (!committed) {
      val detail =
        if (linkFailure == null)
          s"$mf already exists — a second writer committed concurrently."
        else
          s"link-publish of $mf threw (cause below) and the exists+rename " +
            "fallback also failed — either a second writer committed " +
            "concurrently, or the cause names a real I/O problem " +
            "(permissions, disk full, read-only mount)."
      throw new IllegalStateException(
        s"manifest commit failed: $detail Writers must be serialized; " +
          "this attempt's generation dirs are unreferenced garbage, safe " +
          "to delete.", linkFailure)
    }
  }

  /** Apply one micro-batch of changes. `changes` columns: `id` LONG,
    * `seq` LONG, `op` STRING (U/D), payload = every other column.
    * Exposed so specs (and batch backfills) can drive it directly. */
  def applyBatch(s: SparkSession, tableDir: String, numBuckets: Int,
      changes: DataFrame, keepGenerations: Int = 2): Unit = {
    require(keepGenerations >= 1, "keepGenerations must be positive")
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
    val fs = fsOf(s, tableDir)
    fs.mkdirs(new org.apache.hadoop.fs.Path(tableDir))
    val (v, buckets) = state(s, tableDir)
    // ONE Spark job for ALL touched buckets (round-11 — measured with
    // StreamStateBench mode=upsert): the previous shape wrote each
    // bucket in its own sequential job, so a uniform-key batch paid
    // touched × fixed job-scheduling overhead (64-bucket batches ran
    // ~95 rows/s with the data volume a rounding error). Now the
    // joined apply writes every touched bucket in one dynamic-
    // partitioned job into an UNCOMMITTED dot-staging dir (invisible
    // to readers and to the generation listing), then publishes each
    // partition with a METADATA rename into its generation dir — same
    // layout (plain parquet files inside `bucket-<b>-g<v>`), same
    // commit point (the manifest rename), same crash discipline
    // (leftover staging and uncommitted generation dirs at THIS
    // version are deterministically deleted and rewritten). */
    val stagingPath =
      new org.apache.hadoop.fs.Path(tableDir, s".staging-g${v + 1}")
    if (fs.exists(stagingPath)) fs.delete(stagingPath, true)
    val existing = touched.flatMap(b => buckets.get(b))
      .map(d => s"$tableDir/$d")
    val applied = (if (existing.isEmpty) None
      else Some(s.read.parquet(existing.toIndexedSeq: _*))) match {
      case None =>
        resolved.filter(col("op") =!= "D")
          .select(("__b" +: storedCols).map(col): _*)
      case Some(cur) =>
        // ONE full-outer id join + a row-local CASE — q135's apply
        // shape; id determines its bucket, so the join never crosses
        // buckets and new-bucket changes surface as right-only rows
        cur.join(
            resolved.select((col("id") +: col("op") +:
              payloadCols.map(c => col(c).as(s"__c_$c"))): _*),
            Seq("id"), "full_outer")
          .filter(col("op").isNull || col("op") =!= "D")
          .select(col("id") +: payloadCols.map(c =>
            when(col("op").isNull, col(c))
              .otherwise(col(s"__c_$c")).as(c)): _*)
          .withColumn("__b", bucketOf(col("id"), numBuckets))
          .select(("__b" +: storedCols).map(col): _*)
    }
    // cluster rows by bucket before the write: without it every write
    // task holds rows of MANY buckets and the dynamic-partition commit
    // pays tasks × buckets small files; clustered, file count is
    // bounded by max(buckets, shuffle partitions)
    applied.repartition(col("__b"))
      .write.partitionBy("__b").parquet(stagingPath.toString)
    val newGens = touched.map { b =>
      val genName = s"bucket-$b-g${v + 1}"
      val genPath = new org.apache.hadoop.fs.Path(tableDir, genName)
      // a crashed attempt at THIS version left an uncommitted dir:
      // delete and republish — deterministic replay, never data
      if (fs.exists(genPath)) fs.delete(genPath, true)
      val part = new org.apache.hadoop.fs.Path(stagingPath, s"__b=$b")
      if (fs.exists(part)) {
        if (!fs.rename(part, genPath)) throw new IllegalStateException(
          s"upsert apply could not publish $part as $genName")
      } else
        // a touched bucket whose post-apply content is EMPTY (every
        // row deleted): publish an empty generation with the stored
        // schema, exactly as the per-bucket shape did
        applied.filter(col("__b") === b).drop("__b")
          .write.parquet(genPath.toString)
      b -> genName
    }.toMap
    fs.delete(stagingPath, true)
    commitManifest(s, tableDir, v, buckets ++ newGens)
    // retention: per touched bucket keep the newest keepGenerations
    // dirs, delete older best-effort AFTER the commit point
    val all = fs.listStatus(new org.apache.hadoop.fs.Path(tableDir))
      .map(_.getPath.getName)
    touched.foreach { b =>
      val prefix = s"bucket-$b-g"
      val gens = all.filter(_.startsWith(prefix))
        .flatMap(n => scala.util.Try(n.stripPrefix(prefix).toInt).toOption)
        .sorted
      gens.dropRight(keepGenerations).foreach { g =>
        try fs.delete(
          new org.apache.hadoop.fs.Path(tableDir, s"$prefix$g"), true)
        catch { case _: java.io.IOException => () } // best-effort
      }
    }
  }

  /** Manifest GC stats: versions deleted, versions kept, names that
    * were not parseable manifests and therefore NEVER touched. */
  final case class ManifestRetention(
      deleted: Seq[Int], kept: Seq[Int], skipped: Seq[String])

  /** Drop-only manifest GC — bounds the one unbounded-growth surface
    * this layout has (generation dirs are already bounded by
    * `keepGenerations`, but every apply commits a new tiny manifest
    * and a long-lived table accumulates them forever). Keeps the
    * newest `keepVersions` manifests, deletes older ones; mirrors
    * [[Maintenance.expireDatePartitions]]'s parse-or-skip discipline:
    * only first-level files named exactly `manifest-<int>` are
    * candidates — generation dirs, `.tmp` commit leftovers, stray
    * files are reported in `skipped` and never deleted (a retention
    * job must not destroy what it cannot interpret).
    *
    * Time-travel horizon: after a run, [[readVersion]] resolves only
    * the kept versions — an expired version fails loudly
    * (`FileNotFoundException` from the manifest open), never returns
    * a partial snapshot. The CURRENT version is always kept
    * (`keepVersions >= 1`), so readers and the next apply's
    * [[state]] resolution are untouched no matter when this runs.
    *
    * Crash-safety: each delete is one single-file operation, oldest
    * first — a partial run is itself a valid (just less-retentive)
    * retention state, and the current snapshot stays readable
    * throughout. Safe to run concurrently with the single writer:
    * the writer only creates `manifest-(max+1)`, which GC never
    * targets. Idempotent. */
  def expireManifests(s: SparkSession, tableDir: String,
      keepVersions: Int): ManifestRetention = {
    require(keepVersions >= 1, "keepVersions must be positive")
    val fs = fsOf(s, tableDir)
    val dir = new org.apache.hadoop.fs.Path(tableDir)
    // pre-first-write (or fully expired) table = empty retention state
    if (!fs.exists(dir)) return ManifestRetention(Nil, Nil, Nil)
    val skipped = Seq.newBuilder[String]
    val versions = fs.listStatus(dir).toSeq.flatMap { st =>
      val name = st.getPath.getName
      // generation dirs / tmp files are not this job's concern;
      // anything manifest-LOOKING that does not parse is `skipped`
      if (!name.startsWith("manifest-")) None
      else if (st.isDirectory) { skipped += name; None }
      else scala.util.Try(name.stripPrefix("manifest-").toInt)
        .toOption match {
        case some @ Some(_) => some
        case None => skipped += name; None
      }
    }.sorted
    val (drop, keep) = versions.splitAt(
      math.max(0, versions.length - keepVersions))
    val deleted = drop.filter { v =>
      // oldest first (sorted); single-file delete, loud on failure
      val p = new org.apache.hadoop.fs.Path(dir, s"manifest-$v")
      if (fs.delete(p, false)) true
      else throw new java.io.IOException(s"manifest GC delete failed: $p")
    }
    ManifestRetention(deleted, keep, skipped.result().sorted)
  }

  /** Start continuous maintenance of the table from a change stream.
    *
    * `keepManifests`: when set, [[expireManifests]] runs after every
    * committed micro-batch, so a long-lived streaming table bounds its
    * own metadata instead of relying on an out-of-band job — the
    * time-travel horizon is then the last `keepManifests` batches.
    * Safe inside the apply loop: GC never targets the version the
    * batch just committed (always newest) and a crash between commit
    * and GC only defers deletes to the next batch. */
  def start(changes: DataFrame, tableDir: String, checkpointDir: String,
      numBuckets: Int = 64,
      trigger: Trigger = Trigger.ProcessingTime("10 seconds"),
      keepManifests: Option[Int] = None)
      : StreamingQuery =
    changes.writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        applyBatch(b.sparkSession, tableDir, numBuckets, b)
        keepManifests.foreach(k =>
          expireManifests(b.sparkSession, tableDir, k))
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}
