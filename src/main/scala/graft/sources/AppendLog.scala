package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Manifest-committed append-only table with SERIALIZED ingests — the
  * shared persistence protocol of the incremental index seams
  * (`llmdata/IncrementalLsh`, `llmdata/IncrementalIndexing`). Extracted
  * round 7 so the second index reuses the first one's crash/concurrency
  * contract instead of re-deriving it.
  *
  * On-disk layout under a table `dir`:
  *
  *   - `batch-<k>/` — immutable parquet rows, one dir per COMMITTED
  *     ingest;
  *   - `manifest-<k>` — the committed batch-dir names, one per line; the
  *     current manifest is the highest `k`, written once (tmp + rename
  *     into a fresh name — never overwritten), so readers resolve the
  *     table as "the dirs the current manifest lists" and a crashed
  *     ingest's partial batch dir is unreferenced garbage, never data;
  *   - `.ingest-lock` — the exclusive claim held for the WHOLE ingest.
  *
  * Concurrency contract: ingests are SERIALIZED and the lock ENFORCES
  * it rather than assuming it (round-6 VERDICT item 3's treatment).
  * [[append]] atomically creates the lock before reading the manifest,
  * holds it across the batch write and the manifest commit, and a
  * second ingest REFUSES loudly instead. A crashed ingest (JVM death)
  * leaves the lock behind: the next ingest refuses with the recovery
  * instruction (verify no ingest is live, remove the lock; batch dirs
  * absent from the current manifest are uncommitted garbage, safe to
  * delete). If the caller's batch write throws, NO manifest commits —
  * the attempt leaves only unreferenced garbage.
  */
object AppendLog {
  private def fsOf(s: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)

  /** (current manifest version, committed batch-dir names) — (0, Nil)
    * for a fresh table. */
  def state(s: SparkSession, tableDir: String): (Int, Seq[String]) = {
    val fs = fsOf(s, tableDir)
    val dir = new org.apache.hadoop.fs.Path(tableDir)
    if (!fs.exists(dir)) return (0, Nil)
    val versions = fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("manifest-"))
      .flatMap(n => scala.util.Try(n.stripPrefix("manifest-").toInt).toOption)
    if (versions.isEmpty) (0, Nil)
    else {
      val v = versions.max
      val in = fs.open(new org.apache.hadoop.fs.Path(dir, s"manifest-$v"))
      val text =
        try new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
        finally in.close()
      (v, text.split("\n").toSeq.filter(_.nonEmpty))
    }
  }

  /** The committed table as a DataFrame — empty with `schema` for a
    * fresh `tableDir`. Pass `mergeSchema = true` for tables whose row
    * format EVOLVED across appends (the ann-choice stash grew a `ref`
    * column in v2): without it Spark resolves the read schema from one
    * arbitrary footer, and a batch written under the wider schema can
    * silently lose its new columns when an older batch wins (round-11
    * advice). Homogeneous tables keep the cheap default. */
  def read(s: SparkSession, tableDir: String, schema: StructType,
      mergeSchema: Boolean = false): DataFrame = {
    val (_, dirs) = state(s, tableDir)
    if (dirs.isEmpty)
      s.createDataFrame(
        s.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else s.read.option("mergeSchema", mergeSchema.toString)
      .parquet(dirs.map(b => s"$tableDir/$b"): _*)
  }

  /** Claims `.ingest-lock` for the duration of `body` — the exclusive
    * section every manifest writer (append AND compaction) runs in.
    * Refuses loudly when the lock exists (see object scaladoc). */
  private def withLock[T](s: SparkSession, tableDir: String)(body: => T): T = {
    val fs = fsOf(s, tableDir)
    val dir = new org.apache.hadoop.fs.Path(tableDir)
    fs.mkdirs(dir)
    val lock = new org.apache.hadoop.fs.Path(dir, ".ingest-lock")
    val claimed = graft.Phases.time("lock_claim") {
      try { fs.create(lock, false).close(); true }
      catch { case _: java.io.IOException => false }
    }
    if (!claimed) throw new IllegalStateException(
      s"$lock exists — another ingest is running, or a previous one " +
        "crashed. Ingests must be serialized: two concurrent ingests " +
        "would each read the table as of its own start and silently " +
        "miss each other's contribution. If no ingest is live, remove " +
        "the lock; batch dirs absent from the current manifest are " +
        "uncommitted garbage and safe to delete.")
    try body finally fs.delete(lock, false)
  }

  /** Writes `manifest-(v+1)` listing `dirs` via tmp + rename (atomic on
    * HDFS-like filesystems; never overwrites an existing manifest). */
  private def commitManifest(s: SparkSession, tableDir: String, v: Int,
      dirs: Seq[String]): Unit = graft.Phases.time("manifest_commit") {
    val fs = fsOf(s, tableDir)
    val dir = new org.apache.hadoop.fs.Path(tableDir)
    val tmp = new org.apache.hadoop.fs.Path(dir, s".manifest-${v + 1}.tmp")
    val os = fs.create(tmp, false)
    try os.write(dirs.mkString("\n").getBytes("UTF-8")) finally os.close()
    val mf = new org.apache.hadoop.fs.Path(dir, s"manifest-${v + 1}")
    if (!fs.rename(tmp, mf))
      throw new java.io.IOException(s"manifest commit failed: $tmp -> $mf")
  }

  /** Runs `body` under the table's ingest lock WITHOUT committing a
    * manifest — for maintenance that mutates batch-dir sidecar files
    * in place (e.g. `AnnIndex.clearStreamMark`) and must serialize
    * against ingests/compactions doing the same. */
  def withIngestLock[T](s: SparkSession, tableDir: String)(body: => T): T =
    withLock(s, tableDir)(body)

  /** One SERIALIZED append: claims the lock, calls `body(version,
    * committedDirs, batchName)` — which must write the new rows under
    * `$tableDir/$batchName` and may build its return value over the
    * committed dirs plus the fresh batch (all immutable, so the result
    * stays valid after the lock releases) — then commits the manifest
    * listing the new batch and releases the lock. Refuses loudly when
    * another ingest holds the lock (see object scaladoc). */
  def append[T](s: SparkSession, tableDir: String)(
      body: (Int, Seq[String], String) => T): T =
    withLock(s, tableDir) {
      val (v, committed) = graft.Phases.time("state_read")(
        state(s, tableDir))
      val batchName = s"batch-${v + 1}"
      val result = body(v, committed, batchName)
      commitManifest(s, tableDir, v, committed :+ batchName)
      result
    }

  /** Compaction: rewrite all committed batch dirs into ONE, committed
    * through the same manifest protocol — the answer to unbounded
    * batch-dir growth under continuous ingest (an index appended to
    * hourly reads 8,760 dirs after a year; post-compaction readers
    * open one). Runs under the SAME ingest lock, so compaction and
    * ingests serialize against each other and a reader at any moment
    * resolves a consistent manifest: either the old dir list or the
    * single compacted dir — never a mix (the commit is one rename,
    * inside the lock). Old batch dirs become unreferenced garbage,
    * removed best-effort AFTER the commit — a crash between commit and
    * cleanup leaves only harmless orphans, exactly like a crashed
    * ingest's partial batch dir.
    *
    * `rewrite` maps the unioned rows to the compacted layout — identity
    * by default; indexes pass a layout transform (e.g. postings sorted
    * by term) to make the compacted segment row-group-prunable.
    * Compacting an empty table refuses loudly: a mis-pointed dir should
    * be caught, not papered over with an empty commit. */
  def compact(s: SparkSession, tableDir: String,
      rewrite: DataFrame => DataFrame = identity): Unit =
    compactWith(s, tableDir) { (committed, compacted) =>
      val all = s.read.parquet(committed.map(b => s"$tableDir/$b"): _*)
      rewrite(all).write.parquet(s"$tableDir/$compacted")
    }

  /** [[compact]] with a caller-written compacted batch — for tables
    * whose batch dirs hold an internal layout (e.g. IncrementalIndexing
    * with `postings/` + `docstats/` sub-tables). `write(committedDirs,
    * compactedName)` must materialize the full-table rewrite under
    * `$tableDir/$compactedName`. */
  def compactWith(s: SparkSession, tableDir: String)(
      write: (Seq[String], String) => Unit): Unit = {
    val fs = fsOf(s, tableDir)
    val old = withLock(s, tableDir) {
      val (v, committed) = state(s, tableDir)
      if (committed.isEmpty) throw new IllegalStateException(
        s"compact($tableDir): no committed batches — nothing to compact")
      val compacted = s"batch-${v + 1}-compacted"
      write(committed, compacted)
      commitManifest(s, tableDir, v, Seq(compacted))
      committed
    }
    old.foreach(b => fs.delete(
      new org.apache.hadoop.fs.Path(tableDir, b), true))
  }
}
