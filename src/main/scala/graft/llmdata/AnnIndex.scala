package graft.llmdata

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persisted inverted-list ANN index — tune-once/serve-many taken one
  * level deeper than [[AnnChoice]] (round 10).
  *
  * The choice artifact removed TRAINING from the serve path; this
  * removes the per-query CORPUS PASS. [[Similarity.serveChoice]] still
  * re-derives every vector's list assignment (IVF) or sign bucket
  * (LSH) on each search — fine for one batch of queries, but at
  * 100 TB the assignment IS the index build, and a real system
  * materializes the inverted lists once, ingests new vectors
  * incrementally, and probes only the lists a query ranks.
  *
  * Layout (format v4 — GENERATION-VERSIONED, round 13): the index
  * ROOT holds `gen-<k>/` directories and `current-<v>` pointer files.
  * Each generation is an [[graft.sources.AppendLog]] table of
  * `(vec_id, list_id)` rows — `list_id` = the chosen quantizer's cid
  * (IVF) or the masked sign bucket (LSH), so BOTH families serve from
  * the same structure. The LIVE generation is the one named by the
  * highest-numbered pointer file; pointers are written once
  * (create-no-overwrite, the AppendLog manifest discipline), so the
  * swap to a freshly rebuilt generation is one atomic file create and
  * a reader at any moment resolves a complete generation — never a
  * half-deleted one. [[syncTo]]'s rebuild arm builds the NEW
  * generation beside the old, commits the pointer, and expires all
  * but the newest `keepGenerations - 1` superseded generations: an
  * in-flight serve (which resolved its generation at
  * plan-construction time and holds concrete paths) finishes on the
  * old generation while the swap lands — closing the round-12
  * availability gap where an in-place rebuild took the serve offline
  * for its full duration. Retention (round 14, the
  * [[graft.streaming.StreamingUpsert]] `keepGenerations` contract
  * with the knob now EXPOSED on [[syncTo]]): the pointer files are
  * the liveness HISTORY — every generation that was ever live was
  * named by exactly one `current-<v>` — so the keep set is "the gens
  * named by the `keepGenerations` newest pointers", which retains
  * in-flight serves' snapshots and still sweeps crashed-rebuild
  * orphans (never pointer-named). A serve that out-lives
  * `keepGenerations - 1` rebuilds loses its snapshot: BOTH detection
  * points refuse with the named expired-generation message pointing
  * at the knob — at the serve's first probe action (pre-flight) and,
  * since round 15, mid-scan too ([[namedExpiryGuard]] renames the
  * executor's missing-file failure at the point it surfaces). The
  * snapshot loss itself remains the horizon the knob sizes, traded
  * against one lists table of disk per retained generation.
  *
  * Each committed batch inside a generation carries two sidecar
  * markers (the IncrementalIndexing `_stream_batch_id` device):
  *
  *   - `_fp` — the batch's raw-row fingerprint (count + XOR of
  *     xxhash64, the q118 shape). Count is additive and XOR is
  *     associative-commutative, so the UNION of committed batches has
  *     a derivable fingerprint; serve compares it against the live
  *     corpus and REFUSES an index that does not cover it — a vector
  *     the index never ingested can never be returned, which is a
  *     silent recall hole, not an error, unless gated here.
  *   - `_choice` — the fingerprint of the corpus the CHOICE was tuned
  *     on, pinning that every batch was assigned with the same
  *     centroids; mixed-artifact batches refuse at serve.
  *
  * Probe shape at scale: the query side computes its own features
  * (a pushed-down id filter on the embeddings table — never a corpus
  * scan), ranks lists against the broadcast artifact centroids, and
  * the probe table (queries × nprobe list ids) broadcasts against the
  * index; surviving candidate ids semi-join back into the embeddings
  * table for exact scoring — the IncrementalLsh verify discipline
  * (re-read candidates only), so serve cost is candidate-bounded, not
  * corpus-bounded. Parity: assignment is deterministic from the
  * artifact's centroids, so index-served results are row-identical to
  * the fresh-assignment serve (AnnIndexSpec pins it for both
  * families, plus batch-count invariance and both refusal gates). */
object AnnIndex {
  import org.apache.spark.sql.types._

  val Schema: StructType = StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("list_id", LongType, nullable = false)))

  /** Bump when the index layout or marker semantics change (v2:
    * `_choice` pins the ASSIGNMENT fingerprint, not the tune-corpus
    * fingerprint; v3: zero vectors are recorded under [[ZeroList]], so
    * the lists' vec_id set IS the covered id set and [[syncTo]]'s
    * delta diff stays append-only-cheap on corpora that contain them;
    * v4: generation-versioned layout — `gen-<k>/` tables under the
    * root plus an atomically swapped `current-<v>` pointer, so a
    * rebuild never takes the serve offline), so an auto-path dir
    * written by older code is never misread — it maps to a fresh dir
    * and rebuilds. A pre-v4 EXPLICIT dir (manifests at the root)
    * refuses loudly with the migration hint instead of being
    * reinterpreted. */
  val IndexFormatVersion = 4

  /** The sentinel list id zero vectors are recorded under. Cosine is
    * undefined for them, so they are excluded from ASSIGNMENT by
    * design — but they are part of the corpus the index claims to
    * cover, and a covered-but-unlisted id that exists only in the
    * coverage fingerprint breaks [[syncTo]]'s delta diff: the id
    * reappears in every corpus-minus-lists anti-join, the delta batch
    * re-counts it into the coverage fold, and every append-only growth
    * sync silently falls back to a full rebuild (round-11 advice,
    * medium). Recording them under a list id no probe can ever rank
    * (real list ids are ≥ 0: LSH buckets, IVF cids) keeps the serve
    * untouched — the probe join simply never matches — while making
    * "covered" equal "present in the lists". */
  val ZeroList: Long = -1L

  /** The default index location for a corpus directory — keyed exactly
    * like [[AnnChoice.defaultDir]] (format version + canonical path +
    * fingerprint under the per-user owner-only stash root), so the
    * auto-serving registry path (q212) can never read an index built
    * for a different corpus: a regenerated corpus maps to a FRESH dir
    * and rebuilds. Staleness remains possible only on the explicit-dir
    * API ([[search]]) and is refused loudly there. */
  def defaultDir(d: String, fp: (Long, Long)): String =
    s"${AnnChoice.stashRoot()}/ann-index/v$IndexFormatVersion-" +
      AnnChoice.corpusKey(d, fp)

  /** Fingerprint of an artifact's ASSIGNMENT semantics — what the
    * `_choice` sidecar pins. Keyed on exactly the fields that decide a
    * vector's list id (family; LSH: the plane count; IVF: the chosen
    * quantizer's centroid grid), NOT on the corpus fingerprint the
    * choice was tuned on: re-certifying a choice after
    * same-distribution growth ([[Similarity.refreshIfDrifted]])
    * re-stamps the corpus fingerprint but preserves assignment, and
    * the index must keep serving — and delta-ingesting — across it.
    * (Round-11 design catch: the first [[syncTo]] draft compared the
    * tune-corpus fingerprints and would have force-rebuilt on every
    * re-certification.) */
  private[llmdata] def assignmentFp(a: AnnChoice.Artifact): (Long, Long) = {
    val key =
      if (a.family == "lsh") s"lsh|${a.p1}"
      else {
        val qt = a.quants.find(_.nlists == a.p1).getOrElse(
          throw new IllegalStateException(
            s"ann artifact chose ivf nlists=${a.p1} but carries no " +
              "such quantizer — internally inconsistent; re-run the tuner"))
        s"ivf|${a.p1}|" + qt.qcents.map(_.mkString(",")).mkString(";") +
          "|" + qt.ncs.mkString(",")
      }
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8"))
    val bb = java.nio.ByteBuffer.wrap(md)
    (bb.getLong, bb.getLong)
  }

  /** Cold-start build for the auto-serving path: when the root has no
    * live generation with committed batches, build one by ingesting
    * the corpus in TWO deterministic id-split batches and compacting
    * them — so every serve that follows a cold start has exercised the
    * real production sequence (multi-batch ingest, marker-carrying
    * compaction, coverage fold, pointer swap) rather than a
    * single-batch fast path. A non-empty index is left untouched: the
    * default dir is fingerprint-keyed, so whatever is committed there
    * was built FOR this corpus (and [[search]]'s gates still verify
    * it). Returns whether a build ran. */
  def buildIfAbsent(s: SparkSession, d: String, indexDir: String,
      a: AnnChoice.Artifact): Boolean = {
    val empty = pointerState(s, indexDir)._2.forall(g =>
      graft.sources.AppendLog.state(s, s"$indexDir/$g")._2.isEmpty)
    if (!empty) false
    else { rebuildGeneration(s, d, indexDir, a); true }
  }

  private def fsOf(s: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)

  // ---- generation pointer machinery (format v4) --------------------

  /** (highest pointer version, live generation name) — (0, None) for a
    * fresh root. A root with AppendLog manifests but NO pointer is a
    * pre-v4 in-place index: refuse with the migration hint rather than
    * reinterpret it (the fingerprint-keyed DEFAULT dirs are
    * version-keyed, so only an explicit user-managed dir can get
    * here). */
  private def pointerState(s: SparkSession, root: String)
      : (Int, Option[String]) = {
    val fs = fsOf(s, root)
    val dir = new org.apache.hadoop.fs.Path(root)
    if (!fs.exists(dir)) return (0, None)
    val names = fs.listStatus(dir).toSeq.map(_.getPath.getName)
    val ptrs = names.filter(_.startsWith("current-")).flatMap(n =>
      scala.util.Try(n.stripPrefix("current-").toInt).toOption)
    if (ptrs.isEmpty) {
      if (names.exists(_.startsWith("manifest-")))
        throw new IllegalStateException(
          s"ann index at $root uses the pre-v4 in-place layout " +
            "(AppendLog manifests at the root, no generation pointer). " +
            "Format v4 serves from generation directories so a rebuild " +
            "never takes the serve offline — rebuild this index under " +
            "v4 (AnnIndex.syncTo, or delete the dir and re-ingest)")
      (0, None)
    } else {
      val v = ptrs.max
      (v, Some(readPointer(s, root, v)))
    }
  }

  /** The generation name `current-<v>` records. */
  private def readPointer(s: SparkSession, root: String, v: Int): String = {
    val in = fsOf(s, root).open(
      new org.apache.hadoop.fs.Path(root, s"current-$v"))
    val text =
      try new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
      finally in.close()
    text.trim
  }

  /** TEST-ONLY interleave hook — invoked at the named points where a
    * concurrent writer could land ("rebuild-built": generation built,
    * pointer not yet committed; "ingest-resolved": live generation
    * resolved, ingest lock not yet claimed; "serve-gated": integrity
    * gates passed, probe action not yet run), so the race specs can
    * inject a real racing writer deterministically instead of hoping a
    * thread interleaves. A no-op in production; never called on the
    * executor side. */
  private[graft] var raceHook: String => Unit = _ => ()

  /** The live generation's lists-table dir — None before any build.
    * Exposed for spec/ops introspection (batch counts, marker paths). */
  private[graft] def currentListsDir(s: SparkSession,
      root: String): Option[String] =
    pointerState(s, root)._2.map(g => s"$root/$g")

  /** The generation the next WRITE lands in: the live one, or a fresh
    * `gen-1` whose pointer commits immediately (an empty generation is
    * harmless — every serve still refuses at the coverage gate until
    * it is fully ingested; there is no prior generation whose
    * availability the immediate commit could hurt). */
  private def currentGenForWrite(s: SparkSession, root: String): String =
    pointerState(s, root) match {
      case (_, Some(g)) => s"$root/$g"
      case (v, None) =>
        val g = nextGenName(s, root)
        commitPointer(s, root, v, g)
        s"$root/$g"
    }

  /** One past the highest existing generation number — orphan dirs
    * from a crashed rebuild (built but never pointer-committed) are
    * counted, so a retry never collides with one. */
  private def nextGenName(s: SparkSession, root: String): String = {
    val fs = fsOf(s, root)
    val dir = new org.apache.hadoop.fs.Path(root)
    val max =
      if (!fs.exists(dir)) 0
      else fs.listStatus(dir).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("gen-"))
        .flatMap(n => scala.util.Try(n.stripPrefix("gen-").toInt).toOption)
        .maxOption.getOrElse(0)
    s"gen-${max + 1}"
  }

  /** Commits `current-(v+1)` naming `gen` — create-no-overwrite, so a
    * racing rebuild loses LOUDLY (its generation becomes unreferenced
    * garbage the next expiry sweep removes) instead of silently
    * clobbering the winner's swap. */
  private def commitPointer(s: SparkSession, root: String, v: Int,
      gen: String): Unit = {
    val fs = fsOf(s, root)
    fs.mkdirs(new org.apache.hadoop.fs.Path(root))
    val p = new org.apache.hadoop.fs.Path(root, s"current-${v + 1}")
    val os =
      try fs.create(p, false)
      catch {
        case e: java.io.IOException => throw new IllegalStateException(
          s"generation pointer $p already exists — a concurrent rebuild " +
            "committed first; this build's generation is unreferenced " +
            "garbage (removed by the next rebuild's expiry sweep). " +
            "Rebuilds are single-writer; re-run syncTo to converge", e)
      }
    try os.write(gen.getBytes("UTF-8")) finally os.close()
  }

  /** Ops status of the index at `root` — one row per generation dir
    * (live or not, so crashed-rebuild orphans and the retained
    * superseded generation are visible), METADATA-ONLY: manifest +
    * sidecar markers, never a data scan, so a dashboard can poll it at
    * any cadence. Marker reads are Try-wrapped — a half-built orphan
    * reports null coverage instead of throwing (status is the tool you
    * reach for when something is broken; it must not break too).
    * Columns: generation, live, batches (committed dirs), cov_count /
    * cov_xor (folded coverage fingerprint), stream_mark (replay
    * high-water mark). */
  def status(s: SparkSession, root: String): DataFrame = {
    import org.apache.spark.sql.Row
    val fs = fsOf(s, root)
    val dir = new org.apache.hadoop.fs.Path(root)
    val live = scala.util.Try(pointerState(s, root)._2).toOption.flatten
    val gens =
      if (!fs.exists(dir)) Seq.empty
      else fs.listStatus(dir).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("gen-")).sorted
    val rows = gens.map { g =>
      val gd = s"$root/$g"
      val dirs = scala.util.Try(
        graft.sources.AppendLog.state(s, gd)._2).getOrElse(Seq.empty)
      val fps = scala.util.Try(
        dirs.map(b => readMarker(s, s"$gd/$b/_fp"))).toOption
        .filter(_.nonEmpty)
      val mark = scala.util.Try(
        streamMarkMax(s, gd, dirs)).toOption.flatten
      Row(g, live.contains(g), dirs.length,
        fps.map(f => java.lang.Long.valueOf(f.map(_._1).sum)).orNull,
        fps.map(f => java.lang.Long.valueOf(f.map(_._2).reduce(_ ^ _)))
          .orNull,
        mark.map(java.lang.Long.valueOf).orNull)
    }
    import org.apache.spark.sql.types._
    s.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      StructType(Seq(
        StructField("generation", StringType, nullable = false),
        StructField("live", BooleanType, nullable = false),
        StructField("batches", IntegerType, nullable = false),
        StructField("cov_count", LongType, nullable = true),
        StructField("cov_xor", LongType, nullable = true),
        StructField("stream_mark", LongType, nullable = true))))
  }

  /** Build a FRESH generation from the live corpus and swap the
    * pointer to it — the serve-preserving rebuild: the old generation
    * (if any) is untouched until the expiry sweep, so serves that
    * resolved it keep answering. Carries the old generation's stream
    * replay high-water mark into the new one (stamped on the second
    * ingest, carried through the compaction): the rebuilt index covers
    * the live corpus — which already contains every row the old
    * stream lineage delivered — so a crash-recovery replay of an old
    * micro-batch must still be recognized as committed, or it would
    * double-ingest and brick the coverage gate.
    *
    * The mark is RE-READ under the old generation's ingest lock
    * immediately before the pointer commit, and the new generation
    * re-stamped if it advanced (round-14 advice, medium): the build
    * takes corpus-pass time, and a streaming micro-batch committed to
    * the old generation DURING that window carries an id above the
    * pre-build mark — stamped as-is, a post-swap crash-recovery
    * replay of that batch would pass the replay predicate,
    * double-ingest, and brick the coverage gate. Holding the lock
    * across the commit closes the window on the other side too: an
    * ingest racing this commit either landed before the lock claim
    * (its id is in the re-read), refuses on the held lock (streaming
    * replays it after the swap, into the new generation), or claims
    * the lock after the swap and refuses on [[ingest]]'s liveness
    * recheck. Rows delivered to the old generation during the build
    * that the rebuild's corpus read MISSED are not silently lost: the
    * new generation does not cover them, the serve's coverage gate
    * refuses, and [[syncTo]]'s delta arm repairs — degraded cost,
    * never a silent double-ingest. */
  private def rebuildGeneration(s: SparkSession, d: String, root: String,
      a: AnnChoice.Artifact, keepGenerations: Int = 2): Unit = {
    val (v, cur) = pointerState(s, root)
    val mark = cur.flatMap(g => streamMarkMax(s, s"$root/$g",
      graft.sources.AppendLog.state(s, s"$root/$g")._2))
    val gen = nextGenName(s, root)
    val genDir = s"$root/$gen"
    val raw = graft.Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"))
    ingestInto(s, genDir, raw.filter(pmod(col("vec_id"), lit(2)) === 0), a)
    ingestInto(s, genDir, raw.filter(pmod(col("vec_id"), lit(2)) === 1), a,
      streamBatchId = mark)
    compactIn(s, genDir)
    raceHook("rebuild-built")
    cur match {
      case None => commitPointer(s, root, v, gen)
      case Some(g) =>
        val oldDir = s"$root/$g"
        // the timer sits INSIDE the lock body: it measures the HOLD
        // (what a concurrent ingest contends with), never the
        // bounded-retry WAIT for someone else's hold (round-14 review
        // finding — waiting outside the lock blocks only this rebuild)
        withIngestLockRetry(s, oldDir) {
          graft.Phases.time("rebuild_lock_hold") {
            val mark2 = streamMarkMax(s, oldDir,
              graft.sources.AppendLog.state(s, oldDir)._2)
            if (mark2 != mark) restampMark(s, genDir, mark2)
            commitPointer(s, root, v, gen)
          }
        }
    }
    expireGenerations(s, root, keepGenerations)
  }

  /** [[graft.sources.AppendLog.withIngestLock]] with a bounded wait:
    * the AppendLog lock REFUSES rather than queues (right for two
    * ingests — concurrent ingests are a protocol violation), but the
    * rebuild's pre-swap section must serialize against a LEGITIMATE
    * streaming ingest that happens to hold the lock for one
    * micro-batch. Retry for up to `timeoutMs` — default from
    * `SPARK_GRAFT_ANN_SWAP_WAIT_MS` (30 s absent), configurable
    * because "held longer than the deadline" does NOT prove a crashed
    * ingest: a large micro-batch (or a batch-path ingest at scale)
    * can legitimately hold the lock for minutes (round-15 advice,
    * medium). On timeout the refusal is REBUILD-SPECIFIC: the first
    * cut re-surfaced AppendLog's crashed-ingest recovery text
    * verbatim, whose "remove the lock" instruction would corrupt the
    * manifest protocol if an operator followed it against a lock a
    * live ingest still holds. */
  private[llmdata] def swapWaitMs(): Long = scala.util.Try(
    sys.env.getOrElse("SPARK_GRAFT_ANN_SWAP_WAIT_MS", "30000").toLong)
    .getOrElse(30000L)

  private[llmdata] def withIngestLockRetry[T](s: SparkSession,
      dir: String, timeoutMs: Long = swapWaitMs())(body: => T): T = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    while (true) {
      try return graft.sources.AppendLog.withIngestLock(s, dir)(body)
      catch {
        case e: IllegalStateException
            if e.getMessage.contains(".ingest-lock") =>
          if (System.nanoTime() >= deadline)
            throw new IllegalStateException(
              s"ann index rebuild swap could not claim the ingest " +
                s"lock at $dir within ${timeoutMs} ms — a live ingest " +
                "(e.g. a large micro-batch) may legitimately hold it " +
                "this long. VERIFY no ingest is running before " +
                "removing the lock file; if one is, raise " +
                "SPARK_GRAFT_ANN_SWAP_WAIT_MS (or pass a larger " +
                "timeout) and re-run the sync instead", e)
          Thread.sleep(200)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Rewrites the `_stream_batch_id` sidecars of every committed batch
    * in `genDir` to `id` (dropping them when None) — the rebuild's
    * re-stamp when the old generation's mark advanced during the
    * build. Only ever called on a NOT-YET-LIVE generation (single
    * writer by construction: nothing ingests into an unpointed gen). */
  private def restampMark(s: SparkSession, genDir: String,
      id: Option[Long]): Unit = {
    val fs = fsOf(s, genDir)
    graft.sources.AppendLog.state(s, genDir)._2.foreach { b =>
      fs.delete(new org.apache.hadoop.fs.Path(
        s"$genDir/$b/_stream_batch_id"), false)
      id.foreach(i =>
        writeText(s, s"$genDir/$b/_stream_batch_id", i.toString))
    }
  }

  /** Post-swap retention sweep: keep the generations named by the
    * `keepGenerations` newest pointer files — the pointers ARE the
    * liveness history, so this retains exactly the new live
    * generation plus the `keepGenerations - 1` most recently
    * superseded ones (in-flight serves resolved before recent swaps
    * still hold them) — and delete every other gen dir, including
    * orphans from crashed rebuilds (built but never pointer-committed;
    * a max-below-current heuristic would have KEPT such an orphan and
    * deleted the genuinely-previous generation an in-flight serve may
    * be reading). Pointer files past the kept window are GC'd too.
    * Best-effort — a crash mid-sweep leaves only extra garbage for the
    * next sweep. */
  private def expireGenerations(s: SparkSession, root: String,
      keepGenerations: Int): Unit = {
    require(keepGenerations >= 1,
      s"keepGenerations must be >= 1, got $keepGenerations")
    val fs = fsOf(s, root)
    val names = fs.listStatus(
      new org.apache.hadoop.fs.Path(root)).toSeq.map(_.getPath.getName)
    val ptrVersions = names.filter(_.startsWith("current-")).flatMap(n =>
        scala.util.Try(n.stripPrefix("current-").toInt).toOption)
      .sorted.reverse
    val keep = ptrVersions.take(keepGenerations)
      .map(v => readPointer(s, root, v)).toSet
    names.filter(n => n.startsWith("gen-") && !keep.contains(n))
      .foreach(n =>
        fs.delete(new org.apache.hadoop.fs.Path(root, n), true))
    ptrVersions.drop(keepGenerations).foreach(k =>
      fs.delete(new org.apache.hadoop.fs.Path(root, s"current-$k"),
        false))
  }

  private def writeMarker(s: SparkSession, path: String,
      fp: (Long, Long)): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val os = fsOf(s, path).create(p, false)
    try os.write(s"${fp._1}\t${fp._2}".getBytes("UTF-8")) finally os.close()
  }

  private def readMarker(s: SparkSession, path: String): (Long, Long) = {
    val p = new org.apache.hadoop.fs.Path(path)
    val in =
      try fsOf(s, path).open(p)
      catch {
        case e: java.io.FileNotFoundException =>
          throw new IllegalStateException(
            s"ann index batch is missing its marker ($path) — the " +
              "coverage/choice gates cannot run without it. Was this " +
              "table compacted with the generic AppendLog.compact " +
              "instead of AnnIndex.compact (which carries the markers " +
              "through)?", e)
      }
    val text =
      try new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
      finally in.close()
    val parts = text.trim.split("\t")
    (parts(0).toLong, parts(1).toLong)
  }

  /** Compaction that CARRIES THE MARKERS: rewrites all committed
    * (vec_id, list_id) batches into one dir whose `_fp` is the merged
    * coverage fingerprint (counts sum, xors fold — the same algebra
    * the serve gate uses) and whose `_choice` is the single asserted
    * artifact fingerprint. The generic [[graft.sources.AppendLog]]
    * `compact` would drop the sidecars and every later serve would
    * refuse with the missing-marker error above — this is the
    * index-aware twin, same lock/manifest semantics. Operates on the
    * LIVE generation of the index at `root`. */
  def compact(s: SparkSession, root: String): Unit =
    compactIn(s, currentListsDir(s, root).getOrElse(
      throw new IllegalStateException(
        s"compact($root): no live generation — nothing to compact")))

  /** [[compact]] on an ALREADY-RESOLVED generation dir — for callers
    * that just ingested into a specific generation and must compact
    * THAT one (the streaming maintenance loop): re-resolving the live
    * pointer here could race a rebuild swap and rewrite a generation
    * the cadence check never looked at (round-14 advice). */
  private[graft] def compactLists(s: SparkSession, listsDir: String): Unit =
    compactIn(s, listsDir)

  private def compactIn(s: SparkSession, indexDir: String): Unit =
    graft.sources.AppendLog.compactWith(s, indexDir) { (committed, name) =>
      val fps = committed.map(b => readMarker(s, s"$indexDir/$b/_fp"))
      val cov = (fps.map(_._1).sum, fps.map(_._2).reduce(_ ^ _))
      val choices = committed
        .map(b => readMarker(s, s"$indexDir/$b/_choice")).distinct
      if (choices.length > 1) throw new IllegalStateException(
        s"ann index at $indexDir mixes batches assigned under " +
          s"${choices.length} different choice artifacts — compaction " +
          "would launder the inconsistency into one batch; rebuild " +
          "instead")
      // GLOBALLY sorted by list_id: compacted files cover disjoint id
      // ranges, so the serve's pushed `list_id IN (...)` filter
      // ([[searchLists]]) prunes unprobed lists at the parquet
      // row-group level — the IncrementalIndexing.compact sort-by-term
      // discipline applied to the ANN lists. Ingest batches stay
      // unsorted (ingest is the hot path, compaction is maintenance).
      s.read.parquet(committed.map(b => s"$indexDir/$b"): _*)
        .sort("list_id")
        .write.parquet(s"$indexDir/$name")
      writeMarker(s, s"$indexDir/$name/_fp", cov)
      writeMarker(s, s"$indexDir/$name/_choice", choices.head)
      // carry the stream-replay high-water mark forward — computed
      // from the dirs being folded, INSIDE the lock (the
      // IncrementalIndexing.compact discipline): a micro-batch replay
      // arriving after a compaction that dropped the mark would look
      // fresh, double-ingest, and brick the coverage gate for good
      streamMarkMax(s, indexDir, committed).foreach(id =>
        writeText(s, s"$indexDir/$name/_stream_batch_id", id.toString))
    }

  /** The batch's raw fingerprint — same definition as
    * [[Similarity.corpusFingerprint]], over an arbitrary embeddings
    * batch (null-safe for empty batches). */
  private def batchFingerprint(batch: DataFrame): (Long, Long) = {
    val r = batch.agg(count(lit(1)).as("n"),
      coalesce(expr("bit_xor(xxhash64(vec_id, embedding))"), lit(0L))
        .as("x")).head()
    (r.getLong(0), r.getLong(1))
  }

  /** The list-id column for one embeddings-shaped frame under a
    * choice: shared by [[ingest]] and the spec's fresh-assignment
    * reference — ONE definition, so index and serve can never drift. */
  private[llmdata] def assigned(corpus: DataFrame,
      a: AnnChoice.Artifact): DataFrame =
    if (a.family == "lsh")
      corpus.select(col("vec_id"),
        expr(s"CAST(pmod(b8, shiftleft(1, ${a.p1})) AS BIGINT)")
          .as("list_id"))
    else {
      val qt = a.quants.find(_.nlists == a.p1).getOrElse(
        throw new IllegalStateException(
          s"ann index: artifact chose ivf nlists=${a.p1} but carries " +
            "no such quantizer"))
      Similarity.withListAssignment(corpus, qt)
        .select(col("vec_id"), col(s"cid_${qt.idx}").cast("long")
          .as("list_id"))
    }

  /** One SERIALIZED ingest: assign `rawBatch` (embeddings-shaped:
    * vec_id, embedding) under the artifact's choice and append the
    * (vec_id, list_id) rows plus the coverage/choice markers. Vectors
    * assignment drops (zero vectors — cosine undefined) land under the
    * [[ZeroList]] sentinel instead of vanishing, so every ingested id
    * is present in the lists and the coverage fingerprint and the
    * vec_id set agree — the invariant [[syncTo]]'s delta diff rests
    * on.
    *
    * `streamBatchId` is the streaming twin's replay armor
    * ([[graft.streaming.StreamingAnnIndexMaintenance]], the same
    * device as [[IncrementalIndexing.ingest]]): foreachBatch is
    * at-least-once, and a replayed micro-batch ingested twice folds
    * its fingerprint into the coverage TWICE — every later serve then
    * refuses at the coverage gate, turning a crash-recovery replay
    * into a bricked index. When set, the id is stamped into the
    * committed batch dir (`_stream_batch_id`) and the streaming caller
    * checks [[maxStreamBatchId]] before ingesting.
    *
    * Appends into the index's LIVE generation (creating `gen-1` on a
    * fresh root); [[syncTo]]'s rebuild is the only writer that opens a
    * new generation. The resolved-generation LIVENESS is re-verified
    * under the ingest lock (round 14): between resolving the live
    * generation here and claiming its lock, a rebuild can commit the
    * pointer swap — committing this batch into the now-superseded
    * generation would strand its rows where no serve reads them,
    * surfacing much later as a coverage refusal far from the cause.
    * The recheck refuses loudly at the ingest instead; a streaming
    * replay of the refused batch lands in the live generation.
    * Returns the generation dir the batch committed into. */
  def ingest(s: SparkSession, root: String, rawBatch: DataFrame,
      a: AnnChoice.Artifact,
      streamBatchId: Option[Long] = None): String = {
    val genDir = currentGenForWrite(s, root)
    raceHook("ingest-resolved")
    ingestInto(s, genDir, rawBatch, a, streamBatchId,
      preWrite = () => {
        val live = currentListsDir(s, root)
        if (!live.contains(genDir)) throw new IllegalStateException(
          s"ann index ingest at $root: resolved " +
            genDir.split('/').last + " as the live generation, but a " +
            "rebuild swapped the pointer to " +
            live.map(_.split('/').last).getOrElse("<none>") +
            " before this ingest claimed the lock — committing here " +
            "would strand the rows in a superseded generation no serve " +
            "reads. Re-run the ingest (a streaming replay lands in the " +
            "live generation)")
      })
    genDir
  }

  private def ingestInto(s: SparkSession, indexDir: String,
      rawBatch: DataFrame, a: AnnChoice.Artifact,
      streamBatchId: Option[Long] = None,
      preWrite: () => Unit = () => ()): Unit = {
    val fp = graft.Phases.time("fingerprint")(batchFingerprint(rawBatch))
    graft.sources.AppendLog.append(s, indexDir) { (_, _, batchName) =>
      preWrite()
      val base = rawBatch
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("mx", array_max(transform(col("v"), x => abs(x))))
      val corpus = base.filter(col("mx") > 0)
        .withColumn("b8", Similarity.signBucket(col("v")))
        .withColumn("qi", transform(col("v"),
          x => Similarity.quantizeInt8(x, col("mx")).cast("double")))
      val zeros = base.filter(coalesce(col("mx"), lit(0.0)) <= 0)
        .select(col("vec_id"), lit(ZeroList).as("list_id"))
      graft.Phases.time("batch_write") {
        assigned(corpus, a).unionByName(zeros)
          .write.parquet(s"$indexDir/$batchName")
      }
      graft.Phases.time("marker_writes") {
        writeMarker(s, s"$indexDir/$batchName/_fp", fp)
        writeMarker(s, s"$indexDir/$batchName/_choice", assignmentFp(a))
        streamBatchId.foreach(id =>
          writeText(s, s"$indexDir/$batchName/_stream_batch_id",
            id.toString))
      }
    }
  }

  private def writeText(s: SparkSession, path: String,
      text: String): Unit = {
    val os = fsOf(s, path).create(
      new org.apache.hadoop.fs.Path(path), false)
    try os.write(text.getBytes("UTF-8")) finally os.close()
  }

  /** Highest `_stream_batch_id` across the LIVE generation's COMMITTED
    * batch dirs — None for a fresh index or one only ever fed by batch
    * ingests. The streaming caller's replay predicate: skip any id ≤
    * this (micro-batch ids are monotone and replays are sequential).
    * [[syncTo]]'s rebuild carries the mark into the new generation, so
    * the predicate survives a pointer swap. */
  def maxStreamBatchId(s: SparkSession, root: String): Option[Long] =
    currentListsDir(s, root).flatMap(dir =>
      streamMarkMax(s, dir, graft.sources.AppendLog.state(s, dir)._2))

  /** Drops the stream replay high-water mark from the LIVE generation
    * (every committed batch's `_stream_batch_id` sidecar), under the
    * generation's ingest lock. The escape hatch for STARTING A NEW
    * STREAM LINEAGE against an existing index: micro-batch ids restart
    * at 0 under a fresh checkpoint, so the old lineage's mark would
    * silently skip the new query's first batches
    * ([[graft.streaming.StreamingAnnIndexMaintenance]] refuses that
    * restart loudly and points here). ONLY safe when the old query is
    * retired AND the new stream carries rows the index has not already
    * committed — clearing the mark while the new lineage replays
    * already-ingested data double-folds the coverage fingerprint and
    * bricks the serve gate (the exact corruption the mark exists to
    * prevent). */
  def clearStreamMark(s: SparkSession, root: String): Unit =
    currentListsDir(s, root).foreach { dir =>
      graft.sources.AppendLog.withIngestLock(s, dir) {
        val fs = fsOf(s, dir)
        graft.sources.AppendLog.state(s, dir)._2.foreach { b =>
          fs.delete(new org.apache.hadoop.fs.Path(
            s"$dir/$b/_stream_batch_id"), false)
        }
      }
    }

  private def streamMarkMax(s: SparkSession, indexDir: String,
      dirs: Seq[String]): Option[Long] = {
    val fs = fsOf(s, indexDir)
    val ids = dirs.flatMap { b =>
      val p = new org.apache.hadoop.fs.Path(
        s"$indexDir/$b/_stream_batch_id")
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        try Some(new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
          .trim.toLong)
        finally in.close()
      }
    }
    ids.maxOption
  }

  /** Keep choice AND index in lockstep with a LIVE corpus — the whole
    * production loop composed from the two artifacts' own primitives
    * (round 11; the gates that refuse a stale serve are exactly what
    * decides each step, so the loop can never silently serve wrong):
    *
    *   1. [[Similarity.refreshIfDrifted]] brings the CHOICE current —
    *      "fresh"/"recertified" are zero-training, real drift pays
    *      exactly one sweep;
    *   2. an index assigned under a DIFFERENT choice (a retune
    *      happened), or an empty dir, REBUILDS;
    *   3. otherwise the corpus DELTA (ids absent from the lists)
    *      ingests as ONE new batch: the marker algebra (counts sum,
    *      xors fold) makes coverage-after-delta provably equal the
    *      corpus fingerprint for append-only growth — the 100 TB
    *      ingest path, old batches untouched;
    *   4. if coverage still mismatches after the delta — rows were
    *      MUTATED or deleted rather than appended — fall back to a
    *      full rebuild: degraded COST, never degraded correctness.
    *      (Zero vectors no longer trip this: they sit in the lists
    *      under [[ZeroList]], so the delta diff sees them as covered.)
    *
    * Rebuild IS snapshot-isolated since format v4 (round 13, closing
    * the round-12 verdict's one availability gap): the rebuild arm
    * builds the NEW generation beside the live one and swaps the
    * pointer atomically — a serve racing the rebuild keeps answering
    * from the generation it resolved at construction (correct against
    * the corpus that generation covers), and the first serve after
    * the swap answers from the new one. The old in-place arm deleted
    * and rewrote under the lock, so a racing reader REFUSED for the
    * full rebuild duration — at production scale, a retune took the
    * serve offline.
    *
    * Returns (choice outcome, index action): ("fresh" | "recertified"
    * | "retuned", "kept" | "delta" | "rebuilt").
    *
    * `keepGenerations` (default 2 — the original current + one
    * superseded contract) sizes the availability horizon: a rebuild
    * retains the generations named by the `keepGenerations` newest
    * pointers, so a serve survives `keepGenerations - 1` rebuilds
    * between its construction and its last action. Raise it for
    * long-running serves (dashboards holding a DataFrame across
    * retune cycles); each retained generation costs one corpus-sized
    * lists table of disk. */
  def syncTo(s: SparkSession, d: String, stashDir: String,
      indexDir: String, keepGenerations: Int = 2): (String, String) = {
    val choiceOutcome = Similarity.refreshIfDrifted(s, d, stashDir)
    val fp = Similarity.corpusFingerprint(s, d)
    val art = AnnChoice.read(s, stashDir).getOrElse(
      throw new IllegalStateException(
        s"refreshIfDrifted left no artifact at $stashDir"))
    def rebuild(): String = {
      rebuildGeneration(s, d, indexDir, art, keepGenerations)
      "rebuilt"
    }
    val (lists, cov, choiceFp, _) = readIndex(s, indexDir)
    val action = choiceFp match {
      case None => rebuild() // empty dir: first build
      case Some(cf) if cf != assignmentFp(art) =>
        rebuild() // assigned under superseded centroids/planes
      case _ if cov == fp => "kept"
      case _ =>
        val delta = graft.Tables.embeddings(s, d)
          .select(col("vec_id"), col("embedding"))
          .join(lists.select("vec_id").distinct(),
            Seq("vec_id"), "left_anti")
        if (delta.isEmpty) rebuild() // mutation/deletion, not growth
        else {
          ingest(s, indexDir, delta, art)
          val (_, cov2, _, _) = readIndex(s, indexDir)
          if (cov2 == fp) "delta" else rebuild()
        }
    }
    (choiceOutcome, action)
  }

  /** The named refusal for a generation swept by the retention
    * policy while a reader still held it — every expired-generation
    * detection point raises THIS, so the failure names its cause and
    * its knob instead of surfacing as a raw executor read error. */
  private def expiredGenerationError(root: String, genDir: String,
      cause: Throwable = null): IllegalStateException =
    new IllegalStateException(
      s"ann index generation ${genDir.split('/').last} at $root has " +
        "EXPIRED under this reader: retention keeps only the " +
        "generations named by the `keepGenerations` newest pointers " +
        "(default 2 — current + one superseded), so a serve that " +
        "outlives keepGenerations-1 rebuilds loses its snapshot. " +
        "Re-construct the serve (it pins the live generation), or " +
        "raise keepGenerations on AnnIndex.syncTo for serves that " +
        "must outlive multiple rebuilds", cause)

  private def expiredGeneration(root: String, genDir: String): Nothing =
    throw expiredGenerationError(root, genDir)

  /** Refuses with the named expired-generation error if `genDir` no
    * longer exists — the serve-path pre-flight, run at the serve's
    * first ACTION (the probe collect) rather than only at
    * construction, so the common expire-under-a-resolved-serve case
    * fails named before any scan starts. Expiry landing AFTER this
    * check, mid-scan, is caught by [[namedExpiryGuard]]. */
  private def preflightGeneration(s: SparkSession, root: String,
      genDir: String): Unit =
    if (!fsOf(s, genDir).exists(new org.apache.hadoop.fs.Path(genDir)))
      expiredGeneration(root, genDir)

  /** Renames a lists-scan read failure caused by retention sweeping
    * the pinned generation MID-SCAN into the named expired-generation
    * refusal (round 15, closing the residual the round-14 pre-flight
    * documented): the long-scan + aggressive-rebuild-cadence case at
    * production scale, where the sweep lands between the pre-flight
    * and scan completion and previously surfaced as a raw
    * FileNotFoundException far from its cause. The guard is an
    * iterator shim inserted ABOVE the scan's pushed-down filter
    * (pushdown preserved — the filter stays adjacent to the scan) and
    * INSIDE the scan's stage: parquet opens files lazily as the task's
    * iterator advances, so a missing-batch-file failure flows up
    * through this wrapper's hasNext/next on the executor and is
    * re-raised named WITH the original as cause. A post-shuffle catch
    * could not do this — the scan fails in the map stage and reaches
    * later stages only as an opaque stage-failure. Only
    * missing-file failures are renamed (anything on this branch reads
    * exclusively the pinned generation's paths — the embeddings scans
    * live in other stage branches); every other error propagates
    * untouched. Cost: one row round-trip over the already
    * probed-lists-bounded (serve) / lists-bounded (audit) branch. */
  private def namedExpiryGuard(root: String, genDir: String,
      df: DataFrame): DataFrame = {
    def missingFile(e: Throwable): Boolean = {
      var t = e
      while (t != null) {
        if (t.isInstanceOf[java.io.FileNotFoundException]) return true
        t = t.getCause
      }
      false
    }
    df.mapPartitions { it =>
      new Iterator[org.apache.spark.sql.Row] {
        private def named[T](b: => T): T =
          try b catch {
            case e: Throwable if missingFile(e) =>
              throw expiredGenerationError(root, genDir, e)
          }
        def hasNext: Boolean = named(it.hasNext)
        def next(): org.apache.spark.sql.Row = named(it.next())
      }
    }(org.apache.spark.sql.Encoders.row(df.schema))
  }

  /** Committed (vec_id, list_id) rows + the derived coverage
    * fingerprint + the (single, asserted) choice fingerprint + the
    * resolved generation dir — of the LIVE generation, resolved ONCE
    * here: the returned frame reads concrete `gen-<k>/batch-*` paths,
    * so a serve built from it stays pinned to this generation for its
    * lifetime even if a rebuild swaps the pointer underneath (the v4
    * availability contract). A missing dir under the CURRENT pointer
    * is a fresh, never-appended generation (the pointer commits
    * before the first append creates the dir), never an expired one —
    * retention cannot sweep the newest pointer's generation. */
  private def readIndex(s: SparkSession, root: String)
      : (DataFrame, (Long, Long), Option[(Long, Long)], Option[String]) = {
    val empty = (s.createDataFrame(
      s.sparkContext.emptyRDD[org.apache.spark.sql.Row], Schema),
      (0L, 0L), Option.empty[(Long, Long)], Option.empty[String])
    val indexDir = currentListsDir(s, root).getOrElse(return empty)
    val (_, dirs) = graft.sources.AppendLog.state(s, indexDir)
    if (dirs.isEmpty) return empty
    val fps = dirs.map(b => readMarker(s, s"$indexDir/$b/_fp"))
    val cov = (fps.map(_._1).sum, fps.map(_._2).reduce(_ ^ _))
    val choices = dirs.map(b => readMarker(s, s"$indexDir/$b/_choice"))
      .distinct
    if (choices.length > 1) throw new IllegalStateException(
      s"ann index at $indexDir mixes batches assigned under " +
        s"${choices.length} different choice artifacts — every batch " +
        "must be assigned with the same centroids; rebuild the index " +
        "after retuning")
    (s.read.parquet(dirs.map(b => s"$indexDir/$b"): _*),
      cov, choices.headOption, Some(indexDir))
  }

  /** Serve the held-out query set from the persisted lists: refuses an
    * absent/stale choice artifact ([[Similarity.annFamilySearchFrom]]'s
    * gates), an index assigned under a different artifact, and an
    * index whose coverage fingerprint does not match the live corpus.
    * Row-identical to the fresh-assignment serve (spec-pinned). */
  def search(s: SparkSession, d: String, stashDir: String,
      indexDir: String): DataFrame = {
    val fp = Similarity.corpusFingerprint(s, d)
    val art = AnnChoice.read(s, stashDir) match {
      case None => throw new IllegalStateException(
        s"no ANN choice artifact at $stashDir — run " +
          "annFamilyTunePersist first (tune-once/serve-many)")
      case Some(a) if !a.matches(fp) => throw new IllegalStateException(
        s"stale ANN choice artifact at $stashDir: tuned on " +
          s"(count=${a.fpCount}, xor=${a.fpXor}), corpus is " +
          s"(count=${fp._1}, xor=${fp._2}) — re-run annFamilyTunePersist")
      case Some(a) => a
    }
    searchWith(s, d, fp, art, indexDir)
  }

  /** The AUTO path's serve — [[buildIfAbsent]] then [[searchWith]],
    * with one self-repair: a gate failure on the fingerprint-keyed
    * DEFAULT dir rebuilds it and retries ONCE. The default dir is a
    * DERIVED per-corpus artifact (never a table of record), so the
    * corruption classes the gates catch there are all rebuild-curable
    * — the concrete one (round-11 advice, medium): two sessions
    * cold-starting the same dir can both pass [[buildIfAbsent]]'s
    * emptiness check (it runs before any ingest lock), the slower
    * one's staggered appends land duplicate batches after the winner's
    * compact, coverage folds to ~2× the corpus, and without repair
    * every subsequent serve refuses forever — nothing on the auto path
    * ever deletes the dir. A CONCURRENT ingest's lock refusal is NOT
    * repaired (deleting a dir another session is mid-build in would
    * just trade corruptions): it propagates loudly and the next run
    * finds the winner's committed index. The explicit-dir [[search]]
    * keeps refusing loudly — a user-managed index is not ours to
    * delete. */
  private[llmdata] def searchAutoRepair(s: SparkSession, d: String,
      fp: (Long, Long), art: AnnChoice.Artifact,
      indexDir: String): DataFrame =
    withAutoRepair(s, d, art, indexDir)(
      () => searchWith(s, d, fp, art, indexDir))

  /** The auto path's build + one rebuild-and-retry, shared by every
    * registry entry point that reads the fingerprint-keyed default
    * dir (q212 serve, q214 audit). */
  private def withAutoRepair(s: SparkSession, d: String,
      art: AnnChoice.Artifact, indexDir: String)(
      body: () => DataFrame): DataFrame = {
    buildIfAbsent(s, d, indexDir, art)
    try body()
    catch {
      case e: IllegalStateException =>
        System.err.println("[ann-index] WARNING: default index dir " +
          s"failed its serve gates (${e.getMessage.takeWhile(_ != '\n')})" +
          " - rebuilding it (derived, fingerprint-keyed, safe)")
        // v4: repair = build a FRESH generation and swap, never delete
        // the root — the same serve-preserving arm syncTo uses, so even
        // the repair path honors the availability contract (an
        // in-flight serve pinned to an older healthy generation keeps
        // answering while the corrupted current one is superseded)
        rebuildGeneration(s, d, indexDir, art)
        body()
    }
  }

  /** [[search]] with the corpus fingerprint and choice artifact already
    * resolved (the registry path derives both once) — runs the index's
    * OWN two gates (choice consistency, coverage) and serves. */
  private[llmdata] def searchWith(s: SparkSession, d: String,
      fp: (Long, Long), art: AnnChoice.Artifact,
      indexDir: String): DataFrame = {
    val (lists, genDir) = gatedLists(s, fp, art, indexDir)
    raceHook("serve-gated")
    searchLists(s, d, art, lists, indexDir, genDir)
  }

  /** The committed lists AFTER both integrity gates (+ the resolved
    * generation dir, for the serve's expiry pre-flight) — every reader
    * of the index (serve, audit) goes through this, so no entry point
    * can read a stale or mixed-artifact index. */
  private def gatedLists(s: SparkSession, fp: (Long, Long),
      art: AnnChoice.Artifact, indexDir: String)
      : (DataFrame, Option[String]) = {
    val (lists, cov, choiceFp, genDir) = readIndex(s, indexDir)
    if (choiceFp.exists(_ != assignmentFp(art)))
      throw new IllegalStateException(
        s"ann index at $indexDir was assigned under a different choice " +
          "artifact than the one serving — rebuild the index after " +
          "retuning")
    if (cov != fp) throw new IllegalStateException(
      s"ann index at $indexDir does not cover this corpus: index " +
        s"fingerprint (count=${cov._1}, xor=${cov._2}) vs corpus " +
        s"(count=${fp._1}, xor=${fp._2}) — vectors the index never " +
        "ingested would be silent recall holes, not errors; ingest " +
        "the missing batches or rebuild")
    (lists, genDir)
  }

  /** Per-list occupancy of the persisted index — the ops-dashboard
    * audit a production ANN deployment watches (list imbalance is the
    * IVF failure mode: a mega-list degrades every probe that ranks
    * it; empty lists waste nprobe budget). Reads the GATED lists (same
    * two refusals as the serve), drops the [[ZeroList]] sentinel (no
    * probe can rank it), and aggregates — one shuffle keyed on
    * list_id, output bounded by the list count. Driver-checked via an
    * oracle that re-derives every vector's assignment from the
    * artifact's centroid literals ([[Similarity]] q214): hash-green
    * means the PERSISTED index content equals the assignment the
    * choice implies — an integrity gate one level stronger than the
    * coverage fingerprint (which proves the right VECTORS are present,
    * not that they sit in the right lists). */
  private[llmdata] def auditWith(s: SparkSession, fp: (Long, Long),
      art: AnnChoice.Artifact, indexDir: String): DataFrame = {
    val (lists, genDir) = gatedLists(s, fp, art, indexDir)
    val base = lists.filter(col("list_id") >= 0)
    // same mid-scan expiry naming as the serve: the audit reads the
    // full lists table, so it holds its generation even longer
    genDir.fold(base)(g => namedExpiryGuard(indexDir, g, base))
      .groupBy("list_id").agg(count(lit(1)).as("n_vecs"))
      .orderBy("list_id")
  }

  /** q214's registry body: build-if-absent + audit with the shared
    * one-rebuild self-repair. */
  private[llmdata] def auditAutoRepair(s: SparkSession, d: String,
      fp: (Long, Long), art: AnnChoice.Artifact,
      indexDir: String): DataFrame =
    withAutoRepair(s, d, art, indexDir)(
      () => auditWith(s, fp, art, indexDir))

  /** The probe plan over a resolved lists frame. Query features come
    * from an id-filtered embeddings read (pushdown — never a corpus
    * scan); candidates = broadcast probe table ⋈ lists, scored by an
    * id-join back into the embeddings table (candidate-bounded).
    *
    * Probe PUSHDOWN (round 12): a join alone still SCANS the whole
    * lists table and filters after — correct, but it reads every list
    * an index exists to avoid reading. The probed list-id set is
    * bounded by construction (|queries| × nprobe for IVF, |queries| ×
    * Hamming-ball size for LSH — ≤ a few hundred ids, never
    * data-dependent), so it collects to the driver (bounded,
    * documented — the IVF-training/q211-artifact class of collect) and
    * pushes into the parquet scan as a `list_id IN (...)` source
    * filter. With [[compact]] writing the lists GLOBALLY SORTED by
    * list_id, parquet min/max row-group stats then prune every
    * unprobed list at the SCAN: serve I/O is probed-lists-bounded,
    * not index-bounded — at 100 TB the difference between reading an
    * index and reading a table. Semantics-preserving by construction:
    * the equi-join on list_id keeps only probed ids anyway
    * (AnnIndexSpec parity pins it). */
  private def searchLists(s: SparkSession, d: String,
      art: AnnChoice.Artifact, lists: DataFrame, root: String,
      genDir: Option[String]): DataFrame = {
    val qRaw = graft.Tables.embeddings(s, d)
      .filter(col("vec_id") >= 100 && col("vec_id") < 120)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("mx", array_max(transform(col("v"), x => abs(x))))
      .filter(col("mx") > 0)
      .withColumn("nrm", sqrt(Similarity.dot(col("v"), col("v"))))
      .withColumn("b8", Similarity.signBucket(col("v")))
      .withColumn("qi", transform(col("v"),
        x => Similarity.quantizeInt8(x, col("mx")).cast("double")))
    // per-query probed list ids under the chosen config
    val probes: DataFrame =
      if (art.family == "lsh") {
        val (p, r) = (art.p1, art.p2)
        qRaw.select(col("vec_id").as("q_id"), col("v").as("qv"),
            col("nrm").as("qn"), col("b8").as("qb8"))
          .withColumn("planes", lit(p)).withColumn("radius", lit(r))
          .withColumn("pl", expr(
            "filter(sequence(0, 255), b -> b < shiftleft(1, planes) " +
              "AND bit_count(b ^ pmod(qb8, shiftleft(1, planes))) " +
              "<= radius)"))
          .select(col("q_id"), col("qv"), col("qn"),
            explode(col("pl")).as("pl0"))
          .select(col("q_id"), col("qv"), col("qn"),
            col("pl0").cast("long").as("list_id"))
      } else {
        val qt = art.quants.find(_.nlists == art.p1).get
        val centScore = (c: Column) =>
          Similarity.dot(c.getField("_1"), col("qi")) /
            sqrt(c.getField("_2"))
        qRaw
          .withColumn("ranked", sort_array(arrays_zip(
            transform(qt.lit, c => -centScore(c)).as("neg"),
            sequence(lit(0), lit(qt.nlists - 1)).as("cid"))))
          .select(col("vec_id").as("q_id"), col("v").as("qv"),
            col("nrm").as("qn"),
            explode(expr(s"transform(slice(ranked, 1, " +
              s"least(${art.p2}, ${qt.nlists})), p -> p.cid)"))
              .as("pc0"))
          .select(col("q_id"), col("qv"), col("qn"),
            col("pc0").cast("long").as("list_id"))
      }
    // bounded collect (scaladoc above): the probe table — cardinality
    // ≤ |queries| × probes-per-query, independent of the corpus — is
    // collected ONCE (round-12 advice: the first cut collected only
    // the distinct ids and re-evaluated the probe plan inside the
    // join, paying probe derivation twice); the distinct list ids
    // become a source filter the parquet scan can prune on, and the
    // collected rows themselves seed the broadcast side
    val probeRows = probes.collect().toSeq
    // the serve's FIRST ACTION just ran — pre-flight the pinned
    // generation now (round 14): a rebuild+expiry landing between the
    // gates and this action would otherwise surface as an executor
    // read error on the lists scan below, far from its cause
    genDir.foreach(g => preflightGeneration(s, root, g))
    val probedIds = probeRows.map(_.getLong(3)).distinct
    // guard the lists scan itself: a sweep landing AFTER the
    // pre-flight above, mid-scan, renames at the executor instead of
    // dying as a raw read error (round 15; the guard sits above the
    // pushed-down isin filter, so the probed-lists scan pruning is
    // untouched)
    val probed = lists.filter(col("list_id").isin(probedIds: _*))
    val cand = genDir.fold(probed)(g => namedExpiryGuard(root, g, probed))
      .join(broadcast(s.createDataFrame(
          s.sparkContext.parallelize(probeRows, 1), probes.schema)),
        Seq("list_id")).filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("qv"), col("qn"), col("vec_id"))
    // candidate-bounded exact scoring: candidates join the embeddings
    // table by id (the IncrementalLsh re-read-candidates-only shape)
    val vecs = graft.Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("bv"))
      .withColumn("bnrm", sqrt(Similarity.dot(col("bv"), col("bv"))))
    val rankW = Window.partitionBy("q_id")
      .orderBy(col("cos").desc, col("n_id"))
    cand.join(vecs, "vec_id")
      .select(col("q_id"), col("vec_id").as("n_id"),
        (Similarity.dot(col("qv"), col("bv")) /
          (col("qn") * col("bnrm"))).as("cos"))
      .withColumn("rn", row_number().over(rankW))
      .filter(col("rn") <= 3)
      .select(col("q_id"), col("rn").cast("int").as("rank"),
        col("n_id"), lit(art.family).as("family"),
        lit(art.p1).as("p1"), lit(art.p2).as("p2"))
      .orderBy("q_id", "rank")
  }
}
