package graft.llmdata

import org.apache.spark.sql.functions._

/** Gates for the rebuild-vs-live-writer races and the retention knob
  * (round 14 — the advice's replay-mark race plus the verdict's
  * expired-generation items). The interleavings are injected
  * deterministically through [[AnnIndex.raceHook]], so each race is a
  * REAL racing writer at the exact window, not a thread-timing hope:
  *
  *   - a micro-batch committed to the old generation DURING a rebuild
  *     advances the replay mark; the rebuild re-reads it under the old
  *     generation's ingest lock and re-stamps the new generation, so a
  *     post-swap crash-recovery replay of that batch stays a no-op
  *     instead of double-ingesting and bricking the coverage gate;
  *   - an ingest that resolved the live generation but lost the race
  *     to a pointer swap refuses loudly on the liveness recheck
  *     instead of stranding rows in a superseded generation;
  *   - `keepGenerations` sizes the availability horizon: a serve
  *     pinned before k-1 rebuilds still answers, and the k-th expiry
  *     sweeps its generation;
  *   - a generation expiring between a serve's integrity gates and its
  *     first action refuses with the NAMED expired-generation message
  *     (pointing at the knob), not an executor read error. */
class AnnIndexRebuildRaceSpec extends graft.SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def tempDir(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private def raw() = graft.Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("embedding"))

  // an artifact whose ASSIGNMENT differs but which still serves
  // correctly — forces syncTo's rebuild arm without touching the
  // corpus (same device as AnnIndexGenerationSpec)
  private def retunedFrom(a: AnnChoice.Artifact,
      bump: Double): AnnChoice.Artifact =
    if (a.family == "lsh") a.copy(p1 = a.p1 + bump.toInt)
    else a.copy(quants = a.quants.map(q =>
      q.copy(qcents = q.qcents.map(_.map(_ + bump)))))

  private def genDirs(idx: String): Set[String] =
    Option(new java.io.File(idx).listFiles()).toSeq.flatten
      .map(_.getName).filter(_.startsWith("gen-")).toSet

  private def retunedStash(art: AnnChoice.Artifact,
      bump: Double): String = {
    val dir = tempDir("ann-race-stash-")
    AnnChoice.persist(spark, dir, retunedFrom(art, bump))
    dir
  }

  /** Installs a SELF-CLEARING hook at `point`, restoring the no-op
    * hook after `body` even on failure. */
  private def withHook[T](point: String)(action: => Unit)(body: => T): T = {
    AnnIndex.raceHook = p =>
      if (p == point) { AnnIndex.raceHook = _ => (); action }
    try body finally AnnIndex.raceHook = _ => ()
  }

  test("a micro-batch landing mid-rebuild advances the mark; the swap re-stamps it and its replay stays a no-op") {
    val stash = tempDir("ann-race-stash-")
    Similarity.annFamilyTunePersist(spark, sf, stash)
    val art = AnnChoice.read(spark, stash).get
    val idx = tempDir("ann-race-idx-")
    val maxId = raw().agg(max("vec_id")).head().getLong(0)
    graft.streaming.StreamingAnnIndexMaintenance
      .ingestBatch(idx, art)(raw().filter(col("vec_id") <= maxId / 2), 0L)
    graft.streaming.StreamingAnnIndexMaintenance
      .ingestBatch(idx, art)(raw().filter(col("vec_id") > maxId / 2), 1L)
    assert(AnnIndex.maxStreamBatchId(spark, idx).contains(1L))
    // the retune-rebuild, with micro-batch 2 (empty: marks without
    // changing coverage) landing AFTER the new generation is built
    // but BEFORE the pointer swap — the advice's exact window: the
    // pre-build mark capture saw 1, the old generation now says 2
    val stash2 = retunedStash(art, 1.0)
    withHook("rebuild-built") {
      graft.streaming.StreamingAnnIndexMaintenance
        .ingestBatch(idx, art)(raw().limit(0), 2L)
    } {
      assert(AnnIndex.syncTo(spark, sf, stash2, idx)._2 == "rebuilt")
    }
    assert(AnnIndex.currentListsDir(spark, idx)
      .exists(_.endsWith("/gen-2")))
    // the re-stamp: without the under-lock re-read the new generation
    // would carry mark 1 and batch 2's replay would double-ingest
    assert(AnnIndex.maxStreamBatchId(spark, idx).contains(2L),
      "the swap must re-stamp the mark a mid-build micro-batch advanced")
    val lists = AnnIndex.currentListsDir(spark, idx).get
    val n0 = graft.sources.AppendLog.state(spark, lists)._2.length
    graft.streaming.StreamingAnnIndexMaintenance
      .ingestBatch(idx, retunedFrom(art, 1.0))(
        raw().filter(col("vec_id") <= maxId / 2), 2L)
    assert(graft.sources.AppendLog.state(spark, lists)._2.length == n0,
      "a crash-recovery replay of the mid-build batch must be a no-op")
    // and the rebuilt generation still serves green (the empty
    // mid-build batch added no rows the corpus read missed)
    val served = AnnIndex.search(spark, sf, stash2, idx).collect()
    val fresh = Similarity.annFamilySearchFrom(spark, sf, stash2).collect()
    assert(served.nonEmpty && served.toSeq == fresh.toSeq)
  }

  test("a stream STARTING mid-rebuild (no prior mark) is re-stamped too — the None-to-Some transition") {
    val stash = tempDir("ann-race-stash-")
    val idx = tempDir("ann-race-idx-")
    // batch-only index: no streaming lineage, so the rebuild's
    // pre-build mark capture reads None
    assert(AnnIndex.syncTo(spark, sf, stash, idx)._2 == "rebuilt")
    assert(AnnIndex.maxStreamBatchId(spark, idx).isEmpty)
    val art = AnnChoice.read(spark, stash).get
    val stash2 = retunedStash(art, 1.0)
    // micro-batch 0 of a brand-new stream lands in the old generation
    // during the rebuild window: mark None → Some(0)
    withHook("rebuild-built") {
      graft.streaming.StreamingAnnIndexMaintenance
        .ingestBatch(idx, art)(raw().limit(0), 0L)
    } {
      assert(AnnIndex.syncTo(spark, sf, stash2, idx)._2 == "rebuilt")
    }
    assert(AnnIndex.maxStreamBatchId(spark, idx).contains(0L),
      "the swap must stamp a mark that APPEARED during the build")
    // the new lineage's replay of batch 0 is recognized post-swap
    val lists = AnnIndex.currentListsDir(spark, idx).get
    val n0 = graft.sources.AppendLog.state(spark, lists)._2.length
    graft.streaming.StreamingAnnIndexMaintenance
      .ingestBatch(idx, retunedFrom(art, 1.0))(raw().limit(0), 0L)
    assert(graft.sources.AppendLog.state(spark, lists)._2.length == n0,
      "the new lineage's replay must stay a no-op across the swap")
  }

  test("an ingest that lost the race to a pointer swap refuses on the liveness recheck; nothing commits to the superseded generation") {
    val stash = tempDir("ann-race-stash-")
    val idx = tempDir("ann-race-idx-")
    assert(AnnIndex.syncTo(spark, sf, stash, idx)._2 == "rebuilt")
    val art = AnnChoice.read(spark, stash).get
    val oldDir = AnnIndex.currentListsDir(spark, idx).get
    assert(oldDir.endsWith("/gen-1"))
    val n0 = graft.sources.AppendLog.state(spark, oldDir)._2.length
    val stash2 = retunedStash(art, 1.0)
    val e = intercept[IllegalStateException] {
      withHook("ingest-resolved") {
        // the racing rebuild: swaps the pointer to gen-2 while the
        // outer ingest holds a resolved-but-unlocked gen-1
        assert(AnnIndex.syncTo(spark, sf, stash2, idx)._2 == "rebuilt")
      } {
        AnnIndex.ingest(spark, idx, raw().limit(0), art)
      }
    }
    assert(e.getMessage.contains("superseded generation"), s"got: $e")
    assert(graft.sources.AppendLog.state(spark, oldDir)._2.length == n0,
      "the refused ingest must not have committed a manifest")
    // the index is undamaged: the post-swap serve answers green
    val served = AnnIndex.search(spark, sf, stash2, idx).collect()
    assert(served.nonEmpty)
  }

  test("keepGenerations=3: a serve pinned before TWO rebuilds still answers; the third expiry sweeps its generation") {
    val stash = tempDir("ann-race-stash-")
    val idx = tempDir("ann-race-idx-")
    assert(AnnIndex.syncTo(spark, sf, stash, idx,
      keepGenerations = 3)._2 == "rebuilt")
    val art = AnnChoice.read(spark, stash).get
    val pinned = AnnIndex.search(spark, sf, stash, idx)
    val expected = pinned.collect().toSeq
    assert(expected.nonEmpty)
    assert(AnnIndex.syncTo(spark, sf, retunedStash(art, 1.0), idx,
      keepGenerations = 3)._2 == "rebuilt")
    assert(AnnIndex.syncTo(spark, sf, retunedStash(art, 2.0), idx,
      keepGenerations = 3)._2 == "rebuilt")
    assert(genDirs(idx) == Set("gen-1", "gen-2", "gen-3"),
      s"k=3 must retain the pinned generation across two rebuilds, " +
        s"got ${genDirs(idx)}")
    assert(pinned.collect().toSeq == expected,
      "under keepGenerations=3 a serve must survive two rebuilds")
    assert(AnnIndex.syncTo(spark, sf, retunedStash(art, 3.0), idx,
      keepGenerations = 3)._2 == "rebuilt")
    assert(genDirs(idx) == Set("gen-2", "gen-3", "gen-4"),
      s"the k-th rebuild sweeps the oldest, got ${genDirs(idx)}")
  }

  test("a generation expiring between the serve's gates and its first action refuses with the named expired-generation message") {
    val stash = tempDir("ann-race-stash-")
    val idx = tempDir("ann-race-idx-")
    assert(AnnIndex.syncTo(spark, sf, stash, idx)._2 == "rebuilt")
    val art = AnnChoice.read(spark, stash).get
    val e = intercept[IllegalStateException] {
      withHook("serve-gated") {
        // two rebuilds at the default keepGenerations=2: the serve's
        // pinned gen-1 is expired by the second sweep
        assert(AnnIndex.syncTo(spark, sf, retunedStash(art, 1.0),
          idx)._2 == "rebuilt")
        assert(AnnIndex.syncTo(spark, sf, retunedStash(art, 2.0),
          idx)._2 == "rebuilt")
        assert(genDirs(idx) == Set("gen-2", "gen-3"))
      } {
        AnnIndex.search(spark, sf, stash, idx)
      }
    }
    assert(e.getMessage.contains("EXPIRED") &&
      e.getMessage.contains("keepGenerations"),
      s"expiry under a resolved serve must refuse NAMED, got: $e")
  }

  private def chainMessages(e: Throwable): Seq[String] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq

  test("a generation swept MID-SCAN (after the pre-flight) surfaces the named expired-generation message, not a raw read error") {
    val stash = tempDir("ann-race-stash-")
    val idx = tempDir("ann-race-idx-")
    assert(AnnIndex.syncTo(spark, sf, stash, idx)._2 == "rebuilt")
    val art = AnnChoice.read(spark, stash).get
    // construct the serve: search() runs the gates, the probe collect,
    // and the pre-flight NOW — all pass against the live gen-1 — and
    // returns a plan still pinned to gen-1's concrete batch paths.
    // `pinned` is NOT executed before the sweep: AQE caches a
    // materialized plan's query stages inside the Dataset, so a
    // pre-sweep collect would let the post-sweep one answer from the
    // first run's shuffle outputs without ever re-reading the swept
    // parquet (found building this spec); a sibling plan proves the
    // serve is green without touching pinned's stages
    val pinned = AnnIndex.search(spark, sf, stash, idx)
    assert(AnnIndex.search(spark, sf, stash, idx).collect().nonEmpty)
    // two rebuilds at keepGenerations=2 sweep gen-1 — landing AFTER
    // every pre-flight this serve will ever run (they already ran),
    // i.e. the round-14 residual: expiry between pre-flight and scan
    assert(AnnIndex.syncTo(spark, sf, retunedStash(art, 1.0),
      idx)._2 == "rebuilt")
    assert(AnnIndex.syncTo(spark, sf, retunedStash(art, 2.0),
      idx)._2 == "rebuilt")
    assert(genDirs(idx) == Set("gen-2", "gen-3"))
    val e = intercept[Exception] { pinned.collect() }
    val msgs = chainMessages(e)
    assert(msgs.exists(m => m.contains("EXPIRED") &&
        m.contains("keepGenerations")),
      s"a mid-scan sweep must surface the NAMED refusal somewhere in " +
        s"the chain, got: ${msgs.mkString(" | ")}")
    // the cause is preserved for forensics: the original missing-file
    // failure sits below the named refusal
    assert(Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null)
        .exists(_.isInstanceOf[java.io.FileNotFoundException]),
      "the raw read failure must remain attached as the cause")
  }

  test("the swap's lock-retry timeout refuses REBUILD-SPECIFIC, never the crashed-ingest recovery text verbatim") {
    val stash = tempDir("ann-race-stash-")
    val idx = tempDir("ann-race-idx-")
    assert(AnnIndex.syncTo(spark, sf, stash, idx)._2 == "rebuilt")
    val lists = AnnIndex.currentListsDir(spark, idx).get
    // a live ingest legitimately holding the lock past the deadline —
    // the advice's case: AppendLog's refusal text instructs removing
    // the lock, which against a LIVE holder corrupts the manifest
    // protocol; the rebuild's timeout must say "verify first" instead
    val e = intercept[IllegalStateException] {
      graft.sources.AppendLog.withIngestLock(spark, lists) {
        AnnIndex.withIngestLockRetry(spark, lists, timeoutMs = 300)(())
      }
    }
    assert(e.getMessage.contains("SPARK_GRAFT_ANN_SWAP_WAIT_MS") &&
      e.getMessage.contains("VERIFY no ingest is running"),
      s"timeout must name the knob and the verify-first instruction, got: $e")
    assert(e.getCause != null &&
      e.getCause.getMessage.contains(".ingest-lock"),
      "the underlying lock refusal must remain attached as the cause")
  }
}
