package graft.llmdata

import org.apache.spark.sql.functions._

/** Gates for the format-v4 generation-versioned index layout
  * (round 13, closing the round-12 verdict's one availability gap): a
  * rebuild must never take the serve offline. A serve constructed
  * before the rebuild pins its generation (concrete paths) and keeps
  * answering its original rows; the first serve after the pointer
  * swap answers from the new generation; the streaming replay mark
  * survives the swap; retention keeps exactly current + one
  * superseded generation; and a pre-v4 in-place layout refuses with
  * the migration hint instead of being reinterpreted. */
class AnnIndexGenerationSpec extends graft.SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def tempDir(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private def raw() = graft.Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("embedding"))

  // an artifact whose ASSIGNMENT differs from `a` but which still
  // serves correctly — forces syncTo's rebuild arm WITHOUT touching
  // the corpus files (an in-flight serve's corpus read must stay
  // valid, so the availability claim is tested in isolation)
  private def retunedFrom(a: AnnChoice.Artifact,
      bump: Double): AnnChoice.Artifact =
    if (a.family == "lsh") a.copy(p1 = a.p1 + bump.toInt)
    else a.copy(quants = a.quants.map(q =>
      q.copy(qcents = q.qcents.map(_.map(_ + bump)))))

  private def genDirs(idx: String): Set[String] =
    Option(new java.io.File(idx).listFiles()).toSeq.flatten
      .map(_.getName).filter(_.startsWith("gen-")).toSet

  test("a serve pinned before a rebuild keeps answering; the post-swap serve answers from the new generation") {
    val stash = tempDir("ann-gen-stash-")
    val idx = tempDir("ann-gen-idx-")
    assert(AnnIndex.syncTo(spark, sf, stash, idx)._2 == "rebuilt")
    assert(AnnIndex.currentListsDir(spark, idx)
      .exists(_.endsWith("/gen-1")))
    // the in-flight serve: constructed (generation resolved, gates
    // passed, probes collected) BEFORE the rebuild lands
    val pinned = AnnIndex.search(spark, sf, stash, idx)
    val expected = pinned.collect().toSeq
    assert(expected.nonEmpty)
    // a retune: new artifact, same corpus — syncTo must rebuild
    val art = AnnChoice.read(spark, stash).get
    val stash2 = tempDir("ann-gen-stash2-")
    AnnChoice.persist(spark, stash2, retunedFrom(art, 1.0))
    assert(AnnIndex.syncTo(spark, sf, stash2, idx) == ("fresh", "rebuilt"))
    // the swap landed: pointer names gen-2, gen-1 is RETAINED for
    // in-flight serves (the v4 availability contract)
    assert(AnnIndex.currentListsDir(spark, idx)
      .exists(_.endsWith("/gen-2")))
    assert(genDirs(idx) == Set("gen-1", "gen-2"))
    // the pinned serve still answers its original rows — under the
    // pre-v4 in-place rebuild this collect hit deleted files
    assert(pinned.collect().toSeq == expected,
      "a serve racing a rebuild must answer from its pinned generation")
    // and the next serve resolves the NEW generation, row-identical
    // to the fresh-assignment serve under the retuned artifact
    val served = AnnIndex.search(spark, sf, stash2, idx).collect()
    val fresh = Similarity.annFamilySearchFrom(spark, sf, stash2).collect()
    assert(served.nonEmpty && served.toSeq == fresh.toSeq)
  }

  test("retention: a second rebuild expires the oldest generation, keeping current + one superseded") {
    val stash = tempDir("ann-gen-stash-")
    val idx = tempDir("ann-gen-idx-")
    AnnIndex.syncTo(spark, sf, stash, idx)
    val art = AnnChoice.read(spark, stash).get
    for ((bump, expectGens) <- Seq(
        (1.0, Set("gen-1", "gen-2")),
        (2.0, Set("gen-2", "gen-3")))) {
      val stashN = tempDir("ann-gen-stashN-")
      AnnChoice.persist(spark, stashN, retunedFrom(art, bump))
      assert(AnnIndex.syncTo(spark, sf, stashN, idx)._2 == "rebuilt")
      assert(genDirs(idx) == expectGens,
        s"after the bump-$bump rebuild the retained generations must " +
          s"be $expectGens, got ${genDirs(idx)}")
    }
  }

  test("the streaming replay mark survives the swap; a new lineage refuses; clearStreamMark is the escape hatch") {
    val stash = tempDir("ann-gen-stash-")
    Similarity.annFamilyTunePersist(spark, sf, stash)
    val art = AnnChoice.read(spark, stash).get
    val idx = tempDir("ann-gen-idx-")
    val maxId = raw().agg(max("vec_id")).head().getLong(0)
    val first = raw().filter(col("vec_id") <= maxId / 2)
    graft.streaming.StreamingAnnIndexMaintenance
      .ingestBatch(idx, art)(first, 0L)
    graft.streaming.StreamingAnnIndexMaintenance
      .ingestBatch(idx, art)(raw().filter(col("vec_id") > maxId / 2), 1L)
    assert(AnnIndex.maxStreamBatchId(spark, idx).contains(1L))
    // retune-rebuild (corpus untouched): the mark must carry into the
    // new generation — the rebuilt index covers everything the old
    // lineage delivered, so its replays must still read as committed
    val stash2 = tempDir("ann-gen-stash2-")
    AnnChoice.persist(spark, stash2, retunedFrom(art, 1.0))
    assert(AnnIndex.syncTo(spark, sf, stash2, idx)._2 == "rebuilt")
    assert(AnnIndex.maxStreamBatchId(spark, idx).contains(1L),
      "the rebuild must carry the replay high-water mark")
    // a stale replay of the old lineage's last batch: skipped
    val lists = AnnIndex.currentListsDir(spark, idx).get
    val n0 = graft.sources.AppendLog.state(spark, lists)._2.length
    graft.streaming.StreamingAnnIndexMaintenance
      .ingestBatch(idx, retunedFrom(art, 1.0))(first, 1L)
    assert(graft.sources.AppendLog.state(spark, lists)._2.length == n0,
      "a replayed id must stay a no-op across the swap")
    // a NEW checkpoint lineage (id 0 against mark 1) refuses loudly
    val e = intercept[IllegalStateException] {
      graft.streaming.StreamingAnnIndexMaintenance
        .ingestBatch(idx, retunedFrom(art, 1.0))(first, 0L)
    }
    assert(e.getMessage.contains("clearStreamMark"), s"got: $e")
    // the deliberate escape hatch: clearing the mark re-opens ingest
    AnnIndex.clearStreamMark(spark, idx)
    assert(AnnIndex.maxStreamBatchId(spark, idx).isEmpty)
  }

  test("a crashed rebuild's orphan generation: ignored by readers, numbered past, swept by the next rebuild") {
    val stash = tempDir("ann-gen-stash-")
    val idx = tempDir("ann-gen-idx-")
    AnnIndex.syncTo(spark, sf, stash, idx) // live = gen-1
    val before = AnnIndex.search(spark, sf, stash, idx).collect().toSeq
    // a rebuild that died after building but before the pointer commit
    // leaves an unreferenced gen dir — simulate one
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(idx, "gen-2"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(idx, "gen-2", "manifest-1"),
      "batch-1".getBytes("UTF-8"))
    // readers resolve the POINTER, never the highest dir: unaffected
    assert(AnnIndex.currentListsDir(spark, idx)
      .exists(_.endsWith("/gen-1")))
    assert(AnnIndex.search(spark, sf, stash, idx).collect().toSeq
      == before)
    // the next rebuild numbers PAST the orphan (never collides with
    // it), retains the genuinely-previous gen-1 for in-flight serves,
    // and sweeps the orphan — not the heuristic that would have kept
    // the orphan and deleted gen-1
    val stash2 = tempDir("ann-gen-stash2-")
    AnnChoice.persist(spark, stash2,
      retunedFrom(AnnChoice.read(spark, stash).get, 1.0))
    assert(AnnIndex.syncTo(spark, sf, stash2, idx)._2 == "rebuilt")
    assert(AnnIndex.currentListsDir(spark, idx)
      .exists(_.endsWith("/gen-3")))
    assert(genDirs(idx) == Set("gen-1", "gen-3"),
      s"orphan swept, previous retained — got ${genDirs(idx)}")
  }

  test("status reports every generation with live flag, batch counts, coverage and mark — and never throws on a half-built orphan") {
    val stash = tempDir("ann-gen-stash-")
    val idx = tempDir("ann-gen-idx-")
    AnnIndex.syncTo(spark, sf, stash, idx) // live = gen-1, compacted
    // a stream-marked delta batch + a half-built orphan beside it
    graft.streaming.StreamingAnnIndexMaintenance.ingestBatch(
      idx, AnnChoice.read(spark, stash).get)(
      raw().limit(0), 7L) // empty batch: marks without changing coverage
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(idx, "gen-9"))
    val st = AnnIndex.status(spark, idx).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(st.keySet == Set("gen-1", "gen-9"))
    assert(st("gen-1").getBoolean(1) && !st("gen-9").getBoolean(1))
    assert(st("gen-1").getInt(2) == 2, "compacted + delta batch")
    val fp = Similarity.corpusFingerprint(spark, sf)
    assert(st("gen-1").getLong(3) == fp._1 &&
      st("gen-1").getLong(4) == fp._2,
      "status coverage must fold to the corpus fingerprint")
    assert(st("gen-1").getLong(5) == 7L, "stream mark surfaced")
    assert(st("gen-9").isNullAt(3) && st("gen-9").getInt(2) == 0,
      "an orphan reports empty, never throws")
  }

  test("a pre-v4 in-place layout refuses with the migration hint") {
    val idx = tempDir("ann-gen-legacy-")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(idx, "manifest-1"),
      "batch-1".getBytes("UTF-8"))
    val stash = tempDir("ann-gen-stash-")
    Similarity.annFamilyTunePersist(spark, sf, stash)
    val e = intercept[IllegalStateException] {
      AnnIndex.search(spark, sf, stash, idx)
    }
    assert(e.getMessage.contains("pre-v4"),
      s"a legacy layout must refuse with the migration hint, got: $e")
  }
}
