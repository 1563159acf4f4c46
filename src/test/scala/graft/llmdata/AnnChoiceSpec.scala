package graft.llmdata

import graft.SparkEntry

/** Gates for the persisted ANN tuner choice (round-10: tune-once/
  * serve-many). The q210 sweep's validated choice persists through the
  * AppendLog manifest protocol and q211 serves from the artifact —
  * these pin the three load-bearing properties: a warm serve TRAINS
  * NOTHING, a stashed choice serves bit-identically to a fresh sweep's,
  * and a stale or absent artifact refuses loudly instead of silently
  * applying a config tuned on a different corpus. */
class AnnChoiceSpec extends graft.SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def tempDir(): String =
    java.nio.file.Files.createTempDirectory("ann-choice-spec-").toString

  test("warm q211 performs ZERO quantizer training and reproduces the cold run") {
    // first run: cold or warm depending on suite order — either way it
    // leaves the default stash populated for this corpus
    val first = SparkEntry.queries("q211_ann_family_search")(spark, sf)
      .collect()
    val trained = Similarity.trainCalls.get()
    val second = SparkEntry.queries("q211_ann_family_search")(spark, sf)
      .collect()
    assert(Similarity.trainCalls.get() == trained,
      "a warm-stash serve must not train quantizers — the sweep snuck " +
        "back into the serve path")
    assert(second.toSeq == first.toSeq,
      "stash-served results must equal the previous run's")
  }

  test("tune-persist writes the artifact; search-from serves identical rows probe-only") {
    val dir = tempDir()
    val grid = Similarity.annFamilyTunePersist(spark, sf, dir).collect()
    // the persisted grid is the q210 grid (same sweep, same corpus)
    val q210 = SparkEntry.queries("q210_ann_family_tuner")(spark, sf)
      .collect()
    assert(grid.toSeq == q210.toSeq)
    // artifact round-trip: the stored choice IS the grid's chosen row
    val art = AnnChoice.read(spark, dir).get
    val chosen = grid.filter(_.getBoolean(10)).head
    assert(art.family == chosen.getString(0) &&
      art.p1 == chosen.getInt(1) && art.p2 == chosen.getInt(2))
    assert(art.quants.nonEmpty &&
      art.quants.forall(q => q.qcents.nonEmpty && q.ncs.length == q.qcents.length))
    // serve-from: no training, rows identical to the registry's q211
    val trained = Similarity.trainCalls.get()
    val served = Similarity.annFamilySearchFrom(spark, sf, dir).collect()
    assert(Similarity.trainCalls.get() == trained,
      "annFamilySearchFrom must be probe-only")
    val q211 = SparkEntry.queries("q211_ann_family_search")(spark, sf)
      .collect()
    assert(served.toSeq == q211.toSeq,
      "a stashed choice must serve bit-identically to the registry path")
  }

  test("search-from refuses an absent stash loudly") {
    val e = intercept[IllegalStateException] {
      Similarity.annFamilySearchFrom(spark, sf, tempDir())
    }
    assert(e.getMessage.contains("no ANN choice artifact"),
      s"absent stash must name the tune-first contract, got: $e")
  }

  test("search-from refuses a drifted corpus loudly (stale-stash gate)") {
    val dir = tempDir()
    val fp = Similarity.corpusFingerprint(spark, sf)
    // an artifact tuned on a DIFFERENT corpus: same shape, wrong prints
    AnnChoice.persist(spark, dir, AnnChoice.Artifact(
      fp._1 + 1, fp._2 ^ 0x5aL, "lsh", 8, 1,
      Seq(Similarity.IvfQuant(0, 2,
        Seq(Seq.fill(64)(1.0), Seq.fill(64)(-1.0)),
        Seq(64.0, 64.0)))))
    val e = intercept[IllegalStateException] {
      Similarity.annFamilySearchFrom(spark, sf, dir)
    }
    assert(e.getMessage.contains("stale ANN choice artifact") &&
      e.getMessage.contains("drifted"),
      s"drift must be named, not served: $e")
  }

  test("retuning appends through the manifest protocol; readers take the latest") {
    val dir = tempDir()
    val quants = Seq(Similarity.IvfQuant(0, 2,
      Seq(Seq.fill(64)(1.0), Seq.fill(64)(-1.0)), Seq(64.0, 64.0)))
    AnnChoice.persist(spark, dir,
      AnnChoice.Artifact(1L, 2L, "lsh", 8, 1, quants))
    AnnChoice.persist(spark, dir,
      AnnChoice.Artifact(3L, 4L, "ivf", 2, 1, quants))
    val latest = AnnChoice.read(spark, dir).get
    assert(latest.fpCount == 3L && latest.family == "ivf",
      "the second tuning must supersede the first")
    val (v, batches) = graft.sources.AppendLog.state(spark, dir)
    assert(v == 2 && batches.length == 2,
      "each tuning is one committed immutable batch")
  }

  test("a held ingest lock degrades the registry persist to a warning, not a failure") {
    val dir = tempDir()
    val lock = java.nio.file.Paths.get(dir, ".ingest-lock")
    java.nio.file.Files.createFile(lock)
    val ok = AnnChoice.persistBestEffort(spark, dir,
      AnnChoice.Artifact(1L, 2L, "lsh", 8, 1,
        Seq(Similarity.IvfQuant(0, 1, Seq(Seq.fill(64)(1.0)), Seq(64.0)))))
    assert(!ok, "a locked stash must report not-persisted")
    assert(AnnChoice.read(spark, dir).isEmpty,
      "nothing may commit past a held lock")
  }

  test("stash root: fresh path created owner-only; a regular file at the root refuses loudly") {
    // round-11 advice (low): the old FileAlreadyExistsException branch
    // was dead (createDirectories throws it only for a NON-directory
    // path, where re-chmodding cannot help) and a swallowed
    // UnsupportedOperationException could leave the root uncreated on
    // non-POSIX filesystems.
    val base = java.nio.file.Files
      .createTempDirectory("ann-stash-root-").toString
    val fresh = s"$base/sub/root"
    assert(AnnChoice.ensureOwnerOnlyRoot(fresh) == fresh)
    val p = java.nio.file.Paths.get(fresh)
    assert(java.nio.file.Files.isDirectory(p), "root must exist")
    assert(java.nio.file.Files.getPosixFilePermissions(p)
      == java.nio.file.attribute.PosixFilePermissions
        .fromString("rwx------"), "root must be owner-only")
    // a root that exists as a regular FILE can never hold the stash:
    // loud, not a silent chmod of someone's file
    val asFile = s"$base/plainfile"
    java.nio.file.Files.createFile(java.nio.file.Paths.get(asFile))
    val e = intercept[IllegalStateException] {
      AnnChoice.ensureOwnerOnlyRoot(asFile)
    }
    assert(e.getMessage.contains("not a directory"))
  }
}
