package graft.llmdata

import org.apache.spark.sql.functions._

/** Gates for the drift-triggered re-tune (round-11 stretch — the
  * artifact loop closed: the stash refuses drift, q136 measures it,
  * `refreshIfDrifted` now ACTS on it). Load-bearing properties, each
  * pinned on the training-call counter because training is eager and
  * driver-side (no plan shape can see it):
  *
  *  - fresh corpus → "fresh", ZERO training, zero stash writes;
  *  - fingerprint moved but distribution did not (same-distribution
  *    ingest) → "recertified", ZERO training, and the serve gate opens
  *    back up;
  *  - real distribution drift → "retuned", EXACTLY ONE sweep (the same
  *    counter delta a cold tune costs), and the serve stays green
  *    through the swap. */
class AnnRefreshSpec extends graft.SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def tempDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** A mutable corpus: sf0.001's embeddings copied (optionally
    * transformed) into a fresh dir Tables.embeddings can read. */
  private def corpusCopy(transform: org.apache.spark.sql.DataFrame =>
      org.apache.spark.sql.DataFrame): String = {
    val dir = tempDir("ann-refresh-corpus-")
    transform(graft.Tables.embeddings(spark, sf))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("fresh corpus: no retrain, no write; drifted distribution: exactly one retrain, serve green through the swap") {
    val corpus = corpusCopy(identity)
    val stash = tempDir("ann-refresh-stash-")
    // cold tune — measure what ONE sweep costs on the counter
    val before = Similarity.trainCalls.get()
    Similarity.annFamilyTunePersist(spark, corpus, stash)
    val oneSweep = Similarity.trainCalls.get() - before
    assert(oneSweep > 0, "a cold sweep trains quantizers")

    // fresh: fingerprint matches — nothing happens
    val t0 = Similarity.trainCalls.get()
    assert(Similarity.refreshIfDrifted(spark, corpus, stash) == "fresh")
    assert(Similarity.trainCalls.get() == t0, "fresh must train nothing")

    // drift the distribution in place: shift every coordinate far off
    // the trained centroids (new fingerprint AND new geometry)
    graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"),
        expr("transform(CAST(embedding AS ARRAY<DOUBLE>), " +
          "x -> CAST(-3.0 * x + 7.5 AS FLOAT))").as("embedding"))
      .write.mode("overwrite").parquet(s"$corpus/embeddings.parquet")
    val t1 = Similarity.trainCalls.get()
    assert(Similarity.refreshIfDrifted(spark, corpus, stash) == "retuned")
    assert(Similarity.trainCalls.get() - t1 == oneSweep,
      "a drifted corpus must cost exactly one sweep, no more")
    // serve green through the swap: the stash's latest artifact now
    // matches the drifted corpus
    assert(Similarity.annFamilySearchFrom(spark, corpus, stash)
      .count() > 0, "post-retune serve must not refuse")
  }

  test("a pre-v2 stash (no ref column) reads, serves, and is honestly NOT re-certifiable") {
    val corpus = corpusCopy(identity)
    val stash = tempDir("ann-refresh-legacy-")
    // write a v1-format artifact: the v2 schema minus `ref`, committed
    // through the same AppendLog protocol old code used
    val fp = Similarity.corpusFingerprint(spark, corpus)
    val scratch = tempDir("ann-refresh-scratch-")
    Similarity.annFamilyTunePersist(spark, corpus, scratch)
    val real = AnnChoice.read(spark, scratch).get // real quants to copy
    val v1Schema = org.apache.spark.sql.types.StructType(
      AnnChoice.Schema.fields.filterNot(_.name == "ref"))
    graft.sources.AppendLog.append(spark, stash) { (v, _, batch) =>
      val row = org.apache.spark.sql.Row(fp._1, fp._2, real.family,
        real.p1, real.p2,
        real.quants.map(q => org.apache.spark.sql.Row(
          q.idx, q.nlists, q.qcents, q.ncs)), v + 1)
      val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
      rows.add(row)
      spark.createDataFrame(rows, v1Schema)
        .coalesce(1).write.parquet(s"$stash/$batch")
    }
    val art = AnnChoice.read(spark, stash).get
    assert(art.ref.isEmpty, "a legacy artifact carries no ref")
    assert(Similarity.annFamilySearchFrom(spark, corpus, stash)
      .count() > 0, "a legacy stash must still SERVE a matching corpus")
    assert(Similarity.refreshIfDrifted(spark, corpus, stash) == "fresh")
    // a drifted corpus against a legacy artifact cannot re-certify
    // (no reference distribution) — centroidDrift says so explicitly
    assert(Similarity.centroidDrift(spark, corpus,
      art.copy(fpXor = art.fpXor ^ 1L)).isPosInfinity,
      "no ref ⇒ not certifiable ⇒ refresh always re-tunes on drift")
  }

  test("a retune into a pre-v2 stash restores re-certifiability: the mixed-schema read keeps ref") {
    // round-11 advice (low): after refreshIfDrifted retunes into a
    // ref-less v1 stash the batches have MIXED schemas; without
    // mergeSchema Spark may resolve the read to the v1 footer and
    // silently drop the new artifact's ref — every future drifted
    // refresh then pays a full sweep despite re-certification data
    // existing on disk.
    val corpus = corpusCopy(identity)
    val stash = tempDir("ann-refresh-mixed-")
    // fabricate a v1 (ref-less) batch with a STALE fingerprint: the
    // refresh never serves it, so empty quants suffice
    val v1Schema = org.apache.spark.sql.types.StructType(
      AnnChoice.Schema.fields.filterNot(_.name == "ref"))
    graft.sources.AppendLog.append(spark, stash) { (v, _, batch) =>
      val row = org.apache.spark.sql.Row(-1L, -1L, "lsh", 8, 1,
        Seq.empty[org.apache.spark.sql.Row], v + 1)
      val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
      rows.add(row)
      spark.createDataFrame(rows, v1Schema)
        .coalesce(1).write.parquet(s"$stash/$batch")
    }
    // no ref, fingerprint moved → the refresh re-tunes (v2 batch lands
    // BESIDE the v1 batch: the stash is now mixed-schema)
    assert(Similarity.refreshIfDrifted(spark, corpus, stash) == "retuned")
    val art = AnnChoice.read(spark, stash).get
    assert(art.ref.nonEmpty,
      "the retuned v2 artifact's ref must survive the mixed-schema read")
    assert(Similarity.centroidDrift(spark, corpus, art) == 0.0,
      "re-certifiability restored: same corpus drifts exactly 0")
  }

  test("a (cid,dim) key present in only one epoch is drift, not a NoSuchElementException") {
    // round-11 advice (low): unguarded ref(k)/cur(k) lookups threw
    // when the per-cid dim key sets differed between tune and refresh
    // (e.g. embedding dimensionality changed) — refreshIfDrifted
    // crashed instead of honestly re-tuning.
    val corpus = corpusCopy(identity)
    val stash = tempDir("ann-refresh-dims-")
    Similarity.annFamilyTunePersist(spark, corpus, stash)
    val art = AnnChoice.read(spark, stash).get
    assert(art.ref.nonEmpty)
    val dim0 = art.ref.head.dim
    // ref missing a dim the live corpus has
    val missing = art.copy(ref = art.ref.filterNot(_.dim == dim0))
    assert(Similarity.centroidDrift(spark, corpus, missing)
      .isPosInfinity, "a dim the ref lacks is drift by definition")
    // ref carrying a dim the live corpus lacks
    val extra = art.copy(ref = art.ref :+
      AnnChoice.RefStat(art.ref.head.cid, 9999, 0L, art.ref.head.n))
    assert(Similarity.centroidDrift(spark, corpus, extra)
      .isPosInfinity, "a dim the corpus lacks is drift by definition")
  }

  test("same-distribution ingest recertifies: zero training, serve gate reopens") {
    val corpus = corpusCopy(identity)
    val stash = tempDir("ann-refresh-stash-")
    Similarity.annFamilyTunePersist(spark, corpus, stash)
    val artBefore = AnnChoice.read(spark, stash).get
    // append an exact copy of every vector under fresh ids (well clear
    // of the 0–219 tuning/validation/query ranges): the fingerprint
    // moves, every list's induced mean does not
    val dup = graft.Tables.embeddings(spark, corpus)
      .select((col("vec_id") + 100000L).as("vec_id"), col("label"),
        col("embedding"))
    dup.unionByName(graft.Tables.embeddings(spark, corpus))
      .write.mode("overwrite").parquet(s"$corpus/embeddings2.parquet")
    // parquet dirs can't be overwritten while read — swap via rename
    val fs = new java.io.File(s"$corpus/embeddings.parquet")
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(deleteRec)); f.delete()
    }
    deleteRec(fs)
    assert(new java.io.File(s"$corpus/embeddings2.parquet")
      .renameTo(fs), "fixture swap must succeed")
    // the old artifact must now refuse (fingerprint moved) ...
    intercept[IllegalStateException] {
      Similarity.annFamilySearchFrom(spark, corpus, stash)
    }
    // ... and the refresh recertifies WITHOUT training
    val t0 = Similarity.trainCalls.get()
    assert(Similarity.refreshIfDrifted(spark, corpus, stash)
      == "recertified")
    assert(Similarity.trainCalls.get() == t0,
      "a same-distribution ingest must not pay a sweep")
    val artAfter = AnnChoice.read(spark, stash).get
    assert(artAfter.family == artBefore.family &&
      artAfter.p1 == artBefore.p1 && artAfter.p2 == artBefore.p2 &&
      artAfter.quants == artBefore.quants,
      "recertification carries the choice and quantizers unchanged")
    assert(Similarity.annFamilySearchFrom(spark, corpus, stash)
      .count() > 0, "post-recertify serve must not refuse")
  }
}
