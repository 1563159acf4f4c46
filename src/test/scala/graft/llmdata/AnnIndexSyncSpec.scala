package graft.llmdata

import org.apache.spark.sql.functions._

/** Gates for [[AnnIndex.syncTo]] — the composed production loop
  * (round 11): one call keeps choice AND index current against a live
  * corpus, and every decision is made by the same gates that refuse a
  * stale serve. Load-bearing properties:
  *
  *  - cold: one sweep, one build; unchanged corpus: total no-op;
  *  - append-only growth: the choice RE-CERTIFIES (zero training) and
  *    the index ingests ONLY the delta batch — the marker algebra
  *    proves coverage, old batches byte-untouched;
  *  - mutation (same ids, changed bytes): delta is empty, the index
  *    REBUILDS — degraded cost, never a silent recall hole;
  *  - after every outcome the index serve is row-identical to the
  *    fresh-assignment serve. */
class AnnIndexSyncSpec extends graft.SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def tempDir(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  private def corpusCopy(): String = {
    val dir = tempDir("ann-sync-corpus-")
    graft.Tables.embeddings(spark, sf)
      .write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def batchCount(idx: String): Int =
    graft.sources.AppendLog.state(spark, idx)._2.length

  private def serveParity(corpus: String, stash: String,
      idx: String): Unit = {
    val served = AnnIndex.search(spark, corpus, stash, idx).collect()
    val fresh = Similarity.annFamilySearchFrom(spark, corpus, stash)
      .collect()
    assert(served.nonEmpty && served.toSeq == fresh.toSeq,
      "index serve must stay row-identical to the fresh-assignment serve")
  }

  test("cold sync tunes + builds; unchanged corpus is a total no-op; serve parity holds") {
    val corpus = corpusCopy()
    val stash = tempDir("ann-sync-stash-")
    val idx = tempDir("ann-sync-idx-")
    assert(AnnIndex.syncTo(spark, corpus, stash, idx)
      == ("retuned", "rebuilt"))
    serveParity(corpus, stash, idx)
    val t0 = Similarity.trainCalls.get()
    val b0 = batchCount(idx)
    assert(AnnIndex.syncTo(spark, corpus, stash, idx) == ("fresh", "kept"))
    assert(Similarity.trainCalls.get() == t0 && batchCount(idx) == b0,
      "an in-sync corpus must train nothing and append nothing")
  }

  test("append-only growth: choice recertifies (zero training), index ingests ONLY the delta") {
    val corpus = corpusCopy()
    val stash = tempDir("ann-sync-stash-")
    val idx = tempDir("ann-sync-idx-")
    AnnIndex.syncTo(spark, corpus, stash, idx)
    val b0 = batchCount(idx)
    // same-distribution growth: every vector duplicated under fresh
    // ids well clear of the 0-219 tuning/validation/query ranges
    val cur = spark.read.parquet(s"$corpus/embeddings.parquet")
    cur.select((col("vec_id") + 100000L).as("vec_id"), col("label"),
        col("embedding"))
      .unionByName(cur)
      .write.parquet(s"$corpus/embeddings2.parquet")
    def swap(): Unit = {
      def deleteRec(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(deleteRec)); f.delete()
      }
      deleteRec(new java.io.File(s"$corpus/embeddings.parquet"))
      assert(new java.io.File(s"$corpus/embeddings2.parquet")
        .renameTo(new java.io.File(s"$corpus/embeddings.parquet")))
    }
    swap()
    val t0 = Similarity.trainCalls.get()
    assert(AnnIndex.syncTo(spark, corpus, stash, idx)
      == ("recertified", "delta"))
    assert(Similarity.trainCalls.get() == t0,
      "same-distribution growth must not pay a sweep")
    assert(batchCount(idx) == b0 + 1,
      "exactly ONE new batch — the delta — must append; old batches stay")
    serveParity(corpus, stash, idx)
  }

  test("mutation (same ids, changed bytes): delta is empty, the index rebuilds, serve parity holds") {
    val corpus = corpusCopy()
    val stash = tempDir("ann-sync-stash-")
    val idx = tempDir("ann-sync-idx-")
    AnnIndex.syncTo(spark, corpus, stash, idx)
    // scale ONE vector ×2: max-abs int8 quantization and the sign
    // bucket are scale-invariant, so assignment AND the drift
    // statistic are unchanged — but the raw bytes (and so the corpus
    // fingerprint) differ: the id-diff cannot see it, the coverage
    // fold can
    val cur = spark.read.parquet(s"$corpus/embeddings.parquet")
    cur.select(col("vec_id"), col("label"),
        when(col("vec_id") === 0L,
          expr("transform(CAST(embedding AS ARRAY<DOUBLE>), " +
            "x -> CAST(2.0 * x AS FLOAT))"))
          .otherwise(col("embedding")).as("embedding"))
      .write.parquet(s"$corpus/embeddings2.parquet")
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(deleteRec)); f.delete()
    }
    deleteRec(new java.io.File(s"$corpus/embeddings.parquet"))
    assert(new java.io.File(s"$corpus/embeddings2.parquet")
      .renameTo(new java.io.File(s"$corpus/embeddings.parquet")))
    val (choice, action) = AnnIndex.syncTo(spark, corpus, stash, idx)
    assert(action == "rebuilt",
      s"a mutated row must force a rebuild, got $action")
    assert(choice == "recertified",
      "a scale-invariant mutation moves no centroid — no sweep")
    serveParity(corpus, stash, idx)
  }
}
