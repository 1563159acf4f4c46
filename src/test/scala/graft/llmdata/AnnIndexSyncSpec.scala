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
    AnnIndex.currentListsDir(spark, idx)
      .map(graft.sources.AppendLog.state(spark, _)._2.length).getOrElse(0)

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

  test("a zero vector in the corpus does NOT disable the delta path (sentinel list)") {
    // round-11 advice (medium): zero vectors were excluded from the
    // lists but included in the coverage fingerprint, so every
    // append-only growth sync saw them in the corpus-minus-lists diff,
    // double-counted them into the coverage fold, and silently fell
    // back to a full rebuild — forever. v3 records them under
    // AnnIndex.ZeroList: covered, never probed.
    val corpus = corpusCopy()
    val stash = tempDir("ann-sync-stash-")
    val idx = tempDir("ann-sync-idx-")
    val cur0 = spark.read.parquet(s"$corpus/embeddings.parquet")
    cur0.limit(1)
      .select(lit(99999L).as("vec_id"), col("label"),
        expr("transform(embedding, x -> CAST(0.0 AS FLOAT))")
          .as("embedding"))
      .unionByName(cur0)
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
    assert(AnnIndex.syncTo(spark, corpus, stash, idx)._2 == "rebuilt")
    // the zero vector is IN the lists, under the sentinel no probe ranks
    val sentinels = graft.sources.AppendLog
      .read(spark, AnnIndex.currentListsDir(spark, idx).get, AnnIndex.Schema)
      .filter(col("list_id") === AnnIndex.ZeroList)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(sentinels == Set(99999L),
      s"zero vectors must land under ZeroList, got $sentinels")
    // append-only growth (every nonzero vector duplicated under fresh
    // ids): the delta path must survive the zero vector's presence
    val b0 = batchCount(idx)
    val cur = spark.read.parquet(s"$corpus/embeddings.parquet")
    cur.filter(col("vec_id") =!= 99999L)
      .select((col("vec_id") + 100000L).as("vec_id"), col("label"),
        col("embedding"))
      .unionByName(cur)
      .write.parquet(s"$corpus/embeddings2.parquet")
    swap()
    val (_, action) = AnnIndex.syncTo(spark, corpus, stash, idx)
    assert(action == "delta",
      s"growth beside a zero vector must stay on the delta path, got $action")
    assert(batchCount(idx) == b0 + 1, "exactly one delta batch")
    serveParity(corpus, stash, idx)
    // and the zero vector is never served as a neighbor
    val served = AnnIndex.search(spark, corpus, stash, idx)
      .filter(col("n_id") === 99999L).count()
    assert(served == 0L, "a zero vector must never be a neighbor")
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
