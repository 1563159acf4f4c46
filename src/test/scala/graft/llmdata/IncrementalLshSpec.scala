package graft.llmdata

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Incremental LSH index maintenance (q109): the properties that make
  * it an INDEX protocol rather than a query rewrite — batch-count
  * invariance (ingest-order independence) and a self-contained
  * persisted index (parquet round-trip changes nothing). */
class IncrementalLshSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.01"

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("q109 two-batch ingest reproduces q29's single-shot pair set") {
    assert(rows(IncrementalLsh.incrementalPairs(spark, sf)) ==
      rows(Dedup.minhashLsh(spark, sf)))
  }

  test("ingest is batch-count invariant (3 batches == 2 batches == 1)") {
    val two = rows(IncrementalLsh.incrementalPairs(spark, sf, nBatches = 2))
    assert(rows(IncrementalLsh.incrementalPairs(spark, sf, nBatches = 3)) == two)
    assert(rows(IncrementalLsh.incrementalPairs(spark, sf, nBatches = 1)) == two)
  }

  test("the persisted index is self-contained across a parquet round-trip") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("lshidx").toString + "/index"
    val docs = graft.Tables.documents(spark, sf)
    val maxId = docs.agg(max("doc_id")).head.getLong(0)
    val old = docs.filter(col("doc_id") <= maxId / 2)
    val batch = docs.filter(col("doc_id") > maxId / 2)
    // ingest writes the index table; a LATER ingest (fresh session
    // state) reads it back and must emit the same pairs as the
    // in-memory route
    IncrementalLsh.bandIndex(old).write.parquet(dir)
    val viaDisk = rows(IncrementalLsh.ingestPairs(
      spark.read.parquet(dir), IncrementalLsh.bandIndex(batch), docs)
      .orderBy("a_id", "b_id"))
    val inMemory = rows(IncrementalLsh.ingestPairs(
      IncrementalLsh.bandIndex(old), IncrementalLsh.bandIndex(batch), docs)
      .orderBy("a_id", "b_id"))
    assert(viaDisk == inMemory)
    assert(viaDisk.nonEmpty)
  }

  test("lock-serialized ingests: two commits reproduce the single-shot set") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("lshing").toString + "/index"
    val docs = graft.Tables.documents(spark, sf)
    val maxId = docs.agg(max("doc_id")).head.getLong(0)
    val e1 = rows(IncrementalLsh.ingest(spark, dir,
      docs.filter(col("doc_id") <= maxId / 2), docs))
    val e2 = rows(IncrementalLsh.ingest(spark, dir,
      docs.filter(col("doc_id") > maxId / 2), docs))
    assert((e1 ++ e2).sortBy(r => (r(0).asInstanceOf[Long],
      r(1).asInstanceOf[Long])) ==
      rows(Dedup.minhashLsh(spark, sf)))
    // both manifests + both batch dirs committed
    assert(rows(IncrementalLsh.readIndex(spark, dir)).nonEmpty)
  }

  test("a concurrent ingest refuses loudly instead of silently losing pairs") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("lshlock").toString + "/index"
    val docs = graft.Tables.documents(spark, sf)
    IncrementalLsh.ingest(spark, dir, docs.filter(col("doc_id") < 100), docs)
      .count()
    // an in-flight (or crashed) ingest holds the lock
    java.nio.file.Files.createFile(java.nio.file.Paths.get(dir, ".ingest-lock"))
    val e = intercept[IllegalStateException] {
      IncrementalLsh.ingest(spark, dir,
        docs.filter(col("doc_id") >= 100), docs).count()
    }
    assert(e.getMessage.contains("serialized"))
    // the documented recovery — remove the lock — unblocks the ingest,
    // and the refused attempt committed NOTHING (no torn manifest)
    java.nio.file.Files.delete(java.nio.file.Paths.get(dir, ".ingest-lock"))
    val after = IncrementalLsh.ingest(spark, dir,
      docs.filter(col("doc_id") >= 100 && col("doc_id") < 200), docs)
    assert(after.count() >= 0)
  }

  test("band-index compaction preserves the row multiset and later emissions") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("lshcomp").toString + "/index"
    val docs = graft.Tables.documents(spark, sf)
    val maxId = docs.agg(max("doc_id")).head.getLong(0)
    val e1 = rows(IncrementalLsh.ingest(spark, dir,
      docs.filter(col("doc_id") <= maxId / 2), docs))
    val preRows = rows(IncrementalLsh.readIndex(spark, dir)
      .orderBy("doc_id", "band"))
    IncrementalLsh.compact(spark, dir)
    assert(rows(IncrementalLsh.readIndex(spark, dir)
      .orderBy("doc_id", "band")) == preRows)
    // an ingest against the compacted index emits the same pairs the
    // uncompacted index would have (the full single-shot set with e1)
    val e2 = rows(IncrementalLsh.ingest(spark, dir,
      docs.filter(col("doc_id") > maxId / 2), docs))
    assert((e1 ++ e2).sortBy(r => (r(0).asInstanceOf[Long],
      r(1).asInstanceOf[Long])) == rows(Dedup.minhashLsh(spark, sf)))
  }
}
