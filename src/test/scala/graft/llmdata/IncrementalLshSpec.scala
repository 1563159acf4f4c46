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
}
