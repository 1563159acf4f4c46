package graft.llmdata

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental inverted-index maintenance (q132): the disk protocol —
  * serialized manifest-committed segment appends via AppendLog — and
  * the exactness property that makes incremental build an INDEX
  * protocol rather than an approximation: BM25 served from any
  * batch partition of the corpus equals the corpus-scan retrieval. */
class IncrementalIndexingSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.01"

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  /** q70's corpus-scan retrieval — the ground truth the index serves. */
  private def oneShot: Seq[Seq[Any]] =
    rows(IncrementalIndexing.incrementalBm25(spark, sf, nBatches = 1))

  test("q132 is batch-count invariant (3 batches == 2 == 1 == q70)") {
    val one = oneShot
    assert(one.nonEmpty)
    assert(rows(IncrementalIndexing.incrementalBm25(spark, sf, 2)) == one)
    assert(rows(IncrementalIndexing.incrementalBm25(spark, sf, 3)) == one)
    assert(rows(graft.SparkEntry.queries("q70_bm25")(spark, sf)) == one)
  }

  test("disk protocol: two lock-serialized ingests serve the one-shot result") {
    val dir = java.nio.file.Files.createTempDirectory("invidx")
      .toString + "/index"
    val docs = graft.Tables.documents(spark, sf)
    val maxId = docs.agg(max("doc_id")).head.getLong(0)
    IncrementalIndexing.ingest(spark, dir,
      docs.filter(col("doc_id") <= maxId / 2))
    IncrementalIndexing.ingest(spark, dir,
      docs.filter(col("doc_id") > maxId / 2))
    val served = rows(IncrementalIndexing.bm25(
      IncrementalIndexing.readPostings(spark, dir),
      IncrementalIndexing.readDocStats(spark, dir),
      IncrementalIndexing.QueryTerms))
    assert(served == oneShot)
  }

  test("a concurrent ingest refuses loudly; recovery unblocks") {
    val dir = java.nio.file.Files.createTempDirectory("invlock")
      .toString + "/index"
    val docs = graft.Tables.documents(spark, sf)
    IncrementalIndexing.ingest(spark, dir, docs.filter(col("doc_id") < 100))
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(dir, ".ingest-lock"))
    val e = intercept[IllegalStateException] {
      IncrementalIndexing.ingest(spark, dir,
        docs.filter(col("doc_id") >= 100))
    }
    assert(e.getMessage.contains("serialized"))
    // the refused attempt committed nothing: the index still serves,
    // and removing the stale lock (the documented recovery) unblocks
    assert(rows(IncrementalIndexing.readPostings(spark, dir)).nonEmpty)
    java.nio.file.Files.delete(java.nio.file.Paths.get(dir, ".ingest-lock"))
    IncrementalIndexing.ingest(spark, dir,
      docs.filter(col("doc_id") >= 100 && col("doc_id") < 200))
    assert(graft.sources.AppendLog.state(spark, dir)._1 == 2)
  }

  test("compaction folds segments to one dir and changes NOTHING served") {
    val dir = java.nio.file.Files.createTempDirectory("invcomp")
      .toString + "/index"
    val docs = graft.Tables.documents(spark, sf)
    val maxId = docs.agg(max("doc_id")).head.getLong(0)
    IncrementalIndexing.ingest(spark, dir,
      docs.filter(col("doc_id") <= maxId / 2))
    IncrementalIndexing.ingest(spark, dir,
      docs.filter(col("doc_id") > maxId / 2))
    val before = rows(IncrementalIndexing.bm25(
      IncrementalIndexing.readPostings(spark, dir),
      IncrementalIndexing.readDocStats(spark, dir),
      IncrementalIndexing.QueryTerms))
    IncrementalIndexing.compact(spark, dir)
    val (v, dirs) = graft.sources.AppendLog.state(spark, dir)
    assert(dirs.size == 1 && dirs.head.endsWith("-compacted") && v == 3)
    // old segment dirs are gone from disk, not just unreferenced
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "batch-1")))
    val after = rows(IncrementalIndexing.bm25(
      IncrementalIndexing.readPostings(spark, dir),
      IncrementalIndexing.readDocStats(spark, dir),
      IncrementalIndexing.QueryTerms))
    assert(after == before)
    // the compacted table keeps accepting ingests
    IncrementalIndexing.ingest(spark, dir, docs.limit(0))
    assert(graft.sources.AppendLog.state(spark, dir)._2.size == 2)
  }

  test("compacting an empty table refuses loudly") {
    val dir = java.nio.file.Files.createTempDirectory("invempt")
      .toString + "/index"
    val e = intercept[IllegalStateException] {
      IncrementalIndexing.compact(spark, dir)
    }
    assert(e.getMessage.contains("nothing to compact"))
  }
}
