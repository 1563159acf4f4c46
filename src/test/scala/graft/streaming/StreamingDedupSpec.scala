package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingDedupSpec extends SparkSpec {
  import StreamingDedup.Candidate

  private val dup1 = "the quick brown fox jumps over the lazy dog today"
  private val dup2 = dup1 // exact near-dup: identical token set
  private val other = "completely unrelated words about something else entirely"

  test("near-dup arriving in a LATER micro-batch pairs with state from earlier ones") {
    val sp = spark
    import sp.implicits._
    val input = MemoryStream[(Long, String)](sp)
    val docs = input.toDF.toDF("doc_id", "text")
    val q = StreamingDedup.candidatesForDocs(docs)
      .writeStream.format("memory").queryName("sdedup_cross").start()
    try {
      input.addData((1L, dup1), (3L, other))
      q.processAllAvailable()
      assert(sp.table("sdedup_cross").count() === 0) // nothing dup yet
      input.addData((2L, dup2))
      q.processAllAvailable()
      val pairs = sp.table("sdedup_cross").as[Candidate].collect()
        .map(c => (c.a_id, c.b_id)).distinct.toSet
      assert(pairs === Set((1L, 2L))) // found against PRIOR state
      val ests = sp.table("sdedup_cross").as[Candidate].collect().map(_.est)
      assert(ests.forall(_ == 1.0)) // identical token sets: all 8 match
    } finally q.stop()
  }

  test("re-delivery of an already-seen doc id emits nothing (replay-stable)") {
    val sp = spark
    import sp.implicits._
    val input = MemoryStream[(Long, String)](sp)
    val q = StreamingDedup.candidatesForDocs(input.toDF.toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("sdedup_replay").start()
    try {
      input.addData((1L, dup1), (2L, dup2))
      q.processAllAvailable()
      val n = sp.table("sdedup_replay").count()
      assert(n > 0)
      input.addData((2L, dup2)) // at-least-once replay of doc 2
      q.processAllAvailable()
      assert(sp.table("sdedup_replay").count() === n) // no new rows
    } finally q.stop()
  }

  test("replay of an OVERFLOW doc (turned away by maxPerBucket) emits nothing") {
    val sp = spark
    import sp.implicits._
    val input = MemoryStream[(Long, String)](sp)
    val q = StreamingDedup.candidatesForDocs(
        input.toDF.toDF("doc_id", "text"), maxPerBucket = 1)
      .writeStream.format("memory").queryName("sdedup_over_replay").start()
    try {
      input.addData((1L, dup1), (2L, dup2)) // doc 2 overflows (bucket full)
      q.processAllAvailable()
      val n = sp.table("sdedup_over_replay").count()
      assert(n > 0) // the overflow doc still matched the retained doc 1
      input.addData((2L, dup2)) // at-least-once replay of the overflow doc
      q.processAllAvailable()
      assert(sp.table("sdedup_over_replay").count() === n) // no re-emit
    } finally q.stop()
  }

  test("maxPerBucket bounds state: overflow docs match retained members but are not admitted") {
    val sp = spark
    import sp.implicits._
    val docs = Seq((1L, dup1), (2L, dup2), (3L, dup1)).toDF("doc_id", "text")
    val pairs = StreamingDedup.candidatesForDocs(docs, maxPerBucket = 1)
      .collect().map(c => (c.a_id, c.b_id)).distinct.toSet
    // doc 1 admitted; docs 2 and 3 each match doc 1 but are turned
    // away, so (2,3) is never formed
    assert(pairs === Set((1L, 2L), (1L, 3L)))
  }

  test("overflow replay memory is bounded: evicted ids re-emit on replay, retained ids stay silent") {
    val sp = spark
    import sp.implicits._
    val input = MemoryStream[(Long, String)](sp)
    // maxPerBucket=1 ⇒ replay-memory cap = overflowMemoryFactor × 1 = 8
    val q = StreamingDedup.candidatesForDocs(
        input.toDF.toDF("doc_id", "text"), maxPerBucket = 1)
      .writeStream.format("memory").queryName("sdedup_evict").start()
    try {
      input.addData((1L, dup1)) // admitted
      q.processAllAvailable()
      // 9 overflow arrivals: newest-first memory [10..2] caps at 8,
      // evicting doc 2 (the oldest turned-away id)
      input.addData((2L to 10L).map(i => (i, dup1)): _*)
      q.processAllAvailable()
      val n = sp.table("sdedup_evict").count()
      input.addData((10L, dup1)) // replay of a REMEMBERED overflow id
      q.processAllAvailable()
      assert(sp.table("sdedup_evict").count() === n) // still suppressed
      input.addData((2L, dup1)) // replay of the EVICTED id
      q.processAllAvailable()
      // documented weakening: duplicate pair output, never wrong pairs
      val after = sp.table("sdedup_evict").as[Candidate].collect()
      assert(after.length > n)
      assert(after.map(c => (c.a_id, c.b_id)).distinct.sorted.toSeq ===
        (2L to 10L).map(i => (1L, i)))
    } finally q.stop()
  }

  test("batch mode sees the same pairs as the streamed batches") {
    val sp = spark
    import sp.implicits._
    val docs = Seq((1L, dup1), (3L, other), (2L, dup2)).toDF("doc_id", "text")
    val pairs = StreamingDedup.candidatesForDocs(docs)
      .collect().map(c => (c.a_id, c.b_id)).distinct.toSet
    assert(pairs === Set((1L, 2L))) // == the cross-batch result above
  }

  test("band keys match the batch q29 banding (one row per doc per band, 2 bands)") {
    val sp = spark
    import sp.implicits._
    val docs = Seq((1L, dup1), (2L, dup2), (3L, other)).toDF("doc_id", "text")
    val b = StreamingDedup.bands(docs).collect()
    assert(b.length === 6) // 3 docs × 2 bands
    val byDoc = b.groupBy(_.doc_id)
    // identical text ⇒ identical band keys; different text ⇒ disjoint
    assert(byDoc(1L).map(_.band).toSet === byDoc(2L).map(_.band).toSet)
    assert(byDoc(1L).map(_.band).toSet.intersect(
      byDoc(3L).map(_.band).toSet).isEmpty)
    assert(b.forall(_.sig.length === 8))
  }

  test("null-text docs are dropped by BOTH band renderings (agreement by construction)") {
    // round-10 advice: the kernel nulled the whole array (explode drops
    // the row) while the HOF reference emitted null-band rows that
    // pooled every null-text doc into one garbage candidate bucket —
    // both renderings now filter null text EXPLICITLY, and this pins
    // the intended semantics: no shingles ⇒ no bands ⇒ no candidates
    val sp = spark
    import sp.implicits._
    val docs = Seq((1L, dup1), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val kernel = StreamingDedup.bands(docs).collect()
    val ref = StreamingDedup.bandsReference(docs).collect()
    assert(kernel.map(_.doc_id).toSet === Set(1L))
    assert(kernel.sortBy(_.band).toSeq === ref.sortBy(_.band).toSeq,
      "kernel and reference renderings must agree on null-text drops")
  }
}
