package graft.streaming

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingAdmissionSpec extends SparkSpec {
  import StreamingAdmission.Decision

  private val sf = "/root/testdata/sf0.001"

  private def doc(id: Long, source: String, nTok: Int): (Long, String, String) =
    (id, source, Seq.fill(nTok)("w").mkString(" "))

  test("one-batch admission reproduces the q72 recipe exactly") {
    val sp = spark
    import sp.implicits._
    val decisions = StreamingAdmission.admitDocs(
      graft.Tables.documents(sp, sf).select("doc_id", "source", "text"))
    val admitted = decisions.filter(_.admitted)
      .select(col("doc_id"), col("source"), col("n_tok"),
        col("cum_tok"))
    val recipe = SparkEntry.queries("q72_token_budget_mix")(sp, sf)
      .select("doc_id", "source", "n_tok", "cum_tok")
    assert(admitted.exceptAll(recipe).isEmpty && recipe.exceptAll(admitted).isEmpty,
      "batch-mode admission must equal the q72 manifest")
  }

  test("spend persists across micro-batches; rejections are emitted not dropped") {
    val sp = spark
    import sp.implicits._
    val input = MemoryStream[(Long, String, String)](sp)
    val q = StreamingAdmission.admitDocs(
        input.toDF.toDF("doc_id", "source", "text"), budget = 100)
      .writeStream.format("memory").queryName("adm_cross").start()
    try {
      input.addData(doc(1, "s", 60))
      q.processAllAvailable()
      input.addData(doc(2, "s", 60)) // 60 + 60 > 100: must be rejected
      q.processAllAvailable()
      val d = sp.table("adm_cross").as[Decision].collect()
        .map(x => x.doc_id -> x).toMap
      assert(d(1L).admitted && d(1L).cum_tok == 60)
      assert(!d(2L).admitted && d(2L).cum_tok == 120,
        "prefix semantics: offered tokens consume the budget")
    } finally q.stop()
  }

  test("bestFit packs tighter: a rejected doc does not block a smaller later one") {
    val sp = spark
    import sp.implicits._
    val input = MemoryStream[(Long, String, String)](sp)
    val q = StreamingAdmission.admitDocs(
        input.toDF.toDF("doc_id", "source", "text"), budget = 100,
        bestFit = true)
      .writeStream.format("memory").queryName("adm_src").start()
    try {
      input.addData(doc(1, "a", 80), doc(2, "b", 80))
      q.processAllAvailable()
      input.addData(doc(3, "a", 50), doc(4, "a", 20))
      q.processAllAvailable()
      val d = sp.table("adm_src").as[Decision].collect()
        .map(x => x.doc_id -> x).toMap
      assert(d(1L).admitted && d(2L).admitted, "independent source budgets")
      assert(!d(3L).admitted, "50 overshoots a's remaining 20")
      assert(d(4L).admitted && d(4L).cum_tok == 100,
        "the smaller doc still fits after a rejection")
    } finally q.stop()
  }

  test("state survives under the RocksDB state store (the corpus-scale provider)") {
    val sp = spark
    import sp.implicits._
    withRocksDBStateStore {
      val input = MemoryStream[(Long, String, String)](sp)
      val q = StreamingAdmission.admitDocs(
          input.toDF.toDF("doc_id", "source", "text"), budget = 100)
        .writeStream.format("memory").queryName("adm_rocks").start()
      try {
        input.addData(doc(1, "s", 60))
        q.processAllAvailable()
        input.addData(doc(2, "s", 60))
        q.processAllAvailable()
        val d = sp.table("adm_rocks").as[Decision].collect()
          .map(x => x.doc_id -> x).toMap
        assert(d(1L).admitted && !d(2L).admitted,
          "cross-batch spend must survive in RocksDB state")
      } finally q.stop()
    }
  }

  test("at-least-once replay re-emits nothing and never double-spends") {
    val sp = spark
    import sp.implicits._
    val input = MemoryStream[(Long, String, String)](sp)
    val q = StreamingAdmission.admitDocs(
        input.toDF.toDF("doc_id", "source", "text"), budget = 100,
        bestFit = true)
      .writeStream.format("memory").queryName("adm_replay").start()
    try {
      input.addData(doc(1, "s", 60), doc(2, "s", 60))
      q.processAllAvailable()
      val n = sp.table("adm_replay").count()
      assert(n == 2)
      input.addData(doc(1, "s", 60), doc(2, "s", 60)) // replay both
      q.processAllAvailable()
      assert(sp.table("adm_replay").count() == n, "no re-emission")
      input.addData(doc(3, "s", 40))
      q.processAllAvailable()
      val d3 = sp.table("adm_replay").as[Decision].collect()
        .find(_.doc_id == 3L).get
      assert(d3.admitted && d3.cum_tok == 100,
        "replays spent nothing: 40 still fits after the rejected 60")
    } finally q.stop()
  }
}
