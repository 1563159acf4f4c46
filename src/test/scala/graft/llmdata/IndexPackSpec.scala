package graft.llmdata

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Semantics of the round-5 term-stat / packing / scrub / kNN ops
  * (q65–q69) that a plan check can't pin: packing invariants, scrub
  * round-trips, vote majorities, segment bounds. */
class IndexPackSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("q65: packing is gapless and contiguous within each (lang, source) stream") {
    val out = SparkEntry.queries("q65_pack_sequences")(spark, sf).cache()
    try {
      // offsets reconstruct the concatenated stream: sorting by doc_id
      // within a stream, each doc starts exactly where the previous
      // ended (shard_id * B + shard_off is the running token offset)
      val bad = out
        .withColumn("strt", col("shard_id") * 256 + col("shard_off"))
        .withColumn("expected",
          coalesce(
            sum(col("n_tok")).over(
              org.apache.spark.sql.expressions.Window
                .partitionBy("lang", "source").orderBy("doc_id")
                .rowsBetween(Long.MinValue, -1)), lit(0L)))
        .filter(col("strt") =!= col("expected"))
      assert(bad.count() == 0, "packing must be gapless per stream")
      // straddle flag consistency: a doc straddles iff its span crosses
      // a multiple of B
      val badFlag = out
        .withColumn("strt", col("shard_id") * 256 + col("shard_off"))
        .filter(
          (expr("(strt + n_tok - 1) div 256") =!= col("shard_id")).cast("int")
            =!= col("straddles"))
      assert(badFlag.count() == 0, "straddle flag must match the span")
    } finally out.unpersist()
  }

  test("q106: chunks cover every token and reconstruct each document verbatim") {
    val (w, s) = (Packing.ChunkWidth, Packing.ChunkStride) // single-sourced geometry
    val out = SparkEntry.queries("q106_doc_chunks")(spark, sf).cache()
    try {
      val docs = graft.Tables.documents(spark, sf)
        .select(col("doc_id"), col("text"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
      // geometry: starts are 0, S, 2S, … < n_tok; every chunk holds
      // min(W, n_tok - start) tokens, so the windows cover position
      // n_tok - 1 and nothing beyond it
      val geom = out.join(docs.select("doc_id", "n_tok"), "doc_id")
        .filter(col("chunk_start") =!= col("chunk_idx") * s ||
          col("chunk_start") >= col("n_tok") ||
          col("n_chunk") =!= least(lit(w.toLong), col("n_tok") - col("chunk_start")))
      assert(geom.count() == 0, s"chunk geometry must match width $w / stride $s")
      // reconstruction: the first `stride` tokens of each chunk, in
      // chunk order, concatenate back to the original text — the
      // overlap-removal identity every chunk consumer relies on. (The
      // final start always exceeds n_tok - stride, so the stride-wide
      // prefixes tile the whole document with nothing left over.)
      val rebuilt = out
        .withColumn("piece",
          concat_ws(" ", slice(split(col("chunk_text"), " "), 1, s)))
        .groupBy("doc_id")
        .agg(concat_ws(" ",
          flatten(transform(
            array_sort(collect_list(struct(col("chunk_idx"), col("piece")))),
            t => split(t("piece"), " ")))).as("rebuilt_text"))
      val bad = rebuilt.join(docs, "doc_id")
        .filter(col("rebuilt_text") =!= col("text"))
      assert(bad.count() == 0, "stride-prefix concatenation must reproduce the text")
    } finally out.unpersist()
  }

  test("q66: scrub redacts every digit run and round-trips structure") {
    val out = SparkEntry.queries("q66_pii_scrub")(spark, sf)
    val rows = out.limit(100).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val scrubbed = r.getAs[String]("scrubbed")
      assert(!scrubbed.exists(_.isDigit), s"digits survive in: $scrubbed")
      assert(scrubbed.contains("<NUM>") == (r.getAs[Long]("n_nums") > 0))
      assert(r.getAs[Long]("n_emails") == 0, "synthetic props carry no emails")
      assert(!scrubbed.contains("<EMAIL>"))
    }
  }

  test("q67: rank-1 term has the maximal score per doc; ranks are 1..3") {
    val out = SparkEntry.queries("q67_tfidf_topterms")(spark, sf).cache()
    try {
      val perDoc = out.groupBy("doc_id")
        .agg(min("rank").as("lo"), max("rank").as("hi"),
          count(lit(1)).as("n"),
          max(when(col("rank") === 1, col("score"))).as("top"),
          max("score").as("mx"))
      assert(perDoc.filter(col("lo") =!= 1 || col("hi") > 3 || col("n") > 3)
        .count() == 0)
      assert(perDoc.filter(col("top") =!= col("mx")).count() == 0,
        "rank 1 must carry the max score")
    } finally out.unpersist()
  }

  test("q68: predicted label is the vote argmax and votes never exceed k") {
    val out = SparkEntry.queries("q68_knn_label")(spark, sf)
    val rows = out.collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      val votes = r.getAs[Long]("votes")
      assert(votes >= 1 && votes <= 10)
      assert((r.getAs[Int]("true_label") == r.getAs[Int]("pred_label")) ==
        (r.getAs[Int]("correct") == 1))
    }
  }

  test("q69: segments bound the posting groups; df/cf/postings agree") {
    val out = SparkEntry.queries("q69_inverted_index")(spark, sf).cache()
    try {
      val bad = out
        .withColumn("n_post", size(split(col("postings"), ",")).cast("long"))
        .filter(col("n_post") =!= col("df") || col("cf") < col("df") ||
          col("df") > 1000)
      assert(bad.count() == 0,
        "each segment row: |postings| == df ≤ 1000 and cf ≥ df")
      // postings stay inside their segment's id range
      val stray = out.select(col("segment"),
          explode(split(col("postings"), ",").cast("array<long>")).as("doc"))
        .filter(expr("doc div 1000") =!= col("segment"))
      assert(stray.count() == 0, "a posting outside its segment range")
    } finally out.unpersist()
  }
}
