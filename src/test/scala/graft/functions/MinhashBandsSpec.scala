package graft.functions

import org.apache.spark.sql.GraftSqlBridge.{column, expression}
import org.apache.spark.sql.functions._

/** Parity gates for the native minhash kernel (round-10): the kernel
  * must reproduce the HOF rendering ELEMENT-FOR-ELEMENT — the
  * signature definition is the shared contract of batch q29, the
  * incremental LSH index, and StreamingDedup, so a one-bit drift here
  * silently breaks every batch≡stream parity downstream. */
class MinhashBandsSpec extends graft.SparkSpec {

  private def hofRow(tokens: Seq[String]) = {
    val sp = spark
    import sp.implicits._
    val df = Seq(Tuple1(tokens)).toDF("ts")
    val sigs = (0 until 8).map(i =>
      array_min(transform(col("ts"), w => md5(concat(w, lit("#" + i))))))
    df.select(array(
      sigs ++ Seq(
        md5(concat(lit("0"), sigs(0), sigs(1), sigs(2), sigs(3))),
        md5(concat(lit("1"), sigs(4), sigs(5), sigs(6), sigs(7)))): _*)
      .as("r")).head().getSeq[String](0)
  }

  private def kernelRow(tokens: Seq[String]) = {
    val sp = spark
    import sp.implicits._
    Seq(Tuple1(tokens)).toDF("ts")
      .select(column(MinhashBands(expression(col("ts")))).as("r"))
      .head().getSeq[String](0)
  }

  test("kernel equals the HOF rendering on varied real-ish token sets") {
    val cases = Seq(
      Seq("the", "quick", "brown", "fox"),
      Seq("a"), Seq(""),
      Seq("dup", "dup", "dup"), // duplicate tokens cannot move a min
      Seq("unicode", "héllo", "wörld", "日本語", "emoji🙂"),
      Seq("#0", "#1", "x#y"), // tokens colliding with the perm suffix
      (1 to 200).map(i => s"t$i"))
    cases.foreach { ts =>
      val (h, k) = (hofRow(ts), kernelRow(ts))
      assert(k.length == 10 && h.length == 10)
      assert(k == h, s"kernel drifted from the HOF contract on $ts")
    }
  }

  test("null semantics: null array -> null row; null tokens skipped; empty -> all-null") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (1L, null: Seq[String]),
      (2L, Seq[String](null, "w")),
      (3L, Seq.empty[String]))
      .toDF("id", "ts")
      .select(col("id"), column(MinhashBands(expression(col("ts")))).as("r"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(df(1L).isNullAt(1), "null array must null the row")
    // null token skipped: equals the signature of just Seq("w")
    assert(df(2L).getSeq[String](1) == kernelRow(Seq("w")))
    val empty = df(3L).getSeq[String](1)
    assert(empty.length == 10 && empty.forall(_ == null),
      "no tokens -> null components and null bands (concat propagation)")
  }

  test("streaming bands() rides the kernel and equals the HOF reference dataset") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "some shared words and more"),
      (2L, "some shared words and more"),
      (3L, "an entirely different document body"),
      (4L, "")).toDF("doc_id", "text")
    val got = graft.streaming.StreamingDedup.bands(docs)
      .collect().sortBy(r => (r.doc_id, r.band)).toSeq
    val ref = graft.streaming.StreamingDedup.bandsReference(docs)
      .collect().sortBy(r => (r.doc_id, r.band)).toSeq
    assert(got.map(b => (b.doc_id, b.band, b.sig.toSeq)) ==
      ref.map(b => (b.doc_id, b.band, b.sig.toSeq)))
    // the analysis-time type check fires on a wrong-typed argument
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      docs.select(column(MinhashBands(expression(col("doc_id")))))
        .head()
    }
    assert(e.getMessage.contains("minhash_bands") ||
      e.getMessage.toLowerCase.contains("data type mismatch"))
  }

  test("minhash_bands is registered as a SQL function; wrong types fail at analysis") {
    graft.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT minhash_bands(array('a', 'b')) AS mb").head().getSeq[String](0)
    assert(r.length == 10 && r == kernelRow(Seq("a", "b")))
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT minhash_bands(array(1, 2))").head()
    }
    assert(e.getMessage.contains("minhash_bands") ||
      e.getMessage.toLowerCase.contains("data type mismatch"))
  }
}
