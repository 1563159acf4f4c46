package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Count-Min guarantees, engine-free (direct fold/merge calls) plus one
  * distributed run through the real aggregation path:
  *  - exact regime (distinct ≤ sparseMax): estimates equal true counts,
  *    absent items are exactly 0, under any chunking;
  *  - dense regime: estimates NEVER underestimate (deterministic CMS
  *    guarantee) under any merge tree;
  *  - merge-tree identity: the final buffer is IDENTICAL whatever the
  *    chunking/merge shape (counter addition commutes — the
  *    HllAgg-strength pin);
  *  - promotion: crossing sparseMax mid-stream or at merge yields the
  *    same buffer as densifying the total.
  */
class CountMinSpec extends SparkSpec {

  private val words = Seq("a", "b", "c", "d", "e", "f", "g", "h")
  /** Deterministic skewed stream: word i appears (i+1)·13 times. */
  private val stream: Seq[String] =
    words.zipWithIndex.flatMap { case (w, i) => Seq.fill((i + 1) * 13)(w) }
      .zipWithIndex.sortBy { case (_, j) => (j * 7919) % 1009 }.map(_._1)
  private val truth: Map[String, Long] =
    stream.groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def foldChunks(agg: CountMin, chunks: Seq[Seq[String]]): CmBuf = {
    val bufs = chunks.map(_.foldLeft(agg.zero)(agg.reduce))
    bufs.reduce(agg.merge)
  }

  private def chunkings: Seq[Seq[Seq[String]]] = Seq(
    Seq(stream),
    stream.grouped(7).toSeq,
    stream.grouped(97).toSeq,
    Seq(stream.take(3), stream.drop(3)))

  test("exact regime: estimates equal true counts, absent items are 0, any chunking") {
    val agg = new CountMin(words :+ "absent", sparseMax = 64)
    for (ch <- chunkings) {
      val est = agg.finish(foldChunks(agg, ch))
      assert(est === words.map(truth) :+ 0L)
    }
  }

  test("dense regime never underestimates, under any merge tree") {
    // sparseMax 0 forces dense from the first row; tiny width forces
    // collisions so over-counting actually occurs somewhere
    val agg = new CountMin(words :+ "absent", depth = 3, width = 4,
      sparseMax = 0)
    for (ch <- chunkings) {
      val est = agg.finish(foldChunks(agg, ch))
      words.zip(est).foreach { case (w, e) =>
        assert(e >= truth(w), s"underestimated $w: $e < ${truth(w)}")
      }
    }
  }

  test("merge-tree identity: identical final buffer for every chunking") {
    for (sparseMax <- Seq(0, 3, 64)) {
      val agg = new CountMin(words, depth = 3, width = 8,
        sparseMax = sparseMax)
      val ref = foldChunks(agg, chunkings.head)
      for (ch <- chunkings.tail) {
        val got = foldChunks(agg, ch)
        assert(got.sparse === ref.sparse)
        assert(got.dense.toSeq === ref.dense.toSeq)
      }
    }
  }

  test("promotion mid-stream equals densifying the total") {
    // sparseMax 3 < 8 distinct: promotion fires inside reduce on some
    // chunkings and inside merge on others — the identity test above
    // covers shape; here pin that the DENSE estimates still dominate
    // truth and dominate nothing below it (min over rows ≤ row 0 count)
    val agg = new CountMin(words, depth = 4, width = 16, sparseMax = 3)
    val b = foldChunks(agg, stream.grouped(11).toSeq)
    assert(b.dense.nonEmpty && b.sparse.isEmpty)
    val est = agg.finish(b)
    words.zip(est).foreach { case (w, e) => assert(e >= truth(w)) }
    // total mass per row is conserved: each row's counters sum to n
    val n = stream.size.toLong
    (0 until 4).foreach { r =>
      assert(b.dense.slice(r * 16, (r + 1) * 16).sum === n)
    }
  }

  test("distributed run through the real aggregation path matches truth exactly") {
    val sp = spark
    import sp.implicits._
    val cm = udaf(new CountMin(words :+ "absent", sparseMax = 64),
      org.apache.spark.sql.Encoders.STRING)
    val est = stream.toDF("w").repartition(8)
      .agg(cm(col("w")).as("e")).select(explode(col("e")))
      .as[Long].collect().toSeq
    assert(est === words.map(truth) :+ 0L)
  }
}
