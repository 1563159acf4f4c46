package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HLL aggregator semantics: the sparse regime IS count(DISTINCT …)
  * (no hashing, no collision caveat), the dense regime holds the 3σ
  * accuracy bound, and — stronger than the other sketches — ANY merge
  * tree produces the IDENTICAL buffer (set union / register max are
  * both semilattice joins), not just an in-bounds one. */
class HllSpec extends SparkSpec {

  private def fold(agg: HllAgg, vs: Seq[Long]): HllBuf =
    vs.foldLeft(agg.zero)(agg.reduce)

  /** Deterministic pseudo-random longs (no util.Random: replay-safe). */
  private def det(n: Int, seed: Long): Seq[Long] =
    (1 to n).map { i =>
      var z = i * 0x9E3779B97F4A7C15L + seed
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    }

  test("sparse regime is exact under any merge tree and any duplication") {
    val agg = new HllAgg(p = 12, sparseMax = 1000)
    val distinct = det(800, 7L)
    // heavy duplication: 5 copies of each value, shuffled deterministically
    val vs = (distinct ++ distinct ++ distinct ++ distinct ++ distinct)
      .sortBy(v => v * 0x2545F4914F6CDD1DL)
    assert(agg.finish(fold(agg, vs)) === 800L)
    // duplicates must never promote: 4000 rows > sparseMax but 800 distinct
    assert(fold(agg, vs).dense.isEmpty)
    // arbitrary merge trees over arbitrary chunkings
    for (chunk <- Seq(1, 7, 100, 1333)) {
      val bufs = vs.grouped(chunk).map(fold(agg, _)).toSeq
      val left = bufs.reduceLeft(agg.merge)
      val right = bufs.reduceRight(agg.merge)
      assert(agg.finish(left) === 800L)
      assert(agg.finish(right) === 800L)
    }
  }

  test("dense regime: 3σ accuracy and merge-tree buffer IDENTITY") {
    val agg = new HllAgg(p = 12, sparseMax = 100)
    val n = 20000
    val vs = det(n, 42L)
    val whole = fold(agg, vs)
    assert(whole.dense.nonEmpty, "must have promoted")
    val est = agg.finish(whole)
    val rsd = 1.04 / math.sqrt(1 << 12)
    assert(math.abs(est - n).toDouble / n <= 3 * rsd,
      s"estimate $est outside 3σ of $n")
    // identity, not just in-bounds: every chunking/merge order yields
    // the same registers, hence the same estimate to the last bit
    for (chunk <- Seq(13, 500, 9999)) {
      val bufs = vs.grouped(chunk).map(fold(agg, _)).toSeq
      val l = bufs.reduceLeft(agg.merge)
      val r = bufs.reduceRight(agg.merge)
      assert(l.dense.toSeq === whole.dense.toSeq)
      assert(r.dense.toSeq === whole.dense.toSeq)
    }
  }

  test("sparse×dense merges agree with folding everything directly") {
    val agg = new HllAgg(p = 10, sparseMax = 50)
    val a = det(40, 1L)   // stays sparse
    val b = det(400, 2L)  // promotes
    val direct = fold(agg, a ++ b)
    assert(agg.finish(agg.merge(fold(agg, a), fold(agg, b)))
      === agg.finish(direct))
    assert(agg.finish(agg.merge(fold(agg, b), fold(agg, a)))
      === agg.finish(direct))
    // promotion boundary: sparseMax distinct stays exact, +1 densifies
    val edge = new HllAgg(p = 10, sparseMax = 10)
    assert(fold(edge, det(10, 3L)).dense.isEmpty)
    assert(fold(edge, det(11, 3L)).dense.nonEmpty)
  }

  test("small-range correction: dense estimate of a tiny set is near-exact") {
    // force dense with a handful of values: linear counting over 4096
    // registers estimates 20 within ±1
    val agg = new HllAgg(p = 12, sparseMax = 0)
    val est = agg.finish(fold(agg, det(20, 9L)))
    assert(math.abs(est - 20L) <= 1L, s"linear-counting estimate $est")
  }

  test("distributed groupBy equals the local fold and count(DISTINCT)") {
    val sp = spark
    import sp.implicits._
    val rows = for {
      g <- Seq("a", "b", "c"); v <- det(300, g.hashCode.toLong)
    } yield (g, v)
    val dup = rows ++ rows // duplication across partitions
    val df = dup.toDF("g", "v").repartition(13)
    val hll = udaf(new HllAgg(p = 12, sparseMax = 1000),
      org.apache.spark.sql.Encoders.scalaLong)
    val got = df.groupBy("g").agg(hll(col("v")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = df.groupBy("g").agg(countDistinct("v").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === exact)
  }

  test("hll_count resolves as SQL text on both session routes") {
    val sp = spark
    import sp.implicits._
    graft.GraftExtensions.register(sp)
    det(100, 5L).toDF("v").createOrReplaceTempView("hll_in")
    val n = sp.sql("SELECT hll_count(v) FROM hll_in").head.getLong(0)
    assert(n === 100L)
    // arity error is an analysis-time failure, not an encoder crash
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      sp.sql("SELECT hll_count(v, v) FROM hll_in").collect()
    }
    assert(e.getMessage.contains("hll_count"))
  }
}
