package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** KMV sketch guarantees, engine-free plus one distributed run:
  *  - exact regime: the buffer IS the sorted distinct set, under any
  *    chunking; set algebra on two sparse sketches is exact;
  *  - merge-tree identity: min-k of a set union commutes/associates,
  *    so every chunking yields the IDENTICAL buffer, sparse or dense;
  *  - dense estimator: within the ±3/√k envelope on a cardinality far
  *    past saturation, and exact-up-to-collisions while unsaturated;
  *  - promotion: crossing sparseMax in reduce or in merge lands on the
  *    same dense buffer as densifying the total.
  */
class KmvSpec extends SparkSpec {

  private def items(n: Int): Seq[String] = (0 until n).map(i => s"item_$i")

  private def foldChunks(agg: KmvAgg, chunks: Seq[Seq[String]]): KmvBuf = {
    val bufs = chunks.map(_.foldLeft(agg.zero)(agg.reduce))
    bufs.reduce(agg.merge)
  }

  private def chunkings(xs: Seq[String]): Seq[Seq[Seq[String]]] = Seq(
    Seq(xs),
    xs.grouped(7).toSeq,
    xs.grouped(501).toSeq,
    Seq(xs.take(3), xs.drop(3)))

  test("exact regime: buffer is the sorted distinct set, any chunking") {
    val xs = items(40) ++ items(40) // every item twice
    val agg = new KmvAgg(k = 16, sparseMax = 64)
    for (ch <- chunkings(xs)) {
      val b = foldChunks(agg, ch)
      assert(b.hashes.isEmpty)
      assert(b.exact.toSeq === items(40).sorted)
    }
  }

  test("merge-tree identity holds sparse, dense, and across promotion") {
    for ((n, k, sm) <- Seq((40, 16, 64), (500, 64, 100), (500, 64, 0))) {
      val xs = items(n)
      val agg = new KmvAgg(k = k, sparseMax = sm)
      val ref = foldChunks(agg, chunkings(xs).head)
      for (ch <- chunkings(xs).tail) {
        val got = foldChunks(agg, ch)
        assert(got.exact.toSeq === ref.exact.toSeq)
        assert(got.hashes.toSeq === ref.hashes.toSeq)
      }
    }
  }

  test("dense estimator: unsaturated is exact, saturated within the rsd envelope") {
    val k = 256
    val agg = new KmvAgg(k = k, sparseMax = 0)
    // unsaturated: fewer distincts than k → estimate is the hash count
    val small = foldChunks(agg, Seq(items(100)))
    assert(small.hashes.length == 100)
    assert(KmvAgg.estimate(small, k) === 100.0)
    // saturated: 50k distincts, k=256 → rsd ≈ 1/√k ≈ 6.3%; allow 4σ
    val n = 50000
    val big = foldChunks(agg, items(n).grouped(977).toSeq)
    assert(big.hashes.length == k)
    val est = KmvAgg.estimate(big, k)
    assert(math.abs(est - n) < 4 * n / math.sqrt(k),
      s"estimate $est too far from $n")
  }

  test("promotion in reduce equals promotion in merge equals densify-total") {
    val xs = items(200)
    val byReduce = foldChunks(new KmvAgg(k = 32, sparseMax = 50), Seq(xs))
    val byMerge = foldChunks(new KmvAgg(k = 32, sparseMax = 50),
      xs.grouped(40).toSeq) // each chunk stays sparse; merge promotes
    val direct = foldChunks(new KmvAgg(k = 32, sparseMax = 0), Seq(xs))
    assert(byReduce.hashes.toSeq === direct.hashes.toSeq)
    assert(byMerge.hashes.toSeq === direct.hashes.toSeq)
  }

  test("distributed run: sparse sketch equals the exact distinct set") {
    val sp = spark
    import sp.implicits._
    val kmv = udaf(new KmvAgg(k = 64, sparseMax = 1024),
      org.apache.spark.sql.Encoders.STRING)
    val xs = items(300) ++ items(300)
    val got = xs.toDF("w").repartition(8)
      .agg(kmv(col("w")).as("sk"))
      .select(col("sk.exact")).as[Seq[String]].head()
    assert(got === items(300).sorted)
  }
}
