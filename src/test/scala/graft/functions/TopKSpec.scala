package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Merge-tree contract of the bounded top-k aggregator — q92's oracle
  * checks the end-to-end grouped result; the combine algebra is pinned
  * here, engine-free. */
class TopKSpec extends AnyFunSuite {

  private def ref(xs: Seq[(Double, Long)], k: Int): Seq[(Double, Long)] =
    xs.sortBy { case (v, id) => (-v, id) }.take(k)

  test("fold equals sort-and-take under any insertion order") {
    val k = 5
    val agg = new TopK(k)
    val xs = (1 to 200).map(i =>
      (((i * 7919) % 23).toDouble, i.toLong)) // heavy value ties
    for (seed <- Seq(1, 7, 13)) {
      val shuffled = new scala.util.Random(seed).shuffle(xs)
      val got = shuffled.foldLeft(agg.zero)(agg.reduce)
      assert(got === ref(xs, k), s"seed $seed diverged")
    }
  }

  test("merge is exact under arbitrary split points and chunked trees") {
    val k = 7
    val agg = new TopK(k)
    val xs = (1 to 500).map(i => (((i * 104729) % 101).toDouble, i.toLong))
    val want = ref(xs, k)
    for (cut <- Seq(1, 250, 499)) {
      val (l, r) = xs.splitAt(cut)
      val m = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      assert(m === want, s"split at $cut diverged")
    }
    val chunked = xs.grouped(37)
      .map(c => c.foldLeft(agg.zero)(agg.reduce)).reduce(agg.merge)
    assert(chunked === want)
  }

  test("state never exceeds k; short groups return all rows sorted") {
    val agg = new TopK(4)
    val xs = Seq((1.0, 9L), (3.0, 2L), (3.0, 1L))
    val got = xs.foldLeft(agg.zero)(agg.reduce)
    assert(got === Seq((3.0, 1L), (3.0, 2L), (1.0, 9L)))
    val big = (1 to 100).map(i => (i.toDouble, i.toLong))
    assert(big.foldLeft(agg.zero)(agg.reduce).length === 4)
  }
}
