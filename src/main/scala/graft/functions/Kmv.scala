package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Sparse/dense buffer: `hashes.isEmpty ∧ exact` sorted ⟺ sparse mode
  * (exact = the SORTED distinct raw values); once dense, `exact` is
  * empty and `hashes` holds the ≤ k smallest distinct 64-bit item
  * hashes, sorted ascending (unsigned order via the sign-bit flip). */
final case class KmvBuf(exact: Array[String], hashes: Array[Long])

/** K-Minimum-Values distinct sketch as a Spark `Aggregator` — the
  * seventh custom-aggregate entry (SURVEY §2.11). What it adds over
  * [[HllAgg]]: KMV sketches COMPOSE under set operations (Beyer et al.
  * 2007, "On synopses for distinct-value estimation"; the theta-sketch
  * family) — the k smallest hashes of A ∪ B are computable from the
  * two sketches alone, and the Jaccard estimate |sketch_k(A∪B) ∩ A's
  * hashes ∩ B's hashes|/k gives INTERSECTION estimates. That makes
  * per-partition distinct-overlap audits (how much does crawl shard A
  * duplicate shard B's vocabulary/users/urls?) a one-scan aggregate
  * plus an O(sources²·k) driver-free combine — where the exact
  * rendering (q99) pays a token-keyed self-join with O(vocab·sources²)
  * output. At 100 TB that is the difference between an hourly audit
  * and an overnight one.
  *
  * Exactness regime (the q59/q81/q86/q110 pattern): below `sparseMax`
  * distinct items the buffer is the sorted distinct RAW values — set
  * algebra on two sparse sketches (array_intersect/array_union) is
  * EXACT, value-for-value checkable by DuckDB (q116). Past it the
  * buffer densifies to the k smallest md5-derived 64-bit hashes.
  *
  * Mergeability: sparse∪sparse = sorted-distinct union (promoting past
  * `sparseMax`); dense merge = k smallest of the hash-set union.
  * Min-k of a set union is associative and commutative, so ANY merge
  * tree yields the IDENTICAL buffer (the HllAgg-strength pin). State
  * is O(sparseMax + k) per group regardless of stream length.
  *
  * Buffers are immutable arrays re-allocated per row (the MisraGries
  * trade: fine for profiling-scale k; a hot-path variant would carry
  * a mutable bounded heap behind the same merge contract). */
final class KmvAgg(k: Int = 1024, sparseMax: Int = 4096)
    extends Aggregator[String, KmvBuf, KmvBuf] {
  require(k >= 2, "k must be at least 2")
  require(sparseMax >= 0, "sparseMax must be non-negative")

  /** First 8 bytes of md5 as a long, sign-bit-flipped so SIGNED order
    * equals unsigned hash order (uniform over the full 2^64 range —
    * engine-portable and replay-stable like every registry hash). */
  private[functions] def h(item: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(item.getBytes("UTF-8"))
    val raw = java.nio.ByteBuffer.wrap(d).getLong(0)
    raw ^ Long.MinValue
  }

  private def densify(exact: Array[String]): Array[Long] =
    exact.map(h).distinct.sorted.take(k)

  override def zero: KmvBuf = KmvBuf(Array.empty, Array.emptyLongArray)

  override def reduce(b: KmvBuf, a: String): KmvBuf =
    if (b.hashes.nonEmpty || (b.exact.isEmpty && sparseMax == 0)) {
      val hv = h(a)
      val hs = b.hashes
      if (hs.length >= k && hv >= hs.last) b
      else if (java.util.Arrays.binarySearch(hs, hv) >= 0) b
      else KmvBuf(Array.empty, (hs :+ hv).sorted.take(k))
    } else {
      val i = java.util.Arrays.binarySearch(
        b.exact.asInstanceOf[Array[AnyRef]], a)
      if (i >= 0) b
      else {
        val s = (b.exact :+ a).sorted
        if (s.length <= sparseMax) KmvBuf(s, Array.emptyLongArray)
        else KmvBuf(Array.empty, densify(s))
      }
    }

  override def merge(x: KmvBuf, y: KmvBuf): KmvBuf =
    (x.hashes.nonEmpty || x.exact.isEmpty && sparseMax == 0,
      y.hashes.nonEmpty || y.exact.isEmpty && sparseMax == 0) match {
      case (false, false) =>
        val s = (x.exact ++ y.exact).distinct.sorted
        if (s.length <= sparseMax) KmvBuf(s, Array.emptyLongArray)
        else KmvBuf(Array.empty, densify(s))
      case (xa, _) =>
        val xs = if (xa) x.hashes else densify(x.exact)
        val ys = if (y.hashes.nonEmpty || y.exact.isEmpty) y.hashes
          else densify(y.exact)
        KmvBuf(Array.empty, (xs ++ ys).distinct.sorted.take(k))
    }

  override def finish(b: KmvBuf): KmvBuf = b

  private val enc: Encoder[KmvBuf] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[KmvBuf]()
  override def bufferEncoder: Encoder[KmvBuf] = enc
  override def outputEncoder: Encoder[KmvBuf] = enc
}

object KmvAgg {
  /** Distinct-count estimate from a buffer: exact in sparse mode, and
    * exact-up-to-hash-collisions while the sketch is unsaturated; the
    * classic (k−1)/h_(k) fraction once saturated. */
  def estimate(b: KmvBuf, k: Int): Double =
    if (b.hashes.isEmpty) b.exact.length.toDouble
    else if (b.hashes.length < k) b.hashes.length.toDouble
    else {
      // position of the k-th smallest hash in [0, 1): unsigned
      // fraction of the un-flipped value
      val frac = ((b.hashes.last ^ Long.MinValue) >>> 11).toDouble / (1L << 53).toDouble + 1.1102230246251565e-16
      (k - 1).toDouble / frac
    }
}
