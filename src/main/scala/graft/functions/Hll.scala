package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Sparse/dense buffer: `dense.isEmpty` ⟺ sparse mode, where `sparse`
  * is the SORTED distinct raw values seen so far (exact); once dense,
  * `sparse` is empty and `dense` holds the 2^p rank registers. */
final case class HllBuf(sparse: Array[Long], dense: Array[Byte])

/** HyperLogLog distinct-count sketch as a Spark `Aggregator` — the
  * fifth entry on the custom-AGGREGATE extensibility surface (SURVEY
  * §2.11), next to MisraGries / QuantileSketchAgg / TopK / BloomAgg.
  *
  * q41 gates Spark's built-in `approx_count_distinct` only by an
  * in-engine 3σ accuracy bound (Spark's HLL++ and DuckDB's sketch
  * differ, so the estimate itself has no value-level oracle). This
  * aggregator closes that gap the way the rest of the sketch family
  * does — with a genuine EXACTNESS regime (the q59/q81/q86 pattern):
  *
  *  - '''Sparse mode''' (HLL++'s idea, Heule et al. 2013, public):
  *    until a group's distinct count exceeds `sparseMax`, the buffer
  *    is the sorted array of distinct RAW values — `finish` returns
  *    its length, which is EXACTLY `count(DISTINCT x)`, value-for-
  *    value checkable by DuckDB (q110). No hashing is involved on
  *    this path, so there is no collision caveat.
  *  - '''Dense mode''': past `sparseMax` the buffer densifies to the
  *    classic 2^p byte registers (Flajolet et al. 2007): register
  *    j = max leading-zero rank of the hash suffix among values
  *    hashing to j; estimate = α·m²/Σ2^−M[j] with the small-range
  *    linear-counting correction. The 64-bit splitmix64 mixer makes
  *    the large-range correction unnecessary.
  *
  * Mergeability (Spark's partial-aggregation contract): sparse∪sparse
  * is sorted-distinct union (promoting if it outgrows `sparseMax`);
  * anything dense absorbs the other side by hashing its values /
  * taking register-wise max. Register max is a semilattice join, and
  * the sparse set is a set union — both order-free — so ANY merge
  * tree yields the IDENTICAL buffer, not just a statistically
  * equivalent one (spec-pinned; stronger than the MisraGries
  * guarantee, whose truncation is merge-order-sensitive within its
  * error bound).
  *
  * State is O(sparseMax + 2^p) per group regardless of stream length;
  * the shuffle carries the buffer, never the values. Defaults: p=12
  * (m=4096 registers, rsd ≈ 1.6%), sparseMax=4096 (the exact regime
  * covers any group the registry queries aggregate at test scales).
  */
final class HllAgg(p: Int = 12, sparseMax: Int = 4096)
    extends Aggregator[Long, HllBuf, Long] {
  require(p >= 4 && p <= 16, "p must be in [4, 16]")
  require(sparseMax >= 0, "sparseMax must be non-negative")
  private val m = 1 << p

  /** splitmix64 finalizer (public-domain mixer): full-avalanche 64-bit
    * hash of the raw value. */
  private def mix(v: Long): Long = {
    var z = v + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Register update for one hash: index = top p bits, rank = leading
    * zeros of the remaining 64−p bits + 1 (capped). */
  private def addHash(regs: Array[Byte], h: Long): Unit = {
    val idx = (h >>> (64 - p)).toInt
    val w = h << p
    val rank = math.min(java.lang.Long.numberOfLeadingZeros(w) + 1, 64 - p + 1)
    if (rank > regs(idx)) regs(idx) = rank.toByte
  }

  private def densify(values: Array[Long]): Array[Byte] = {
    val regs = new Array[Byte](m)
    var i = 0
    while (i < values.length) { addHash(regs, mix(values(i))); i += 1 }
    regs
  }

  override def zero: HllBuf = HllBuf(Array.empty, Array.empty)

  override def reduce(b: HllBuf, v: Long): HllBuf =
    if (b.dense.nonEmpty) { addHash(b.dense, mix(v)); b }
    else {
      val pos = java.util.Arrays.binarySearch(b.sparse, v)
      if (pos >= 0) b                               // duplicate: exact set unchanged
      else {
        val at = -pos - 1
        val s = new Array[Long](b.sparse.length + 1)
        System.arraycopy(b.sparse, 0, s, 0, at)
        s(at) = v
        System.arraycopy(b.sparse, at, s, at + 1, b.sparse.length - at)
        if (s.length > sparseMax) HllBuf(Array.empty, densify(s))
        else HllBuf(s, b.dense)
      }
    }

  override def merge(x: HllBuf, y: HllBuf): HllBuf =
    if (x.dense.isEmpty && y.dense.isEmpty) {
      // sorted-distinct union of two sorted arrays
      val s = new Array[Long](x.sparse.length + y.sparse.length)
      var (i, j, n) = (0, 0, 0)
      while (i < x.sparse.length || j < y.sparse.length) {
        val v =
          if (j >= y.sparse.length) { i += 1; x.sparse(i - 1) }
          else if (i >= x.sparse.length) { j += 1; y.sparse(j - 1) }
          else if (x.sparse(i) < y.sparse(j)) { i += 1; x.sparse(i - 1) }
          else if (x.sparse(i) > y.sparse(j)) { j += 1; y.sparse(j - 1) }
          else { i += 1; j += 1; x.sparse(i - 1) }
        s(n) = v; n += 1
      }
      val u = java.util.Arrays.copyOf(s, n)
      if (u.length > sparseMax) HllBuf(Array.empty, densify(u))
      else HllBuf(u, Array.empty)
    } else {
      val regs =
        if (x.dense.nonEmpty) java.util.Arrays.copyOf(x.dense, m)
        else densify(x.sparse)
      if (y.dense.nonEmpty) {
        var i = 0
        while (i < m) {
          if (y.dense(i) > regs(i)) regs(i) = y.dense(i); i += 1
        }
      } else {
        var i = 0
        while (i < y.sparse.length) { addHash(regs, mix(y.sparse(i))); i += 1 }
      }
      HllBuf(Array.empty, regs)
    }

  override def finish(b: HllBuf): Long =
    if (b.dense.isEmpty) b.sparse.length.toLong
    else {
      val alpha =
        if (m == 16) 0.673 else if (m == 32) 0.697
        else if (m == 64) 0.709 else 0.7213 / (1.0 + 1.079 / m)
      var sum = 0.0
      var zeros = 0
      var i = 0
      while (i < m) {
        sum += java.lang.Math.pow(2.0, -b.dense(i).toDouble)
        if (b.dense(i) == 0) zeros += 1
        i += 1
      }
      val e = alpha * m.toDouble * m.toDouble / sum
      val corrected =
        if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
        else e
      math.round(corrected)
    }

  private val bufEnc: Encoder[HllBuf] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[HllBuf]()
  override def bufferEncoder: Encoder[HllBuf] = bufEnc
  override def outputEncoder: Encoder[Long] =
    org.apache.spark.sql.Encoders.scalaLong
}
