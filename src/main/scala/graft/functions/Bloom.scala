package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bloom-filter bitset as a Spark `Aggregator` — the set-membership
  * sketch a cross-split/cross-shard dedup gate runs at 100 TB (BFF-style
  * "bloom filter filter" pipelines, Dolma/DataComp; Bloom 1970 — all
  * public literature).
  *
  * Division of labor: position DERIVATION stays in Catalyst
  * ([[Bloom.positions]] — `xxhash64(key, seed_i) mod m`, codegen'd, no
  * UDF), so the aggregator never re-implements a hash: its input is the
  * already-derived k-position array, and the buffer is the OR-monoid on
  * a fixed m-bit bitset. That makes the merge contract trivial
  * (element-wise OR — associative/commutative/idempotent), so the
  * sketch survives any partial-aggregation merge tree, and build and
  * probe provably use the SAME positions because they share the same
  * Column expression.
  *
  * No-false-negative guarantee: a key inserted at build time has all k
  * bits set in every superset bitset, so a probe that finds a clear bit
  * is a DEFINITE miss — the basis for q85's "bloom-negative rows skip
  * the verify join" gate. False positives only cost a redundant verify
  * probe, never a wrong answer.
  */
final class BloomAgg(mBits: Int)
    extends Aggregator[Seq[Int], Array[Long], Array[Long]] {
  require(mBits >= 64 && mBits % 64 == 0, "mBits must be a positive multiple of 64")
  private val words = mBits / 64

  override def zero: Array[Long] = new Array[Long](words)

  override def reduce(b: Array[Long], pos: Seq[Int]): Array[Long] = {
    pos.foreach { p => b(p >>> 6) |= (1L << (p & 63)) }
    b
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { x(i) |= y(i); i += 1 }
    x
  }

  override def finish(b: Array[Long]): Array[Long] = b

  private val enc: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def bufferEncoder: Encoder[Array[Long]] = enc
  override def outputEncoder: Encoder[Array[Long]] = enc
}

object Bloom {
  /** The k probe positions of `key` in an m-bit filter, as a Catalyst
    * array expression: `pmod(xxhash64(key, i), m)` per probe — one
    * independent 64-bit hash per seed (not the double-hashing shortcut;
    * k is small, and per-seed hashes keep every probe expression pure
    * codegen). Build and probe MUST both call this. */
  def positions(key: Column, mBits: Int, k: Int): Column =
    array((0 until k).map(i =>
      pmod(xxhash64(key, lit(i)), lit(mBits.toLong)).cast("int")): _*)

  /** Membership probe against a bitset column: all k bits set. Unrolled
    * per probe (k is a small constant) so the whole test is one codegen'd
    * boolean expression — no higher-order functions in the 100 TB map
    * pass. */
  def mightContain(bits: Column, key: Column, mBits: Int, k: Int): Column =
    (0 until k).map { i =>
      val p = pmod(xxhash64(key, lit(i)), lit(mBits.toLong)).cast("int")
      val word = (call_function("shiftright", p, lit(6)) + 1).cast("int")
      val bit = call_function("shiftleft", lit(1L), p.bitwiseAND(lit(63)))
      element_at(bits, word).bitwiseAND(bit) =!= lit(0L)
    }.reduce(_ && _)
}
