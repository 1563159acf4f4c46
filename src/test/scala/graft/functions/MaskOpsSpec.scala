package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native bitmap kernels behind the set-similarity verify
  * (MaskIntersect) and the q160 canonical-pair test (NoCommonBitBelow)
  * must agree value-for-value with the HOF renderings they replaced —
  * the renderings ARE the specification (and what the DuckDB oracles
  * re-derive from raw tokens). */
class MaskOpsSpec extends SparkSpec {
  import org.apache.spark.sql.GraftSqlBridge.{column, expression}

  private def masks(n: Int, buckets: Int) = {
    import spark.implicits._
    // deterministic pseudo-random masks, some sparse, some dense
    Seq.tabulate(n)(i =>
      (i.toLong,
        Array.tabulate(buckets)(j =>
          if ((i + j) % 3 == 0) 0L
          else java.lang.Long.rotateLeft(0x9E3779B97F4A7C15L * (i * 31 + j + 1), i + j)),
        Array.tabulate(buckets)(j =>
          if ((i * 7 + j) % 4 == 0) 0L
          else java.lang.Long.rotateLeft(0xC2B2AE3D27D4EB4FL * (i * 17 + j + 1), i * 2 + j))))
      .toDF("id", "a", "b")
  }

  test("mask_intersect equals the HOF popcount fold on every row") {
    val df = masks(200, 7)
    val r = df.select(
      column(MaskIntersect(expression(col("a")), expression(col("b"))))
        .as("fast"),
      aggregate(zip_with(col("a"), col("b"),
        (x, y) => bit_count(x.bitwiseAND(y)).cast("long")),
        lit(0L), (acc, x) => acc + x).as("hof"))
      .collect()
    r.foreach(row => assert(row.getLong(0) == row.getLong(1)))
  }

  test("mask_intersect is registered as a SQL function on both session routes; integral literals coerce") {
    graft.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT mask_intersect(array(CAST(6 AS BIGINT), CAST(12 AS BIGINT))," +
        " array(CAST(3 AS BIGINT), CAST(10 AS BIGINT))) AS n," +
        " mask_intersect(array(6, 12), array(3, 10)) AS coerced").head()
    // 6&3 = 2 (1 bit), 12&10 = 8 (1 bit)
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    // a non-integral array must FAIL AT ANALYSIS through the kernel's
    // own type check — the round-9 blanket Cast made it a runtime ANSI
    // cast error instead (round-9 advice)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT mask_intersect(array('x'), array(1, 2))").head()
    }
    assert(e.getMessage.toLowerCase.contains("mask_intersect") ||
      e.getMessage.toLowerCase.contains("data type mismatch"),
      s"expected the kernel's analysis-time type failure, got: $e")
    // empty / all-null array literals type as array<void> and must keep
    // COERCING (round-10 advice: the round-9 widen regressed them to an
    // analysis failure). Values follow the kernel's existing padding
    // semantics — two empty masks intersect to 0 bits; an empty mask
    // against a populated one pads with null elements and yields NULL
    // (the zip_with contract the null-semantics test pins) — the
    // regression being pinned here is the ANALYSIS, not new semantics
    val z = spark.sql(
      "SELECT mask_intersect(array(), array()) AS both_empty," +
        " mask_intersect(array(), array(1, 2)) AS empty_vs_full," +
        " mask_intersect(array(CAST(NULL AS INT)), array(7)) AS null_elem")
      .head()
    assert(z.getLong(0) == 0L, "two empty masks share 0 bits")
    assert(z.isNullAt(1), "length-mismatch padding yields NULL")
    assert(z.isNullAt(2), "a null element yields NULL (padding contract)")
  }

  test("mask_intersect null semantics match zip_with padding") {
    import spark.implicits._
    val df = Seq(
      (Some(Array(1L, 2L)), Array(3L)),          // length mismatch
      (None: Option[Array[Long]], Array(1L)))    // null array
      .toDF("a", "b")
    val r = df.select(
      column(MaskIntersect(expression(col("a")), expression(col("b"))))
        .as("fast")).collect()
    assert(r.forall(_.isNullAt(0)))
  }

  test("no_common_bit_below equals the HOF rendering for every (bucket, bit) position") {
    val df = masks(100, 5)
    // every bucket × a few bit positions, including the sign bit.
    // NB the below-mask is precomputed (bit − 1 wraps correctly in
    // Scala): the in-plan `col - 1` rendering the kernel replaced was
    // a LATENT ANSI OVERFLOW at bit = 1L<<63 — writing this spec
    // found it; the kernel's Java subtraction wraps to exactly the
    // all-bits-below-the-sign-bit mask
    val cases = for (k <- 0 until 5; s <- Seq(0, 1, 13, 63)) yield (k, s)
    cases.foreach { case (k, s) =>
      val bit = 1L << s
      val below = bit - 1L
      val r = df
        .withColumn("pc", zip_with(col("a"), col("b"),
          (x, y) => x.bitwiseAND(y)))
        .select(
          column(NoCommonBitBelow(expression(col("a")),
            expression(col("b")), expression(lit(k)),
            expression(lit(bit)))).as("fast"),
          (!expr(s"exists(slice(pc, 1, $k), x -> x != 0L)") &&
            (expr(s"element_at(pc, $k + 1)")
              .bitwiseAND(lit(below)) === 0)).as("hof"))
        .collect()
      r.foreach(row => assert(row.getBoolean(0) == row.getBoolean(1),
        s"divergence at bucket=$k bit=1L<<$s"))
    }
  }

  test("ph_canonical_triple: lowest untouched triple vs a Scala reference; null under 3 zero chunks") {
    def reference(x: Long): Option[Int] = {
      val zeros = (0 until 10).filter(b => ((x >>> (6 * b)) & 63L) == 0L)
      if (zeros.length < 3) None
      else Some(zeros(0) * 100 + zeros(1) * 10 + zeros(2))
    }
    val rng = new scala.util.Random(42)
    val xs = Seq(0L, 63L, 63L << 54) ++
      // sparse xors (the hamming<=7 regime: few bits set)
      Seq.fill(300)((0 until rng.nextInt(8)).map(_ =>
        1L << rng.nextInt(60)).foldLeft(0L)(_ | _)) ++
      // dense xors (null regime)
      Seq.fill(50)(rng.nextLong() & ((1L << 60) - 1))
    xs.foreach { x =>
      assert(Option(PhCanonicalTriple.tripleId(x, 10))
        .map(_.intValue()) == reference(x), s"x=$x")
    }
    // the keyed-combos encoding contract: tid = i*100 + j*10 + k with
    // i<j<k over chunks 0..9 — the all-untouched pair anchors at 012
    assert(PhCanonicalTriple.tripleId(0L, 10) == 12)
  }

  test("no_common_bit_below is defensive on malformed inputs") {
    import spark.implicits._
    val df = Seq((Array(1L, 2L), Array(3L, 4L))).toDF("a", "b")
    def run(k: Int) = df.select(
      column(NoCommonBitBelow(expression(col("a")), expression(col("b")),
        expression(lit(k)), expression(lit(1L)))).as("x")).head()
    assert(run(2).isNullAt(0), "out-of-range bucket must null, not throw")
    assert(run(-1).isNullAt(0))
    assert(!run(0).isNullAt(0))
  }
}
