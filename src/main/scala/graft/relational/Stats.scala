package graft.relational

import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Optimizer-statistics operators — the sketches and histograms a
  * cost-based planner (or a 100 TB capacity review) derives from the
  * data to predict plan costs BEFORE running them: frequency moments
  * for join-size estimation, equi-width histograms for range-predicate
  * selectivity. Both are one-pass, mergeable, bounded-state
  * aggregations — the ANALYZE TABLE job shape — and both are audited
  * here against the exact answer in the same plan, because an
  * estimator you never validate is how 100 TB plans go 100× over
  * budget.
  */
object Stats {

  val qs: Seq[Q] = Seq(
    // ---- q145: frequency moments F0/F1/F2 over the lineitem→supplier
    //      FK — THE optimizer join statistic (Alon–Matias–Szegedy's
    //      moment problem): F2 = Σ f(k)² IS the self-equi-join
    //      cardinality on the key, the quantity a planner needs to
    //      cost any join through `l_suppkey`, and F2/F0 its skew
    //      signal. Computed from ONE Misra–Gries pass (k = 2^16) in
    //      its EXACTNESS regime — k exceeds the supplier count through
    //      sf1 (10^4), so no decrement ever fires and the sketch IS
    //      the exact frequency table (the q59/q81/q86 gate pattern).
    //      The regime is asserted loudly in-plan: Σ map-values must
    //      equal the row count (any MG decrement breaks that
    //      invariant), so a scale-up past the knob raises instead of
    //      silently under-counting (round-6 ADVICE discipline). The
    //      moment fold is a codegen'd HOF over the one-row map —
    //      never a second scan. ----
    Q(
      "q145_frequency_moments",
      """WITH c AS (SELECT l_suppkey, count(*) AS cnt
        |  FROM lineitem GROUP BY 1)
        |SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
        |  CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(sum(cnt * cnt) AS BIGINT) AS selfjoin_pairs
        |FROM c""".stripMargin,
    ) { (s, d) =>
      val mg = udaf(new graft.functions.MisraGries(1 << 16),
        org.apache.spark.sql.Encoders.STRING)
      val guarded = when(
        assert_true(
          expr("aggregate(map_values(m), CAST(0 AS BIGINT), " +
            "(acc, v) -> acc + v)") === col("n_rows"),
          lit("q145 requires the Misra-Gries exactness regime: key " +
            "cardinality exceeded k=65536 and counts decremented - " +
            "raise k or switch to the CountMin estimate")).isNull,
        col("m"))
      Tables.lineitem(s, d)
        .select(col("l_suppkey").cast("string").as("k"))
        .agg(mg(col("k")).as("m"), count(lit(1)).as("n_rows"))
        .select(col("n_rows"), guarded.as("m"))
        .select(col("n_rows"),
          expr("CAST(cardinality(m) AS BIGINT)").as("n_keys"),
          expr("aggregate(map_values(m), CAST(0 AS BIGINT), " +
            "(acc, v) -> acc + v * v)").as("selfjoin_pairs"))
    },

    // ---- q146: histogram selectivity audit — build a 20-bucket
    //      equi-width histogram over o_totalprice (min/max from the
    //      data, the ANALYZE pass), then predict the row count of a
    //      range predicate by uniform-within-bucket interpolation and
    //      compare against the exact count IN THE SAME PLAN. Bucket
    //      assignment and the per-bucket fractional overlap are the
    //      same IEEE double ops in both engines (2-decimal inputs);
    //      each bucket's contribution is floored to integer
    //      MILLI-rows BEFORE the sum, so the final add is associative
    //      integer math — a double sum's partition-order
    //      nondeterminism can never move the estimate (the q119
    //      exactness discipline applied to an estimator). Three
    //      aggregations total (min/max scalar, bucket counts, exact
    //      count), each one shuffle of at most bucket cardinality;
    //      the min/max scalar rides a broadcast cross join (q15's
    //      pattern). ----
    Q(
      "q146_histogram_selectivity",
      """WITH mm AS (SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx
        |  FROM orders),
        |h AS (SELECT least(19, CAST(floor((o_totalprice - mm.mn)
        |      / ((mm.mx - mm.mn) / 20)) AS BIGINT)) AS b,
        |    count(*) AS cnt
        |  FROM orders, mm GROUP BY 1),
        |est AS (SELECT CAST(sum(CAST(floor(1000 * cnt
        |      * (least(300000.0, mm.mn + (b + 1) * ((mm.mx - mm.mn) / 20))
        |        - greatest(150000.0, mm.mn + b * ((mm.mx - mm.mn) / 20)))
        |      / ((mm.mx - mm.mn) / 20)) AS BIGINT)) // 1000
        |    AS BIGINT) AS est_rows
        |  FROM h, mm
        |  WHERE mm.mn + (b + 1) * ((mm.mx - mm.mn) / 20) > 150000.0
        |    AND mm.mn + b * ((mm.mx - mm.mn) / 20) < 300000.0),
        |act AS (SELECT count(*) AS actual_rows FROM orders
        |  WHERE o_totalprice >= 150000.0 AND o_totalprice < 300000.0)
        |SELECT est.est_rows, act.actual_rows,
        |  abs(est.est_rows - act.actual_rows) AS abs_err
        |FROM est, act""".stripMargin,
    ) { (s, d) =>
      val orders = Tables.orders(s, d)
      val mm = orders.agg(min("o_totalprice").as("mn"),
        max("o_totalprice").as("mx"))
      val lo = lit(150000.0)
      val hi = lit(300000.0)
      val w = (col("mx") - col("mn")) / 20
      val h = orders.crossJoin(broadcast(mm))
        .select(least(lit(19L),
          floor((col("o_totalprice") - col("mn")) / w).cast("long"))
          .as("b"))
        .groupBy("b").agg(count(lit(1)).as("cnt"))
      val est = h.crossJoin(broadcast(mm))
        .filter(col("mn") + (col("b") + 1) * w > lo &&
          col("mn") + col("b") * w < hi)
        .withColumn("milli", floor(lit(1000) * col("cnt") *
          (least(hi, col("mn") + (col("b") + 1) * w) -
            greatest(lo, col("mn") + col("b") * w)) / w).cast("long"))
        .agg(expr("CAST(sum(milli) div 1000 AS BIGINT)").as("est_rows"))
      val act = orders
        .filter(col("o_totalprice") >= lo && col("o_totalprice") < hi)
        .agg(count(lit(1)).as("actual_rows"))
      est.crossJoin(broadcast(act))
        .select(col("est_rows"), col("actual_rows"),
          abs(col("est_rows") - col("actual_rows")).as("abs_err"))
    },
  )
}
