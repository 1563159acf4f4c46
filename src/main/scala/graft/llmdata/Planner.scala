package graft.llmdata

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{Caches, Q, Tables}

/** LSH parameter planner — the design-time knob-chooser for the MinHash
  * family (q29/q109): given a hash budget and a target Jaccard
  * threshold, pick the (bands b × rows-per-band r) split that minimizes
  * expected candidate error ON THIS CORPUS. The S-curve
  * P(candidate | s) = 1 − (1 − s^r)^b (Leskovec–Rajaraman–Ullman,
  * Mining of Massive Datasets ch. 3 — public literature) prices every
  * split; what the textbook can't supply is the corpus's own pair-
  * similarity mass, so the planner measures it: a deterministic
  * 64-doc sample (md5-ranked, the q50 engine-stable discipline), all
  * C(64,2) = 2016 exact pairwise Jaccards, folded to a 20-bin
  * histogram. Expected false positives = below-threshold mass that the
  * curve still admits; expected false negatives = above-threshold mass
  * it misses; chosen = the split minimizing FP + FN (deterministic
  * tie-break on band count).
  *
  * Everything is integer fixed-point: bin-mid similarities in micro
  * units, s^r and (1−s^r)^b as UNROLLED floor-multiply chains
  * (x·y div 10^6 per step) — the identical arithmetic token-for-token
  * in Spark (`div`) and DuckDB (`//`), so the S-curve is hash-exact
  * cross-engine with no pow() in sight (library pow differs in ulps
  * between engines).
  *
  * Scale: the planner's cost is O(sample²) = constant — independent of
  * corpus size. The only corpus-sized work is ranking doc ids for the
  * sample (one TakeOrdered over ids, no text moved); token sets are
  * built for the 64 sampled docs only (broadcast semi-join pushdown).
  * At 100 TB this runs in seconds and decides the layout of the
  * petabyte-sized signature/band tables it plans for.
  */
object Planner {

  /** Hash budget the planner splits: b·r = 24. */
  private val Splits: Seq[(Int, Int)] =
    Seq(1 -> 24, 2 -> 12, 3 -> 8, 4 -> 6, 6 -> 4, 8 -> 3, 12 -> 2, 24 -> 1)

  private val SampleN = 64
  private val Bins = 20          // histogram bins over [0, 1]
  private val ThresholdBin = 14  // bin mids ≥ 0.7 ⇔ bin ≥ 14 (t = 0.70)

  /** x^n in micro fixed-point as an unrolled floor-multiply chain:
    * acc ← (acc · x) idiv 10^6, n−1 times. `x` must be an expression in
    * [0, 10^6]; every intermediate ≤ 10^12, exact in BIGINT. */
  private def powChain(x: String, n: Int, idiv: String): String =
    (2 to n).foldLeft(x)((acc, _) => s"(($acc) * ($x)) $idiv 1000000")

  /** 1 − (1 − s^r)^b over micro-unit column `s`, rendered per split. */
  private def sCurve(s: String, b: Int, r: Int, idiv: String): String =
    s"1000000 - (${powChain(s"1000000 - (${powChain(s, r, idiv)})", b, idiv)})"

  val qs: Seq[Q] = Seq(

    // ---- q189: choose (bands, rows) for a 24-hash MinHash budget from
    //      the measured pair-similarity histogram. Output: the full
    //      priced grid (audit trail — the planner SHOWS its work, the
    //      q176 tuner discipline) with expected FP/FN/cost in pair-micro
    //      units and the chosen row flagged. ----
    Q(
      "q189_lsh_parameter_plan",
      {
        val grid = Splits.map { case (b, r) =>
          val p = sCurve("(2 * bin + 1) * 25000", b, r, "//")
          s"""SELECT $b AS n_bands, $r AS rows_per_band,
            |  CAST(sum(CASE WHEN bin < $ThresholdBin
            |    THEN n_pairs * ($p) ELSE 0 END) AS BIGINT) AS exp_fp_micro,
            |  CAST(sum(CASE WHEN bin >= $ThresholdBin
            |    THEN n_pairs * (1000000 - ($p)) ELSE 0 END) AS BIGINT)
            |    AS exp_fn_micro
            |FROM h""".stripMargin
        }.mkString("\n  UNION ALL\n")
        s"""WITH samp AS (SELECT doc_id FROM documents
          |  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT $SampleN),
          |words AS (SELECT DISTINCT d.doc_id,
          |    unnest(string_split(d.text, ' ')) AS w
          |  FROM documents d JOIN samp USING (doc_id)),
          |wc AS (SELECT doc_id, count(*) AS nw FROM words GROUP BY doc_id),
          |pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
          |  FROM samp a JOIN samp b ON a.doc_id < b.doc_id),
          |inter AS (SELECT wa.doc_id AS a_id, wb.doc_id AS b_id,
          |    count(*) AS ni
          |  FROM words wa JOIN words wb
          |    ON wa.w = wb.w AND wa.doc_id < wb.doc_id
          |  GROUP BY 1, 2),
          |pj AS (SELECT p.a_id, p.b_id, coalesce(i.ni, 0) AS ni,
          |    ca.nw + cb.nw - coalesce(i.ni, 0) AS un
          |  FROM pairs p
          |  LEFT JOIN inter i ON i.a_id = p.a_id AND i.b_id = p.b_id
          |  JOIN wc ca ON ca.doc_id = p.a_id
          |  JOIN wc cb ON cb.doc_id = p.b_id),
          |h AS (SELECT least(${Bins - 1}, (ni * $Bins) // un) AS bin,
          |    CAST(count(*) AS BIGINT) AS n_pairs
          |  FROM pj GROUP BY 1),
          |grid AS (
          |$grid
          |)
          |SELECT n_bands, rows_per_band, exp_fp_micro, exp_fn_micro,
          |  exp_fp_micro + exp_fn_micro AS cost_micro,
          |  CASE WHEN row_number() OVER (ORDER BY
          |      exp_fp_micro + exp_fn_micro, n_bands) = 1
          |    THEN 1 ELSE 0 END AS chosen
          |FROM grid ORDER BY n_bands""".stripMargin
      },
    ) { (s, d) =>
      val docs = Tables.documents(s, d)
      // deterministic sample: corpus-sized work is ranking ids only
      val samp = broadcast(docs.select(col("doc_id"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        .limit(SampleN))
      // per-doc token dedup is row-local (round 15, the setSim change)
      val words = docs.join(samp, "doc_id")
        .select(col("doc_id"),
          explode(array_distinct(split(col("text"), " "))).as("w"))
      val wc = words.groupBy("doc_id").agg(count(lit(1)).as("nw"))
      val pairs = samp.select(col("doc_id").as("a_id"))
        .join(samp.select(col("doc_id").as("b_id")),
          col("a_id") < col("b_id"))
      val inter = words.select(col("doc_id").as("a_id"), col("w"))
        .join(words.select(col("doc_id").as("b_id"), col("w")), Seq("w"))
        .filter(col("a_id") < col("b_id"))
        .groupBy("a_id", "b_id").agg(count(lit(1)).as("ni"))
      val pj = pairs
        .join(inter, Seq("a_id", "b_id"), "left")
        .na.fill(0L, Seq("ni"))
        .join(wc.select(col("doc_id").as("a_id"), col("nw").as("na")), "a_id")
        .join(wc.select(col("doc_id").as("b_id"), col("nw").as("nb")), "b_id")
        .withColumn("un", col("na") + col("nb") - col("ni"))
      val h = Caches.persist(pj
        .select(least(lit(Bins - 1), expr(s"(ni * $Bins) div un")).as("bin"))
        .groupBy("bin").agg(count(lit(1)).as("n_pairs")))
      val grid = Splits.map { case (b, r) =>
        val p = sCurve("(2 * bin + 1) * 25000", b, r, "div")
        h.agg(
          sum(expr(s"CASE WHEN bin < $ThresholdBin THEN n_pairs * ($p) " +
            "ELSE CAST(0 AS BIGINT) END")).cast("long").as("exp_fp_micro"),
          sum(expr(s"CASE WHEN bin >= $ThresholdBin " +
            s"THEN n_pairs * (1000000 - ($p)) ELSE CAST(0 AS BIGINT) END"))
            .cast("long").as("exp_fn_micro"))
          .select(lit(b).as("n_bands"), lit(r).as("rows_per_band"),
            col("exp_fp_micro"), col("exp_fn_micro"))
      }.reduce(_ unionAll _)
      // 8-row config domain: the unpartitioned window is metadata-sized
      val rank = Window.orderBy(
        (col("exp_fp_micro") + col("exp_fn_micro")).asc, col("n_bands").asc)
      grid
        .withColumn("cost_micro", col("exp_fp_micro") + col("exp_fn_micro"))
        .withColumn("chosen",
          when(row_number().over(rank) === 1, 1).otherwise(0))
        .orderBy("n_bands")
    },
  )
}
