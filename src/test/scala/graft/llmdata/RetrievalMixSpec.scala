package graft.llmdata

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Semantics of the round-6 retrieval / mixture / SCD2 ops (q70–q74)
  * that a plan check can't pin: BM25 ranking properties, rarity-score
  * bounds, budget-cutoff invariants, sample-rank invariants, and SCD2
  * interval algebra. */
class RetrievalMixSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("q70: BM25 returns ≤10 docs, scores positive-descending, rare term dominates") {
    val rows = SparkEntry.queries("q70_bm25")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.forall(_ > 0.0))
    assert(scores.sameElements(scores.sortBy(-_)), "emit order is score desc")
    // 'dup' has df≈5% vs ≈75% for the other terms: its rational idf is
    // orders of magnitude larger, so every top-10 doc must contain it
    val top = rows.map(_.getAs[Long]("doc_id")).toSet
    val dupDocs = graft.Tables.documents(spark, sf)
      .filter(array_contains(split(col("text"), " "), "dup"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(top.subsetOf(dupDocs), "top-10 must all contain the rare term")
  }

  test("q71: rarity score is (0,1] and orders rare-vocab docs below common ones") {
    val out = SparkEntry.queries("q71_rare_token_score")(spark, sf).cache()
    try {
      assert(out.filter(col("mean_df_frac") <= 0.0 || col("mean_df_frac") > 1.0)
        .count() == 0, "mean df fraction is a probability")
      // docs containing the rare token score strictly below the corpus max
      val withDup = SparkEntry.queries("q71_rare_token_score")(spark, sf)
        .join(graft.Tables.documents(spark, sf)
          .filter(array_contains(split(col("text"), " "), "dup"))
          .select("doc_id"), "doc_id")
      val maxAll = out.agg(max("mean_df_frac")).head.getDouble(0)
      val maxDup = withDup.agg(max("mean_df_frac")).head.getDouble(0)
      assert(maxDup < maxAll, "rare-token docs sit below the common-doc ceiling")
    } finally out.unpersist()
  }

  test("q72: budget cutoff — kept set is a prefix in md5 order and never overspends") {
    val out = SparkEntry.queries("q72_token_budget_mix")(spark, sf).cache()
    try {
      assert(out.filter(col("cum_tok") > 600).count() == 0, "budget is a hard cap")
      // prefix property: within a source, cum_tok reconstructs as the
      // running sum in (md5, doc_id) order — no skipped doc mid-prefix
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
        .rowsBetween(Long.MinValue, 0)
      val bad = out.withColumn("recomputed", sum("n_tok").over(w))
        .filter(col("recomputed") =!= col("cum_tok"))
      assert(bad.count() == 0, "kept docs form a contiguous md5-order prefix")
    } finally out.unpersist()
  }

  test("q73: weighted sample — ranks are 1..k per lang, priority = hash/weight") {
    val out = SparkEntry.queries("q73_weighted_sample")(spark, sf).cache()
    try {
      val perLang = out.groupBy("lang")
        .agg(count(lit(1)).as("n"), min("rk").as("lo"), max("rk").as("hi"))
        .collect()
      perLang.foreach { r =>
        assert(r.getAs[Int]("lo") == 1 && r.getAs[Long]("n") <= 10 &&
          r.getAs[Int]("hi") == r.getAs[Long]("n"), s"dense ranks per lang: $r")
      }
      val bad = out.filter(
        abs(col("priority") * col("n_chars") -
          conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
            .cast("long").cast("double")) > lit(1e-6) * col("priority"))
      assert(bad.count() == 0, "priority must be the hash/weight ratio")
    } finally out.unpersist()
  }

  test("q75: containment ⊇ Jaccard — every J≥0.95 pair appears in both directions") {
    val cont = SparkEntry.queries("q75_containment")(spark, sf).cache()
    try {
      assert(cont.filter(col("containment") < 0.95 || col("containment") > 1.0)
        .count() == 0, "containment is within [t, 1]")
      assert(cont.filter(col("a_id") === col("b_id")).count() == 0)
      // J(A,B) ≥ t implies C(a→b) ≥ t and C(b→a) ≥ t (intersection over
      // a smaller denominator), so the Jaccard join's pairs embed here
      // in BOTH directions
      val jac = SparkEntry.queries("q28_jaccard_pairs")(spark, sf)
        .select(col("a_id"), col("b_id"))
      val both = jac.unionByName(
        jac.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
      val missing = both.join(cont, Seq("a_id", "b_id"), "left_anti")
      assert(missing.count() == 0, "jaccard pairs must all be contained")
    } finally cont.unpersist()
  }

  test("q76: hard negatives — never the query's own label, dense ranks 1..5") {
    val out = SparkEntry.queries("q76_hard_negatives")(spark, sf).cache()
    try {
      assert(out.filter(col("neg_label") === col("true_label")).count() == 0,
        "a hard negative must carry a different label")
      val ranks = out.groupBy("q_id")
        .agg(min("rank").as("lo"), max("rank").as("hi"),
          count(lit(1)).as("n")).collect()
      ranks.foreach { r =>
        assert(r.getAs[Int]("lo") == 1 &&
          r.getAs[Int]("hi") == r.getAs[Long]("n") && r.getAs[Long]("n") <= 5)
      }
    } finally out.unpersist()
  }

  test("q77: weakest-link bigram probability is a conditional probability in (0,1]") {
    val out = SparkEntry.queries("q77_bigram_minprob")(spark, sf)
    assert(out.filter(col("min_bigram_p") <= 0.0 || col("min_bigram_p") > 1.0)
      .count() == 0)
    assert(out.filter(col("n_distinct_bigrams") < 1).count() == 0)
  }

  test("q78: dialogue assembly — turn counts match the string and partition all events") {
    val out = SparkEntry.queries("q78_dialogue_pack")(spark, sf).cache()
    try {
      val bad = out.filter(
        size(split(col("dialogue"), " ")) =!= col("n_turns"))
      assert(bad.count() == 0, "dialogue token count equals n_turns")
      val total = out.agg(sum("n_turns")).head.getLong(0)
      val events = graft.Tables.events(spark, sf).count()
      assert(total == events, "sessions partition the event stream")
    } finally out.unpersist()
  }

  test("q80: purity counts sum to k and purity is the same-language fraction") {
    val out = SparkEntry.queries("q80_neighbor_lang_purity")(spark, sf).cache()
    try {
      assert(out.count() == 50, "one row per query vector")
      val bad = out.filter(col("n_same") + col("n_diff") =!= 10 ||
        abs(col("purity") * 10 - col("n_same")) > 1e-9)
      assert(bad.count() == 0, "n_same + n_diff = k and purity = n_same/k")
    } finally out.unpersist()
  }

  test("q82: rewrite drops exactly q64's covered positions; cleaned text has n_kept tokens") {
    val rw = SparkEntry.queries("q82_dedup_rewrite")(spark, sf).cache()
    try {
      val marked = SparkEntry.queries("q64_dup_spans")(spark, sf)
        .select(col("doc_id"), col("n_covered"))
      val bad = rw.join(marked, "doc_id")
        .filter(col("n_tok") - col("n_kept") =!= col("n_covered"))
      assert(bad.count() == 0, "removal must equal the marking pass")
      val badLen = rw.filter(col("n_kept") > 0 &&
        size(split(col("cleaned_text"), " ")) =!= col("n_kept"))
      assert(badLen.count() == 0, "cleaned text reassembles exactly n_kept tokens")
    } finally rw.unpersist()
  }

  test("q79: split drift covers the vocabulary; ratios are nonnegative and finite") {
    val out = SparkEntry.queries("q79_split_drift")(spark, sf).cache()
    try {
      val vocab = graft.Tables.documents(spark, sf)
        .select(explode(split(col("text"), " ")).as("w"))
        .distinct().count()
      assert(out.count() == vocab, "one row per vocabulary token")
      assert(out.filter(col("drift_ratio") < 0.0 ||
        col("drift_ratio").isNull || isnan(col("drift_ratio"))).count() == 0,
        "add-one smoothing keeps every ratio finite")
    } finally out.unpersist()
  }

  test("q74: SCD2 intervals — contiguous versions, non-overlapping validity, one current row") {
    val out = SparkEntry.queries("q74_scd2")(spark, sf).cache()
    try {
      // exactly one open (is_current) interval per user
      val multiCurrent = out.filter(col("is_current") === 1)
        .groupBy("user_id").count().filter(col("count") =!= 1)
      assert(multiCurrent.count() == 0)
      // versions are 1..max dense, and each interval ends where the
      // next begins (valid_to == next valid_from), strictly increasing
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("version")
      val bad = out
        .withColumn("prev_v", lag("version", 1).over(w))
        .withColumn("prev_to", lag("valid_to", 1).over(w))
        .filter(
          (col("prev_v").isNull && col("version") =!= 1) ||
          (col("prev_v").isNotNull && col("version") =!= col("prev_v") + 1) ||
          (col("prev_to").isNotNull && col("prev_to") =!= col("valid_from")))
      assert(bad.count() == 0, "intervals must chain without gaps or overlap")
      // adjacent versions always change state (runs are maximal)
      val sameState = out
        .withColumn("prev_state", lag("state", 1).over(w))
        .filter(col("prev_state").isNotNull &&
          col("prev_state") === col("state"))
      assert(sameState.count() == 0, "consecutive versions differ in state")
    } finally out.unpersist()
  }
}
