package graft.llmdata

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** `[EXT]` End-to-end training-data curation pipeline: the composition
  * query a 100 TB pretraining-data job actually runs, as ONE plan —
  *
  *   tokenize → language-ID → quality gate → exact-dedup keeping the
  *   BEST copy → deterministic split → per-(lang, split) corpus stats.
  *
  * Each stage exists standalone (q33/q34/q27/q50); this operator is the
  * fused rendering, and the fusion is where the scale win lives:
  *
  *  - '''One token pass, one doc-keyed shuffle, for ALL per-doc
  *    stats.''' Language-ID hits are CONDITIONAL SUMS in the same
  *    `groupBy(doc_id)` as the quality counters — the profile table is
  *    a compile-time constant, so q33's broadcast-join + cross-join +
  *    window argmax collapses into 5 codegen'd `sum(when(...))`
  *    columns and a `greatest` + CASE argmax (lexicographic tie-break
  *    preserved). Map-side partial aggregation reduces each partition
  *    to ~one row per doc before the exchange, so shuffle volume is
  *    O(docs), never O(tokens).
  *  - '''Dedup keeps the best copy, not the first.''' Within each
  *    `md5(text)` group the survivor is the highest type-token-ratio
  *    copy (ties → lowest doc_id): a window keyed by fp — grouped,
  *    never global. This is the real curation contract (near-identical
  *    crawls differ in boilerplate; keep the cleanest), vs q27's
  *    min-id convenience.
  *  - '''Gate before the expensive stages.''' The quality filter runs
  *    straight off the stats pass, so low-quality docs never reach the
  *    dedup shuffle or the split — at 100 TB the gate is the cheapest
  *    place to drop data.
  *  - Split assignment is md5-keyed (q50's principle): stable across
  *    runs, engines, and cluster sizes; never `rand()`.
  *
  * Output is the per-(pred_lang, split) corpus summary — the table a
  * data-mix dashboard reads. All ratios are int/int IEEE divisions of
  * exact integer sums (Q.scala float policy).
  */
object Curation {

  /** Profile words per language, lexicographic lang order — the same
    * fixture q33 uses, fused here as conditional-aggregate literals. */
  private val byLang: Seq[(String, Seq[String])] =
    TextAnalysis.profiles.groupBy(_._1).view.mapValues(_.map(_._2))
      .toSeq.sortBy(_._1)

  private def sqlHitSums: String = byLang.map { case (l, ws) =>
    s"sum(CASE WHEN w IN (${ws.map(w => s"'$w'").mkString(",")}) " +
      s"THEN 1 ELSE 0 END) AS h_$l"
  }.mkString(",\n|    ")

  private def sqlArgmax: String = {
    val m = byLang.map(l => s"h_${l._1}").mkString("greatest(", ",", ")")
    val cases = byLang.init.map { case (l, _) =>
      s"WHEN h_$l = m THEN '$l'"
    }.mkString(" ")
    s"$m AS m, CASE $cases ELSE '${byLang.last._1}' END AS pred_lang"
  }

  val qs: Seq[Q] = Seq(
    Q(
      "q60_curation_pipeline",
      s"""WITH toks AS (${Text.SqlTokens}),
        |st AS (SELECT doc_id, count(*) AS n_tokens,
        |    count(DISTINCT w) AS n_distinct,
        |    $sqlHitSums
        |  FROM toks GROUP BY doc_id),
        |st2 AS (SELECT *, $sqlArgmax FROM (SELECT * FROM st) q),
        |sc AS (SELECT s.doc_id, md5(d.text) AS fp, s.n_tokens,
        |    s.n_distinct, s.m, s.pred_lang,
        |    CAST(s.n_distinct AS DOUBLE)/s.n_tokens AS ttr
        |  FROM st2 s JOIN documents d ON d.doc_id = s.doc_id
        |  WHERE CAST(s.m AS DOUBLE)/s.n_tokens <= 0.12),
        |k AS (SELECT * FROM sc
        |  QUALIFY row_number() OVER (PARTITION BY fp
        |    ORDER BY ttr DESC, doc_id) = 1),
        |b AS (SELECT *,
        |    CAST(('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,4)) AS BIGINT)
        |      % 10 AS bucket
        |  FROM k)
        |SELECT pred_lang,
        |  CASE WHEN bucket < 8 THEN 'train'
        |       WHEN bucket = 8 THEN 'val' ELSE 'test' END AS split,
        |  count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |  CAST(sum(n_distinct) AS DOUBLE)/sum(n_tokens) AS distinct_ratio,
        |  min(doc_id) AS first_id
        |FROM b GROUP BY 1, 2 ORDER BY pred_lang, split""".stripMargin,
    ) { (s, d) =>
      // round 15: every per-doc stat is ROW-LOCAL — the token count,
      // the distinct-token count, and the profile-hit sums are all
      // functions of the doc's own token array, so the old explode +
      // doc-keyed shuffle + count-distinct expand + join back to
      // documents collapse into one narrow projection over the scan
      // (zero pre-dedup shuffles; a null text drops in both shapes —
      // no token rows before, a null gate predicate now)
      val arr = col("toks")
      val hitCols = byLang.map { case (l, ws) =>
        size(filter(arr, x => x.isInCollection(ws))).cast("long")
          .as(s"h_$l")
      }
      val scored = Tables.documentsSpread(s, d)
        .withColumn("toks", split(col("text"), " "))
        .select(Seq(col("doc_id"), md5(col("text")).as("fp"),
          size(arr).cast("long").as("n_tokens"),
          size(array_distinct(arr)).cast("long").as("n_distinct")) ++
          hitCols: _*)
        .withColumn("m",
          greatest(byLang.map { case (l, _) => col(s"h_$l") }: _*))
        // argmax with q33's contract: lexicographically-first language
        // among the max-hit ones
        .withColumn("pred_lang",
          byLang.init.foldRight(lit(byLang.last._1)) { case ((l, _), e) =>
            when(col(s"h_$l") === col("m"), l).otherwise(e)
          })
        .withColumn("ttr", col("n_distinct").cast("double") / col("n_tokens"))
        // quality gate FIRST: stopword-saturated docs (profile-hit
        // ratio > 0.12, q34's 'low' bucket) never reach the dedup
        // shuffle or the split
        .filter(col("m").cast("double") / col("n_tokens") <= 0.12)
      // keep the highest-TTR copy of each exact-duplicate group
      // (ties → lowest doc_id); window is keyed by fp, never global
      val keepW = Window.partitionBy("fp")
        .orderBy(col("ttr").desc, col("doc_id"))
      val kept = scored.withColumn("rn", row_number().over(keepW))
        .filter(col("rn") === 1)
        .withColumn("bucket",
          conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
            .cast("long") % 10)
        .withColumn("split",
          when(col("bucket") < 8, "train")
            .when(col("bucket") === 8, "val").otherwise("test"))
      kept.groupBy("pred_lang", "split")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_tokens").as("total_tokens"),
          (sum("n_distinct").cast("double") / sum("n_tokens"))
            .as("distinct_ratio"),
          min("doc_id").as("first_id"))
        .orderBy("pred_lang", "split")
    },

    // ---- q127: per-source boilerplate-shingle audit — 3-gram shingles
    //      occurring in ≥5% of a source's docs are boilerplate (nav
    //      bars, license footers, template chrome: the CCNet/C4-style
    //      template-removal signal; public literature). Emits the
    //      per-source report a curation dashboard reads: how many
    //      shingles are boilerplate, how many docs carry at least one,
    //      and the worst shingle's document frequency.
    //      Scale shape: ONE shingle pass feeds both aggregates — df is
    //      a (source, g)-keyed partial-aggregated count (no explode of
    //      doc lists), membership is a SEMI join of the shingle table
    //      against the (tiny) boilerplate set, and the 5% threshold is
    //      the INTEGER comparison 20·df ≥ n_docs, so the gate itself
    //      has no float. Output cardinality = |sources|. The only
    //      double is one int/int division. ----
    Q(
      "q127_boilerplate_shingles",
      s"""WITH sh AS (${Text.SqlShingleSet.replace("doc_id, lang,",
             "doc_id, source,")}),
        |n AS (SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT)
        |    AS n_docs FROM sh GROUP BY 1),
        |df AS (SELECT source, g, CAST(count(*) AS BIGINT) AS df
        |  FROM sh GROUP BY 1, 2),
        |b AS (SELECT df.source, df.g, df.df FROM df JOIN n USING (source)
        |  WHERE 20 * df.df >= n.n_docs),
        |aff AS (SELECT sh.source,
        |    CAST(count(DISTINCT sh.doc_id) AS BIGINT) AS n_affected
        |  FROM sh WHERE EXISTS (SELECT 1 FROM b
        |    WHERE b.source = sh.source AND b.g = sh.g)
        |  GROUP BY 1),
        |r AS (SELECT source, CAST(count(*) AS BIGINT) AS n_boiler,
        |    CAST(max(df) AS BIGINT) AS max_df FROM b GROUP BY 1)
        |SELECT n.source, n.n_docs, r.n_boiler, r.max_df, aff.n_affected,
        |  CAST(aff.n_affected AS DOUBLE) / n.n_docs AS affected_ratio
        |FROM n JOIN r USING (source) JOIN aff USING (source)
        |ORDER BY source""".stripMargin,
    ) { (s, d) =>
      // ONE shingle materialization for the three consumers (doc
      // counts, df, membership) — without the persist each aggregate
      // re-tokenizes the corpus
      val sh = graft.Caches.persist(Tables.documentsSpread(s, d)
        .select(col("doc_id"), col("source"),
          split(col("text"), " ").as("w"))
        .filter(size(col("w")) >= 3)
        .select(col("doc_id"), col("source"),
          explode(array_distinct(expr(
            "transform(sequence(0, size(w) - 3), " +
              "i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))"))).as("g")))
      val n = sh.groupBy("source")
        .agg(countDistinct("doc_id").as("n_docs"))
      val df = sh.groupBy("source", "g").agg(count(lit(1)).as("df"))
      // b is output-bounded (threshold survivors) but feeds TWO
      // subtrees (membership semi-join + the per-source report) whose
      // different column pruning defeated exchange reuse — the full
      // (source, g) df aggregate ran twice (two 5.5 MB exchanges in
      // the stage profile). Persisting the tiny survivor set computes
      // it once (round 15).
      val b = graft.Caches.persist(
        df.join(n, "source").filter(col("df") * 20 >= col("n_docs")))
      val aff = sh.join(b.select("source", "g"), Seq("source", "g"),
          "left_semi")
        .groupBy("source").agg(countDistinct("doc_id").as("n_affected"))
      val r = b.groupBy("source")
        .agg(count(lit(1)).as("n_boiler"), max("df").as("max_df"))
      n.join(r, "source").join(aff, "source")
        .select(col("source"), col("n_docs"), col("n_boiler"),
          col("max_df"), col("n_affected"),
          (col("n_affected").cast("double") / col("n_docs"))
            .as("affected_ratio"))
        .orderBy("source")
    },

    // ---- q129: duplicate-count training weights — soft dedup. Instead
    //      of dropping duplicates (q27/q60), keep every copy and weight
    //      its training loss by 1/cluster_size, so each distinct
    //      content contributes unit mass to the objective (the
    //      repetition-control alternative the dedup literature
    //      discusses when provenance must be preserved; public
    //      literature). Clusters key on the token-SET fingerprint
    //      (Text.setFp — the rewrite-invariant identity q82 dedups
    //      on), so reshuffled copies of the same content share one
    //      weight; the canonical flag marks the min-id survivor, so
    //      the hard-dedup manifest is a filter of this one.
    //      Scale shape: cluster size is a window COUNT keyed by fp —
    //      grouped, never global, one fp-keyed shuffle; no join, no
    //      second pass. weight is one 1/bigint IEEE division ⇒
    //      bit-identical across engines. ----
    Q(
      "q129_dup_weight",
      """WITH t AS (SELECT doc_id, source,
        |    md5(array_to_string(list_sort(list_distinct(
        |      string_split(text,' '))),' ')) AS fp
        |  FROM documents),
        |c AS (SELECT doc_id, source, fp,
        |    CAST(count(*) OVER (PARTITION BY fp) AS BIGINT) AS csize,
        |    min(doc_id) OVER (PARTITION BY fp) AS keep_id
        |  FROM t)
        |SELECT doc_id, source, fp, csize,
        |  CAST(1.0 AS DOUBLE) / csize AS weight,
        |  CAST(doc_id = keep_id AS BOOLEAN) AS is_canonical
        |FROM c ORDER BY doc_id""".stripMargin,
    ) { (s, d) =>
      val w = Window.partitionBy("fp")
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"), Text.setFp.as("fp"))
        .withColumn("csize", count(lit(1)).over(w))
        .withColumn("keep_id", min("doc_id").over(w))
        .select(col("doc_id"), col("source"), col("fp"), col("csize"),
          (lit(1.0) / col("csize")).as("weight"),
          (col("doc_id") === col("keep_id")).as("is_canonical"))
        .orderBy("doc_id")
    },

    // ---- q155: grouped k-fold assignment — GroupKFold semantics
    //      (sklearn's name for the leakage rule every eval design
    //      needs): folds are keyed by the GROUP (customer), never the
    //      row, so no entity ever straddles a train/validation
    //      boundary — q50 splits rows, this splits entities. Fold =
    //      md5(group) mod 5 (q50's engine-stable hash bucketing,
    //      never rand()); the output is the per-fold census PLUS the
    //      leakage audit itself (max folds touched by any group —
    //      contractually 1, and the query proves it rather than
    //      assuming it). One row-keyed map + two group-keyed
    //      aggregations; the audit max is a broadcast scalar. ----
    Q(
      "q155_group_kfold",
      """WITH f AS (SELECT o_orderkey, o_custkey,
        |    CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 4))
        |      AS BIGINT) % 5 AS fold
        |  FROM orders),
        |leak AS (SELECT o_custkey, count(DISTINCT fold) AS nf
        |  FROM f GROUP BY 1)
        |SELECT f.fold, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(count(DISTINCT f.o_custkey) AS BIGINT) AS n_groups,
        |  CAST((SELECT max(nf) FROM leak) AS BIGINT)
        |    AS max_folds_per_group
        |FROM f GROUP BY 1 ORDER BY fold""".stripMargin,
    ) { (s, d) =>
      val f = graft.Caches.persist(Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
          (conv(substring(md5(col("o_custkey").cast("string")), 1, 4),
            16, 10).cast("long") % 5).as("fold")))
      val leak = f.groupBy("o_custkey")
        .agg(countDistinct("fold").as("nf"))
        .agg(max("nf").as("max_folds_per_group"))
      f.groupBy("fold")
        .agg(count(lit(1)).as("n_orders"),
          countDistinct("o_custkey").as("n_groups"))
        .crossJoin(broadcast(leak))
        .select(col("fold"), col("n_orders"), col("n_groups"),
          col("max_folds_per_group"))
        .orderBy("fold")
    },

    // ---- q192: water-filling token-budget allocation — the mixture
    //      solver q72's admission policy assumes has already run: given
    //      a total token budget (scale-parametric: 80% of the corpus)
    //      and equal target shares across languages, allocate each
    //      language min(its availability, the water level λ), with λ
    //      chosen so the budget is spent EXACTLY. Classic water-fill:
    //      order languages by availability ascending; a language is
    //      capped iff taking all its tokens plus ≥ that much for every
    //      later language still fits the budget (the capped set is a
    //      prefix of the order); the leftover spreads integer-evenly
    //      over the uncapped with the remainder going to the first
    //      (deterministic) ranks, so Σ allocated = budget exactly — no
    //      float water level, no iteration. One corpus pass folds to
    //      the language domain; every window runs on ≤|langs| rows
    //      (metadata-sized). At 100 TB the allocation THIS emits is the
    //      per-source sampling quota a q73-style weighted sampler
    //      executes. ----
    Q(
      "q192_waterfill_mix",
      """WITH t AS (SELECT lang,
        |    CAST(len(string_split(text,' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |a AS (SELECT lang, CAST(sum(n_tok) AS BIGINT) AS avail
        |  FROM t GROUP BY 1),
        |b AS (SELECT CAST(sum(avail) * 4 // 5 AS BIGINT) AS budget,
        |    CAST(count(*) AS BIGINT) AS n FROM a),
        |o AS (SELECT lang, avail,
        |    CAST(row_number() OVER (ORDER BY avail, lang) AS BIGINT)
        |      AS idx,
        |    CAST(sum(avail) OVER (ORDER BY avail, lang
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pfx
        |  FROM a),
        |c AS (SELECT o.lang, o.avail, o.idx, b.budget, b.n,
        |    CASE WHEN o.pfx + o.avail * (b.n - o.idx) <= b.budget
        |      THEN 1 ELSE 0 END AS capped
        |  FROM o, b),
        |s AS (SELECT
        |    CAST(coalesce(sum(CASE WHEN capped = 1 THEN avail END), 0)
        |      AS BIGINT) AS csum,
        |    CAST(sum(capped) AS BIGINT) AS ncap FROM c)
        |SELECT c.lang, c.avail,
        |  CAST(CASE WHEN c.capped = 1 THEN c.avail
        |    ELSE (c.budget - s.csum) // (c.n - s.ncap) +
        |      (CASE WHEN c.idx - s.ncap <=
        |          (c.budget - s.csum) % (c.n - s.ncap)
        |        THEN 1 ELSE 0 END)
        |    END AS BIGINT) AS allocated,
        |  c.capped
        |FROM c, s ORDER BY lang""".stripMargin,
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      // persisted: the language fold feeds the budget scalar, the
      // prefix windows, AND the final allocation — one corpus
      // tokenize, not three
      val a = graft.Caches.persist(Tables.documents(s, d)
        .select(col("lang"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        .groupBy("lang").agg(sum("n_tok").as("avail")))
      val b = a.agg(expr("sum(avail) * 4 div 5").cast("long").as("budget"),
        count(lit(1)).as("n"))
      // language-domain windows: ≤|langs| rows, metadata-sized
      val w = Window.orderBy(col("avail"), col("lang"))
      val c = a
        .withColumn("idx", row_number().over(w).cast("long"))
        .withColumn("pfx", sum("avail").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .crossJoin(broadcast(b))
        .withColumn("capped",
          when(col("pfx") + col("avail") * (col("n") - col("idx"))
            <= col("budget"), 1).otherwise(0))
      val st = c.agg(
        coalesce(sum(when(col("capped") === 1, col("avail"))), lit(0L))
          .cast("long").as("csum"),
        sum("capped").cast("long").as("ncap"))
      c.crossJoin(broadcast(st))
        .select(col("lang"), col("avail"),
          when(col("capped") === 1, col("avail"))
            .otherwise(expr("(budget - csum) div (n - ncap)") +
              when(col("idx") - col("ncap") <=
                expr("(budget - csum) % (n - ncap)"), 1L).otherwise(0L))
            .cast("long").as("allocated"),
          col("capped"))
        .orderBy("lang")
    },

    // ---- q201: facility-location greedy selection — coverage-based
    //      diverse subset choice (Nemhauser–Wolsey–Fisher 1978: greedy
    //      on a monotone submodular objective is (1−1/e)-optimal —
    //      public literature), the third leg of the selection family:
    //      q149 k-center is DISTANCE-diverse, q179 MMR is
    //      EMBEDDING-diverse, this is COVERAGE-diverse — pick the k
    //      docs whose union of trigram shingles covers the most
    //      vocabulary, the "seed a new domain mix with maximally
    //      representative exemplars" primitive. Greedy is inherently
    //      sequential in k, so k=3 steps are UNROLLED (the q142/q151
    //      superstep discipline): each step is one anti-join of the
    //      persisted (doc, shingle) table against the covered set +
    //      one doc-keyed count + one TakeOrdered argmax (gain DESC,
    //      doc_id tie-break). The covered set is ≤ k·max-doc-shingles
    //      rows — broadcastable at any corpus size, which is what
    //      makes the superstep scale: the corpus-sized side never
    //      re-shuffles. Already-selected docs vanish from later steps
    //      by construction (all their shingles are covered ⇒ zero
    //      anti-join rows). coverage_micro is a ratio ≤ 1 (plain
    //      form; vocab < 2⁶³/10⁶ documented envelope). ----
    Q(
      "q201_facility_location",
      """WITH tw AS (SELECT DISTINCT doc_id, w FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(t) - 1),
        |        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS w
        |    FROM (SELECT doc_id, string_split(text,' ') AS t
        |      FROM documents)
        |    WHERE len(t) >= 3)),
        |v AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS vocab FROM tw),
        |c1 AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS gain
        |  FROM tw GROUP BY 1),
        |d1 AS (SELECT doc_id, gain FROM c1
        |  ORDER BY gain DESC, doc_id LIMIT 1),
        |cov1 AS (SELECT tw.w FROM tw JOIN d1 ON tw.doc_id = d1.doc_id),
        |c2 AS (SELECT t.doc_id, CAST(count(*) AS BIGINT) AS gain
        |  FROM tw t LEFT JOIN cov1 c ON t.w = c.w
        |  WHERE c.w IS NULL GROUP BY 1),
        |d2 AS (SELECT doc_id, gain FROM c2
        |  ORDER BY gain DESC, doc_id LIMIT 1),
        |cov2 AS (SELECT w FROM cov1
        |  UNION SELECT tw.w FROM tw JOIN d2 ON tw.doc_id = d2.doc_id),
        |c3 AS (SELECT t.doc_id, CAST(count(*) AS BIGINT) AS gain
        |  FROM tw t LEFT JOIN cov2 c ON t.w = c.w
        |  WHERE c.w IS NULL GROUP BY 1),
        |d3 AS (SELECT doc_id, gain FROM c3
        |  ORDER BY gain DESC, doc_id LIMIT 1),
        |sel AS (SELECT CAST(1 AS BIGINT) AS rnk, doc_id, gain FROM d1
        |  UNION ALL SELECT CAST(2 AS BIGINT), doc_id, gain FROM d2
        |  UNION ALL SELECT CAST(3 AS BIGINT), doc_id, gain FROM d3)
        |SELECT rnk, doc_id, gain,
        |  CAST(sum(gain) OVER (ORDER BY rnk
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS covered_cum,
        |  v.vocab,
        |  CAST(sum(gain) OVER (ORDER BY rnk ROWS UNBOUNDED PRECEDING)
        |    * 1000000 // v.vocab AS BIGINT) AS coverage_micro
        |FROM sel, v ORDER BY rnk""".stripMargin,
    ) { (s, d) =>
      val tw = graft.Caches.persist(Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("t"))
        .filter(size(col("t")) >= 3)
        .select(col("doc_id"),
          explode(transform(sequence(lit(1), size(col("t")) - 2),
            i => concat_ws(" ", element_at(col("t"), i),
              element_at(col("t"), i + 1), element_at(col("t"), i + 2))))
            .as("w"))
        .distinct())
      val v = tw.agg(countDistinct("w").cast("long").as("vocab"))
      def argmax(c: org.apache.spark.sql.DataFrame) =
        c.orderBy(col("gain").desc, col("doc_id")).limit(1)
      val d1 = argmax(tw.groupBy("doc_id").agg(count(lit(1)).as("gain")))
      val cov1 = graft.Caches.persist(
        tw.join(broadcast(d1.select("doc_id")), "doc_id").select("w"))
      val d2 = argmax(tw.join(broadcast(cov1), Seq("w"), "left_anti")
        .groupBy("doc_id").agg(count(lit(1)).as("gain")))
      val cov2 = graft.Caches.persist(cov1
        .union(tw.join(broadcast(d2.select("doc_id")), "doc_id")
          .select("w")).distinct())
      val d3 = argmax(tw.join(broadcast(cov2), Seq("w"), "left_anti")
        .groupBy("doc_id").agg(count(lit(1)).as("gain")))
      val sel = d1.select(lit(1L).as("rnk"), col("doc_id"), col("gain"))
        .unionAll(d2.select(lit(2L).as("rnk"), col("doc_id"), col("gain")))
        .unionAll(d3.select(lit(3L).as("rnk"), col("doc_id"), col("gain")))
      // 3-row selection domain: the unpartitioned window is metadata-sized
      sel.withColumn("covered_cum",
          sum("gain").over(Window.orderBy("rnk")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("long"))
        .crossJoin(broadcast(v))
        .withColumn("coverage_micro",
          expr("covered_cum * 1000000 div vocab").cast("long"))
        .orderBy("rnk")
    },
  )
}
