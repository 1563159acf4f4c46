package graft.llmdata

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** `[EXT]` Data-mixture operators: the selection passes that turn a
  * curated corpus into a training mix — per-source token-budget caps
  * (the "data recipe" knob every pretraining run tunes: LLaMA/GPT-3
  * report per-source sampling proportions; public literature) and
  * weighted sampling without replacement (priority sampling à la
  * Efraimidis–Spirakis, here with a deterministic hash in place of
  * rand()).
  *
  * Scale design (100 TB):
  *  - both ops are ONE window over the mixture key ((source) resp.
  *    (lang)) — open-cardinality keys in a real corpus (crawl shard,
  *    registered language), so no partition grows with corpus size and
  *    there is no join, no global sort, no driver materialization;
  *  - selection order inside a key is md5(doc_id) — engine- and
  *    cluster-stable, reproducible across reruns, never rand() (q50's
  *    split lesson): a re-run on different partitioning picks the SAME
  *    mix, which is what makes the recipe auditable;
  *  - all accounting is exact integer arithmetic (cumulative token
  *    sums, row-number ranks); the one double (q73's priority) is a
  *    single IEEE division of exact inputs, bit-identical across
  *    engines.
  */
object Mixing {

  /** Per-source token budget. Small relative to a source's ~1.5k test
    * tokens so the cumsum cutoff is well exercised at every sf. */
  private val Budget = 600

  val qs: Seq[Q] = Seq(
    // ---- q72: token-budget mixing — within each source, admit docs
    //      in md5 order until the source's token budget is spent
    //      (admit while cumulative tokens ≤ budget). Emits the kept
    //      docs with their cumulative position, i.e. the reproducible
    //      "data recipe" manifest. ----
    Q(
      "q72_token_budget_mix",
      s"""WITH t AS (SELECT doc_id, source,
        |    CAST(len(string_split(text,' ')) AS BIGINT) AS n_tok,
        |    md5(CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents),
        |c AS (SELECT doc_id, source, n_tok,
        |    CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY h, doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok
        |  FROM t)
        |SELECT doc_id, source, n_tok, cum_tok
        |FROM c WHERE cum_tok <= $Budget ORDER BY doc_id""".stripMargin,
    ) { (s, d) =>
      val w = Window.partitionBy("source").orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tok"),
          md5(col("doc_id").cast("string")).as("h"))
        .withColumn("cum_tok", sum("n_tok").over(w))
        .filter(col("cum_tok") <= Budget)
        .select(col("doc_id"), col("source"), col("n_tok"), col("cum_tok"))
        .orderBy("doc_id")
    },

    // ---- q73: weighted sample without replacement — top-10 docs per
    //      lang under length-proportional weights. Priority sampling:
    //      key = hash(doc) / weight, keep the k smallest per stratum
    //      (heavier docs draw smaller keys ⇒ higher inclusion odds —
    //      the hash-determinized Efraimidis–Spirakis one-pass scheme).
    //      The 60-bit md5 prefix is the uniform draw; the only float
    //      is one division of exact inputs. ----
    Q(
      "q73_weighted_sample",
      """WITH t AS (SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
        |    CAST(('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT)
        |      AS h
        |  FROM documents),
        |p AS (SELECT doc_id, lang, n_chars,
        |    CAST(h AS DOUBLE) / n_chars AS priority FROM t),
        |r AS (SELECT *, row_number() OVER (PARTITION BY lang
        |    ORDER BY priority, doc_id) AS rk FROM p)
        |SELECT doc_id, lang, n_chars, priority, CAST(rk AS INT) AS rk
        |FROM r WHERE rk <= 10 ORDER BY lang, rk""".stripMargin,
    ) { (s, d) =>
      val w = Window.partitionBy("lang").orderBy("priority", "doc_id")
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars").cast("long")
          .as("n_chars"),
          conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
            .cast("long").as("h"))
        .withColumn("priority", col("h").cast("double") / col("n_chars"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 10)
        .select(col("doc_id"), col("lang"), col("n_chars"), col("priority"),
          col("rk").cast("int").as("rk"))
        .orderBy("lang", "rk")
    },

    // ---- q120: weighted sample through the BOUNDED-STATE aggregator —
    //      q73's exact output (same oracle SQL) from the TopK
    //      aggregator instead of the per-stratum window sort. The
    //      window rendering sorts EVERY row of a stratum to keep 10;
    //      this one folds the corpus through O(k) per-group buffers
    //      with map-side partial aggregation (the q92 machinery), so
    //      state and shuffle are k-bounded at any corpus size — the
    //      scale answer for open-cardinality strata. Priorities ride
    //      NEGATED (TopK keeps largest by (value desc, id asc);
    //      smallest-priority-first with doc_id tiebreak is exactly
    //      that order on -priority), and double negation is
    //      sign-flip-exact, so the emitted priority is bit-identical
    //      to q73's. The 50-row result joins back for n_chars — AQE
    //      broadcasts the tiny side against the corpus scan. ----
    Q(
      "q120_reservoir_sample",
      """WITH t AS (SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
        |    CAST(('0x'||substr(md5(CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT)
        |      AS h
        |  FROM documents),
        |p AS (SELECT doc_id, lang, n_chars,
        |    CAST(h AS DOUBLE) / n_chars AS priority FROM t),
        |r AS (SELECT *, row_number() OVER (PARTITION BY lang
        |    ORDER BY priority, doc_id) AS rk FROM p)
        |SELECT doc_id, lang, n_chars, priority, CAST(rk AS INT) AS rk
        |FROM r WHERE rk <= 10 ORDER BY lang, rk""".stripMargin,
    ) { (s, d) =>
      val tk = udaf(new graft.functions.TopK(10),
        org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaDouble,
          org.apache.spark.sql.Encoders.scalaLong))
      val docs = Tables.documents(s, d)
      docs
        .select(col("doc_id"), col("lang"),
          (conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
            .cast("long").cast("double") /
            col("n_chars").cast("long")).as("priority"))
        .groupBy("lang")
        .agg(tk(-col("priority"), col("doc_id")).as("top"))
        .select(col("lang"), posexplode(col("top")).as(Seq("i", "p")))
        .select(col("lang"), (col("i") + 1).cast("int").as("rk"),
          col("p._2").as("doc_id"), (-col("p._1")).as("priority"))
        .join(docs.select(col("doc_id"),
          col("n_chars").cast("long").as("n_chars")), "doc_id")
        .select(col("doc_id"), col("lang"), col("n_chars"),
          col("priority"), col("rk"))
        .orderBy("lang", "rk")
    },

    // ---- q124: source Pareto / cumulative-share audit — the "data
    //      recipe" chart every mixture review starts from: token share
    //      per source and the cumulative share in descending order
    //      (which sources make up 80% of the corpus?). Float policy:
    //      the CUMULATIVE sum stays an exact BIGINT riding the ordered
    //      window (never a float accumulation), so each share is ONE
    //      IEEE division of exact integers — bit-identical across
    //      engines at any position. The ordered window runs over the
    //      per-SOURCE aggregate rows (cardinality = sources, not
    //      corpus); its single partition is bounded by the source
    //      count, the same k-bounded caveat as q117's rank stage. ----
    Q(
      "q124_source_pareto",
      """WITH t AS (SELECT source,
        |    CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT))
        |      AS BIGINT) AS toks
        |  FROM documents GROUP BY source),
        |tt AS (SELECT CAST(sum(toks) AS BIGINT) AS total FROM t)
        |SELECT source, toks,
        |  CAST(row_number() OVER o AS INT) AS rk,
        |  CAST(toks AS DOUBLE) / tt.total AS share,
        |  CAST(sum(toks) OVER (o ROWS UNBOUNDED PRECEDING) AS DOUBLE)
        |    / tt.total AS cum_share
        |FROM t, tt
        |WINDOW o AS (ORDER BY toks DESC, source)
        |ORDER BY rk""".stripMargin,
    ) { (s, d) =>
      val t = Tables.documents(s, d)
        .groupBy("source")
        .agg(sum(size(split(col("text"), " ")).cast("long")).as("toks"))
      val tt = t.agg(sum("toks").as("total"))
      val o = Window.orderBy(col("toks").desc, col("source"))
      val run = o.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t.crossJoin(broadcast(tt))
        .withColumn("rk", row_number().over(o).cast("int"))
        .withColumn("share", col("toks").cast("double") / col("total"))
        .withColumn("cum_share",
          sum("toks").over(run).cast("double") / col("total"))
        .select("source", "toks", "rk", "share", "cum_share")
        .orderBy("rk")
    },

    // ---- q125: source-balance Gini coefficient — the imbalance
    //      number behind q124's Pareto chart: per language, how
    //      unequally do its sources contribute tokens (0 = perfectly
    //      balanced recipe, →1 = one source dominates)? Gini via the
    //      mean-absolute-difference identity Σᵢⱼ|xᵢ−xⱼ| / (2·n·Σx):
    //      the pairwise sum is over SOURCE-level aggregate rows —
    //      bounded by sources² per language (the q99 discipline),
    //      never corpus-sized — and every term is an exact BIGINT, so
    //      the coefficient is ONE IEEE division of identical integer
    //      operands (registry float policy; no sort-based Lorenz
    //      rendering needed). ----
    Q(
      "q125_source_gini",
      """WITH t AS (SELECT lang, source,
        |    CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT))
        |      AS BIGINT) AS toks
        |  FROM documents GROUP BY lang, source),
        |g AS (SELECT a.lang,
        |    CAST(sum(abs(a.toks - b.toks)) AS BIGINT) AS num
        |  FROM t a JOIN t b ON a.lang = b.lang GROUP BY a.lang),
        |s AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_sources,
        |    CAST(sum(toks) AS BIGINT) AS total FROM t GROUP BY lang)
        |SELECT s.lang, s.n_sources, s.total,
        |  CAST(g.num AS DOUBLE) / (2 * s.n_sources * s.total) AS gini
        |FROM s JOIN g ON g.lang = s.lang
        |ORDER BY s.lang""".stripMargin,
    ) { (s, d) =>
      val t = graft.Caches.persist(Tables.documents(s, d)
        .groupBy("lang", "source")
        .agg(sum(size(split(col("text"), " ")).cast("long")).as("toks")))
      val g = t.toDF("lang", "src_a", "ta")
        .join(t.toDF("lang", "src_b", "tb"), Seq("lang"))
        .groupBy("lang")
        .agg(sum(abs(col("ta") - col("tb"))).as("num"))
      val sz = t.groupBy("lang")
        .agg(count(lit(1)).as("n_sources"), sum("toks").as("total"))
      sz.join(g, Seq("lang"))
        .select(col("lang"), col("n_sources"), col("total"),
          (col("num").cast("double") /
            (lit(2) * col("n_sources") * col("total"))).as("gini"))
        .orderBy("lang")
    },

    // ---- q114: deterministic negative sampling — for every customer,
    //      up to 5 parts they have NEVER ordered, hash-proposed (the
    //      contrastive / recommendation training-data pass: word2vec-
    //      style negative sampling, BPR's unobserved-item draws;
    //      public literature). The scale shape matters: the naive
    //      rendering is customers × parts ANTI JOIN — a cartesian
    //      that explodes at 100 TB. Here each customer proposes only
    //      8 CANDIDATE slots (cand = md5("c_slot") mod (pmax+1), the
    //      registry's engine-portable hash), so the candidate set is
    //      8·|C| rows — LINEAR in customers, independent of catalog
    //      size. pmax rides a broadcast one-row aggregate (the q15
    //      scalar pattern), the part-existence check is a broadcast
    //      semi join, and the only fact-sized shuffle is the anti
    //      join against the positives. Collided proposals dedup to
    //      their smallest slot; survivors rank by slot — fully
    //      deterministic, so the drawn negatives are reproducible
    //      across engines, reruns, and cluster layouts. A customer
    //      whose proposals mostly hit positives emits fewer than 5
    //      rows (no re-draw loop — documented, auditable via rk). ----
    Q(
      "q114_negative_sample",
      """WITH pos AS (SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
        |    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
        |pm AS (SELECT max(p_partkey) AS pmax FROM part),
        |cand AS (
        |  SELECT cu.c_custkey AS c, s.slot,
        |    CAST(('0x' || substr(md5(CAST(cu.c_custkey AS VARCHAR) || '_' ||
        |        CAST(s.slot AS VARCHAR)), 1, 15)) AS BIGINT)
        |      % (pm.pmax + 1) AS p
        |  FROM customer cu, range(1, 9) s(slot), pm),
        |ded AS (SELECT c, p, min(slot) AS slot FROM cand
        |  WHERE EXISTS (SELECT 1 FROM part WHERE p_partkey = cand.p)
        |    AND NOT EXISTS (SELECT 1 FROM pos
        |                    WHERE pos.c = cand.c AND pos.p = cand.p)
        |  GROUP BY c, p),
        |r AS (SELECT c, p, slot,
        |    row_number() OVER (PARTITION BY c ORDER BY slot) AS rk FROM ded)
        |SELECT c AS c_custkey, CAST(rk AS INT) AS rk, p AS p_partkey
        |FROM r WHERE rk <= 5 ORDER BY c_custkey, rk""".stripMargin,
    ) { (s, d) =>
      // NOT spread (measured, round 16): round-robining the lineitem
      // side before the join moves ~10 MB of raw join input to save a
      // 556 ms 3-task stage — min-of-6 regressed 1.51 → 1.79 s. The
      // 3-way underparallelism is the local one-row-group file layout,
      // which production split counts fix for free.
      val pos = Tables.orders(s, d)
        .join(Tables.lineitem(s, d),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
        .distinct()
      val pmax = Tables.part(s, d).agg(max("p_partkey").as("pmax"))
      val rkW = Window.partitionBy("c").orderBy("slot")
      // spread floor (round 16, guide §2.5): the candidate build runs
      // 8 md5s per customer, and the local single-split customer scan
      // ran all of it on ONE task (440 ms serial in the stage
      // profile); the repartition moves only (c_custkey) longs and is
      // a no-op once the scan splits exceed the core count
      Tables.spread(Tables.customer(s, d)
        .select(col("c_custkey").as("c")))
        .select(col("c"), explode(sequence(lit(1), lit(8))).as("slot"))
        .crossJoin(broadcast(pmax))
        .withColumn("p",
          conv(substring(md5(concat(col("c").cast("string"), lit("_"),
            col("slot").cast("string"))), 1, 15), 16, 10).cast("long")
            % (col("pmax") + 1))
        .join(Tables.part(s, d).select(col("p_partkey").as("p")),
          Seq("p"), "left_semi")
        .join(pos, Seq("c", "p"), "left_anti")
        .groupBy("c", "p").agg(min("slot").as("slot"))
        .withColumn("rk", row_number().over(rkW))
        .filter(col("rk") <= 5)
        .select(col("c").as("c_custkey"), col("rk").cast("int").as("rk"),
          col("p").as("p_partkey"))
        .orderBy("c_custkey", "rk")
    },

    // ---- q126: temperature-scaled mixture weights — renormalized
    //      power weights w_s ∝ p_s^α over per-source token mass (the
    //      multilingual-mixing knob: α<1 upweights rare sources, α>1
    //      concentrates on large ones; XLM-R / mT5-style sampling,
    //      public literature). The bench pins α=2 so every weight is a
    //      ratio of EXACT integers (n_s² / Σ n_t²) — the α knob changes
    //      one pow() and nothing about the plan. Expected doc quota at
    //      a 10k-doc budget is floor-division in pure integer math.
    //      Scale shape: token mass per source is ONE partial-aggregated
    //      pass with no explode (size(split) per row, summed map-side);
    //      the Σ-scalars ride a broadcast one-row aggregate (q15
    //      pattern). Output cardinality = |sources| — never grows with
    //      the corpus. Both emitted doubles are single IEEE divisions
    //      of exact bigints ⇒ bit-identical across engines. ----
    Q(
      "q126_temperature_mix",
      """WITH m AS (SELECT source,
        |    CAST(sum(len(string_split(text,' '))) AS BIGINT) AS n_tok,
        |    CAST(count(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_tok) AS BIGINT) AS t1,
        |    CAST(sum(n_tok * n_tok) AS BIGINT) AS t2 FROM m)
        |SELECT m.source, m.n_docs, m.n_tok,
        |  CAST(m.n_tok AS DOUBLE) / tot.t1 AS p_natural,
        |  CAST(m.n_tok * m.n_tok AS DOUBLE) / tot.t2 AS w_temp,
        |  CAST((10000 * m.n_tok * m.n_tok) // tot.t2 AS BIGINT)
        |    AS quota_docs
        |FROM m, tot ORDER BY source""".stripMargin,
    ) { (s, d) =>
      // |sources| rows — persisted so the Σ-scalar pass reuses the
      // corpus aggregation instead of re-scanning
      val m = graft.Caches.persist(Tables.documents(s, d)
        .select(col("source"), size(split(col("text"), " ")).cast("long")
          .as("toks"))
        .groupBy("source")
        .agg(sum("toks").as("n_tok"), count(lit(1)).as("n_docs")))
      val tot = m.agg(sum("n_tok").as("t1"),
        sum(col("n_tok") * col("n_tok")).as("t2"))
      m.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"), col("n_tok"),
          (col("n_tok").cast("double") / col("t1")).as("p_natural"),
          ((col("n_tok") * col("n_tok")).cast("double") / col("t2"))
            .as("w_temp"),
          expr("(10000 * n_tok * n_tok) div t2").as("quota_docs"))
        .orderBy("source")
    },
  )
}
