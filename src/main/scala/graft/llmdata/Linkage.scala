package graft.llmdata

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Entity resolution / record linkage — match dirty free-text records
  * against a canonical entity catalog (the dedup problem where the
  * "duplicate" is a NOISY variant, not a copy: product feeds, author
  * names, crawl titles). The classic two-stage shape from the record-
  * linkage literature (Fellegi–Sunter framing; blocking surveyed in
  * Christen 2012):
  *
  *  1. BLOCKING — records meet only candidates sharing a cheap key
  *     (here: any token 3-prefix), never the full catalog. The block
  *     join bounds the candidate set; everything downstream is
  *     per-candidate work.
  *  2. VERIFY + RESOLVE — exact edit distance on the candidates only,
  *     then a per-record argmin window (partitioned by record — no
  *     global sort) with a deterministic tie-break (distance, then
  *     entity id).
  *
  * At 100 TB the catalog is entity-cardinality (≪ records) and
  * broadcasts; the block join's hazard is HOT BLOCKS (a token prefix
  * shared by half the catalog). Since round 10 the mitigation is
  * WIRED, not just audited: q170's per-block pair budget feeds
  * [[Linkage.blockedCandidates]], which salts any block past
  * [[Linkage.PairBudget]] (dirty side sharded, catalog side
  * replicated — the Dedup.saltedPairs device) and degenerates to the
  * plain join everywhere else; q144 routes through it.
  *
  * The dirty feed is derived deterministically from `part` (word swap /
  * char drop at head and tail / suffix append, keyed on the record id)
  * so both engines construct byte-identical inputs; the resolver never
  * sees how the noise was made. `correct` marks records whose resolved
  * entity carries the original name — the measured resolution accuracy
  * (~74% under this noise mix; swaps land on neighboring entities, a
  * known blocking+edit-distance failure mode the output makes
  * visible).
  */
object Linkage {
  import org.apache.spark.sql.DataFrame

  /** Per-(block, salt) pair budget of the candidate join — q170's
    * measured per-block pair count, wired into q144 (round-10: the
    * audit now FEEDS the join instead of just describing it). 2²²
    * pairs ≈ one task's comfortable verify workload (the q38
    * targetPerBlock discipline applied to candidate pairs). */
  val PairBudget: Long = 1L << 22

  /** Blocking join with the hot-block budget enforced: blocks whose
    * dirty×catalog pair count exceeds `pairBudget` are SPLIT — the
    * dirty side salts into fd = ⌈nd / max(1, budget div nc)⌉ shards
    * (pmod on the record id, [[Dedup]].saltedPairs' device) and the
    * catalog side replicates to every shard — so a pathological block
    * (a token prefix shared by half the catalog) spreads over fd
    * shuffle keys instead of hot-spotting one task. Within-budget
    * blocks get fd = 1: the salt column is constant and the join
    * degenerates to the plain blocking join — no overhead where the
    * audit says none is needed.
    *
    * Per-key pair bound: ⌈nd/fd⌉·nc ≤ (budget div nc)·nc ≤ budget
    * whenever nc ≤ budget (pmod spreads a block's record ids
    * near-uniformly; the spec pins the bound exactly on sequential
    * ids). A single block whose CATALOG side alone exceeds the budget
    * bounds at nc — one dirty row must meet all nc entities somewhere,
    * so nc is that block's irreducible per-key floor (splitting the
    * catalog side too would shrink tasks but not the row's total
    * work).
    *
    * The salt-factor frame is block-domain (bounded: distinct token
    * 3-prefixes) and broadcasts; each dirty/catalog row meets its
    * block's factor map-side. A (record, entity) pair sharing k blocks
    * still meets exactly k times (the dirty row's salt is a function
    * of (blk, record_id)) — downstream `distinct()` semantics are
    * unchanged from the plain join. */
  private[llmdata] def blockedCandidates(db: DataFrame, cb: DataFrame,
      pairBudget: Long): DataFrame = {
    require(pairBudget > 0, "pair budget must be positive")
    // q170's per-block audit sizes, feeding the join they audit
    val dsz = db.groupBy("blk").agg(count(lit(1)).as("nd"))
    val csz = cb.groupBy("blk").agg(count(lit(1)).as("nc"))
    val factors = broadcast(dsz.join(csz, "blk")
      .select(col("blk"),
        expr(s"(nd + greatest(1L, ${pairBudget}L div nc) - 1) div " +
          s"greatest(1L, ${pairBudget}L div nc)").as("fd")))
    val dbs = db.join(factors, "blk")
      .withColumn("salt", pmod(col("record_id"), col("fd")))
      .drop("fd")
    val cbs = cb.join(factors, "blk")
      .withColumn("salt", explode(sequence(lit(0L), col("fd") - 1L)))
      .drop("fd")
    dbs.join(cbs, Seq("blk", "salt"))
  }

  val qs: Seq[Q] = Seq(
    // ---- q144: catalog entity resolution — blocked fuzzy best-match
    //      of 2000 noisy records onto the 64-entity name catalog. ----
    Q(
      "q144_entity_resolution",
      """WITH cat AS (SELECT p_name AS name, min(p_partkey) AS entity_id
        |  FROM part GROUP BY 1),
        |dirty AS (SELECT p_partkey AS record_id, p_name AS true_name,
        |  CASE p_partkey % 4
        |    WHEN 0 THEN string_split(p_name,' ')[2] || ' ' ||
        |      string_split(p_name,' ')[1]
        |    WHEN 1 THEN substr(p_name, 1, length(p_name) - 1)
        |    WHEN 2 THEN substr(p_name, 2)
        |    ELSE p_name || 'x' END AS dname
        |  FROM part),
        |db AS (SELECT DISTINCT record_id, dname, true_name,
        |    substr(t.tok, 1, 3) AS blk
        |  FROM dirty, unnest(string_split(dname, ' ')) AS t(tok)),
        |cb AS (SELECT DISTINCT entity_id, name, substr(t.tok, 1, 3) AS blk
        |  FROM cat, unnest(string_split(name, ' ')) AS t(tok)),
        |cand AS (SELECT DISTINCT d.record_id, d.dname, d.true_name,
        |    c.entity_id, c.name
        |  FROM db d JOIN cb c ON d.blk = c.blk),
        |scored AS (SELECT record_id, true_name, entity_id, name,
        |    levenshtein(dname, name) AS dist,
        |    row_number() OVER (PARTITION BY record_id
        |      ORDER BY levenshtein(dname, name), entity_id) AS rk
        |  FROM cand)
        |SELECT record_id, entity_id AS matched_entity,
        |  CAST(dist AS BIGINT) AS dist,
        |  CAST(CASE WHEN name = true_name THEN 1 ELSE 0 END AS BIGINT)
        |    AS correct
        |FROM scored WHERE rk = 1 ORDER BY record_id""".stripMargin,
    ) { (s, d) =>
      val part = Tables.part(s, d)
      val cat = part.groupBy(col("p_name").as("name"))
        .agg(min("p_partkey").as("entity_id"))
      val dirty = part.select(
        col("p_partkey").as("record_id"), col("p_name").as("true_name"),
        when(col("p_partkey") % 4 === 0,
          concat_ws(" ", element_at(split(col("p_name"), " "), 2),
            element_at(split(col("p_name"), " "), 1)))
          .when(col("p_partkey") % 4 === 1,
            expr("substr(p_name, 1, length(p_name) - 1)"))
          .when(col("p_partkey") % 4 === 2, expr("substr(p_name, 2)"))
          .otherwise(concat(col("p_name"), lit("x"))).as("dname"))
      // blocking keys dedup ROW-LOCALLY (round 15, the setSim change):
      // record_id/entity_id are unique per input row, so the distinct
      // over (id, …, blk) never crosses rows — array_distinct over the
      // transformed token array replaces the full-blocking-table
      // exchange with zero shuffle
      val db = dirty
        .select(col("record_id"), col("dname"), col("true_name"),
          explode(array_distinct(expr(
            "transform(split(dname, ' '), t -> substring(t, 1, 3))")))
            .as("blk"))
      val cb = cat
        .select(col("entity_id"), col("name"),
          explode(array_distinct(expr(
            "transform(split(name, ' '), t -> substring(t, 1, 3))")))
            .as("blk"))
      val w = Window.partitionBy("record_id")
        .orderBy(col("dist"), col("entity_id"))
      blockedCandidates(db, cb, PairBudget)
        .select("record_id", "dname", "true_name", "entity_id", "name")
        .distinct()
        .withColumn("dist", levenshtein(col("dname"), col("name")))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("record_id"), col("entity_id").as("matched_entity"),
          col("dist").cast("long").as("dist"),
          when(col("name") === col("true_name"), 1L).otherwise(0L)
            .as("correct"))
        .orderBy("record_id")
    },

    // ---- q158: golden-record survivorship — the MDM merge step after
    //      q144's matching: three conflicting feeds for the same
    //      entity fold to one golden row with PER-FIELD survivorship
    //      rules (segment: valid beats UNKNOWN, then newest, then
    //      source priority; balance: newest then priority — so one
    //      golden row can mix sources per field, which is the point
    //      of field-level survivorship vs row-level SCD2, q74's
    //      territory). Each rule compiles to ONE argmax over a
    //      COMPOSITE INTEGER key (validity·10⁹ + recency·10³ +
    //      inverted priority — monotone encoding of the lexicographic
    //      rule, q137's argmax-fold discipline: O(1) state per
    //      entity, partial-aggregated, never a per-entity sort).
    //      Feeds are derived deterministically from `customer`;
    //      feed-2 nulls 20% of segments to 'UNKNOWN' and shifts
    //      balances so survivorship is observable per field. ----
    Q(
      "q158_golden_record",
      """WITH feeds AS (
        |  SELECT c_custkey AS id, 1 AS src_prio,
        |    100 + c_custkey % 50 AS recency,
        |    c_mktsegment AS segment, c_acctbal AS bal
        |  FROM customer WHERE c_custkey % 3 <> 0
        |  UNION ALL
        |  SELECT c_custkey, 2, 200 + c_custkey % 30,
        |    CASE WHEN c_custkey % 5 = 0 THEN 'UNKNOWN'
        |         ELSE c_mktsegment END,
        |    c_acctbal + 10
        |  FROM customer WHERE c_custkey % 4 <> 1
        |  UNION ALL
        |  SELECT c_custkey, 3, 50 + c_custkey % 80,
        |    c_mktsegment, c_acctbal - 5
        |  FROM customer WHERE c_custkey % 5 <> 2),
        |keyed AS (SELECT id, segment, bal,
        |    CAST((CASE WHEN segment <> 'UNKNOWN' THEN 1 ELSE 0 END)
        |        * 1000000000 + recency * 1000 + (9 - src_prio)
        |      AS BIGINT) AS seg_key,
        |    CAST(recency * 1000 + (9 - src_prio) AS BIGINT) AS bal_key
        |  FROM feeds)
        |SELECT id, arg_max(segment, seg_key) AS segment,
        |  arg_max(bal, bal_key) AS bal,
        |  CAST(count(*) AS BIGINT) AS n_sources
        |FROM keyed GROUP BY id ORDER BY id""".stripMargin,
    ) { (s, d) =>
      val cust = Tables.customer(s, d)
      def feed(pred: org.apache.spark.sql.Column, prio: Int,
          recBase: Int, recMod: Int,
          seg: org.apache.spark.sql.Column,
          bal: org.apache.spark.sql.Column) =
        cust.filter(pred).select(col("c_custkey").as("id"),
          lit(prio).as("src_prio"),
          (lit(recBase) + col("c_custkey") % recMod).as("recency"),
          seg.as("segment"), bal.as("bal"))
      val feeds = feed(col("c_custkey") % 3 =!= 0, 1, 100, 50,
          col("c_mktsegment"), col("c_acctbal"))
        .unionAll(feed(col("c_custkey") % 4 =!= 1, 2, 200, 30,
          when(col("c_custkey") % 5 === 0, "UNKNOWN")
            .otherwise(col("c_mktsegment")), col("c_acctbal") + 10))
        .unionAll(feed(col("c_custkey") % 5 =!= 2, 3, 50, 80,
          col("c_mktsegment"), col("c_acctbal") - 5))
      feeds.select(col("id"), col("segment"), col("bal"),
          (when(col("segment") =!= "UNKNOWN", 1L).otherwise(0L)
            * 1000000000L + col("recency") * 1000L
            + (lit(9) - col("src_prio"))).as("seg_key"),
          (col("recency") * 1000L + (lit(9) - col("src_prio")))
            .as("bal_key"))
        .groupBy("id")
        .agg(max_by(col("segment"), col("seg_key")).as("segment"),
          max_by(col("bal"), col("bal_key")).as("bal"),
          count(lit(1)).as("n_sources"))
        .orderBy("id")
    },

    // ---- q169: bounded fuzzy name pairs — catalog names within edit
    //      distance 3, verified by the NATIVE banded expression
    //      `lev_bounded` (functions/BoundedLevenshtein: Ukkonen's
    //      O(k·n) diagonal band with three early exits, whole-stage
    //      codegen via a static call — the built-in levenshtein fills
    //      the full O(m·n) matrix to answer a ≤3 question). Pairs
    //      range over the DISTINCT-NAME domain (entity cardinality,
    //      ≪ rows at any corpus scale; the name side of q144's
    //      catalog), ordered a < b. The oracle uses exact
    //      levenshtein — equal BY CONTRACT because the bounded form
    //      returns the exact distance whenever it is ≤ k (the spec
    //      pins the sentinel path the oracle never sees). ----
    Q(
      "q169_bounded_fuzzy_pairs",
      """WITH names AS (SELECT DISTINCT p_name AS name FROM part)
        |SELECT a.name AS name_a, b.name AS name_b,
        |  CAST(levenshtein(a.name, b.name) AS INT) AS dist
        |FROM names a JOIN names b ON a.name < b.name
        |WHERE levenshtein(a.name, b.name) <= 3
        |ORDER BY name_a, name_b""".stripMargin,
    ) { (s, d) =>
      val names = Tables.part(s, d).select(col("p_name").as("name"))
        .distinct()
      names.toDF("name_a")
        .join(broadcast(names.toDF("name_b")),
          col("name_a") < col("name_b"))
        .withColumn("dist", expr("lev_bounded(name_a, name_b, 3)"))
        .filter(col("dist") <= 3)
        .orderBy("name_a", "name_b")
    },

    // ---- q170: blocking-quality audit — the q117-style skew report
    //      for q144's blocking scheme, run BEFORE the candidate join:
    //      per block key, dirty-side records × catalog-side entities
    //      = the candidate pairs that block will emit; the top-10
    //      hottest blocks and their share of the total pair budget
    //      tell the ER pipeline whether to cap, split, or salt a
    //      block before paying for it (the documented hot-block seam,
    //      now measured instead of assumed). Two domain-bounded
    //      aggregations + a broadcast scalar total; integer mille
    //      share. ----
    Q(
      "q170_blocking_audit",
      """WITH dirty AS (SELECT p_partkey AS record_id,
        |  CASE p_partkey % 4
        |    WHEN 0 THEN string_split(p_name,' ')[2] || ' ' ||
        |      string_split(p_name,' ')[1]
        |    WHEN 1 THEN substr(p_name, 1, length(p_name) - 1)
        |    WHEN 2 THEN substr(p_name, 2)
        |    ELSE p_name || 'x' END AS dname
        |  FROM part),
        |db AS (SELECT DISTINCT record_id, substr(t.tok, 1, 3) AS blk
        |  FROM dirty, unnest(string_split(dname, ' ')) AS t(tok)),
        |cb AS (SELECT DISTINCT e.entity_id, substr(t.tok, 1, 3) AS blk
        |  FROM (SELECT p_name, min(p_partkey) AS entity_id
        |        FROM part GROUP BY 1) e,
        |    unnest(string_split(e.p_name, ' ')) AS t(tok)),
        |dsz AS (SELECT blk, CAST(count(*) AS BIGINT) AS nd
        |  FROM db GROUP BY 1),
        |csz AS (SELECT blk, CAST(count(DISTINCT entity_id) AS BIGINT)
        |    AS nc
        |  FROM cb GROUP BY 1),
        |j AS (SELECT d.blk, d.nd, c.nc, d.nd * c.nc AS pairs
        |  FROM dsz d JOIN csz c ON d.blk = c.blk),
        |tot AS (SELECT CAST(sum(pairs) AS BIGINT) AS tp FROM j)
        |SELECT j.blk, j.nd, j.nc, CAST(j.pairs AS BIGINT) AS pairs,
        |  CAST(1000 * j.pairs // tot.tp AS BIGINT) AS share_milli
        |FROM j, tot ORDER BY pairs DESC, blk LIMIT 10""".stripMargin,
    ) { (s, d) =>
      val part = Tables.part(s, d)
      val dirty = part.select(col("p_partkey").as("record_id"),
        when(col("p_partkey") % 4 === 0,
          concat_ws(" ", element_at(split(col("p_name"), " "), 2),
            element_at(split(col("p_name"), " "), 1)))
          .when(col("p_partkey") % 4 === 1,
            expr("substr(p_name, 1, length(p_name) - 1)"))
          .when(col("p_partkey") % 4 === 2, expr("substr(p_name, 2)"))
          .otherwise(concat(col("p_name"), lit("x"))).as("dname"))
      // row-local blocking-key dedup (see q144 — same rationale)
      val dsz = dirty
        .select(col("record_id"),
          explode(array_distinct(expr(
            "transform(split(dname, ' '), t -> substring(t, 1, 3))")))
            .as("blk"))
        .groupBy("blk").agg(count(lit(1)).as("nd"))
      val csz = part.groupBy(col("p_name"))
        .agg(min("p_partkey").as("entity_id"))
        .select(col("entity_id"),
          explode(array_distinct(expr(
            "transform(split(p_name, ' '), t -> substring(t, 1, 3))")))
            .as("blk"))
        .groupBy("blk").agg(countDistinct("entity_id").as("nc"))
      val j = graft.Caches.persist(dsz.join(csz, "blk")
        .withColumn("pairs", col("nd") * col("nc")))
      val tot = j.agg(sum("pairs").as("tp"))
      j.crossJoin(broadcast(tot))
        .select(col("blk"), col("nd"), col("nc"), col("pairs"),
          expr("(1000 * pairs) div tp").as("share_milli"))
        .orderBy(col("pairs").desc, col("blk"))
        .limit(10)
    },
  )
}

