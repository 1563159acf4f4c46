package graft.llmdata

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Caches, Q, Tables}

/** Graph analytics over corpus-derived graphs — the two iterative
  * message-passing primitives (power-iteration centrality, clamped-seed
  * label propagation) that curation pipelines run on document/domain
  * graphs: rank sources by cross-reference structure, spread sparse
  * human labels to unlabeled neighbors.
  *
  * Spark has no native iterative-graph operator; the Spark-first
  * rendering is the Pregel decomposition — each superstep is ONE
  * edge⋈rank join + ONE groupBy(dst) shuffle, unrolled a fixed number
  * of steps so the whole computation is a single declarative plan both
  * engines can replay (no driver loop, no mutable accumulators; the
  * oracle unrolls the same steps as CTEs). The edge list and degree
  * table persist ONCE and feed every superstep.
  *
  * Graphs derive from rare shared n-gram anchors (q138's device): an
  * anchor with document-frequency in [2, dfMax] contributes at most
  * C(dfMax, 2) pairs BY CONSTRUCTION, so edge building cannot skew or
  * go quadratic no matter the corpus size — the predicate itself is
  * the bound. At 100 TB nodes are domains/doc-clusters (≪ corpus
  * rows); per-superstep traffic is O(edges), the textbook distributed
  * PageRank/LPA cost (Page et al. 1999; Raghavan et al. 2007, with
  * deterministic min-label tie-breaks instead of random ones).
  *
  * All rank arithmetic is INTEGER (scaled by 10^6, floor division) so
  * every superstep is bit-identical across engines — the q91/q113
  * float policy applied to iterative state.
  */
object Graphs {

  /** Distinct (key, n-gram) shingle pairs over whitespace tokens. */
  private def shingles(df: DataFrame, key: String, extra: Seq[String],
      n: Int): DataFrame = {
    val concatExpr = (0 until n)
      .map(k => s"w[i+$k]").mkString("concat_ws(' ', ", ", ", ")")
    df.select((key +: extra).map(col) :+ split(col("text"), " ").as("w"): _*)
      .filter(size(col("w")) >= n)
      .select((key +: extra).map(col) :+
        explode(array_distinct(expr(
          s"transform(sequence(0, size(w) - $n), i -> $concatExpr)")))
          .as("g"): _*)
  }

  /** Anchors: n-grams with document frequency in [2, dfMax] over the
    * distinct (key, g) pairs — the fan-out bound. */
  private def anchored(sh: DataFrame, dfMax: Int): DataFrame =
    sh.groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df").between(2, dfMax)).select("g")

  /** Symmetric directed edge list from co-anchored keys. */
  private def coAnchorEdges(sh: DataFrame, dfMax: Int,
      key: String): DataFrame = {
    val posts = sh.join(anchored(sh, dfMax), Seq("g"))
    posts.select(col("g"), col(key).as("src"))
      .join(posts.select(col("g"), col(key).as("dst")), Seq("g"))
      .filter(col("src") =!= col("dst"))
      .select("src", "dst").distinct()
  }

  val qs: Seq[Q] = Seq(
    // ---- q142: source PageRank — power iteration (3 supersteps,
    //      damping 0.85) over the source co-anchor graph: sources
    //      sharing a rare 5-gram are linked, and rank flows along
    //      links. Integer-exact: rank starts at 10^6 per node;
    //      each step is r' = 0.15·10^6 + ⌊85·Σ⌊r/deg⌋/100⌋, all
    //      BIGINT floor division, so DuckDB replays the exact
    //      fixpoint trajectory. The graph is symmetric, so every
    //      node has in-edges and no dangling-mass term is needed.
    //      Each superstep: one edge⋈rank hash join (rank side is
    //      node-cardinality — broadcastable at any scale where
    //      nodes ≪ edges) + one groupBy(dst). ----
    Q(
      "q142_source_pagerank",
      """WITH sh AS (SELECT DISTINCT source,
        |    string_split(text,' ')[i] || ' ' ||
        |    string_split(text,' ')[i+1] || ' ' ||
        |    string_split(text,' ')[i+2] || ' ' ||
        |    string_split(text,' ')[i+3] || ' ' ||
        |    string_split(text,' ')[i+4] AS g
        |  FROM documents,
        |    unnest(range(1, len(string_split(text,' ')) - 3)) AS t(i)
        |  WHERE len(string_split(text,' ')) >= 5),
        |an AS (SELECT g FROM sh GROUP BY g
        |  HAVING count(*) BETWEEN 2 AND 3),
        |ed AS (SELECT DISTINCT a.source AS src, b.source AS dst
        |  FROM sh a JOIN an ON a.g = an.g JOIN sh b ON a.g = b.g
        |  WHERE a.source <> b.source),
        |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg
        |  FROM ed GROUP BY src),
        |r0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS r FROM deg),
        |r1 AS (SELECT e.dst AS node,
        |    CAST(150000 + (85 * sum(p.r // d.deg)) // 100 AS BIGINT) AS r
        |  FROM ed e JOIN r0 p ON e.src = p.node JOIN deg d ON e.src = d.src
        |  GROUP BY e.dst),
        |r2 AS (SELECT e.dst AS node,
        |    CAST(150000 + (85 * sum(p.r // d.deg)) // 100 AS BIGINT) AS r
        |  FROM ed e JOIN r1 p ON e.src = p.node JOIN deg d ON e.src = d.src
        |  GROUP BY e.dst),
        |r3 AS (SELECT e.dst AS node,
        |    CAST(150000 + (85 * sum(p.r // d.deg)) // 100 AS BIGINT) AS r
        |  FROM ed e JOIN r2 p ON e.src = p.node JOIN deg d ON e.src = d.src
        |  GROUP BY e.dst)
        |SELECT r3.node AS source, deg.deg AS degree, r3.r AS rank
        |FROM r3 JOIN deg ON r3.node = deg.src
        |ORDER BY rank DESC, source""".stripMargin,
    ) { (s, d) =>
      val sh = Caches.persist(
        shingles(Tables.documentsSpread(s, d), "source", Nil, 5))
      val ed = Caches.persist(coAnchorEdges(sh, 3, "source"))
      val deg = Caches.persist(
        ed.groupBy("src").agg(count(lit(1)).as("deg")))
      def step(rank: DataFrame): DataFrame =
        ed.join(rank, ed("src") === rank("node"))
          .join(deg, Seq("src"))
          .groupBy(col("dst").as("node"))
          .agg(expr("CAST(150000 + (85 * sum(r div deg)) div 100 AS BIGINT)")
            .as("r"))
      val r0 = deg.select(col("src").as("node"), lit(1000000L).as("r"))
      val r3 = step(step(step(r0)))
      r3.join(deg, r3("node") === deg("src"))
        .select(col("node").as("source"), col("deg").as("degree"),
          col("r").as("rank"))
        .orderBy(col("rank").desc, col("source"))
    },

    // ---- q143: label propagation — clamped-seed LPA (2 supersteps)
    //      over the document co-anchor graph (4-grams, df ≤ 4 so
    //      fan-out ≤ C(4,2)). Seeds: every doc_id % 5 = 0 keeps its
    //      lang label forever; each round, an UNLABELED node adopts
    //      the majority label among its labeled neighbors, ties
    //      broken by smallest label (Raghavan et al.'s LPA with
    //      deterministic tie-breaks — required for cross-engine
    //      equality). Each superstep: edge⋈labels join, grouped vote
    //      count, per-node argmax window (partitioned by node — no
    //      global sort), anti-join clamp. Emits (doc, label, round
    //      assigned); nodes never reached stay unlabeled and absent. ----
    Q(
      "q143_label_propagation",
      """WITH sh AS (SELECT DISTINCT doc_id,
        |    string_split(text,' ')[i] || ' ' ||
        |    string_split(text,' ')[i+1] || ' ' ||
        |    string_split(text,' ')[i+2] || ' ' ||
        |    string_split(text,' ')[i+3] AS g
        |  FROM documents,
        |    unnest(range(1, len(string_split(text,' ')) - 2)) AS t(i)
        |  WHERE len(string_split(text,' ')) >= 4),
        |an AS (SELECT g FROM sh GROUP BY g
        |  HAVING count(*) BETWEEN 2 AND 4),
        |ed AS (SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
        |  FROM sh a JOIN an ON a.g = an.g JOIN sh b ON a.g = b.g
        |  WHERE a.doc_id <> b.doc_id),
        |l0 AS (SELECT doc_id AS node, lang AS label, 0 AS rnd
        |  FROM documents WHERE doc_id % 5 = 0),
        |v1 AS (SELECT e.dst AS node, p.label,
        |    row_number() OVER (PARTITION BY e.dst
        |      ORDER BY count(*) DESC, p.label) AS rk
        |  FROM ed e JOIN l0 p ON e.src = p.node
        |  WHERE e.dst NOT IN (SELECT node FROM l0)
        |  GROUP BY e.dst, p.label),
        |l1 AS (SELECT node, label, rnd FROM l0
        |  UNION ALL SELECT node, label, 1 FROM v1 WHERE rk = 1),
        |v2 AS (SELECT e.dst AS node, p.label,
        |    row_number() OVER (PARTITION BY e.dst
        |      ORDER BY count(*) DESC, p.label) AS rk
        |  FROM ed e JOIN l1 p ON e.src = p.node
        |  WHERE e.dst NOT IN (SELECT node FROM l1)
        |  GROUP BY e.dst, p.label),
        |l2 AS (SELECT node, label, rnd FROM l1
        |  UNION ALL SELECT node, label, 2 FROM v2 WHERE rk = 1)
        |SELECT node AS doc_id, label, CAST(rnd AS BIGINT) AS assigned_round
        |FROM l2 ORDER BY doc_id""".stripMargin,
    ) { (s, d) =>
      val docs = Tables.documentsSpread(s, d)
      val sh = Caches.persist(shingles(docs, "doc_id", Nil, 4))
      val ed = Caches.persist(coAnchorEdges(sh, 4, "doc_id"))
      val seeds = docs.filter(col("doc_id") % 5 === 0)
        .select(col("doc_id").as("node"), col("lang").as("label"),
          lit(0L).as("rnd"))
      def vote(labeled: DataFrame, rnd: Int): DataFrame = {
        val w = Window.partitionBy("node")
          .orderBy(col("votes").desc, col("label"))
        ed.join(labeled.select(col("node").as("src"), col("label")),
            Seq("src"))
          .join(labeled.select(col("node")), ed("dst") === col("node"),
            "left_anti")
          .groupBy(col("dst").as("node"), col("label"))
          .agg(count(lit(1)).as("votes"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") === 1)
          .select(col("node"), col("label"), lit(rnd.toLong).as("rnd"))
      }
      val l1 = Caches.persist(seeds.unionAll(vote(seeds, 1)))
      val l2 = l1.unionAll(vote(l1, 2))
      l2.select(col("node").as("doc_id"), col("label"),
          col("rnd").as("assigned_round"))
        .orderBy("doc_id")
    },

    // ---- q147: triangle counting + local clustering census over the
    //      document co-anchor graph — the graph-density audit (how
    //      clique-ish are the near-dup neighborhoods) behind cluster-
    //      quality checks. Uses the DEGREE-ORDERED ORIENTATION
    //      (Ortmann & Brandes; the distributed-triangle standard):
    //      each undirected edge points from its lower-(deg, id)
    //      endpoint to the higher, making out-degree O(√m) for ANY
    //      degree distribution — the wedge self-join (out-neighbors
    //      paired per apex) cannot blow up on hub nodes, where naive
    //      id-ordering goes quadratic on a low-id hub. Each triangle
    //      is found exactly once (the orientation is acyclic, so
    //      exactly one vertex out-points to the other two); closure
    //      is a semi-join of wedges against the undirected edge set.
    //      Per-node counts then fan each triangle to its 3 corners.
    //      Output: every node with degree and triangle count (0 for
    //      open neighborhoods). ----
    Q(
      "q147_triangle_count",
      """WITH sh AS (SELECT DISTINCT doc_id,
        |    string_split(text,' ')[i] || ' ' ||
        |    string_split(text,' ')[i+1] || ' ' ||
        |    string_split(text,' ')[i+2] || ' ' ||
        |    string_split(text,' ')[i+3] AS g
        |  FROM documents,
        |    unnest(range(1, len(string_split(text,' ')) - 2)) AS t(i)
        |  WHERE len(string_split(text,' ')) >= 4),
        |an AS (SELECT g FROM sh GROUP BY g
        |  HAVING count(*) BETWEEN 2 AND 4),
        |ed AS (SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
        |  FROM sh a JOIN an ON a.g = an.g JOIN sh b ON a.g = b.g
        |  WHERE a.doc_id <> b.doc_id),
        |und AS (SELECT src, dst FROM ed WHERE src < dst),
        |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
        |  FROM ed GROUP BY 1),
        |o AS (SELECT CASE WHEN ds.deg < dd.deg
        |      OR (ds.deg = dd.deg AND u.src < u.dst) THEN u.src ELSE u.dst
        |    END AS s,
        |    CASE WHEN ds.deg < dd.deg
        |      OR (ds.deg = dd.deg AND u.src < u.dst) THEN u.dst ELSE u.src
        |    END AS t
        |  FROM und u JOIN deg ds ON u.src = ds.node
        |  JOIN deg dd ON u.dst = dd.node),
        |tri AS (SELECT o1.s AS a, o1.t AS b, o2.t AS c
        |  FROM o o1 JOIN o o2 ON o1.s = o2.s AND o1.t < o2.t
        |  JOIN und u ON u.src = least(o1.t, o2.t)
        |    AND u.dst = greatest(o1.t, o2.t)),
        |pn AS (SELECT node, CAST(count(*) AS BIGINT) AS triangles FROM (
        |    SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
        |    UNION ALL SELECT c FROM tri) q GROUP BY 1)
        |SELECT deg.node AS doc_id, deg.deg AS degree,
        |  coalesce(pn.triangles, 0) AS triangles
        |FROM deg LEFT JOIN pn ON deg.node = pn.node
        |ORDER BY doc_id""".stripMargin,
    ) { (s, d) =>
      val sh = Caches.persist(
        shingles(Tables.documentsSpread(s, d), "doc_id", Nil, 4))
      val ed = coAnchorEdges(sh, 4, "doc_id")
      val und = Caches.persist(ed.filter(col("src") < col("dst")))
      val deg = Caches.persist(
        ed.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg")))
      val lower = col("ds") < col("dd") ||
        (col("ds") === col("dd") && col("src") < col("dst"))
      val o = Caches.persist(und
        .join(deg.select(col("node").as("src"), col("deg").as("ds")),
          Seq("src"))
        .join(deg.select(col("node").as("dst"), col("deg").as("dd")),
          Seq("dst"))
        .select(when(lower, col("src")).otherwise(col("dst")).as("s"),
          when(lower, col("dst")).otherwise(col("src")).as("t")))
      val tri = o.select(col("s"), col("t").as("b"))
        .join(o.select(col("s"), col("t").as("c")), Seq("s"))
        .filter(col("b") < col("c"))
        .join(und, und("src") === least(col("b"), col("c")) &&
          und("dst") === greatest(col("b"), col("c")), "left_semi")
      val pn = tri.select(col("s").as("node"))
        .unionAll(tri.select(col("b").as("node")))
        .unionAll(tri.select(col("c").as("node")))
        .groupBy("node").agg(count(lit(1)).as("triangles"))
      deg.join(pn, Seq("node"), "left")
        .select(col("node").as("doc_id"), col("deg").as("degree"),
          coalesce(col("triangles"), lit(0L)).as("triangles"))
        .orderBy("doc_id")
    },

    // ---- q151: deterministic random walks — the DeepWalk/node2vec
    //      data-prep step (walk corpus generation for graph-embedding
    //      training), made reproducible the q50 way: the "random"
    //      neighbor at step s is indexed by an md5 of (walk, step,
    //      node) mod degree — uniform over neighbors, stable across
    //      runs/engines/cluster sizes, and NEVER rand() (a re-run
    //      that changes the walk corpus invalidates every downstream
    //      embedding diff). One walker starts at each doc_id % 7 = 0
    //      node; 3 steps unroll as 3 joins against the persisted
    //      neighbor table (rn = per-src row_number over dst — the
    //      alias-free indexed adjacency list). Each step is one
    //      walker⋈adjacency hash join on the current node — walker
    //      cardinality rows, never edge-quadratic; the symmetric
    //      graph guarantees no walker strands. ----
    Q(
      "q151_random_walks",
      """WITH sh AS (SELECT DISTINCT doc_id,
        |    string_split(text,' ')[i] || ' ' ||
        |    string_split(text,' ')[i+1] || ' ' ||
        |    string_split(text,' ')[i+2] || ' ' ||
        |    string_split(text,' ')[i+3] AS g
        |  FROM documents,
        |    unnest(range(1, len(string_split(text,' ')) - 2)) AS t(i)
        |  WHERE len(string_split(text,' ')) >= 4),
        |an AS (SELECT g FROM sh GROUP BY g
        |  HAVING count(*) BETWEEN 2 AND 4),
        |ed AS (SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
        |  FROM sh a JOIN an ON a.g = an.g JOIN sh b ON a.g = b.g
        |  WHERE a.doc_id <> b.doc_id),
        |nb AS (SELECT src, dst,
        |    row_number() OVER (PARTITION BY src ORDER BY dst) AS rn,
        |    count(*) OVER (PARTITION BY src) AS deg
        |  FROM ed),
        |w0 AS (SELECT src AS walk, src AS cur FROM nb
        |  WHERE src % 7 = 0 GROUP BY 1, 2),
        |w1 AS (SELECT w.walk, nb.dst AS cur FROM w0 w JOIN nb
        |  ON nb.src = w.cur AND nb.rn = 1 + CAST(('0x' ||
        |    substr(md5(w.walk || '|0|' || w.cur), 1, 15)) AS BIGINT)
        |    % nb.deg),
        |w2 AS (SELECT w.walk, nb.dst AS cur FROM w1 w JOIN nb
        |  ON nb.src = w.cur AND nb.rn = 1 + CAST(('0x' ||
        |    substr(md5(w.walk || '|1|' || w.cur), 1, 15)) AS BIGINT)
        |    % nb.deg),
        |w3 AS (SELECT w.walk, nb.dst AS cur FROM w2 w JOIN nb
        |  ON nb.src = w.cur AND nb.rn = 1 + CAST(('0x' ||
        |    substr(md5(w.walk || '|2|' || w.cur), 1, 15)) AS BIGINT)
        |    % nb.deg)
        |SELECT w0.walk, w1.cur AS s1, w2.cur AS s2, w3.cur AS s3
        |FROM w0 JOIN w1 USING (walk) JOIN w2 USING (walk)
        |JOIN w3 USING (walk)
        |ORDER BY walk""".stripMargin,
    ) { (s, d) =>
      val sh = Caches.persist(
        shingles(Tables.documentsSpread(s, d), "doc_id", Nil, 4))
      val ed = coAnchorEdges(sh, 4, "doc_id")
      val wAdj = Window.partitionBy("src").orderBy("dst")
      val nb = Caches.persist(ed
        .withColumn("rn", row_number().over(wAdj).cast("long"))
        .withColumn("deg",
          count(lit(1)).over(Window.partitionBy("src")).cast("long")))
      val w0 = nb.filter(col("src") % 7 === 0)
        .select(col("src").as("walk"), col("src").as("cur")).distinct()
      // each step CARRIES the accumulated step columns instead of
      // being a separate branch re-joined on walk at the end
      // (round 15): the branch shape recomputed step k inside every
      // later step's lineage plus three final walk-joins — 6 step
      // joins + 3 re-joins for a 3-step walk; the chain pays exactly
      // one join per step and the final projection is free. Same
      // rows: rn === pick matches exactly one neighbor (rn covers
      // 1..deg and pick ∈ [1, deg]), so each step emits one row per
      // surviving walker in both shapes.
      def step(wk: DataFrame, k: Int): DataFrame = {
        val pick = lit(1) + conv(substring(md5(
          concat_ws("|", col("walk"), lit(k), col("cur"))), 1, 15),
          16, 10).cast("long") % col("deg")
        val keep = wk.columns.toSeq.collect { case c if c != "cur" => wk(c) }
        wk.join(nb, nb("src") === wk("cur") && col("rn") === pick)
          .select(keep ++ Seq(col("dst").as(s"s${k + 1}"),
            col("dst").as("cur")): _*)
      }
      step(step(step(w0, 0), 1), 2)
        .select(col("walk"), col("s1"), col("s2"), col("s3"))
        .orderBy("walk")
    },
  )
}
