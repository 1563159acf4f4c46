package graft.llmdata

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** `[EXT]` Deduplication operators for a large-scale training-data
  * pipeline (project north star, BASELINE.json): exact content-hash
  * dedup, word-set Jaccard similarity join, MinHash+LSH banding with
  * verification, SimHash bit-vote fingerprints, and canonical/rolling
  * document fingerprints. All oracle-checked against DuckDB.
  *
  * Scale design (100 TB):
  *  - exact dedup is a single hash-shuffle on md5(text) with map-side
  *    partial aggregation — the canonical "group by content hash";
  *  - the Jaccard join blocks candidate pairs by `lang` (a real pipeline
  *    blocks by shard/domain) and joins on the token — an inverted-index
  *    similarity join; common-token skew is the known hazard, which is
  *    exactly why q29's MinHash+LSH path exists: its shuffle key is the
  *    *band hash*, whose cardinality grows with corpus size, so bucket
  *    sizes stay bounded and the verify step touches only candidates;
  *  - SimHash reduces each doc to one 16-bit integer — near-dup search
  *    becomes an equi-join on simhash (or a small Hamming-ball probe),
  *    no pairwise scan;
  *  - nothing below collects to the driver; every stage is a
  *    groupBy/join that Catalyst plans with partial aggregation + AQE.
  */
object Dedup {

  val qs: Seq[Q] = Seq(
    // ---- q27: exact dedup — keep the first doc of each content-hash
    //      group (hash-groupBy; dropDuplicates semantics made explicit) ----
    Q(
      "q27_dedup_exact",
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies, md5(text) AS fp
        |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin,
    ) { (s, d) =>
      Tables.documents(s, d)
        .groupBy(md5(col("text")).as("fp"))
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
        .select("keep_id", "n_copies", "fp")
        .orderBy("keep_id")
    },

    // ---- q28: word-set Jaccard similarity join (n-gram Jaccard with
    //      n=1 token shingles), blocked by lang, threshold 0.95.
    //      Inverted-index join: shuffle key = token. ----
    Q(
      "q28_jaccard_pairs",
      s"""WITH words AS (${Text.SqlTokenSet}),
        |wc AS (SELECT doc_id, count(*) AS nw FROM words GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS ni
        |  FROM words a JOIN words b
        |    ON a.w = b.w AND a.lang = b.lang AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT a_id, b_id,
        |  CAST(ni AS DOUBLE)/(ca.nw + cb.nw - ni) AS jaccard
        |FROM inter JOIN wc ca ON ca.doc_id = a_id
        |           JOIN wc cb ON cb.doc_id = b_id
        |WHERE CAST(ni AS DOUBLE)/(ca.nw + cb.nw - ni) >= 0.95
        |ORDER BY a_id, b_id""".stripMargin,
    ) { (s, d) =>
      val words = Text.tokenSet(s, d)
      val wc = words.groupBy("doc_id").agg(count(lit(1)).as("nw"))
      val inter = words.as("a")
        .join(words.as("b"),
          col("a.w") === col("b.w") && col("a.lang") === col("b.lang") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .agg(count(lit(1)).as("ni"))
      val j = col("ni").cast("double") /
        (col("ca.nw") + col("cb.nw") - col("ni"))
      inter
        .join(wc.as("ca"), col("a_id") === col("ca.doc_id"))
        .join(wc.as("cb"), col("b_id") === col("cb.doc_id"))
        .select(col("a_id"), col("b_id"), j.as("jaccard"))
        .filter(col("jaccard") >= 0.95)
        .orderBy("a_id", "b_id")
    },

    // ---- q29: MinHash + LSH — 8 md5-based permutations, 4 bands of 2,
    //      candidate pairs from band-bucket equality, then Jaccard-verify
    //      ≥ 0.9 on candidates only. The scale path for q28: the shuffle
    //      key is the band hash, not the token. ----
    Q(
      "q29_minhash_lsh",
      s"""WITH words AS (
        |  SELECT DISTINCT doc_id, unnest(string_split(text,' ')) AS w FROM documents),
        |sigs AS (SELECT doc_id,
        |  min(md5(w||'#0')) AS s0, min(md5(w||'#1')) AS s1,
        |  min(md5(w||'#2')) AS s2, min(md5(w||'#3')) AS s3,
        |  min(md5(w||'#4')) AS s4, min(md5(w||'#5')) AS s5,
        |  min(md5(w||'#6')) AS s6, min(md5(w||'#7')) AS s7
        |  FROM words GROUP BY doc_id),
        |bands AS (SELECT doc_id, unnest([
        |  md5('0'||s0||s1), md5('1'||s2||s3),
        |  md5('2'||s4||s5), md5('3'||s6||s7)]) AS band FROM sigs),
        |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        |  FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id),
        |wc AS (SELECT doc_id, count(*) AS nw FROM words GROUP BY doc_id),
        |inter AS (SELECT c.a_id, c.b_id, count(*) AS ni FROM cand c
        |  JOIN words wa ON wa.doc_id = c.a_id
        |  JOIN words wb ON wb.doc_id = c.b_id AND wb.w = wa.w
        |  GROUP BY 1, 2)
        |SELECT i.a_id, i.b_id,
        |  CAST(ni AS DOUBLE)/(ca.nw + cb.nw - ni) AS jaccard
        |FROM inter i JOIN wc ca ON ca.doc_id = i.a_id
        |             JOIN wc cb ON cb.doc_id = i.b_id
        |WHERE CAST(ni AS DOUBLE)/(ca.nw + cb.nw - ni) >= 0.9
        |ORDER BY a_id, b_id""".stripMargin,
    ) { (s, d) =>
      val words = Text.tokenSet(s, d).drop("lang")
      val sigAggs = (0 until 8).map(i =>
        min(md5(concat(col("w"), lit("#" + i)))).as(s"s$i"))
      val sigs = words.groupBy("doc_id").agg(sigAggs.head, sigAggs.tail: _*)
      val bands = sigs.select(col("doc_id"),
        explode(array(
          md5(concat(lit("0"), col("s0"), col("s1"))),
          md5(concat(lit("1"), col("s2"), col("s3"))),
          md5(concat(lit("2"), col("s4"), col("s5"))),
          md5(concat(lit("3"), col("s6"), col("s7"))))).as("band"))
      val cand = bands.as("a")
        .join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .distinct()
      val wc = words.groupBy("doc_id").agg(count(lit(1)).as("nw"))
      val inter = cand
        .join(words.as("wa"), col("a_id") === col("wa.doc_id"))
        .join(words.as("wb"),
          col("b_id") === col("wb.doc_id") && col("wa.w") === col("wb.w"))
        .groupBy("a_id", "b_id").agg(count(lit(1)).as("ni"))
      val j = col("ni").cast("double") /
        (col("ca.nw") + col("cb.nw") - col("ni"))
      inter
        .join(wc.as("ca"), col("a_id") === col("ca.doc_id"))
        .join(wc.as("cb"), col("b_id") === col("cb.doc_id"))
        .select(col("a_id"), col("b_id"), j.as("jaccard"))
        .filter(col("jaccard") >= 0.9)
        .orderBy("a_id", "b_id")
    },

    // ---- q30: SimHash — 16-bit fingerprint by per-bit weighted vote of
    //      token hashes (weight = term frequency). One integer per doc. ----
    Q(
      "q30_simhash",
      s"""WITH toks AS (${Text.SqlTokens}),
        |wh AS (SELECT doc_id, w, count(*) AS c,
        |         CAST(('0x'||substr(md5(w),1,4)) AS BIGINT) AS h
        |       FROM toks GROUP BY doc_id, w),
        |bits AS (SELECT doc_id, bit,
        |    sum(CASE WHEN (h >> bit) & 1 = 1 THEN c ELSE -c END) AS vote
        |  FROM wh, (SELECT unnest(range(16)) AS bit) b GROUP BY doc_id, bit)
        |SELECT doc_id,
        |  sum(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE CAST(0 AS BIGINT) END) AS simhash
        |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    ) { (s, d) =>
      val wh = Text.tokens(s, d)
        .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
        .withColumn("h", conv(substring(md5(col("w")), 1, 4), 16, 10).cast("long"))
      val bits = wh
        .select(col("doc_id"), col("c"), col("h"),
          explode(sequence(lit(0), lit(15))).as("bit"))
        .groupBy("doc_id", "bit")
        .agg(sum(when(expr("(shiftright(h, bit) & 1) = 1"), col("c"))
          .otherwise(-col("c"))).as("vote"))
      bits.groupBy("doc_id")
        .agg(sum(when(col("vote") > 0, expr("shiftleft(CAST(1 AS BIGINT), bit)"))
          .otherwise(lit(0L))).as("simhash"))
        .orderBy("doc_id")
    },

    // ---- q36: document fingerprints — canonical word-set hash (groups
    //      docs with identical vocabularies) + rolling 3-gram shingle
    //      min-hash (winnowing-style content fingerprint). ----
    Q(
      "q36_fingerprint",
      """WITH f AS (
        |  SELECT doc_id,
        |    md5(array_to_string(list_sort(list_distinct(string_split(text,' '))),' ')) AS fp_set,
        |    CASE WHEN len(string_split(text,' ')) >= 3 THEN
        |      list_min(list_transform(range(1, len(string_split(text,' ')) - 1),
        |        i -> md5(string_split(text,' ')[i] || ' ' ||
        |                 string_split(text,' ')[i+1] || ' ' ||
        |                 string_split(text,' ')[i+2])))
        |    ELSE NULL END AS fp_shingle
        |  FROM documents)
        |SELECT doc_id, fp_set, fp_shingle,
        |  count(*) OVER (PARTITION BY fp_set) AS n_same_set
        |FROM f ORDER BY doc_id""".stripMargin,
    ) { (s, d) =>
      val t = split(col("text"), " ")
      val f = Tables.documents(s, d).select(
        col("doc_id"),
        md5(concat_ws(" ", array_sort(array_distinct(t)))).as("fp_set"),
        when(size(t) >= 3,
          array_min(transform(sequence(lit(1), size(t) - 2),
            i => md5(concat_ws(" ",
              element_at(t, i), element_at(t, i + 1), element_at(t, i + 2))))))
          .otherwise(lit(null)).as("fp_shingle"))
      f.withColumn("n_same_set", count(lit(1)).over(Window.partitionBy("fp_set")))
        .orderBy("doc_id")
    },
  )
}
