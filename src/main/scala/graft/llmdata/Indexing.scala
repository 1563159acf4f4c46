package graft.llmdata

import graft.Q
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** `[EXT]` Term-statistics operators over the `documents` corpus:
  * per-document TF-IDF keyterms and the inverted index (posting lists)
  * — the retrieval-side components of a training-data pipeline
  * (corpus search, relevance-based filtering, data-mix diagnostics).
  *
  * Scale design (100 TB):
  *  - both ops reduce token rows with map-side partial aggregation
  *    before any exchange, so shuffle volume is O(distinct (doc, term))
  *    resp. O(distinct (term, segment)), never O(token occurrences);
  *  - the document-frequency table derives FROM the per-doc aggregate
  *    (one extra term-keyed shuffle of doc-level rows) and joins back
  *    broadcast — at an open web-scale vocabulary AQE degrades it to a
  *    term-keyed shuffle join, which is the same key the tf rows
  *    already carry;
  *  - the corpus size enters as a broadcast 1-row aggregate (scalar-
  *    subquery shape, q15), never a driver-side collect;
  *  - TF-IDF scores use the rational form tf·N/df computed as ONE
  *    integer product cast to double and ONE division — exact integers
  *    into one IEEE op each ⇒ bit-identical across engines (Q.scala
  *    float policy), with the term as deterministic tie-break.
  */
object Indexing {

  val qs: Seq[Q] = Seq(
    // ---- q67: TF-IDF keyterms — top-3 terms per document by
    //      tf·N/df (rational idf; monotone in tf/df, so ranking
    //      matches the ln(N/df) convention for any fixed tf) with
    //      lexicographic tie-break. ----
    Q(
      "q67_tfidf_topterms",
      s"""WITH toks AS (${Text.SqlTokens}),
        |tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
        |  FROM toks GROUP BY 1, 2),
        |df AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY w),
        |n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM toks)
        |SELECT doc_id, w AS term, tf, df,
        |  CAST(tf * n AS DOUBLE) / df AS score, CAST(rn AS INT) AS rank
        |FROM (SELECT tf.doc_id, tf.w, tf.tf, df.df, n.n,
        |    row_number() OVER (PARTITION BY tf.doc_id
        |      ORDER BY CAST(tf.tf * n.n AS DOUBLE) / df.df DESC, tf.w) AS rn
        |  FROM tf JOIN df USING (w) CROSS JOIN n)
        |WHERE rn <= 3 ORDER BY doc_id, rank""".stripMargin,
    ) { (s, d) =>
      val tf = Text.tokens(s, d)
        .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
      val dfT = tf.groupBy("w").agg(count(lit(1)).as("df"))
      val n = tf.agg(count_distinct(col("doc_id")).as("n"))
      val w = Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("w"))
      tf.join(dfT, "w")
        .join(broadcast(n))
        .withColumn("score", (col("tf") * col("n")).cast("double") / col("df"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("w").as("term"), col("tf"), col("df"),
          col("score"), col("rank").cast("int").as("rank"))
        .orderBy("doc_id", "rank")
    },

    // ---- q69: inverted index — posting lists built as SEGMENTS of
    //      1000 doc-ids (Lucene-style): one row per (term, segment)
    //      with segment-local document/collection frequency and the
    //      sorted posting list (rendered as a canonical comma-joined
    //      string: identical bytes in both engines, no array-typed
    //      output to hash). The segment key is STRUCTURAL scale
    //      safety: a stop word's postings grow with the corpus, so a
    //      per-term `collect_list` would fold 100 TB worth of doc-ids
    //      into one row — the segment bound caps every aggregation
    //      group at 1000 entries no matter how common the term.
    //      Term-level df/cf are an additive rollup of the segments.
    //      Build is the classic two-level aggregate: (term, doc)
    //      partial counts, then the per-(term, segment) fold; posting
    //      order is pinned by array_sort ⇒ partition-order-proof. ----
    Q(
      "q69_inverted_index",
      s"""WITH toks AS (${Text.SqlTokens}),
        |td AS (SELECT w, doc_id, CAST(count(*) AS BIGINT) AS c
        |  FROM toks GROUP BY 1, 2)
        |SELECT w AS term, doc_id // 1000 AS segment,
        |  CAST(count(*) AS BIGINT) AS df, CAST(sum(c) AS BIGINT) AS cf,
        |  array_to_string(list_sort(list(doc_id)), ',') AS postings
        |FROM td GROUP BY 1, 2 ORDER BY term, segment""".stripMargin,
    ) { (s, d) =>
      Text.tokens(s, d)
        .groupBy("w", "doc_id").agg(count(lit(1)).as("c"))
        .groupBy(col("w"), expr("doc_id div 1000").as("segment"))
        .agg(count(lit(1)).as("df"), sum("c").as("cf"),
          array_join(
            transform(array_sort(collect_list(col("doc_id"))),
              x => x.cast("string")), ",").as("postings"))
        .select(col("w").as("term"), col("segment"), col("df"), col("cf"),
          col("postings"))
        .orderBy("term", "segment")
    },
  )
}
