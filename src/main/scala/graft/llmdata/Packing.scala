package graft.llmdata

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** `[EXT]` Sequence packing and document chunking for LLM pretraining:
  * the concat-and-chunk pass that turns a curated document stream into
  * fixed-token-budget training sequences (every major pretraining
  * pipeline ends with this — GPT-3 §2.1 "documents are concatenated and
  * split into sequences"; T5/Gopher pack similarly; public literature),
  * and the per-document overlapping-window chunker that RAG indexing and
  * long-document training both preprocess with.
  *
  * Contract: within each (lang, source) stream, documents are
  * concatenated in doc_id order and the token stream is cut into shards
  * of exactly `budget` tokens. A document starting at stream offset `s`
  * with `n` tokens is assigned to the shard containing `s`
  * (shard = s div B), carries its in-shard offset (s mod B), and is
  * flagged when it straddles a shard boundary (the packed-attention /
  * EOD-masking case trainers must handle).
  *
  * Scale design (100 TB):
  *  - the running offset is ONE partitioned window over a map-computed
  *    token count — no join, no second pass; everything else is per-row
  *    integer arithmetic in whole-stage codegen;
  *  - the window key (lang, source) is the natural data-parallel unit
  *    and OPEN cardinality — `source` is the crawl shard/file in a real
  *    corpus, so no window partition grows with corpus size and none
  *    exceeds one task. Packing is only ever contiguous per key; a
  *    global concatenation order would serialize the corpus through one
  *    task by definition, which is why no production pipeline uses one;
  *  - integer-only math (div/mod on the cumulative count) — no floats
  *    anywhere, so the assignment is bit-stable across engines and
  *    cluster layouts.
  */
object Packing {

  /** Tokens per packed training sequence. Small relative to the test
    * docs (~40–200 tokens) so shard boundaries are well exercised. */
  private val B = 256

  /** Chunk geometry for q106: 32-token windows every 24 tokens (8-token
    * overlap) — small relative to the test docs for boundary coverage.
    * (Declared before `qs`: the oracle SQL interpolates these at object
    * construction. Package-visible so the spec pins the SAME geometry
    * instead of duplicating the literals.) */
  private[llmdata] val ChunkWidth = 32
  private[llmdata] val ChunkStride = 24

  val qs: Seq[Q] = Seq(
    // ---- q65: pack-sequences assignment — per-doc shard id, in-shard
    //      offset, and boundary-straddle flag. ----
    Q(
      "q65_pack_sequences",
      s"""WITH t AS (SELECT doc_id, lang, source,
        |    CAST(len(string_split(text,' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |c AS (SELECT doc_id, lang, source, n_tok,
        |    CAST(sum(n_tok) OVER (PARTITION BY lang, source ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) - n_tok AS BIGINT) AS strt
        |  FROM t)
        |SELECT doc_id, lang, source, n_tok,
        |  strt // $B AS shard_id,
        |  strt % $B AS shard_off,
        |  CAST(strt // $B <> (strt + n_tok - 1) // $B AS INT) AS straddles
        |FROM c ORDER BY doc_id""".stripMargin,
    ) { (s, d) =>
      val w = Window.partitionBy("lang", "source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        .withColumn("strt", sum("n_tok").over(w) - col("n_tok"))
        .select(col("doc_id"), col("lang"), col("source"), col("n_tok"),
          expr(s"strt div $B").as("shard_id"),
          (col("strt") % B).as("shard_off"),
          (expr(s"strt div $B") =!=
            expr(s"(strt + n_tok - 1) div $B")).cast("int").as("straddles"))
        .orderBy("doc_id")
    },

    // ---- q106: overlapping-window document chunking — cut every doc
    //      into fixed-width token windows (width 32, stride 24, so
    //      consecutive chunks overlap by 8 tokens), the preprocessing
    //      unit of RAG indexing and long-document training. Chunk
    //      starts are 0, S, 2S, … < n_tok; the final chunk truncates at
    //      the document end. Pure MAP pass: tokenize, generate starts
    //      with one row-local `sequence`+`posexplode`, slice — no
    //      shuffle anywhere but the final ORDER BY, so the operator
    //      scales with executors at any corpus size. Integer-only
    //      offsets (start, index, length) keep the contract bit-stable
    //      cross-engine; the chunk text is an exact substring
    //      reassembly, verified verbatim by the oracle. ----
    Q(
      "q106_doc_chunks",
      s"""WITH tl AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
        |st AS (SELECT doc_id, w, unnest(range(0, len(w), $ChunkStride)) AS chunk_start
        |  FROM tl)
        |SELECT doc_id, chunk_start // $ChunkStride AS chunk_idx, chunk_start,
        |  CAST(len(list_slice(w, chunk_start + 1, chunk_start + $ChunkWidth)) AS BIGINT)
        |    AS n_chunk,
        |  array_to_string(list_slice(w, chunk_start + 1, chunk_start + $ChunkWidth), ' ')
        |    AS chunk_text
        |FROM st ORDER BY doc_id, chunk_idx""".stripMargin,
    ) { (s, d) =>
      val chunk = slice(col("w"),
        (col("chunk_start") + 1).cast("int"), lit(ChunkWidth))
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"), col("w"),
          posexplode(sequence(lit(0), size(col("w")) - 1, lit(ChunkStride))))
        .toDF("doc_id", "w", "chunk_idx", "chunk_start")
        .select(col("doc_id"), col("chunk_idx").cast("long"),
          col("chunk_start").cast("long"),
          size(chunk).cast("long").as("n_chunk"),
          concat_ws(" ", chunk).as("chunk_text"))
        .orderBy("doc_id", "chunk_idx")
    },

    // ---- q194: context-length curve — price the sequence-length knob
    //      before committing a packing run (q65) or a chunking run
    //      (q106): for each candidate context length L, how many docs
    //      truncate, how many tokens truncation loses, how full the
    //      padded one-doc-per-row layout is, and how many sequences
    //      concat-and-chunk mode would emit. The corpus collapses to
    //      the LENGTH-domain histogram first (bounded by the longest
    //      doc, not the doc count), so the 4-row L grid multiplies a
    //      histogram, never the corpus; util_micro floors once per L.
    //      All integer; one map-side-combined pass. ----
    Q(
      "q194_context_length_curve",
      """WITH t AS (SELECT
        |    CAST(len(string_split(text,' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |h AS (SELECT n_tok, CAST(count(*) AS BIGINT) AS c
        |  FROM t GROUP BY 1),
        |m AS (SELECT CAST(sum(c) AS BIGINT) AS n_docs,
        |    CAST(sum(n_tok * c) AS BIGINT) AS total FROM h),
        |g AS (SELECT CAST(k AS BIGINT) AS len_ctx
        |  FROM (VALUES (128),(256),(512),(1024)) AS v(k))
        |SELECT g.len_ctx,
        |  CAST(sum(CASE WHEN h.n_tok > g.len_ctx THEN h.c ELSE 0 END)
        |    AS BIGINT) AS docs_truncated,
        |  CAST(sum(CASE WHEN h.n_tok > g.len_ctx
        |      THEN (h.n_tok - g.len_ctx) * h.c ELSE 0 END)
        |    AS BIGINT) AS tokens_lost,
        |  CAST(sum(least(h.n_tok, g.len_ctx) * h.c) AS BIGINT)
        |    AS tokens_kept,
        |  CAST(sum(least(h.n_tok, g.len_ctx) * h.c) * 1000000
        |    // (m.n_docs * g.len_ctx) AS BIGINT) AS util_micro,
        |  CAST((m.total + g.len_ctx - 1) // g.len_ctx AS BIGINT)
        |    AS chunks_concat
        |FROM h, g, m
        |GROUP BY g.len_ctx, m.n_docs, m.total ORDER BY len_ctx""".stripMargin,
    ) { (s, d) =>
      import s.implicits._
      val h = Tables.documents(s, d)
        .select(size(split(col("text"), " ")).cast("long").as("n_tok"))
        .groupBy("n_tok").agg(count(lit(1)).as("c"))
      val m = h.agg(sum("c").as("n_docs"),
        sum(col("n_tok") * col("c")).as("total"))
      val grid = Seq(128L, 256L, 512L, 1024L).toDF("len_ctx")
      h.crossJoin(broadcast(grid)).crossJoin(broadcast(m))
        .groupBy("len_ctx", "n_docs", "total")
        .agg(
          sum(when(col("n_tok") > col("len_ctx"), col("c"))
            .otherwise(0L)).cast("long").as("docs_truncated"),
          sum(when(col("n_tok") > col("len_ctx"),
            (col("n_tok") - col("len_ctx")) * col("c"))
            .otherwise(0L)).cast("long").as("tokens_lost"),
          sum(least(col("n_tok"), col("len_ctx")) * col("c"))
            .cast("long").as("tokens_kept"))
        .select(col("len_ctx"), col("docs_truncated"), col("tokens_lost"),
          col("tokens_kept"),
          expr("tokens_kept * 1000000 div (n_docs * len_ctx)")
            .cast("long").as("util_micro"),
          expr("(total + len_ctx - 1) div len_ctx").cast("long")
            .as("chunks_concat"))
        .orderBy("len_ctx")
    },
  )
}
