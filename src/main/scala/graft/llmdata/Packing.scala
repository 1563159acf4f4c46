package graft.llmdata

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** `[EXT]` Sequence packing for LLM pretraining: the concat-and-chunk
  * pass that turns a curated document stream into fixed-token-budget
  * training sequences (every major pretraining pipeline ends with this —
  * GPT-3 §2.1 "documents are concatenated and split into sequences";
  * T5/Gopher pack similarly; public literature).
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
  )
}
