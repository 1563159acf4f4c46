package graft.llmdata

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Shared tokenization helpers for the LLM-data operators over the
  * `documents` table (TESTDATA.md; whitespace-joined word text).
  *
  * Scale notes (100 TB): every consumer below tokenizes with a codegen'd
  * `split` — no UDFs — so the token pipeline stays inside whole-stage
  * codegen and the scan prunes to (doc_id, text) only.
  */
object Text {
  /** (doc_id, w) with one row per token occurrence. All three shared
    * tokenizers load via [[Tables.documentsSpread]]: tokenize is the
    * CPU-heavy first stage of every consumer, and without the spread
    * floor it runs on however few splits the file gives (1, locally). */
  def tokens(s: SparkSession, d: String): DataFrame =
    Tables.documentsSpread(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))

  /** (doc_id, lang, w) distinct token sets (for set-similarity ops). */
  def tokenSet(s: SparkSession, d: String): DataFrame =
    tokenSetOf(Tables.documents(s, d))

  /** [[tokenSet]] over an arbitrary (doc_id, lang, text) frame — lets
    * similarity ops tokenize a collapsed/filtered doc subset instead of
    * the whole corpus. */
  def tokenSetOf(docs: DataFrame): DataFrame =
    Tables.spread(docs)
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("w"))
      .distinct()

  /** Row-local token-SET fingerprint: md5 of the sorted distinct token
    * list. Equal fp ⟺ equal token set (mod md5 collision) — the collapse
    * key that lets set-similarity joins run over distinct contents
    * instead of documents. */
  def setFp: Column =
    md5(concat_ws(" ", array_sort(array_distinct(split(col("text"), " ")))))

  /** (doc_id, lang, g) distinct 3-gram shingle sets — the n-gram unit
    * of near-dup detection (docs shorter than 3 tokens have none). */
  def shingleSet(s: SparkSession, d: String): DataFrame =
    Tables.documentsSpread(s, d)
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), col("lang"),
        explode(array_distinct(expr(
          "transform(sequence(0, size(w) - 3), " +
            "i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))"))).as("g"))

  /** The DuckDB-side rendering of the same tokenizations, shared by the
    * oracle SQL of several queries. */
  val SqlTokens = "SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents"
  val SqlTokenSet =
    "SELECT DISTINCT doc_id, lang, unnest(string_split(text,' ')) AS w FROM documents"
  val SqlShingleSet =
    """SELECT doc_id, lang, unnest(list_distinct(list_transform(
      |    range(1, len(string_split(text,' ')) - 1),
      |    i -> string_split(text,' ')[i] || ' ' ||
      |         string_split(text,' ')[i+1] || ' ' ||
      |         string_split(text,' ')[i+2]))) AS g
      |  FROM documents WHERE len(string_split(text,' ')) >= 3""".stripMargin
}
