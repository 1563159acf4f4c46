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
  /** (doc_id, w) with one row per token occurrence. */
  def tokens(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))

  /** (doc_id, lang, w) distinct token sets (for set-similarity ops). */
  def tokenSet(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("w"))
      .distinct()

  /** The DuckDB-side rendering of the same tokenizations, shared by the
    * oracle SQL of several queries. */
  val SqlTokens = "SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents"
  val SqlTokenSet =
    "SELECT DISTINCT doc_id, lang, unnest(string_split(text,' ')) AS w FROM documents"
}
