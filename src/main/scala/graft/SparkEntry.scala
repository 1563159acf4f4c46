package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers here as a named
  * query over `/root/testdata/sf*` plus (when SQL-expressible) the
  * equivalent DuckDB oracle SQL. Definitions live in the per-domain
  * modules; this object is just the registry.
  */
object SparkEntry {
  /** All verifiable operators, in registration order. */
  def registry: Seq[Q] =
    relational.Relational.qs ++
      relational.EventOps.qs ++
      relational.Stats.qs ++
      llmdata.Dedup.qs ++
      llmdata.IncrementalLsh.qs ++
      llmdata.Similarity.qs ++
      llmdata.TextAnalysis.qs ++
      llmdata.Curation.qs ++
      llmdata.Hygiene.qs ++
      llmdata.Packing.qs ++
      llmdata.Mixing.qs ++
      llmdata.Indexing.qs ++
      llmdata.IncrementalIndexing.qs ++
      llmdata.Multimodal.qs ++
      llmdata.Snapshots.qs ++
      llmdata.Governance.qs ++
      llmdata.Graphs.qs ++
      llmdata.Linkage.qs ++
      llmdata.Layout.qs ++
      llmdata.Planner.qs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Snowflake join + aggregate (q03): exercises scan, broadcast joins,
    * partial aggregation, distinct-agg, and sort in one plan. */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.tune(spark)
    registry.find(_.name == "q03_join_dims").get
      .run(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> { (s: SparkSession, d: String) =>
      GraftSession.tune(s)
      q.run(s, d)
    }).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
