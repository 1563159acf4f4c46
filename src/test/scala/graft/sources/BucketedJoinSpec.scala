package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Proves the bucketing contract: a join of two tables bucketed on the
  * join key plans with zero Exchange operators — the 100 TB shape for
  * repeated fact⋈fact joins. */
class BucketedJoinSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("bucketed lineitem⋈orders joins with no shuffle on either side") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      Bucketed.write(Tables.lineitem(spark, sf), "li_b",
        Seq("l_orderkey"), 8, sortCols = Seq("l_orderkey"))
      Bucketed.write(Tables.orders(spark, sf), "ord_b",
        Seq("o_orderkey"), 8, sortCols = Seq("o_orderkey"))
      val joined = Bucketed.table(spark, "li_b")
        .join(Bucketed.table(spark, "ord_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      // the join itself must be exchange-free; only the final
      // aggregation may shuffle (tiny: one row per priority)
      val joinSection = plan.substring(0, plan.indexOf("HashAggregate"))
      assert(!joinSection.contains("Exchange"),
        s"bucketed join must not shuffle:\n$joinSection")
      assert(plan.contains("SortMergeJoin"))
      // and it still computes the right thing
      val n = joined.agg(sum("n")).head().getLong(0)
      assert(n == Tables.lineitem(spark, sf).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}
