package graft.llmdata

import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Privacy / re-identification audits — the data-governance gate a
  * training corpus passes before release. The reference pipeline ships
  * device telemetry into a serving store with no release review; any
  * production counterpart (and any LLM corpus with user-derived rows)
  * needs the two classic audits from the privacy literature:
  *
  *  - k-anonymity (Sweeney 2002): every quasi-identifier (QI)
  *    combination must be shared by ≥ k rows, else the row is
  *    re-identifiable by linkage.
  *  - l-diversity (Machanavajjhala et al. 2007): within each QI group the
  *    SENSITIVE attribute must take ≥ l distinct values, else group
  *    membership alone leaks the sensitive value even at high k.
  *
  * Both are pure grouped aggregation — ONE keyed shuffle each, no
  * joins wider than the fact→dim FK, integer-exact outputs. At 100 TB
  * the QI histogram is tiny relative to the corpus (bounded by the QI
  * domain product, not the row count), so the reduce side never skews:
  * partial aggregation collapses each partition to its local QI
  * histogram before the exchange.
  */
object Governance {

  val qs: Seq[Q] = Seq(
    // ---- q139: k-anonymity audit — group-size census over the QI
    //      tuple (nation, market segment, account-balance band).
    //      Balance is generalized to 2000-unit bands (the
    //      generalization step of the k-anonymity method: coarsen
    //      continuous columns until groups clear the k floor); the
    //      audit reports every QI group with its size and the
    //      anonymity class it clears (k≥10 / k≥5 / k≥2 / unique).
    //      Division is double-IEEE then floor — identical in both
    //      engines since the inputs are 2-decimal doubles. ----
    Q(
      "q139_k_anonymity",
      """SELECT c_nationkey, c_mktsegment,
        |  CAST(floor(c_acctbal / 2000) AS BIGINT) AS bal_band,
        |  count(*) AS group_size,
        |  CASE WHEN count(*) >= 10 THEN 'k10'
        |       WHEN count(*) >= 5 THEN 'k5'
        |       WHEN count(*) >= 2 THEN 'k2'
        |       ELSE 'unique' END AS anonymity
        |FROM customer
        |GROUP BY 1, 2, 3
        |ORDER BY c_nationkey, c_mktsegment, bal_band""".stripMargin,
    ) { (s, d) =>
      Tables.customer(s, d)
        .groupBy(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 2000).cast("long").as("bal_band"))
        .agg(count(lit(1)).as("group_size"))
        .withColumn("anonymity",
          when(col("group_size") >= 10, "k10")
            .when(col("group_size") >= 5, "k5")
            .when(col("group_size") >= 2, "k2")
            .otherwise("unique"))
        .orderBy("c_nationkey", "c_mktsegment", "bal_band")
    },

    // ---- q140: l-diversity audit — distinct-sensitive-value census
    //      per QI group, sensitive attribute = order status reached
    //      through the customer→orders FK. A group can be large (high
    //      k) yet homogeneous (l = 1): everyone in it shares the same
    //      status, so the "anonymity" leaks it. ONE broadcast FK join
    //      (customer is the dimension) then one grouped
    //      count-distinct; the QI histogram bound means no skew. ----
    Q(
      "q140_l_diversity",
      """SELECT c.c_nationkey, c.c_mktsegment,
        |  CAST(floor(c.c_acctbal / 2000) AS BIGINT) AS bal_band,
        |  count(DISTINCT o.o_orderstatus) AS l,
        |  count(*) AS n_orders,
        |  CASE WHEN count(DISTINCT o.o_orderstatus) >= 3 THEN 'diverse'
        |       WHEN count(DISTINCT o.o_orderstatus) = 2 THEN 'low'
        |       ELSE 'homogeneous' END AS diversity
        |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        |GROUP BY 1, 2, 3
        |ORDER BY c_nationkey, c_mktsegment, bal_band""".stripMargin,
    ) { (s, d) =>
      val cust = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 2000).cast("long").as("bal_band"))
      Tables.orders(s, d)
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy("c_nationkey", "c_mktsegment", "bal_band")
        .agg(countDistinct(col("o_orderstatus")).as("l"),
          count(lit(1)).as("n_orders"))
        .withColumn("diversity",
          when(col("l") >= 3, "diverse")
            .when(col("l") === 2, "low")
            .otherwise("homogeneous"))
        .orderBy("c_nationkey", "c_mktsegment", "bal_band")
    },
  )
}
