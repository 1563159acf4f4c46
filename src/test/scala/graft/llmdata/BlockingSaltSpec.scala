package graft.llmdata

import org.apache.spark.sql.functions._

/** Gates for the budget-salted blocking join (round-10: q170's
  * measured hot-block budget wired into q144's candidate join). The
  * load-bearing properties: salting never changes the candidate SET, a
  * synthetic hot block's per-(blk, salt) pair count honors the budget,
  * within-budget blocks pay zero salting overhead (fd = 1), and the
  * registry q144 output is unchanged by the rewiring. */
class BlockingSaltSpec extends graft.SparkSpec {

  // 1000 dirty records and 50 catalog entities all sharing one hot
  // block, plus a small cold block: pairs(hot) = 50,000
  private def fixtures() = {
    val sp = spark
    import sp.implicits._
    val db = (Seq.tabulate(1000)(i => (i.toLong, s"rec $i", "hot")) ++
      Seq.tabulate(10)(i => (2000L + i, s"cold $i", "cld")))
      .toDF("record_id", "dname", "blk")
    val cb = (Seq.tabulate(50)(j => (j.toLong, s"ent $j", "hot")) ++
      Seq.tabulate(3)(j => (100L + j, s"cent $j", "cld")))
      .toDF("entity_id", "name", "blk")
    (db, cb)
  }

  test("salted candidates equal the plain blocking join's, as a multiset") {
    val (db, cb) = fixtures()
    val plain = db.join(cb, Seq("blk"))
      .select("record_id", "entity_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val salted = Linkage.blockedCandidates(db, cb, pairBudget = 1000L)
      .select("record_id", "entity_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(salted == plain,
      "salting must re-route pairs, never add or drop one")
  }

  test("a synthetic hot block honors the per-(blk, salt) pair budget") {
    val (db, cb) = fixtures()
    val budget = 1000L
    // nc = 50 -> rows/shard = budget div nc = 20 -> fd = 50 shards;
    // sequential record ids spread exactly 20 per shard -> per-key
    // pairs = 20 * 50 = 1000 = budget
    val perKey = Linkage.blockedCandidates(db, cb, budget)
      .groupBy("blk", "salt").agg(count(lit(1)).as("pairs"))
      .collect()
    assert(perKey.nonEmpty)
    perKey.foreach(r => assert(r.getLong(2) <= budget,
      s"per-task pair count must honor the budget: $r"))
    // the hot block actually split (50 shards), the cold one did not
    val hotShards = perKey.count(_.getString(0) == "hot")
    val coldShards = perKey.count(_.getString(0) == "cld")
    assert(hotShards == 50, s"hot block must shard (got $hotShards)")
    assert(coldShards == 1,
      "a within-budget block must not pay any salting overhead")
  }

  test("a block whose catalog side alone exceeds the budget bounds at nc (one record per shard)") {
    val sp = spark
    import sp.implicits._
    val db = Seq.tabulate(10)(i => (i.toLong, s"rec $i", "hot"))
      .toDF("record_id", "dname", "blk")
    val cb = Seq.tabulate(40)(j => (j.toLong, s"ent $j", "hot"))
      .toDF("entity_id", "name", "blk")
    // budget 20 < nc 40: rows/shard = max(1, 20 div 40) = 1 -> fd = 10
    val perKey = Linkage.blockedCandidates(db, cb, pairBudget = 20L)
      .groupBy("blk", "salt").agg(count(lit(1)).as("pairs")).collect()
    assert(perKey.length == 10, "one shard per dirty record")
    perKey.foreach(r => assert(r.getLong(2) == 40L,
      "nc is the irreducible per-key floor when nc > budget"))
  }

  test("q144 through the salted join matches the plain-join reference row for row") {
    val sf = "/root/testdata/sf0.01"
    val got = graft.SparkEntry.queries("q144_entity_resolution")(spark, sf)
      .collect()
    assert(got.nonEmpty)
    // reference: the round-9 unsalted plan, inline
    val part = graft.Tables.part(spark, sf)
    val cat = part.groupBy(col("p_name").as("name"))
      .agg(min("p_partkey").as("entity_id"))
    val dirty = part.select(
      col("p_partkey").as("record_id"), col("p_name").as("true_name"),
      when(col("p_partkey") % 4 === 0,
        concat_ws(" ", element_at(split(col("p_name"), " "), 2),
          element_at(split(col("p_name"), " "), 1)))
        .when(col("p_partkey") % 4 === 1,
          expr("substr(p_name, 1, length(p_name) - 1)"))
        .when(col("p_partkey") % 4 === 2, expr("substr(p_name, 2)"))
        .otherwise(concat(col("p_name"), lit("x"))).as("dname"))
    val db = dirty
      .select(col("record_id"), col("dname"), col("true_name"),
        explode(split(col("dname"), " ")).as("tok"))
      .select(col("record_id"), col("dname"), col("true_name"),
        substring(col("tok"), 1, 3).as("blk")).distinct()
    val cb = cat
      .select(col("entity_id"), col("name"),
        explode(split(col("name"), " ")).as("tok"))
      .select(col("entity_id"), col("name"),
        substring(col("tok"), 1, 3).as("blk")).distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("record_id").orderBy(col("dist"), col("entity_id"))
    val ref = db.join(broadcast(cb), Seq("blk"))
      .select("record_id", "dname", "true_name", "entity_id", "name")
      .distinct()
      .withColumn("dist", levenshtein(col("dname"), col("name")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("record_id"), col("entity_id").as("matched_entity"),
        col("dist").cast("long").as("dist"),
        when(col("name") === col("true_name"), 1L).otherwise(0L)
          .as("correct"))
      .orderBy("record_id").collect()
    assert(got.toSeq == ref.toSeq,
      "the salted q144 must resolve every record identically")
  }
}
