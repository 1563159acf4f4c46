package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Schema-evolution seam: added columns null-fill older rows, dropped
  * or retyped columns refuse BEFORE any file lands, and the merged
  * read sees every vintage. */
class EvolvingSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("evolve").toString + "/t"

  test("added columns surface as NULL on rows that predate them") {
    val sp = spark
    import sp.implicits._
    val dir = tmp()
    Evolving.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    // the template grew a sensor: same columns plus battery
    Evolving.append(Seq((3L, "c", 70)).toDF("id", "v", "battery"), dir)
    val got = Evolving.read(sp, dir)
    assert(got.columns.sorted.toSeq == Seq("battery", "id", "v"))
    assert(got.count() == 3)
    assert(got.filter(col("battery").isNull).count() == 2)
    assert(got.filter(col("id") === 3L).select("battery")
      .head.getInt(0) == 70)
  }

  test("dropping or retyping a column refuses loudly, table untouched") {
    val sp = spark
    import sp.implicits._
    val dir = tmp()
    Evolving.append(Seq((1L, "a", 70)).toDF("id", "v", "battery"), dir)
    // dropped column
    val e1 = intercept[IllegalArgumentException] {
      Evolving.append(Seq((2L, "b")).toDF("id", "v"), dir)
    }
    assert(e1.getMessage.contains("battery"))
    // retyped column (int → string)
    val e2 = intercept[IllegalArgumentException] {
      Evolving.append(Seq((2L, "b", "full")).toDF("id", "v", "battery"), dir)
    }
    assert(e2.getMessage.contains("battery"))
    // the refusals landed BEFORE any write: table still one row
    assert(Evolving.read(sp, dir).count() == 1)
  }

  test("nested nullability flips are not retype violations") {
    val sp = spark
    import sp.implicits._
    val dir = tmp()
    // seed the table with an array column whose read-back schema has
    // containsNull = true (parquet round-trips commonly flip it)
    Evolving.append(
      Seq((1L, Seq("a", "b"))).toDF("id", "tags"), dir)
    // the same logical column with containsNull = false must append —
    // before the round-6 ADVICE fix the strict dataType equality
    // counted this as a retype and refused
    val tight = sp.createDataFrame(
      sp.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(2L, Seq("c")))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("tags",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType, containsNull = false),
          nullable = false))))
    Evolving.append(tight, dir)
    assert(Evolving.read(sp, dir).count() == 2)
    // an actual element retype still refuses
    val e = intercept[IllegalArgumentException] {
      Evolving.append(Seq((3L, Seq(1, 2))).toDF("id", "tags"), dir)
    }
    assert(e.getMessage.contains("tags"))
  }

  test("first write establishes the schema; same-schema appends just append") {
    val sp = spark
    import sp.implicits._
    val dir = tmp()
    Evolving.append(Seq((1L, "a")).toDF("id", "v"), dir)
    Evolving.append(Seq((2L, "b")).toDF("id", "v"), dir)
    assert(Evolving.read(sp, dir).count() == 2)
  }
}
