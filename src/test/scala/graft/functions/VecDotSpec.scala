package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VecDotSpec extends SparkSpec {
  import org.apache.spark.sql.GraftSqlBridge.{column, expression}

  test("vec_dot matches the HOF fold bit-for-bit (same evaluation order)") {
    import spark.implicits._
    val df = Seq.tabulate(100)(i =>
      (i.toLong, Array.tabulate(64)(j => math.sin(i * 64 + j)),
        Array.tabulate(64)(j => math.cos(i * 64 + j))))
      .toDF("id", "a", "b")
    val got = df.select(
      column(VecDot(expression(col("a")), expression(col("b")))).as("fast"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("hof"))
      .collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("vec_dot is registered as a SQL function; numeric literals coerce") {
    graft.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d," +
        "       vec_dot(array(1, 2), array(3, 4)) AS coerced")
      .head()
    assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 11.0)
  }

  test("null array input yields null; length mismatch yields null (zip_with parity)") {
    import spark.implicits._
    val df = Seq((Some(Array(1.0, 2.0, 3.0)), Array(2.0, 5.0)),
      (None, Array(1.0))).toDF("a", "b")
    val r = df.select(
      column(VecDot(expression(col("a")), expression(col("b")))).as("d"),
      // the HOF rendering: zip_with null-pads the shorter side, so the
      // sum is null — a malformed unequal-dim embedding must surface,
      // not produce a silent partial dot product
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("hof"))
      .collect()
    assert(r(0).isNullAt(0) && r(0).isNullAt(1))
    assert(r(1).isNullAt(0) && r(1).isNullAt(1))
  }

  test("a null ELEMENT nulls the result, matching the HOF fold") {
    graft.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT vec_dot(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 1.0D)) AS fast," +
        "     aggregate(zip_with(array(1.0D, CAST(NULL AS DOUBLE)), array(1.0D, 1.0D)," +
        "       (x, y) -> x * y), 0.0D, (acc, x) -> acc + x) AS hof")
      .head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
