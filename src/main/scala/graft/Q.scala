package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark plan plus (when SQL-expressible) the
  * equivalent ANSI SQL the driver runs in DuckDB on the same parquet
  * tables. Column names/types must line up exactly; every query ends in a
  * deterministic total ORDER BY on both sides so hashing is order-proof.
  *
  * Float policy (driver hash-compares values exactly):
  *   - SUM over doubles → cast the addend to DECIMAL first (exact in both
  *     engines; the testdata is 2-decimal money so DECIMAL(38,4) is lossless)
  *   - AVG / ratios → compute in double, cast the final value to a coarse
  *     DECIMAL — relative double error ~1e-12 can't move a 1e-6 boundary
  *   - COUNT / MIN / MAX are exact as-is.
  */
final case class Q(
    name: String,
    oracle: Option[String],
)(val run: (SparkSession, String) => DataFrame)

object Q {
  def apply(name: String, oracle: String)(
      run: (SparkSession, String) => DataFrame): Q =
    Q(name, Some(oracle))(run)

  /** rows-only check (no DuckDB-expressible oracle). */
  def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, None)(run)
}
