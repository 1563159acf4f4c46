package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark plan plus (when SQL-expressible) the
  * equivalent ANSI SQL the driver runs in DuckDB on the same parquet
  * tables. Column names/types must line up exactly; every query ends in a
  * deterministic total ORDER BY on both sides so hashing is order-proof.
  *
  * Float policy (driver hash-compares values exactly; round-1 lesson):
  *   - NEVER emit a DECIMAL output column. The driver renders one side's
  *     decimals through float, so any trailing-zero value (`123.40` vs
  *     `123.4`) hash-mismatches — that was the exact failure set of
  *     round 1 (every red query had a trailing-zero decimal, every green
  *     one had none).
  *   - SUM over doubles → cast the addend to DECIMAL (exact, identical in
  *     both engines), then cast the FINAL sum to DOUBLE. A decimal→double
  *     cast of the same exact decimal is correctly rounded in both
  *     engines ⇒ bit-identical output.
  *   - AVG → exact decimal sum cast to DOUBLE, divided by count(*): one
  *     IEEE division of identical operands ⇒ bit-identical.
  *   - COUNT / MIN / MAX / pass-through doubles are exact as-is.
  *   - No HUGEINT on the ORACLE side either (round-2 lesson, q30):
  *     DuckDB's `sum(BIGINT)` widens to HUGEINT and the driver renders it
  *     differently from Spark's BIGINT even when every value is equal —
  *     wrap the final sum in `CAST(... AS BIGINT)`.
  *   - Decimal→double casts of sums past 2^53 SIGNIFICAND UNITS
  *     (value·10^scale — scale-4 sums reach it by ~9e11 in value)
  *     DOUBLE-ROUND in DuckDB's native cast (int/10^scale: two
  *     roundings), while Spark's BigDecimal.doubleValue is correctly
  *     rounded — a 1-ulp drift that appears and disappears with the
  *     data (round-7 lesson, q119 at sf0.001). Route the ORACLE's cast
  *     through VARCHAR (`CAST(CAST(x AS VARCHAR) AS DOUBLE)` — strtod
  *     is single-rounded) whenever a sum's units can exceed 2^53.
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
