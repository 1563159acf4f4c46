package graft

import org.apache.spark.sql.functions._

/** Pins the SQL-semantics envelope the whole correctness gate runs
  * under (round-9 ANSI audit): Spark 4 defaults
  * `spark.sql.ansi.enabled=true`, and the registry was verified
  * oracle-green with the flag forced on — so ANSI is the TESTED
  * contract, not an accident of the default. If a future session
  * profile or Spark upgrade flipped it off, zero divisors and
  * overflows would start returning silent NULLs where the verified
  * behavior is a loud throw, and every `nullif` degenerate-regime
  * argument in the registry (q195/q199/q205/q206) would be checking a
  * different engine than the one that shipped. */
class AnsiModeSpec extends SparkSpec {

  test("the shared session runs under ANSI semantics") {
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true",
      "the registry's verified envelope is ANSI mode — do not turn it " +
        "off session-wide; scope any exception to the expression and " +
        "document it in SURVEY §7.4")
  }

  test("an unguarded zero divisor throws loudly; the registry's nullif guard nulls explicitly") {
    import org.apache.spark.sql.functions.col
    val one = spark.range(1).select(lit(1L).as("s"), lit(0L).as("n"))
    intercept[Exception] { one.select(expr("s div n")).collect() }
    // the q195/q199 discipline: NULL comes from the guard, not from
    // engine-specific division semantics
    val r = one.select(expr("s div nullif(n, 0)").as("x")).collect()
    assert(r.head.isNullAt(0))
  }
}
