package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable numeric helpers.
  *
  * Spark's `round(double, n)` rounds the SHORTEST DECIMAL REPRESENTATION of
  * the double (BigDecimal.valueOf → HALF_UP) while DuckDB rounds the binary
  * value — the two disagree whenever the shortest representation sits
  * exactly on a .5 boundary the binary value doesn't. For oracle-checked
  * outputs we therefore use `floor(x·10ⁿ + 0.5)/10ⁿ`: every step is an
  * IEEE-deterministic double op, so any engine computes the identical bits.
  */
object Portable {

  /** Deterministic half-up-ish rounding to n decimals (see object doc). */
  def pround(c: Column, n: Int): Column = {
    val p = math.pow(10, n)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }

  /** SQL text of the same expression, for the DuckDB oracle side. */
  def proundSql(x: String, n: Int): String = {
    val p = math.pow(10, n).toLong
    s"floor(($x) * $p + 0.5) / $p.0"
  }
}
