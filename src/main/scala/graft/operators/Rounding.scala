package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic rounding.
  *
  * Spark's `round()` on DoubleType routes through the double's shortest
  * decimal string (BigDecimal.valueOf), so a stored -19570.814999999997
  * rounds as "-19570.815" → -19570.82 (HALF_UP on the string). DuckDB —
  * the driver's oracle engine — rounds the binary value:
  * std::round(x·10ⁿ)/10ⁿ → -19570.81. For hash-matched oracle compares we
  * need DuckDB's semantics, reproduced here with exact IEEE ops (mul,
  * floor, neg are all exact-deterministic), verified bit-identical on
  * 55k random + adversarial half-boundary samples.
  *
  * All-builtin expression → stays in whole-stage codegen.
  */
object Rounding {
  /** DuckDB-semantics round-half-away-from-zero to `scale` decimals. */
  def dround(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale) // exact for scale <= 15
    val y = c * lit(p)
    (when(c >= 0, floor(y + lit(0.5)))
      .otherwise(-floor(-y + lit(0.5))) / lit(p)).cast("double")
  }

  /** Driver/executor-side scalar twin of [[dround]] — the identical
    * IEEE operation sequence, for stateful-streaming code that computes
    * the same statistic the Column form emits (parity tests compare
    * them for equality, so the two must round bit-for-bit).
    */
  def droundD(x: Double, scale: Int): Double = {
    val p = math.pow(10, scale)
    val y = x * p
    (if (x >= 0) math.floor(y + 0.5) else -math.floor(-y + 0.5)) / p
  }
}
