package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Float-safety discipline shared by every oracle-checked operator.
  *
  * The driver hash-compares our parquet output against DuckDB's answer, so
  * every emitted number must be bit-identical across engines:
  *   - money/quantity aggregates run in DECIMAL(12,2) (exact, same SQL
  *     semantics in Spark and DuckDB), are ROUNDed as decimal (HALF_UP ==
  *     away-from-zero in both engines), then cast to DOUBLE (IEEE-exact);
  *   - genuine DOUBLE expressions (ratios, interpolated percentiles) are
  *     quantized with floor(x*100+0.5)/100 — pure IEEE ops that both engines
  *     evaluate identically, unlike native ROUND(double) whose tie-breaking
  *     differs (Spark re-rounds via Double.toString).
  */
object Num {
  /** Cast to exact DECIMAL(12,2) for money/quantity arithmetic. */
  def dec(c: Column): Column = c.cast(DecimalType(12, 2))

  /** Exact decimal sum -> round 2 -> double. SQL twin: `moneySql`. */
  def money(c: Column): Column = round(sum(dec(c)), 2).cast(DoubleType)

  /** Deterministic 2-dp quantization of a DOUBLE. SQL twin: `r2Sql`. */
  def r2(c: Column): Column = floor(c * 100.0 + 0.5) / 100.0

  /** Deterministic 4-dp quantization of a DOUBLE. SQL twin: `r4Sql`. */
  def r4(c: Column): Column = floor(c * 10000.0 + 0.5) / 10000.0

  /** Scala-side twin of [[r4]] — bit-identical to the Column spelling
    * (same floor(x*10000+0.5)/10000 IEEE sequence), for driver/state
    * code that must agree with a relational leg.
    */
  def r4Double(x: Double): Double = math.floor(x * 10000.0 + 0.5) / 10000.0

  def decSql(e: String): String = s"CAST($e AS DECIMAL(12,2))"
  def moneySql(e: String): String =
    s"CAST(ROUND(SUM(${decSql(e)}),2) AS DOUBLE)"
  def r2Sql(e: String): String = s"(FLOOR(($e)*100.0+0.5)/100.0)"
  def r4Sql(e: String): String = s"(FLOOR(($e)*10000.0+0.5)/10000.0)"
}
