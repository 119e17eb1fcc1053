package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Statistical Column helpers shared across modules.
  *
  * Everything here is pure `Column` arithmetic — it stays inside
  * whole-stage codegen (no UDFs, no lookup-table joins), so it scales to
  * arbitrarily large inputs with zero extra shuffles.
  */
object Stats {

  /** ln Γ(x) for x ≥ 1 via a Stirling series after shifting the argument
    * up by 10 (recurrence ln Γ(x) = ln Γ(x+10) − Σ ln(x+i)). Absolute
    * error ≲ 1e-12 over the integer arguments we use — far below the 6dp
    * rounding of every p-value that consumes it. Matches DuckDB's
    * `lgamma` (used by the oracle) to well past rounding precision.
    */
  def lgammaCol(x: Column): Column = {
    val g = x + lit(10.0)
    val stirling =
      (g - lit(0.5)) * log(g) - g + lit(0.5 * math.log(2 * math.Pi)) +
        lit(1.0) / (lit(12.0) * g) -
        lit(1.0) / (lit(360.0) * g * g * g) +
        lit(1.0) / (lit(1260.0) * g * g * g * g * g)
    val shift = (0 until 10).map(i => log(x + lit(i.toDouble))).reduce(_ + _)
    stirling - shift
  }

  /** ln(n!) = ln Γ(n+1), n ≥ 0. */
  def lnFact(n: Column): Column = lgammaCol(n.cast("double") + lit(1.0))

  /** ln C(n, k) in log space (valid for 0 ≤ k ≤ n). */
  def lnChoose(n: Column, k: Column): Column =
    lnFact(n) - lnFact(k) - lnFact(n - k)

  /** Standard-normal upper tail Q(z) = 1 − Φ(z) for z ≥ 0 via the
    * Zelen–Severo polynomial (Abramowitz & Stegun 26.2.17, |ε| < 7.5e-8
    * — far below 6dp p-value rounding). Pure arithmetic: the oracle SQL
    * spells out the identical Horner form, so both engines agree. */
  def normalUpperTail(z: Column): Column = {
    val k = lit(1.0) / (lit(1.0) + lit(0.2316419) * z)
    val poly = k * (lit(0.319381530) + k * (lit(-0.356563782) +
      k * (lit(1.781477937) + k * (lit(-1.821255978) + k * lit(1.330274429)))))
    exp(z * z * lit(-0.5)) * lit(0.3989422804014327) * poly
  }

  /** The matching DuckDB SQL for normalUpperTail — kept adjacent so the
    * two Horner forms can never drift apart. `z` is a SQL expression. */
  def normalUpperTailSql(z: String): String = {
    val k = s"(1.0/(1.0 + 0.2316419*($z)))"
    s"(exp(($z)*($z)*-0.5) * 0.3989422804014327 * ($k*(0.319381530 + $k*(-0.356563782 + $k*(1.781477937 + $k*(-1.821255978 + $k*1.330274429))))))"
  }

  /** Exact interpolated median as an aggregate Column (Spark `percentile`
    * — same interpolation rule as DuckDB's `median`/`quantile_cont`).
    * At 100 TB swap for `percentile_approx` where the consumer tolerates
    * approximation; the call sites that need oracle-exactness keep this.
    */
  def medianCol(c: Column): Column = percentile(c, lit(0.5))

  /** Exact interpolated quantile (DuckDB `quantile_cont` analog). */
  def quantileCol(c: Column, q: Double): Column = percentile(c, lit(q))

  /** Exact interpolated quantiles at several probabilities in ONE
    * aggregation pass (array-valued, like quantile_cont(x, [..])). */
  def quantilesCol(c: Column, qs: Seq[Double]): Column =
    percentile(c, array(qs.map(lit): _*))

  /** Approximate quantile (t-digest style sketch, single pass, bounded
    * memory) — the 100 TB path when exactness isn't contractual.
    * accuracy = 1/relativeError; 10000 ≈ 0.01% rank error. */
  def quantileApproxCol(c: Column, q: Double, accuracy: Int = 10000): Column =
    percentile_approx(c, lit(q), lit(accuracy))
}
