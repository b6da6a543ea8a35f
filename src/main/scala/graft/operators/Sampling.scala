package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-mix construction.
  *
  * The keep/drop decision is a pure function of the row id — `md5(id)` hex
  * prefix compared against a per-stratum threshold — NOT `rand()`: the same
  * row always lands on the same side across engines, runs, retries, and
  * task re-executions (a `rand()` filter re-draws on every Spark retry and
  * silently changes the sample), and the DuckDB oracle reproduces it
  * exactly. Map-side only: no shuffle, no driver state; rates quantize to
  * 1/256 (two hex chars).
  */
object Sampling {

  /** Two-hex-char threshold for a keep-rate in [0,1]. */
  def hexThreshold(rate: Double): String = {
    val n = math.round(rate * 256).toInt
    if (n >= 256) "g0" // lexicographically above every hex pair: keep all
    else if (n <= 0) "00"
    else f"$n%02x"
  }

  /** Keep-predicate: md5 of the id's decimal string, first two hex chars
    * under the stratum's threshold. */
  def keep(id: Column, strata: Column, rates: Map[String, Double],
      default: Double): Column = {
    val thresh = rates.foldLeft(lit(hexThreshold(default))) {
      case (acc, (stratum, rate)) =>
        when(strata === stratum, lit(hexThreshold(rate))).otherwise(acc)
    }
    substring(md5(id.cast("string")), 1, 2) < thresh
  }

  /** Stratified downsample: keep each row with its stratum's rate,
    * deterministically by id hash. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double], default: Double): DataFrame =
    df.where(keep(col(idCol), col(strataCol), rates, default))
}
