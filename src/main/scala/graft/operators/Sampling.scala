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

  /** Distribution rebalancing — the static data-MIXING step of a training
    * pipeline (DoReMi/DCLM-style): downsample over-represented strata so
    * the surviving corpus approaches `targetShares`. Rates come FROM THE
    * DATA, fully declaratively: one stratum-grain count aggregate (k rows),
    * one scalar max, then a broadcast join of per-stratum thresholds back
    * onto the corpus — no driver collect, no rand(). The most
    * under-represented stratum (largest target/actual ratio) keeps
    * everything; every other stratum keeps target-proportionally less, so
    * the output mix is exact up to the 1/256 rate quantization of the
    * deterministic md5 keep-predicate. Strata absent from `targetShares`
    * are dropped (target share zero). */
  def rebalanceSample(df: DataFrame, idCol: String, strataCol: String,
      targetShares: Map[String, Double]): DataFrame = {
    val tgt = typedlit(targetShares)
    val counts = df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("_n"))
      .withColumn("_tgt", element_at(tgt, col(strataCol)))
      .where(col("_tgt").isNotNull)
    val maxRatio = counts
      .agg(max(col("_tgt") / col("_n")).as("_maxr"))
    val nQuant = round((col("_tgt") / col("_n")) / col("_maxr") * 256)
      .cast("int")
    val rates = counts.crossJoin(broadcast(maxRatio))
      .select(col(strataCol),
        when(nQuant >= 256, lit("g0")) // above every hex pair: keep all
          .when(nQuant <= 0, lit("00"))
          .otherwise(lpad(lower(hex(nQuant)), 2, "0")).as("_thr"))
    df.join(broadcast(rates), Seq(strataCol))
      .where(substring(md5(col(idCol).cast("string")), 1, 2) < col("_thr"))
      .drop("_thr")
  }
}
