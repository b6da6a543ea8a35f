package graft.flows

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

import graft.sinks.UpsertSink
import graft.time.Align

/** Funding-settlement sync (reference `binance/perp.py:195-222`,
  * `bybit/perp.py:189-234`, `okx/perp.py:192-233`):
  *
  *  - J4 lookup join: funding history ⋈ funding info on symbol, inner (the
  *    reference's dict probe drops history rows with no info);
  *  - J8 conditional-fetch semi-join: symbols whose stored
  *    `next_funding_time` hasn't arrived are pruned from the WORK LIST
  *    before any fetch happens — here a filter on the dim that drives the
  *    fetch, not a post-hoc row filter;
  *  - P11 funding-interval snap to the standard bucket grid.
  */
object SyncFunding {

  private val histSchema = DataType.fromDDL(
    "array<struct<symbol string, fundingTime long, fundingRate string>>")
  private val infoSchema = DataType.fromDDL(
    "array<struct<symbol string, fundingIntervalHours int, " +
      "adjustedFundingRateCap string, adjustedFundingRateFloor string>>")

  /** J8: prune the symbol work list — fetch only symbols whose stored
    * next_funding_time is unknown or has passed. */
  def dueSymbols(symbols: DataFrame, state: DataFrame, nowMs: Long): DataFrame =
    symbols.join(state, Seq("symbol"), "left_outer")
      .where(col("next_funding_time").isNull ||
        col("next_funding_time") <= nowMs)
      .select(symbols.columns.map(col): _*)

  /** J4 + P11: history rows enriched with info, interval snapped. */
  def merge(histBody: DataFrame, infoBody: DataFrame,
      exchangeId: Int, instType: Int): DataFrame = {
    val hist = histBody.select(
      explode(from_json(col("body"), histSchema)).as("h"))
      .select(col("h.symbol").as("symbol"),
        col("h.fundingTime").as("ts"),
        col("h.fundingRate").cast("double").as("funding_rate"))
    val info = infoBody.select(
      explode(from_json(col("body"), infoSchema)).as("i"))
      .select(col("i.symbol").as("symbol"),
        (col("i.fundingIntervalHours") * 60).as("raw_interval"),
        col("i.adjustedFundingRateCap").cast("double").as("adjusted_cap"),
        col("i.adjustedFundingRateFloor").cast("double").as("adjusted_floor"))
    hist.join(broadcast(info), Seq("symbol")) // inner: dict-probe drop
      .select(
        col("ts"),
        Align.dtString(col("ts")).as("dt"),
        lit(exchangeId).cast("short").as("exchange_id"),
        col("symbol"),
        lit(instType).cast("byte").as("inst_type"),
        col("funding_rate"),
        Align.snapFundingInterval(col("raw_interval")).as("funding_interval"),
        col("adjusted_cap"), col("adjusted_floor"))
  }

  def run(spark: SparkSession, sinkPath: String, histBody: DataFrame,
      infoBody: DataFrame, exchangeId: Int, instType: Int): Unit =
    UpsertSink.upsert(spark, sinkPath, merge(histBody, infoBody,
      exchangeId, instType),
      Seq("exchange_id", "inst_type", "symbol", "ts"), "ts")
}
