package graft.flows

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Funcs
import graft.sinks.UpsertSink

/** `sync_symbols` (SURVEY §3 honorable mention #4; reference
  * `flows/sync_symbols.py:45-60` + `binance/perp.py:41-72` +
  * `_base_.py:105-122`): fetch the symbol catalog, normalize per exchange
  * (S2/P1), derive precision metadata (P6/P7), map status enums (P8), and
  * upsert ONLY the five mutable fields into the `exchange_symbol` dim —
  * MySQL `ON DUPLICATE KEY UPDATE` semantics (K2).
  */
object SyncSymbols {

  /** reference `binance/perp.py:30-39` */
  val BinanceStatusMap: Map[String, Int] = Map(
    "TRADING" -> 1, "PENDING_TRADING" -> 0, "PRE_DELIVERING" -> 2,
    "DELIVERING" -> 2, "DELIVERED" -> 2, "PRE_SETTLE" -> 2,
    "SETTLING" -> 2, "CLOSE" -> 3)

  /** Normalize a binance exchangeInfo body: PERPETUAL-only filter (P16),
    * tick/step extracted from the filters array, status enum (P8),
    * precision derivation from tick strings (P6). */
  def binanceSymbols(raw: DataFrame, exchangeId: Int, instType: Int): DataFrame = {
    val schema = "struct<symbols array<struct<symbol string, baseAsset string, " +
      "quoteAsset string, status string, contractType string, " +
      "pricePrecision int, quantityPrecision int, " +
      "filters array<struct<filterType string, tickSize string, stepSize string>>>>>"
    val rows = raw.select(explode(
      from_json(col("body"),
        org.apache.spark.sql.types.DataType.fromDDL(schema))
        .getField("symbols")).as("s"))
      .where(col("s.contractType") === "PERPETUAL")
    val tick = element_at(
      filter(col("s.filters"), f => f.getField("filterType") === "PRICE_FILTER"), 1)
      .getField("tickSize")
    val step = element_at(
      filter(col("s.filters"), f => f.getField("filterType") === "LOT_SIZE"), 1)
      .getField("stepSize")
    rows.select(
      lit(exchangeId).cast("short").as("exchange_id"),
      col("s.symbol").as("symbol"),
      lit(instType).cast("byte").as("inst_type"),
      col("s.baseAsset").as("base_asset"),
      col("s.quoteAsset").as("quote_asset"),
      Funcs.enumMap(col("s.status"), BinanceStatusMap).cast("byte").as("status"),
      tick.as("tick_size"),
      step.as("step_size"),
      col("s.pricePrecision").cast("byte").as("price_precision"),
      col("s.quantityPrecision").cast("byte").as("quantity_precision"),
      Funcs.precisionOf(tick).as("derived_price_precision"))
  }

  /** okx: `{data: [{instId, instFamily, state, tickSz, lotSz, listTime}]}`
    * (`okx/perp.py:19-54`): base/quote from instFamily split, precisions
    * DERIVED from the tick/lot strings (P6 via the native expression's
    * composed twin). */
  def okxSymbols(raw: DataFrame, exchangeId: Int, instType: Int): DataFrame = {
    val schema = "struct<data array<struct<instId string, instFamily string, " +
      "state string, tickSz string, lotSz string, listTime string>>>"
    val statusMap = Map("live" -> 1, "suspend" -> 2, "preopen" -> 0, "test" -> 0)
    raw.select(explode(from_json(col("body"),
        org.apache.spark.sql.types.DataType.fromDDL(schema))
        .getField("data")).as("s"))
      .select(
        lit(exchangeId).cast("short").as("exchange_id"),
        col("s.instId").as("symbol"),
        lit(instType).cast("byte").as("inst_type"),
        element_at(split(col("s.instFamily"), "-"), 1).as("base_asset"),
        element_at(split(col("s.instFamily"), "-"), 2).as("quote_asset"),
        Funcs.enumMap(col("s.state"), statusMap).cast("byte").as("status"),
        col("s.tickSz").as("tick_size"),
        col("s.lotSz").as("step_size"),
        Funcs.precisionOf(col("s.tickSz")).cast("byte").as("price_precision"),
        Funcs.precisionOf(col("s.lotSz")).cast("byte").as("quantity_precision"),
        col("s.listTime").cast("long").as("onboard_time"))
  }

  /** kraken: `{result: {PAIR: {altname, base, quote, status, tick_size,
    * lot_multiplier, lot_decimals, pair_decimals}}}` (`kraken/spot.py:36-71`):
    * P9 asset canonicalization (XXBT→BTC, ZUSD→USD, …) and step_size derived
    * as lot_multiplier / 10^lot_decimals. */
  def krakenSymbols(raw: DataFrame, exchangeId: Int, instType: Int): DataFrame = {
    val schema = "struct<result map<string, struct<altname string, base string, " +
      "quote string, status string, tick_size string, lot_multiplier double, " +
      "lot_decimals int, pair_decimals int>>>"
    val statusMap = Map("online" -> 1, "cancel_only" -> 2, "post_only" -> 2,
      "limit_only" -> 2, "reduce_only" -> 2)
    raw.select(explode(from_json(col("body"),
        org.apache.spark.sql.types.DataType.fromDDL(schema))
        .getField("result")).as(Seq("pair", "s")))
      .select(
        lit(exchangeId).cast("short").as("exchange_id"),
        col("s.altname").as("symbol"),
        lit(instType).cast("byte").as("inst_type"),
        Funcs.canonicalizeKrakenAsset(col("s.base")).as("base_asset"),
        Funcs.canonicalizeKrakenAsset(col("s.quote")).as("quote_asset"),
        Funcs.enumMap(col("s.status"), statusMap).cast("byte").as("status"),
        col("s.tick_size").as("tick_size"),
        // plain-decimal rendering ("0.00000001"), not the double's "1.0E-8":
        // fixed-scale decimal string, then trim trailing zeros / bare dot
        regexp_replace(regexp_replace(
          (col("s.lot_multiplier") / pow(lit(10), col("s.lot_decimals")))
            .cast("decimal(28,12)").cast("string"),
          "0+$", ""), "\\.$", "").as("step_size"),
        col("s.pair_decimals").cast("byte").as("price_precision"),
        col("s.lot_decimals").cast("byte").as("quantity_precision"))
  }

  /** The five mutable fields the reference updates in place
    * (`_base_.py:111-121`). */
  val UpdateFields: Seq[String] =
    Seq("tick_size", "step_size", "price_precision", "quantity_precision", "status")

  def run(spark: SparkSession, dimPath: String, raw: DataFrame,
      exchangeId: Int, instType: Int): Unit = {
    val rows = binanceSymbols(raw, exchangeId, instType)
      .drop("derived_price_precision")
    UpsertSink.updateFields(spark, dimPath, rows,
      Seq("exchange_id", "symbol", "inst_type"), UpdateFields)
  }
}
