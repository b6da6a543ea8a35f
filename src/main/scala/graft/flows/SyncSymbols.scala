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
        // fixed-scale decimal string, then trim fractional zeros / bare dot
        Funcs.trimZeros(
          (col("s.lot_multiplier") / pow(lit(10), col("s.lot_decimals")))
            .cast("decimal(28,12)").cast("string")).as("step_size"),
        col("s.pair_decimals").cast("byte").as("price_precision"),
        col("s.lot_decimals").cast("byte").as("quantity_precision"))
  }

  // Repo-wide status codes (SURVEY §2.3 P8): PENDING=0, ACTIVE=1, HALTED=2,
  // CLOSED=3 — a consistent encoding of the reference's SymbolStatus enum
  // (`constants.py:4-8`), fixed since round 1.
  private val PEND = 0
  private val ACT = 1
  private val HALT = 2
  private val CLOSE = 3

  private def fromDDL(s: String) =
    org.apache.spark.sql.types.DataType.fromDDL(s)

  /** binance spot (`binance/spot.py:16-54`): same filters-array extraction as
    * perp but NO contractType filter, its own status vocabulary, and the
    * reference's literal `tick.rstrip("0")` — which leaves a bare trailing
    * dot on integer ticks ("1.00000000" → "1."); mirrored faithfully. */
  def binanceSpotSymbols(raw: DataFrame, exchangeId: Int, instType: Int): DataFrame = {
    val statusMap = Map("TRADING" -> ACT, "END_OF_DAY" -> CLOSE,
      "HALT" -> HALT, "BREAK" -> HALT)
    val schema = "struct<symbols array<struct<symbol string, baseAsset string, " +
      "quoteAsset string, status string, " +
      "filters array<struct<filterType string, tickSize string, stepSize string>>>>>"
    val rows = raw.select(explode(
      from_json(col("body"), fromDDL(schema)).getField("symbols")).as("s"))
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
      Funcs.enumMap(col("s.status"), statusMap).cast("byte").as("status"),
      regexp_replace(tick, "0+$", "").as("tick_size"),
      regexp_replace(step, "0+$", "").as("step_size"),
      // precision derived from the UNstripped strings, like the reference
      Funcs.precisionOf(tick).cast("byte").as("price_precision"),
      Funcs.precisionOf(step).cast("byte").as("quantity_precision"))
  }

  /** okx spot (`okx/spot.py:16-48`): base/quote from dedicated baseCcy/
    * quoteCcy fields (no instFamily split), preopen/test → PENDING. */
  def okxSpotSymbols(raw: DataFrame, exchangeId: Int, instType: Int): DataFrame = {
    val statusMap = Map("live" -> ACT, "suspend" -> HALT,
      "preopen" -> PEND, "test" -> PEND)
    val schema = "struct<data array<struct<instId string, baseCcy string, " +
      "quoteCcy string, state string, tickSz string, lotSz string, listTime string>>>"
    raw.select(explode(from_json(col("body"), fromDDL(schema))
        .getField("data")).as("s"))
      .select(
        lit(exchangeId).cast("short").as("exchange_id"),
        col("s.instId").as("symbol"),
        lit(instType).cast("byte").as("inst_type"),
        col("s.baseCcy").as("base_asset"),
        col("s.quoteCcy").as("quote_asset"),
        Funcs.enumMap(col("s.state"), statusMap).cast("byte").as("status"),
        col("s.tickSz").as("tick_size"),
        col("s.lotSz").as("step_size"),
        Funcs.precisionOf(col("s.tickSz")).cast("byte").as("price_precision"),
        Funcs.precisionOf(col("s.lotSz")).cast("byte").as("quantity_precision"),
        col("s.listTime").cast("long").as("onboard_time"))
  }

  /** bybit (`bybit/perp.py:19-47` / `bybit/spot.py:16-47`): shared v5
    * instruments-info shape. Perp keeps only LinearPerpetual contracts and
    * prefers the explicit priceScale field, falling back to the derived tick
    * precision (`perp.py:44`); spot derives both precisions and takes
    * step from lotSizeFilter.basePrecision. */
  private val BybitStatusMap = Map("Trading" -> ACT)
  private val bybitSchema = "struct<result struct<list array<struct<" +
    "symbol string, baseCoin string, quoteCoin string, status string, " +
    "contractType string, priceScale string, " +
    "priceFilter struct<tickSize string>, " +
    "lotSizeFilter struct<qtyStep string, basePrecision string>>>>>"

  def bybitPerpSymbols(raw: DataFrame, exchangeId: Int, instType: Int): DataFrame = {
    val rows = raw.select(explode(from_json(col("body"), fromDDL(bybitSchema))
        .getField("result").getField("list")).as("s"))
      .where(col("s.contractType") === "LinearPerpetual")
    val tick = col("s.priceFilter.tickSize")
    val step = col("s.lotSizeFilter.qtyStep")
    rows.select(
      lit(exchangeId).cast("short").as("exchange_id"),
      col("s.symbol").as("symbol"),
      lit(instType).cast("byte").as("inst_type"),
      col("s.baseCoin").as("base_asset"),
      col("s.quoteCoin").as("quote_asset"),
      Funcs.enumMap(col("s.status"), BybitStatusMap).cast("byte").as("status"),
      tick.as("tick_size"),
      step.as("step_size"),
      coalesce(col("s.priceScale").cast("int"), Funcs.precisionOf(tick))
        .cast("byte").as("price_precision"),
      Funcs.precisionOf(step).cast("byte").as("quantity_precision"))
  }

  def bybitSpotSymbols(raw: DataFrame, exchangeId: Int, instType: Int): DataFrame = {
    val rows = raw.select(explode(from_json(col("body"), fromDDL(bybitSchema))
      .getField("result").getField("list")).as("s"))
    val tick = col("s.priceFilter.tickSize")
    val step = col("s.lotSizeFilter.basePrecision")
    rows.select(
      lit(exchangeId).cast("short").as("exchange_id"),
      col("s.symbol").as("symbol"),
      lit(instType).cast("byte").as("inst_type"),
      col("s.baseCoin").as("base_asset"),
      col("s.quoteCoin").as("quote_asset"),
      Funcs.enumMap(col("s.status"), BybitStatusMap).cast("byte").as("status"),
      tick.as("tick_size"),
      step.as("step_size"),
      Funcs.precisionOf(tick).cast("byte").as("price_precision"),
      Funcs.precisionOf(step).cast("byte").as("quantity_precision"))
  }

  /** bitget perp (`bitget/perp.py:19-52`): tick rendered as 10^-pricePlace
    * fixed-point (P7), precisions taken from pricePlace/volumePlace. */
  def bitgetPerpSymbols(raw: DataFrame, exchangeId: Int, instType: Int): DataFrame = {
    val statusMap = Map("normal" -> ACT, "listed" -> PEND, "maintain" -> HALT,
      "limit_open" -> HALT, "restrictedAPI" -> HALT, "off" -> CLOSE)
    val schema = "struct<data array<struct<symbol string, baseCoin string, " +
      "quoteCoin string, symbolStatus string, pricePlace string, " +
      "sizeMultiplier string, volumePlace string>>>"
    raw.select(explode(from_json(col("body"), fromDDL(schema))
        .getField("data")).as("s"))
      .select(
        lit(exchangeId).cast("short").as("exchange_id"),
        col("s.symbol").as("symbol"),
        lit(instType).cast("byte").as("inst_type"),
        col("s.baseCoin").as("base_asset"),
        col("s.quoteCoin").as("quote_asset"),
        Funcs.enumMap(col("s.symbolStatus"), statusMap).cast("byte").as("status"),
        Funcs.toDecimalStr(col("s.pricePlace").cast("int")).as("tick_size"),
        col("s.sizeMultiplier").as("step_size"),
        col("s.pricePlace").cast("byte").as("price_precision"),
        col("s.volumePlace").cast("byte").as("quantity_precision"))
  }

  /** bitget spot (`bitget/spot.py:16-55`): tick AND step both rendered as
    * 10^-precision fixed-point, then the precisions re-derived from those
    * strings (the reference round-trips through `precision()`). */
  def bitgetSpotSymbols(raw: DataFrame, exchangeId: Int, instType: Int): DataFrame = {
    val statusMap = Map("online" -> ACT, "halt" -> HALT,
      "gray" -> PEND, "offline" -> CLOSE)
    val schema = "struct<data array<struct<symbol string, baseCoin string, " +
      "quoteCoin string, status string, pricePrecision string, " +
      "quantityPrecision string>>>"
    val rows = raw.select(explode(from_json(col("body"), fromDDL(schema))
      .getField("data")).as("s"))
    val tick = Funcs.toDecimalStr(col("s.pricePrecision").cast("int"))
    val step = Funcs.toDecimalStr(col("s.quantityPrecision").cast("int"))
    rows.select(
      lit(exchangeId).cast("short").as("exchange_id"),
      col("s.symbol").as("symbol"),
      lit(instType).cast("byte").as("inst_type"),
      col("s.baseCoin").as("base_asset"),
      col("s.quoteCoin").as("quote_asset"),
      Funcs.enumMap(col("s.status"), statusMap).cast("byte").as("status"),
      tick.as("tick_size"),
      step.as("step_size"),
      Funcs.precisionOf(tick).cast("byte").as("price_precision"),
      Funcs.precisionOf(step).cast("byte").as("quantity_precision"))
  }

  /** mexc perp (`mexc/perp.py:14-48`): integer-coded raw states (P8 int
    * variant), precisions from priceScale/amountScale, onboard from
    * openingTime seconds. */
  def mexcPerpSymbols(raw: DataFrame, exchangeId: Int, instType: Int): DataFrame = {
    val statusMap = Map(0 -> ACT, 1 -> HALT, 2 -> CLOSE, 3 -> CLOSE, 4 -> HALT)
    val schema = "struct<data array<struct<symbol string, baseCoin string, " +
      "quoteCoin string, state int, priceUnit string, volUnit string, " +
      "priceScale int, amountScale int, openingTime long>>>"
    raw.select(explode(from_json(col("body"), fromDDL(schema))
        .getField("data")).as("s"))
      .select(
        lit(exchangeId).cast("short").as("exchange_id"),
        col("s.symbol").as("symbol"),
        lit(instType).cast("byte").as("inst_type"),
        col("s.baseCoin").as("base_asset"),
        col("s.quoteCoin").as("quote_asset"),
        Funcs.enumMapInt(col("s.state"), statusMap).cast("byte").as("status"),
        col("s.priceUnit").as("tick_size"),
        col("s.volUnit").as("step_size"),
        col("s.priceScale").cast("byte").as("price_precision"),
        col("s.amountScale").cast("byte").as("quantity_precision"),
        (col("s.openingTime") * 1000).as("onboard_time"))
  }

  /** mexc spot (`mexc/spot.py:15-47`): string-coded states; the reference
    * takes tick from quoteAmountPrecision / step from baseSizePrecision but
    * the PRECISIONS from the quote/baseAssetPrecision int fields — a
    * deliberate asymmetry mirrored here. */
  def mexcSpotSymbols(raw: DataFrame, exchangeId: Int, instType: Int): DataFrame = {
    val statusMap = Map("1" -> ACT, "2" -> HALT, "3" -> CLOSE)
    val schema = "struct<symbols array<struct<symbol string, baseAsset string, " +
      "quoteAsset string, status string, quoteAmountPrecision string, " +
      "baseSizePrecision string, quoteAssetPrecision int, baseAssetPrecision int>>>"
    raw.select(explode(from_json(col("body"), fromDDL(schema))
        .getField("symbols")).as("s"))
      .select(
        lit(exchangeId).cast("short").as("exchange_id"),
        col("s.symbol").as("symbol"),
        lit(instType).cast("byte").as("inst_type"),
        col("s.baseAsset").as("base_asset"),
        col("s.quoteAsset").as("quote_asset"),
        Funcs.enumMap(col("s.status"), statusMap).cast("byte").as("status"),
        col("s.quoteAmountPrecision").as("tick_size"),
        col("s.baseSizePrecision").as("step_size"),
        col("s.quoteAssetPrecision").cast("byte").as("price_precision"),
        col("s.baseAssetPrecision").cast("byte").as("quantity_precision"))
  }

  /** gate perp (`gate/perp.py:16-50`): base/quote split from the contract
    * name, contracts trade in integer-lot sizes (step=1, qty precision 0). */
  def gatePerpSymbols(raw: DataFrame, exchangeId: Int, instType: Int): DataFrame = {
    val statusMap = Map("prelaunch" -> PEND, "trading" -> ACT,
      "delisting" -> HALT, "delisted" -> CLOSE, "circuit_breaker" -> HALT)
    val schema = "array<struct<name string, status string, " +
      "order_price_round string, launch_time long>>"
    raw.select(explode(from_json(col("body"), fromDDL(schema))).as("s"))
      .select(
        lit(exchangeId).cast("short").as("exchange_id"),
        col("s.name").as("symbol"),
        lit(instType).cast("byte").as("inst_type"),
        element_at(split(col("s.name"), "_"), 1).as("base_asset"),
        element_at(split(col("s.name"), "_"), 2).as("quote_asset"),
        Funcs.enumMap(col("s.status"), statusMap).cast("byte").as("status"),
        col("s.order_price_round").as("tick_size"),
        lit("1").as("step_size"),
        Funcs.precisionOf(col("s.order_price_round")).cast("byte")
          .as("price_precision"),
        lit(0).cast("byte").as("quantity_precision"),
        (col("s.launch_time") * 1000).as("onboard_time"))
  }

  /** gate spot (`gate/spot.py:16-50`): both tick and step rendered from the
    * int precisions via P7; onboard = min(sell_start, buy_start) seconds. */
  def gateSpotSymbols(raw: DataFrame, exchangeId: Int, instType: Int): DataFrame = {
    val statusMap = Map("untradable" -> CLOSE, "buyable" -> ACT,
      "sellable" -> ACT, "tradable" -> ACT)
    val schema = "array<struct<id string, base string, quote string, " +
      "trade_status string, precision int, amount_precision int, " +
      "sell_start long, buy_start long>>"
    raw.select(explode(from_json(col("body"), fromDDL(schema))).as("s"))
      .select(
        lit(exchangeId).cast("short").as("exchange_id"),
        col("s.id").as("symbol"),
        lit(instType).cast("byte").as("inst_type"),
        col("s.base").as("base_asset"),
        col("s.quote").as("quote_asset"),
        Funcs.enumMap(col("s.trade_status"), statusMap).cast("byte").as("status"),
        Funcs.toDecimalStr(col("s.precision")).as("tick_size"),
        Funcs.toDecimalStr(col("s.amount_precision")).as("step_size"),
        col("s.precision").cast("byte").as("price_precision"),
        col("s.amount_precision").cast("byte").as("quantity_precision"),
        (least(col("s.sell_start"), col("s.buy_start")) * 1000).as("onboard_time"))
  }

  /** coinbase spot (`coinbase/spot.py:16-49`): increments straight through,
    * precisions derived (P6). */
  def coinbaseSpotSymbols(raw: DataFrame, exchangeId: Int, instType: Int): DataFrame = {
    val statusMap = Map("online" -> ACT, "offline" -> CLOSE,
      "internal" -> HALT, "delisted" -> CLOSE)
    val schema = "array<struct<id string, base_currency string, " +
      "quote_currency string, status string, quote_increment string, " +
      "base_increment string>>"
    raw.select(explode(from_json(col("body"), fromDDL(schema))).as("s"))
      .select(
        lit(exchangeId).cast("short").as("exchange_id"),
        col("s.id").as("symbol"),
        lit(instType).cast("byte").as("inst_type"),
        col("s.base_currency").as("base_asset"),
        col("s.quote_currency").as("quote_asset"),
        Funcs.enumMap(col("s.status"), statusMap).cast("byte").as("status"),
        col("s.quote_increment").as("tick_size"),
        col("s.base_increment").as("step_size"),
        Funcs.precisionOf(col("s.quote_increment")).cast("byte")
          .as("price_precision"),
        Funcs.precisionOf(col("s.base_increment")).cast("byte")
          .as("quantity_precision"))
  }

  /** bitmart perp (`bitmart/perp.py:17-49`): the true step is
    * vol_precision × contract_size in exact decimal (`perp.py:33`); note the
    * reference maps "Delisted" to PENDING, mirrored faithfully. The product
    * is rendered as a trimmed plain-decimal string (Python's `str(Decimal)`
    * keeps the operand scale; the value is identical). */
  def bitmartPerpSymbols(raw: DataFrame, exchangeId: Int, instType: Int): DataFrame = {
    val statusMap = Map("Trading" -> ACT, "Delisted" -> PEND)
    val schema = "struct<data struct<symbols array<struct<symbol string, " +
      "base_currency string, quote_currency string, status string, " +
      "price_precision string, vol_precision string, contract_size string>>>>"
    val rows = raw.select(explode(from_json(col("body"), fromDDL(schema))
      .getField("data").getField("symbols")).as("s"))
    val step = Funcs.trimZeros(
      (col("s.vol_precision").cast("decimal(18,9)") *
        col("s.contract_size").cast("decimal(18,9)"))
        .cast("decimal(28,12)").cast("string"))
    rows.select(
      lit(exchangeId).cast("short").as("exchange_id"),
      col("s.symbol").as("symbol"),
      lit(instType).cast("byte").as("inst_type"),
      col("s.base_currency").as("base_asset"),
      col("s.quote_currency").as("quote_asset"),
      Funcs.enumMap(col("s.status"), statusMap).cast("byte").as("status"),
      // the reference's "price_precision" FIELD is a tick string
      col("s.price_precision").as("tick_size"),
      step.as("step_size"),
      Funcs.precisionOf(col("s.price_precision")).cast("byte")
        .as("price_precision"),
      Funcs.precisionOf(step).cast("byte").as("quantity_precision"))
  }

  /** bitmart spot (`bitmart/spot.py:16-49`): tick rendered from
    * price_max_precision via P7, step from base_min_size. */
  def bitmartSpotSymbols(raw: DataFrame, exchangeId: Int, instType: Int): DataFrame = {
    val statusMap = Map("trading" -> ACT, "pre-trade" -> PEND)
    val schema = "struct<data struct<symbols array<struct<symbol string, " +
      "base_currency string, quote_currency string, trade_status string, " +
      "price_max_precision int, base_min_size string>>>>"
    raw.select(explode(from_json(col("body"), fromDDL(schema))
        .getField("data").getField("symbols")).as("s"))
      .select(
        lit(exchangeId).cast("short").as("exchange_id"),
        col("s.symbol").as("symbol"),
        lit(instType).cast("byte").as("inst_type"),
        col("s.base_currency").as("base_asset"),
        col("s.quote_currency").as("quote_asset"),
        Funcs.enumMap(col("s.trade_status"), statusMap).cast("byte").as("status"),
        Funcs.toDecimalStr(col("s.price_max_precision")).as("tick_size"),
        col("s.base_min_size").as("step_size"),
        col("s.price_max_precision").cast("byte").as("price_precision"),
        Funcs.precisionOf(col("s.base_min_size")).cast("byte")
          .as("quantity_precision"))
  }

  /** weex perp (`weex/perp.py:16-48`): base/quote from underlying_index /
    * quote_currency; note the reference's quantity precision comes from
    * minOrderSize while step comes from size_increment (asymmetric, mirrored).
    * The reference body indexes the symbol STRING (`perp.py:36-37`,
    * `symbol["underlying_index"]` — a latent TypeError); the evident intent,
    * fields off the contract object, is implemented. weex/spot.py is an
    * empty stub in the reference — no spot client exists. */
  def weexPerpSymbols(raw: DataFrame, exchangeId: Int, instType: Int): DataFrame = {
    val statusMap = Map("TRADING" -> ACT, "SUSPENDED" -> HALT)
    val schema = "array<struct<symbol string, underlying_index string, " +
      "quote_currency string, status string, tick_size string, " +
      "size_increment string, minOrderSize string>>"
    raw.select(explode(from_json(col("body"), fromDDL(schema))).as("s"))
      .select(
        lit(exchangeId).cast("short").as("exchange_id"),
        col("s.symbol").as("symbol"),
        lit(instType).cast("byte").as("inst_type"),
        col("s.underlying_index").as("base_asset"),
        col("s.quote_currency").as("quote_asset"),
        Funcs.enumMap(col("s.status"), statusMap).cast("byte").as("status"),
        col("s.tick_size").as("tick_size"),
        col("s.size_increment").as("step_size"),
        Funcs.precisionOf(col("s.tick_size")).cast("byte").as("price_precision"),
        Funcs.precisionOf(col("s.minOrderSize")).cast("byte")
          .as("quantity_precision"))
  }

  /** woox perp+spot (`woox/perp.py:16-49` / `woox/spot.py:16-51`): one feed
    * for both books; symbols are TYPE_BASE_QUOTE and the instType argument
    * (1=PERP, 0=SPOT) selects the segment filter. */
  def wooxSymbols(raw: DataFrame, exchangeId: Int, instType: Int): DataFrame = {
    val statusMap = Map("TRADING" -> ACT, "SUSPENDED" -> HALT)
    val wanted = if (instType == 1) "PERP" else "SPOT"
    val schema = "struct<rows array<struct<symbol string, status string, " +
      "quote_tick string, base_tick string, listing_time string>>>"
    val rows = raw.select(explode(from_json(col("body"), fromDDL(schema))
        .getField("rows")).as("s"))
      .where(element_at(split(col("s.symbol"), "_"), 1) === wanted)
    rows.select(
      lit(exchangeId).cast("short").as("exchange_id"),
      col("s.symbol").as("symbol"),
      lit(instType).cast("byte").as("inst_type"),
      element_at(split(col("s.symbol"), "_"), 2).as("base_asset"),
      element_at(split(col("s.symbol"), "_"), 3).as("quote_asset"),
      Funcs.enumMap(col("s.status"), statusMap).cast("byte").as("status"),
      col("s.quote_tick").as("tick_size"),
      col("s.base_tick").as("step_size"),
      Funcs.precisionOf(col("s.quote_tick")).cast("byte").as("price_precision"),
      Funcs.precisionOf(col("s.base_tick")).cast("byte")
        .as("quantity_precision"),
      (col("s.listing_time").cast("double") * 1000).cast("long")
        .as("onboard_time"))
  }

  /** aster perp+spot (`aster/perp.py:16-58` / `aster/spot.py:16-57`):
    * binance-family exchangeInfo shape — filters-array tick/step, explicit
    * precision fields, shared 8-state vocabulary; perp additionally keeps
    * only PERPETUAL contracts. */
  def asterSymbols(raw: DataFrame, exchangeId: Int, instType: Int): DataFrame = {
    val statusMap = Map("TRADING" -> ACT, "PENDING_TRADING" -> PEND,
      "PRE_DELIVERING" -> HALT, "DELIVERING" -> HALT, "DELIVERED" -> HALT,
      "PRE_SETTLE" -> HALT, "SETTLING" -> HALT, "CLOSE" -> CLOSE)
    val schema = "struct<symbols array<struct<symbol string, baseAsset string, " +
      "quoteAsset string, status string, contractType string, " +
      "pricePrecision int, quantityPrecision int, " +
      "filters array<struct<filterType string, tickSize string, stepSize string>>>>>"
    val all = raw.select(explode(from_json(col("body"), fromDDL(schema))
      .getField("symbols")).as("s"))
    val rows =
      if (instType == 1) all.where(col("s.contractType") === "PERPETUAL")
      else all
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
      Funcs.enumMap(col("s.status"), statusMap).cast("byte").as("status"),
      tick.as("tick_size"),
      step.as("step_size"),
      col("s.pricePrecision").cast("byte").as("price_precision"),
      col("s.quantityPrecision").cast("byte").as("quantity_precision"))
  }

  /** Dispatch registry over every (exchange, inst_type) client the reference
    * ships — 21 pairs across 12 exchanges (weex has no spot client; its
    * spot.py is an empty stub). Mirrors `KlineAdapters.registry`. inst_type:
    * 0=SPOT, 1=PERP (`constants.py:11-13`). */
  val registry: Map[(String, Int), (DataFrame, Int, Int) => DataFrame] = Map(
    ("binance", 1) -> (binanceSymbols _),
    ("binance", 0) -> (binanceSpotSymbols _),
    ("okx", 1) -> (okxSymbols _),
    ("okx", 0) -> (okxSpotSymbols _),
    ("kraken", 0) -> (krakenSymbols _),
    ("bybit", 1) -> (bybitPerpSymbols _),
    ("bybit", 0) -> (bybitSpotSymbols _),
    ("bitget", 1) -> (bitgetPerpSymbols _),
    ("bitget", 0) -> (bitgetSpotSymbols _),
    ("mexc", 1) -> (mexcPerpSymbols _),
    ("mexc", 0) -> (mexcSpotSymbols _),
    ("gate", 1) -> (gatePerpSymbols _),
    ("gate", 0) -> (gateSpotSymbols _),
    ("coinbase", 0) -> (coinbaseSpotSymbols _),
    ("bitmart", 1) -> (bitmartPerpSymbols _),
    ("bitmart", 0) -> (bitmartSpotSymbols _),
    ("weex", 1) -> (weexPerpSymbols _),
    ("woox", 1) -> (wooxSymbols _),
    ("woox", 0) -> (wooxSymbols _),
    ("aster", 1) -> (asterSymbols _),
    ("aster", 0) -> (asterSymbols _))

  /** bitget sentiment eligibility (P16 variant, `bitget/perp.py:128,134`):
    * the long-short-ratio feed blacklists a base-asset set and strips the
    * `_UMCBL` product suffix before hitting the API. */
  val BitgetSentimentBlacklist: Seq[String] =
    Seq("ADA", "ASTER", "BNB", "DOGE", "GIGGLE", "LTC")

  def bitgetSentimentEligible(symbols: DataFrame): DataFrame =
    symbols
      .where(!col("base_asset").isin(BitgetSentimentBlacklist: _*))
      .withColumn("api_symbol", regexp_replace(col("symbol"), "_UMCBL$", ""))

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
