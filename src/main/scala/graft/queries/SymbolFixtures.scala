package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic multi-exchange symbol-catalog fixtures for the
  * `s5_symbol_catalog` oracle query (S2 coverage, SURVEY §2.1).
  *
  * Each `part` row is assigned to one of the 21 (exchange, inst_type)
  * client pairs the reference ships and rendered into THAT exchange's raw
  * exchange-info JSON body (binance filters array, okx data list, kraken
  * result map, bitmart nested envelope, ...). The Spark side then runs the
  * real registry normalizer over the JSON — exercising schema parse, status
  * enum maps, precision derivation, and tick rendering end to end — while
  * the DuckDB twin computes the expected normalized catalog directly from
  * the same `part` columns. Symbol catalogs are metadata-scale (~10k rows
  * per exchange); this query's shape is not a 100 TB concern.
  *
  * Derivations (identical in both engines):
  *   pidx = p_partkey % 21, p = p_size % 7, q = (p_size+3) % 6,
  *   base = 'C'||p_partkey, quote = [USDT,USDC,USD,BTC][p_partkey % 4],
  *   tick = 10^-p, step = 10^-q (P7 rendering), status = vocab[p_partkey % n].
  */
object SymbolFixtures {

  /** Ordered client pairs; pidx is the position, exchange_id = pidx + 1. */
  val pairs: Seq[(String, Int)] = Seq(
    ("binance", 1), ("binance", 0), ("okx", 1), ("okx", 0), ("kraken", 0),
    ("bybit", 1), ("bybit", 0), ("bitget", 1), ("bitget", 0), ("mexc", 1),
    ("mexc", 0), ("gate", 1), ("gate", 0), ("coinbase", 0), ("bitmart", 1),
    ("bitmart", 0), ("weex", 1), ("woox", 1), ("woox", 0), ("aster", 1),
    ("aster", 0))

  /** Raw status vocabularies, one per pidx (mexc perp is int-coded and
    * handled separately). Order matters: pk % n indexes into these. */
  val statusVocab: Map[Int, Seq[String]] = {
    val binancePerp = Seq("TRADING", "PENDING_TRADING", "PRE_DELIVERING",
      "DELIVERING", "DELIVERED", "PRE_SETTLE", "SETTLING", "CLOSE")
    Map(
      0 -> binancePerp,
      1 -> Seq("TRADING", "END_OF_DAY", "HALT", "BREAK"),
      2 -> Seq("live", "suspend", "preopen", "test"),
      3 -> Seq("live", "suspend", "preopen", "test"),
      4 -> Seq("online", "cancel_only", "post_only", "limit_only", "reduce_only"),
      5 -> Seq("Trading"),
      6 -> Seq("Trading"),
      7 -> Seq("normal", "listed", "maintain", "limit_open", "restrictedAPI", "off"),
      8 -> Seq("online", "halt", "gray", "offline"),
      10 -> Seq("1", "2", "3"),
      11 -> Seq("prelaunch", "trading", "delisting", "delisted", "circuit_breaker"),
      12 -> Seq("untradable", "buyable", "sellable", "tradable"),
      13 -> Seq("online", "offline", "internal", "delisted"),
      14 -> Seq("Trading", "Delisted"),
      15 -> Seq("trading", "pre-trade"),
      16 -> Seq("TRADING", "SUSPENDED"),
      17 -> Seq("TRADING", "SUSPENDED"),
      18 -> Seq("TRADING", "SUSPENDED"),
      19 -> binancePerp,
      20 -> binancePerp)
  }

  /** Shared per-row fixture columns, derived from `part`. */
  def base(s: SparkSession, d: String): DataFrame = {
    import graft.functions.Funcs
    Tables.part(s, d).select(
      col("p_partkey").cast("long").as("pk"),
      pmod(col("p_partkey"), lit(21)).cast("int").as("pidx"),
      pmod(col("p_size"), lit(7)).cast("int").as("p"),
      pmod(col("p_size") + 3, lit(6)).cast("int").as("q"))
      .withColumn("base", concat(lit("C"), col("pk")))
      .withColumn("quote", element_at(
        array(lit("USDT"), lit("USDC"), lit("USD"), lit("BTC")),
        (pmod(col("pk"), lit(4)) + 1).cast("int")))
      .withColumn("sym", concat(col("base"), lit("_"), col("quote")))
      .withColumn("tick", Funcs.toDecimalStr(col("p")))
      .withColumn("step", Funcs.toDecimalStr(col("q")))
  }

  private def statusRaw(pidx: Int): Column = {
    val vocab = statusVocab(pidx)
    element_at(array(vocab.map(lit): _*),
      (pmod(col("pk"), lit(vocab.size)) + 1).cast("int"))
  }

  /** One-row (symbol, body) frame in the shape the normalizers ingest. */
  private def asBody(agg: Column)(rows: DataFrame): DataFrame =
    rows.agg(agg.as("body")).select(lit("x").as("symbol"), col("body"))

  /** binance/aster exchangeInfo: filters array + explicit precisions. */
  private def binanceShape(pidx: Int): DataFrame => DataFrame =
    asBody(to_json(struct(collect_list(struct(
      col("sym").as("symbol"), col("base").as("baseAsset"),
      col("quote").as("quoteAsset"), statusRaw(pidx).as("status"),
      lit("PERPETUAL").as("contractType"),
      col("p").as("pricePrecision"), col("q").as("quantityPrecision"),
      array(
        struct(lit("PRICE_FILTER").as("filterType"), col("tick").as("tickSize"),
          col("step").as("stepSize")),
        struct(lit("LOT_SIZE").as("filterType"), col("tick").as("tickSize"),
          col("step").as("stepSize"))).as("filters"))).as("symbols"))))

  private def okxPerpShape: DataFrame => DataFrame =
    asBody(to_json(struct(collect_list(struct(
      col("sym").as("instId"),
      concat(col("base"), lit("-"), col("quote")).as("instFamily"),
      statusRaw(2).as("state"), col("tick").as("tickSz"),
      col("step").as("lotSz"), lit("0").as("listTime"))).as("data"))))

  private def okxSpotShape: DataFrame => DataFrame =
    asBody(to_json(struct(collect_list(struct(
      col("sym").as("instId"), col("base").as("baseCcy"),
      col("quote").as("quoteCcy"), statusRaw(3).as("state"),
      col("tick").as("tickSz"), col("step").as("lotSz"),
      lit("0").as("listTime"))).as("data"))))

  private def krakenShape: DataFrame => DataFrame = rows =>
    rows.agg(map_from_arrays(collect_list(col("sym")), collect_list(struct(
        col("sym").as("altname"), col("base").as("base"),
        col("quote").as("quote"), statusRaw(4).as("status"),
        col("tick").as("tick_size"), lit(1.0).as("lot_multiplier"),
        col("q").as("lot_decimals"), col("p").as("pair_decimals")))).as("m"))
      .select(lit("x").as("symbol"),
        to_json(struct(col("m").as("result"))).as("body"))

  private def bybitShape(pidx: Int): DataFrame => DataFrame =
    asBody(to_json(struct(struct(collect_list(struct(
      col("sym").as("symbol"), col("base").as("baseCoin"),
      col("quote").as("quoteCoin"), statusRaw(pidx).as("status"),
      lit("LinearPerpetual").as("contractType"),
      col("p").cast("string").as("priceScale"),
      struct(col("tick").as("tickSize")).as("priceFilter"),
      struct(col("step").as("qtyStep"), col("step").as("basePrecision"))
        .as("lotSizeFilter"))).as("list")).as("result"))))

  private def bitgetPerpShape: DataFrame => DataFrame =
    asBody(to_json(struct(collect_list(struct(
      col("sym").as("symbol"), col("base").as("baseCoin"),
      col("quote").as("quoteCoin"), statusRaw(7).as("symbolStatus"),
      col("p").cast("string").as("pricePlace"),
      col("step").as("sizeMultiplier"),
      col("q").cast("string").as("volumePlace"))).as("data"))))

  private def bitgetSpotShape: DataFrame => DataFrame =
    asBody(to_json(struct(collect_list(struct(
      col("sym").as("symbol"), col("base").as("baseCoin"),
      col("quote").as("quoteCoin"), statusRaw(8).as("status"),
      col("p").cast("string").as("pricePrecision"),
      col("q").cast("string").as("quantityPrecision"))).as("data"))))

  private def mexcPerpShape: DataFrame => DataFrame =
    asBody(to_json(struct(collect_list(struct(
      col("sym").as("symbol"), col("base").as("baseCoin"),
      col("quote").as("quoteCoin"),
      pmod(col("pk"), lit(5)).cast("int").as("state"),
      col("tick").as("priceUnit"), col("step").as("volUnit"),
      col("p").as("priceScale"), col("q").as("amountScale"),
      lit(0L).as("openingTime"))).as("data"))))

  private def mexcSpotShape: DataFrame => DataFrame =
    asBody(to_json(struct(collect_list(struct(
      col("sym").as("symbol"), col("base").as("baseAsset"),
      col("quote").as("quoteAsset"), statusRaw(10).as("status"),
      col("tick").as("quoteAmountPrecision"),
      col("step").as("baseSizePrecision"),
      col("p").as("quoteAssetPrecision"),
      col("q").as("baseAssetPrecision"))).as("symbols"))))

  private def gatePerpShape: DataFrame => DataFrame =
    asBody(to_json(collect_list(struct(
      col("sym").as("name"), statusRaw(11).as("status"),
      col("tick").as("order_price_round"), lit(0L).as("launch_time")))))

  private def gateSpotShape: DataFrame => DataFrame =
    asBody(to_json(collect_list(struct(
      col("sym").as("id"), col("base").as("base"), col("quote").as("quote"),
      statusRaw(12).as("trade_status"), col("p").as("precision"),
      col("q").as("amount_precision"), lit(0L).as("sell_start"),
      lit(0L).as("buy_start")))))

  private def coinbaseShape: DataFrame => DataFrame =
    asBody(to_json(collect_list(struct(
      col("sym").as("id"), col("base").as("base_currency"),
      col("quote").as("quote_currency"), statusRaw(13).as("status"),
      col("tick").as("quote_increment"), col("step").as("base_increment")))))

  private def bitmartPerpShape: DataFrame => DataFrame =
    asBody(to_json(struct(struct(collect_list(struct(
      col("sym").as("symbol"), col("base").as("base_currency"),
      col("quote").as("quote_currency"), statusRaw(14).as("status"),
      col("tick").as("price_precision"), col("step").as("vol_precision"),
      lit("1").as("contract_size"))).as("symbols")).as("data"))))

  private def bitmartSpotShape: DataFrame => DataFrame =
    asBody(to_json(struct(struct(collect_list(struct(
      col("sym").as("symbol"), col("base").as("base_currency"),
      col("quote").as("quote_currency"), statusRaw(15).as("trade_status"),
      col("p").as("price_max_precision"),
      col("step").as("base_min_size"))).as("symbols")).as("data"))))

  private def weexShape: DataFrame => DataFrame =
    asBody(to_json(collect_list(struct(
      col("sym").as("symbol"), col("base").as("underlying_index"),
      col("quote").as("quote_currency"), statusRaw(16).as("status"),
      col("tick").as("tick_size"), col("step").as("size_increment"),
      col("step").as("minOrderSize")))))

  private def wooxShape(pidx: Int, prefix: String): DataFrame => DataFrame =
    asBody(to_json(struct(collect_list(struct(
      concat(lit(prefix + "_"), col("sym")).as("symbol"),
      statusRaw(pidx).as("status"), col("tick").as("quote_tick"),
      col("step").as("base_tick"), lit("0").as("listing_time"))).as("rows"))))

  /** Body builder per pidx, in [[pairs]] order. */
  val builders: Seq[DataFrame => DataFrame] = Seq(
    binanceShape(0), binanceShape(1), okxPerpShape, okxSpotShape, krakenShape,
    bybitShape(5), bybitShape(6), bitgetPerpShape, bitgetSpotShape,
    mexcPerpShape, mexcSpotShape, gatePerpShape, gateSpotShape, coinbaseShape,
    bitmartPerpShape, bitmartSpotShape, weexShape,
    wooxShape(17, "PERP"), wooxShape(18, "SPOT"),
    binanceShape(19), binanceShape(20))
}
