package graft.flows

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.TagCrypto

class FlowsSpec extends SparkSpec {
  import spark.implicits._

  // ---- SyncSymbols -------------------------------------------------------

  private val exchangeInfoBody =
    """{"symbols":[
      |{"symbol":"BTCUSDT","baseAsset":"BTC","quoteAsset":"USDT","status":"TRADING",
      | "contractType":"PERPETUAL","pricePrecision":2,"quantityPrecision":3,
      | "filters":[{"filterType":"PRICE_FILTER","tickSize":"0.01000000"},
      |            {"filterType":"LOT_SIZE","stepSize":"0.00100000"}]},
      |{"symbol":"ETHUSDT_240628","baseAsset":"ETH","quoteAsset":"USDT","status":"TRADING",
      | "contractType":"CURRENT_QUARTER","pricePrecision":2,"quantityPrecision":3,
      | "filters":[]},
      |{"symbol":"DOGEUSDT","baseAsset":"DOGE","quoteAsset":"USDT","status":"SETTLING",
      | "contractType":"PERPETUAL","pricePrecision":5,"quantityPrecision":0,
      | "filters":[{"filterType":"PRICE_FILTER","tickSize":"0.00001000"},
      |            {"filterType":"LOT_SIZE","stepSize":"1.00000000"}]}
      |]}""".stripMargin.replace("\n", "")

  test("binanceSymbols: PERPETUAL filter, tick/step from filters, status enum, P6 precision") {
    val out = SyncSymbols.binanceSymbols(
      Seq(("x", exchangeInfoBody)).toDF("symbol", "body"), 1, 1)
      .orderBy("symbol")
      .select($"symbol", $"status".cast("int"), $"tick_size", $"step_size",
        $"derived_price_precision")
      .as[(String, Int, String, String, Int)].collect()
    assert(out.length == 2) // quarterly contract filtered out
    assert(out(0) == (("BTCUSDT", 1, "0.01000000", "0.00100000", 2)))
    assert(out(1) == (("DOGEUSDT", 2, "0.00001000", "1.00000000", 5)))
  }

  test("SyncSymbols.run upserts only the five mutable fields") {
    val dim = Files.createTempDirectory("dim").toString + "/exchange_symbol"
    SyncSymbols.run(spark,
      dim, Seq(("x", exchangeInfoBody)).toDF("symbol", "body"), 1, 1)
    val first = spark.read.parquet(dim)
    assert(first.count() == 2)
    // second run with a changed tick size updates in place (idempotent keys)
    val body2 = exchangeInfoBody.replace("\"0.01000000\"", "\"0.10000000\"")
    SyncSymbols.run(spark, dim, Seq(("x", body2)).toDF("symbol", "body"), 1, 1)
    val after = spark.read.parquet(dim)
    assert(after.count() == 2)
    val tick = after.where($"symbol" === "BTCUSDT")
      .select($"tick_size").as[String].head()
    assert(tick == "0.10000000")
  }

  test("okxSymbols: instFamily split, P6 precision derivation, status enum") {
    val body =
      """{"data":[{"instId":"BTC-USDT-SWAP","instFamily":"BTC-USDT","state":"live",
        |"tickSz":"0.1","lotSz":"0.01","listTime":"1611916828000"}]}"""
        .stripMargin.replace("\n", "")
    val out = SyncSymbols.okxSymbols(Seq(("x", body)).toDF("symbol", "body"), 2, 1)
      .select($"symbol", $"base_asset", $"quote_asset", $"status".cast("int"),
        $"price_precision".cast("int"), $"quantity_precision".cast("int"),
        $"onboard_time")
      .as[(String, String, String, Int, Int, Int, Long)].head()
    assert(out == (("BTC-USDT-SWAP", "BTC", "USDT", 1, 1, 2, 1611916828000L)))
  }

  test("krakenSymbols: P9 canonicalization and derived step size") {
    val body =
      """{"result":{"XXBTZUSD":{"altname":"XBTUSD","base":"XXBT","quote":"ZUSD",
        |"status":"online","tick_size":"0.1","lot_multiplier":1.0,
        |"lot_decimals":8,"pair_decimals":1}}}""".stripMargin.replace("\n", "")
    val out = SyncSymbols.krakenSymbols(Seq(("x", body)).toDF("symbol", "body"), 5, 0)
      .select($"symbol", $"base_asset", $"quote_asset", $"status".cast("int"),
        $"step_size")
      .as[(String, String, String, Int, String)].head()
    assert(out._1 == "XBTUSD")
    assert(out._2 == "BTC" && out._3 == "USD") // XXBT→BTC, ZUSD→USD
    assert(out._4 == 1)
    assert(BigDecimal(out._5) == BigDecimal("0.00000001")) // 1/10^8
  }

  // ---- SyncSymbols: round-3 exchange clients (S2 completion) -------------

  private def oneBody(body: String) =
    Seq(("x", body.stripMargin.replace("\n", ""))).toDF("symbol", "body")

  private def normalized(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("symbol")
      .select($"symbol", $"base_asset", $"quote_asset", $"status".cast("int"),
        $"tick_size", $"step_size", $"price_precision".cast("int"),
        $"quantity_precision".cast("int"))
      .as[(String, String, String, Int, String, String, Int, Int)].collect()

  test("binanceSpotSymbols: no contract filter, rstrip-0 ticks, spot status vocab") {
    val body =
      """{"symbols":[
        |{"symbol":"BTCUSDT","baseAsset":"BTC","quoteAsset":"USDT","status":"TRADING",
        | "filters":[{"filterType":"PRICE_FILTER","tickSize":"0.01000000"},
        |            {"filterType":"LOT_SIZE","stepSize":"1.00000000"}]},
        |{"symbol":"OLDUSDT","baseAsset":"OLD","quoteAsset":"USDT","status":"BREAK",
        | "filters":[{"filterType":"PRICE_FILTER","tickSize":"0.00001000"},
        |            {"filterType":"LOT_SIZE","stepSize":"0.10000000"}]}]}"""
    val out = normalized(SyncSymbols.binanceSpotSymbols(oneBody(body), 1, 0))
    // the reference's literal rstrip("0"): "1.00000000" -> "1." (kept faithful)
    assert(out(0) == (("BTCUSDT", "BTC", "USDT", 1, "0.01", "1.", 2, 0)))
    assert(out(1) == (("OLDUSDT", "OLD", "USDT", 2, "0.00001", "0.1", 5, 1)))
  }

  test("okxSpotSymbols: baseCcy/quoteCcy fields, preopen->PENDING") {
    val body =
      """{"data":[{"instId":"BTC-USDT","baseCcy":"BTC","quoteCcy":"USDT",
        |"state":"preopen","tickSz":"0.1","lotSz":"0.0001","listTime":"1611916828000"}]}"""
    val out = normalized(SyncSymbols.okxSpotSymbols(oneBody(body), 2, 0))
    assert(out(0) == (("BTC-USDT", "BTC", "USDT", 0, "0.1", "0.0001", 1, 4)))
  }

  test("bybitPerpSymbols: LinearPerpetual filter, priceScale preferred over derived") {
    val body =
      """{"result":{"list":[
        |{"symbol":"BTCUSDT","baseCoin":"BTC","quoteCoin":"USDT","status":"Trading",
        | "contractType":"LinearPerpetual","priceScale":"2",
        | "priceFilter":{"tickSize":"0.10"},"lotSizeFilter":{"qtyStep":"0.001"}},
        |{"symbol":"BTCUSDH25","baseCoin":"BTC","quoteCoin":"USDT","status":"Trading",
        | "contractType":"LinearFutures","priceScale":"1",
        | "priceFilter":{"tickSize":"0.5"},"lotSizeFilter":{"qtyStep":"0.01"}}]}}"""
    val out = normalized(SyncSymbols.bybitPerpSymbols(oneBody(body), 6, 1))
    assert(out.length == 1) // futures contract filtered out
    // priceScale=2 wins over precision("0.10")=1
    assert(out(0) == (("BTCUSDT", "BTC", "USDT", 1, "0.10", "0.001", 2, 3)))
  }

  test("bybitSpotSymbols: basePrecision step, both precisions derived") {
    val body =
      """{"result":{"list":[
        |{"symbol":"ETHUSDC","baseCoin":"ETH","quoteCoin":"USDC","status":"Trading",
        | "priceFilter":{"tickSize":"0.01"},
        | "lotSizeFilter":{"qtyStep":"9","basePrecision":"0.00001"}}]}}"""
    val out = normalized(SyncSymbols.bybitSpotSymbols(oneBody(body), 6, 0))
    assert(out(0) == (("ETHUSDC", "ETH", "USDC", 1, "0.01", "0.00001", 2, 5)))
  }

  test("bitgetPerpSymbols: tick rendered 10^-pricePlace, 6-state vocab") {
    val body =
      """{"data":[
        |{"symbol":"BTCUSDT_UMCBL","baseCoin":"BTC","quoteCoin":"USDT",
        | "symbolStatus":"normal","pricePlace":"1","sizeMultiplier":"0.001",
        | "volumePlace":"3"},
        |{"symbol":"NEWUSDT_UMCBL","baseCoin":"NEW","quoteCoin":"USDT",
        | "symbolStatus":"listed","pricePlace":"0","sizeMultiplier":"1",
        | "volumePlace":"0"}]}"""
    val out = normalized(SyncSymbols.bitgetPerpSymbols(oneBody(body), 8, 1))
    assert(out(0) == (("BTCUSDT_UMCBL", "BTC", "USDT", 1, "0.1", "0.001", 1, 3)))
    assert(out(1) == (("NEWUSDT_UMCBL", "NEW", "USDT", 0, "1", "1", 0, 0)))
  }

  test("bitgetSpotSymbols: both sizes rendered from precisions, re-derived") {
    val body =
      """{"data":[{"symbol":"BTCUSDT","baseCoin":"BTC","quoteCoin":"USDT",
        |"status":"gray","pricePrecision":"4","quantityPrecision":"6"}]}"""
    val out = normalized(SyncSymbols.bitgetSpotSymbols(oneBody(body), 8, 0))
    assert(out(0) == (("BTCUSDT", "BTC", "USDT", 0, "0.0001", "0.000001", 4, 6)))
  }

  test("mexcPerpSymbols: int state map, s->ms onboard") {
    val body =
      """{"data":[{"symbol":"BTC_USDT","baseCoin":"BTC","quoteCoin":"USDT",
        |"state":4,"priceUnit":"0.5","volUnit":"0.0001","priceScale":1,
        |"amountScale":4,"openingTime":1700000000}]}"""
    val df = SyncSymbols.mexcPerpSymbols(oneBody(body), 10, 1)
    val out = normalized(df)
    assert(out(0) == (("BTC_USDT", "BTC", "USDT", 2, "0.5", "0.0001", 1, 4)))
    assert(df.select($"onboard_time").as[Long].head() == 1700000000000L)
  }

  test("mexcSpotSymbols: precisions from asset-precision fields, not the sizes") {
    val body =
      """{"symbols":[{"symbol":"MXUSDT","baseAsset":"MX","quoteAsset":"USDT",
        |"status":"1","quoteAmountPrecision":"5.0","baseSizePrecision":"0.0001",
        |"quoteAssetPrecision":6,"baseAssetPrecision":2}]}"""
    val out = normalized(SyncSymbols.mexcSpotSymbols(oneBody(body), 10, 0))
    assert(out(0) == (("MXUSDT", "MX", "USDT", 1, "5.0", "0.0001", 6, 2)))
  }

  test("gatePerpSymbols: name split, integer lots (step=1, qty precision 0)") {
    val body =
      """[{"name":"BTC_USDT","status":"trading","order_price_round":"0.1",
        |"launch_time":1500000000}]"""
    val df = SyncSymbols.gatePerpSymbols(oneBody(body), 12, 1)
    val out = normalized(df)
    assert(out(0) == (("BTC_USDT", "BTC", "USDT", 1, "0.1", "1", 1, 0)))
    assert(df.select($"onboard_time").as[Long].head() == 1500000000000L)
  }

  test("gateSpotSymbols: P7 ticks from precisions, min(sell,buy) onboard") {
    val body =
      """[{"id":"ETH_USDT","base":"ETH","quote":"USDT","trade_status":"buyable",
        |"precision":2,"amount_precision":3,"sell_start":200,"buy_start":100}]"""
    val df = SyncSymbols.gateSpotSymbols(oneBody(body), 12, 0)
    val out = normalized(df)
    assert(out(0) == (("ETH_USDT", "ETH", "USDT", 1, "0.01", "0.001", 2, 3)))
    assert(df.select($"onboard_time").as[Long].head() == 100000L)
  }

  test("coinbaseSpotSymbols: increments through, precisions derived") {
    val body =
      """[{"id":"BTC-USD","base_currency":"BTC","quote_currency":"USD",
        |"status":"internal","quote_increment":"0.01","base_increment":"0.00000001"}]"""
    val out = normalized(SyncSymbols.coinbaseSpotSymbols(oneBody(body), 13, 0))
    assert(out(0) == (("BTC-USD", "BTC", "USD", 2, "0.01", "0.00000001", 2, 8)))
  }

  test("bitmartPerpSymbols: step = vol_precision x contract_size, Delisted->PENDING") {
    val body =
      """{"data":{"symbols":[
        |{"symbol":"BTCUSDT","base_currency":"BTC","quote_currency":"USDT",
        | "status":"Trading","price_precision":"0.1","vol_precision":"0.001",
        | "contract_size":"10"},
        |{"symbol":"GONEUSDT","base_currency":"GONE","quote_currency":"USDT",
        | "status":"Delisted","price_precision":"0.01","vol_precision":"1",
        | "contract_size":"1"}]}}"""
    val out = normalized(SyncSymbols.bitmartPerpSymbols(oneBody(body), 14, 1))
    // 0.001 * 10 = 0.01 exactly, in decimal
    assert(out(0) == (("BTCUSDT", "BTC", "USDT", 1, "0.1", "0.01", 1, 2)))
    assert(out(1) == (("GONEUSDT", "GONE", "USDT", 0, "0.01", "1", 2, 0)))
  }

  test("bitmartSpotSymbols: P7 tick from max precision") {
    val body =
      """{"data":{"symbols":[{"symbol":"BMX_ETH","base_currency":"BMX",
        |"quote_currency":"ETH","trade_status":"pre-trade",
        |"price_max_precision":8,"base_min_size":"1.0"}]}}"""
    val out = normalized(SyncSymbols.bitmartSpotSymbols(oneBody(body), 14, 0))
    assert(out(0) == (("BMX_ETH", "BMX", "ETH", 0, "0.00000001", "1.0", 8, 0)))
  }

  test("weexPerpSymbols: qty precision from minOrderSize, step from size_increment") {
    val body =
      """[{"symbol":"cmt_btcusdt","underlying_index":"BTC","quote_currency":"USDT",
        |"status":"SUSPENDED","tick_size":"0.5","size_increment":"0.001",
        |"minOrderSize":"0.01"}]"""
    val out = normalized(SyncSymbols.weexPerpSymbols(oneBody(body), 16, 1))
    // step 0.001 but precision(minOrderSize 0.01) = 2 — reference asymmetry
    assert(out(0) == (("cmt_btcusdt", "BTC", "USDT", 2, "0.5", "0.001", 1, 2)))
  }

  test("wooxSymbols: TYPE_BASE_QUOTE segment filter selects the book") {
    val body =
      """{"rows":[
        |{"symbol":"PERP_BTC_USDT","status":"TRADING","quote_tick":"0.1",
        | "base_tick":"0.0001","listing_time":"1600000000.125"},
        |{"symbol":"SPOT_BTC_USDT","status":"TRADING","quote_tick":"0.01",
        | "base_tick":"0.00001","listing_time":"1600000001.5"}]}"""
    val perp = SyncSymbols.wooxSymbols(oneBody(body), 17, 1)
    val spot = SyncSymbols.wooxSymbols(oneBody(body), 17, 0)
    assert(normalized(perp)(0) ==
      (("PERP_BTC_USDT", "BTC", "USDT", 1, "0.1", "0.0001", 1, 4)))
    assert(normalized(spot)(0) ==
      (("SPOT_BTC_USDT", "BTC", "USDT", 1, "0.01", "0.00001", 2, 5)))
    assert(perp.select($"onboard_time").as[Long].head() == 1600000000125L)
  }

  test("asterSymbols: perp filters PERPETUAL, spot keeps all") {
    val body =
      """{"symbols":[
        |{"symbol":"BTCUSDT","baseAsset":"BTC","quoteAsset":"USDT",
        | "status":"SETTLING","contractType":"PERPETUAL","pricePrecision":1,
        | "quantityPrecision":3,
        | "filters":[{"filterType":"PRICE_FILTER","tickSize":"0.1"},
        |            {"filterType":"LOT_SIZE","stepSize":"0.001"}]},
        |{"symbol":"ETHUSDT_Q","baseAsset":"ETH","quoteAsset":"USDT",
        | "status":"TRADING","contractType":"CURRENT_QUARTER","pricePrecision":2,
        | "quantityPrecision":2,
        | "filters":[{"filterType":"PRICE_FILTER","tickSize":"0.01"},
        |            {"filterType":"LOT_SIZE","stepSize":"0.01"}]}]}"""
    assert(normalized(SyncSymbols.asterSymbols(oneBody(body), 20, 1)).toSeq ==
      Seq(("BTCUSDT", "BTC", "USDT", 2, "0.1", "0.001", 1, 3)))
    assert(normalized(SyncSymbols.asterSymbols(oneBody(body), 20, 0)).length == 2)
  }

  test("symbol registry covers all 21 reference client pairs") {
    val r = SyncSymbols.registry
    assert(r.size == 21)
    val spotOnly = Seq("kraken", "coinbase")
    val perpOnly = Seq("weex") // weex/spot.py is an empty stub
    val both = Seq("binance", "okx", "bybit", "bitget", "mexc", "gate",
      "bitmart", "woox", "aster")
    spotOnly.foreach(e => assert(r.contains((e, 0)) && !r.contains((e, 1))))
    perpOnly.foreach(e => assert(r.contains((e, 1)) && !r.contains((e, 0))))
    both.foreach(e => assert(r.contains((e, 0)) && r.contains((e, 1))))
  }

  test("bitgetSentimentEligible: base blacklist + _UMCBL strip") {
    val df = Seq(
      ("BTCUSDT_UMCBL", "BTC"), ("DOGEUSDT_UMCBL", "DOGE"),
      ("ASTERUSDT_UMCBL", "ASTER")).toDF("symbol", "base_asset")
    val out = SyncSymbols.bitgetSentimentEligible(df)
      .select($"symbol", $"api_symbol").as[(String, String)].collect()
    assert(out.toSeq == Seq(("BTCUSDT_UMCBL", "BTCUSDT")))
  }

  // ---- SyncSentiment -----------------------------------------------------

  private def lsrBody(ts: Long, long: String, short: String) =
    s"""[{"symbol":"BTCUSDT","longAccount":"$long","shortAccount":"$short","timestamp":$ts}]"""

  test("sentiment merge: 5m alignment + full-outer 3-way, missing sides NULL") {
    val t0 = 1704067200000L
    // pos at t0, acc at t0+5m (misaligned by 17s → aligns to t0+5m), retail at t0
    val pos = Seq(("BTCUSDT", lsrBody(t0, "0.6", "0.4"))).toDF("symbol", "body")
    val acc = Seq(("BTCUSDT", lsrBody(t0 + 300000 + 17000, "0.7", "0.3")))
      .toDF("symbol", "body")
    val retail = Seq(("BTCUSDT", lsrBody(t0, "0.55", "0.45"))).toDF("symbol", "body")
    val out = SyncSentiment.merge(
      SyncSentiment.series(pos, "top_trader_pos_long", "top_trader_pos_short"),
      SyncSentiment.series(acc, "top_trader_acc_long", "top_trader_acc_short"),
      SyncSentiment.series(retail, "retail_acc_long", "retail_acc_short"),
      1, 1)
      .orderBy("ts")
      .select($"ts", $"top_trader_pos_long", $"top_trader_acc_long",
        $"retail_acc_long")
      .as[(Long, Option[Double], Option[Double], Option[Double])].collect()
    assert(out.length == 2)
    assert(out(0) == ((t0, Some(0.6), None, Some(0.55))))
    assert(out(1) == ((t0 + 300000, None, Some(0.7), None)))
  }

  test("okx ratio decomposition feeds the same merge (P10)") {
    val body = """{"data":[["1704067200000","3"]]}"""
    val out = SyncSentiment.okxSeries(
      Seq(("BTC-USDT-SWAP", body)).toDF("symbol", "body"), "l", "s")
      .select($"l", $"s").as[(Double, Double)].head()
    assert(out == ((0.75, 0.25)))
  }

  // ---- SyncKalshi --------------------------------------------------------

  private def market(ticker: String, event: String, status: Int, oi: Long,
      yes: Integer = 60, no: Integer = 30) =
    (1704067200000L, event, ticker, status, 55, yes, 65, no, 40, 1000L, 500L, oi)

  private def marketsDf(rows: Seq[(Long, String, String, Int, Int, Integer, Int, Integer, Int, Long, Long, Long)]) =
    rows.toDF("updated_ts", "event_ticker", "ticker", "status", "last_price",
      "yes_bid", "yes_ask", "no_bid", "no_ask", "liquidity", "volume",
      "open_interest")

  test("kalshi: anti-join drops finalized; snapshot filters by prefix threshold; P12 probs") {
    val markets = marketsDf(Seq(
      market("T1", "KXBTC-24DEC", 1, 1500),   // passes KXBTC threshold 1000
      market("T2", "KXBTC-24DEC", 1, 900),    // fails 1000
      market("T3", "OTHER-X", 1, 400),        // passes default 300
      market("T4", "OTHER-X", 2, 9999),       // inactive
      market("T5", "OTHER-X", 1, 9999, null, 30))) // null yes_bid → null probs
    val finalized = Seq("T3").toDF("ticker")
    assert(SyncKalshi.nonFinalized(markets, finalized)
      .select($"ticker").as[String].collect().toSet ==
      Set("T1", "T2", "T4", "T5"))
    val snap = SyncKalshi.snapshot(markets)
      .select($"ticker", $"yes_prob", $"no_prob")
      .as[(String, Option[Double], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(snap.keySet == Set("T1", "T3", "T5"))
    assert(snap("T1") == ((Some(0.666667), Some(0.333333)))) // 0.6/(0.6+0.3)
    assert(snap("T5") == ((None, None)))
  }

  test("kalshi pagination: cursor chain, volume skip, empty/cursor stops, >cap break") {
    def mkt(ticker: String, volume: Long, status: String = "active"): String =
      s"""{"event_ticker":"${ticker.split("-")(0)}-E","ticker":"$ticker",
         |"status":"$status","last_price":55,"yes_bid":60,"yes_ask":65,
         |"no_bid":30,"no_ask":40,"liquidity":1000,"volume":$volume,
         |"open_interest":2000}""".stripMargin.replace("\n", "")
    def page(markets: Seq[String], cursor: String): String =
      s"""{"markets":[${markets.mkString(",")}],"cursor":"$cursor"}"""
    val dir = Files.createTempDirectory("kalshipages")
    def record(name: String, body: String): Unit =
      Files.write(dir.resolve(s"$name.json"), body.getBytes("UTF-8"))
    // KXBTC: 3-page chain; one zero-volume market dropped; last page has no cursor
    record("KXBTC#0", page(Seq(mkt("KXBTC-A", 10), mkt("KXBTC-B", 0)), "c1"))
    record("KXBTC#1", page(Seq(mkt("KXBTC-C", 20, "closed")), "c2"))
    record("KXBTC#2", page(Seq(mkt("KXBTC-D", 30)), ""))
    // KXETH: 60 kept markets per page; cap 100 crossed AFTER page 1 lands,
    // so pages 0+1 contribute in full (120 rows) and page 2 is never fetched
    record("KXETH#0", page((1 to 60).map(i => mkt(s"KXETH-A$i", i)), "d1"))
    record("KXETH#1", page((1 to 60).map(i => mkt(s"KXETH-B$i", i)), "d2"))
    record("KXETH#2", page(Seq(mkt("KXETH-NEVER", 5)), ""))
    // KXFED: empty first page stops the walk before anything lands
    record("KXFED#0", page(Seq(), "e1"))
    record("KXFED#1", page(Seq(mkt("KXFED-NEVER", 5)), ""))
    val raw = spark.read.format(classOf[graft.sources.RestSource].getName)
      .option("path", dir.toString).load()
    val out = SyncKalshi.paginatedMarkets(raw, updatedTs = 1704067200000L)
    val byTicker = out.select($"ticker", $"status", $"volume")
      .as[(String, Option[Int], Long)].collect().map(r => r._1 -> r).toMap
    // KXBTC: A, C, D kept; B dropped (zero volume)
    assert(byTicker.keySet.filter(_.startsWith("KXBTC")) ==
      Set("KXBTC-A", "KXBTC-C", "KXBTC-D"))
    assert(byTicker("KXBTC-A")._2.contains(1))   // active → 1
    assert(byTicker("KXBTC-C")._2.contains(3))   // closed → 3
    // KXETH: exactly pages 0+1 = 120 rows, page 2 never fetched
    assert(byTicker.keySet.count(_.startsWith("KXETH")) == 120)
    assert(!byTicker.contains("KXETH-NEVER"))
    // KXFED: empty page stops before contributing
    assert(!byTicker.keySet.exists(_.startsWith("KXFED")))
    // the maxPages bound caps the chain even when cursors keep coming
    val bounded = SyncKalshi.paginatedMarkets(raw, 1704067200000L, maxPages = 2)
    assert(bounded.where($"ticker".startsWith("KXBTC")).count() == 2) // A, C
    // the paginated feed drives the same downstream flow (meta + snapshot)
    val snap = SyncKalshi.snapshot(out)
    assert(snap.count() > 0)
  }

  // ---- SyncOnchain + TagCrypto -------------------------------------------

  test("TagCrypto round-trips with the CryptoJS-compatible key derivation") {
    val ts = "1704067200123"
    val enc = TagCrypto.encryptTag("Binance Hot Wallet", ts)
    assert(enc.contains("=") || enc.length % 4 == 0)
    assert(TagCrypto.decryptTag(enc, ts) == "Binance Hot Wallet")
    // pass-through for plain values
    assert(TagCrypto.decryptTag("plain", ts) == "plain")
    // multi-segment joins with ": "
    val two = TagCrypto.encryptTag("A", ts) + ". " + TagCrypto.encryptTag("B", ts)
    assert(TagCrypto.decryptTag(two, ts) == "A: B")
  }

  test("recursive JSON decryption: nested structs, tag lists, quirk parity") {
    val ts = "1704067200123"
    val e = (s: String) => TagCrypto.encryptTag(s, ts)
    // tags nested at several depths: per-chain map → address struct with an
    // entityTags array, a propertyTags list inside a deeper object, a tag
    // field holding a NON-string (reference copies it untouched), and a
    // list field holding a non-list (reference recurses into it instead)
    val body =
      s"""{"data":{"ETH":{"0xa":{
         |  "entityTag":"${e("Kraken 4")}",
         |  "entityTags":["${e("Exchange")}","plain",7],
         |  "meta":{"propertyTags":["${e("Cold Storage")}"],
         |          "inner":[{"tokenTag":"${e("USDT Treasury")}"}]},
         |  "hoverEntityTag":42,
         |  "propertyTag":{"nested":"${e("NotDecrypted")}"}
         |}}}}""".stripMargin.replace("\n", "")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val out = mapper.readTree(TagCrypto.decryptJson(body, ts))
    val a = out.get("data").get("ETH").get("0xa")
    assert(a.get("entityTag").asText == "Kraken 4")
    assert(a.get("entityTags").get(0).asText == "Exchange")
    assert(a.get("entityTags").get(1).asText == "plain") // pass-through
    assert(a.get("entityTags").get(2).asInt == 7) // non-string untouched
    assert(a.get("meta").get("propertyTags").get(0).asText == "Cold Storage")
    assert(a.get("meta").get("inner").get(0).get("tokenTag").asText
      == "USDT Treasury")
    assert(a.get("hoverEntityTag").asInt == 42) // non-string tag: as-is
    // propertyTag holding an OBJECT: reference's decrypt_tag(v) returns the
    // object untouched — the nested ciphertext must stay encrypted
    assert(a.get("propertyTag").get("nested").asText != "NotDecrypted")
    // non-JSON input passes through unchanged
    assert(TagCrypto.decryptJson("not json {", ts) == "not json {")
  }

  test("parseTags resolves a tag that ONLY exists in a nested entityTags list") {
    val ts = "1704067200123"
    val enc = TagCrypto.encryptTag("Bridge Operator", ts)
    val tagBody =
      s"""{"data":{"ETH":{"0xn":{"entityTag":null,"hoverEntityTag":null,
         |"tokenTag":null,"entityTags":["$enc"]}}}}"""
        .stripMargin.replace("\n", "")
    val tags = SyncOnchain.parseTags(Seq((ts, tagBody)).toDF("ts", "body"))
      .as[(String, String, String)].collect()
    assert(tags.toList == List(("ETH", "0xn", "Bridge Operator")))
  }

  test("onchain: decrypt → fallback chain → double tag lookup → classify") {
    val ts = "1704067200123"
    val encBinance = TagCrypto.encryptTag("Binance Cold", ts)
    val encWhale = TagCrypto.encryptTag("Mega Whale 7", ts)
    val txBody =
      """{"data":{"hits":[
        |{"chain":"ETH","txHash":"0xabc","fromAddress":"0xf1","toAddress":"0xt1",
        | "tokenSymbol":"ETH","tokenContractAddress":null,"value":5000.0,
        | "price":2000.0,"valueUsd":1.0E7,"timestamp":1704067200000}
        |]}}""".stripMargin.replace("\n", "")
    val tagBody =
      s"""{"data":{"ETH":{
         |"0xf1":{"entityTag":"$encWhale","hoverEntityTag":null,"tokenTag":null,"entityTags":[]},
         |"0xt1":{"entityTag":null,"hoverEntityTag":"$encBinance","tokenTag":null,"entityTags":[]}
         |}}}""".stripMargin.replace("\n", "")
    val out = SyncOnchain.enrich(
      SyncOnchain.parseTxs(Seq(txBody).toDF("body")),
      SyncOnchain.parseTags(Seq((ts, tagBody)).toDF("ts", "body")))
      .select($"from_tag", $"to_tag", $"entity_class")
      .as[(String, String, String)].head()
    assert(out == (("Mega Whale 7", "Binance Cold", "cex")))
  }
}
