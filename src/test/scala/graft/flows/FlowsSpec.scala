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
