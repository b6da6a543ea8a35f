package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Golden-fixture tests: raw bodies are the exact samples embedded in the
  * reference docstrings (FIXTURES.md §A); expectations are the unified rows
  * its `format_item` lambdas produce, plus our uniform s→ms normalization. */
class KlineAdaptersSpec extends SparkSpec {
  import spark.implicits._

  private val M = 60000L // 1m grid

  private def raw(symbol: String, body: String): DataFrame =
    Seq((symbol, body)).toDF("symbol", "body")

  private case class Row6(ts: Long, open: String, close: String,
      volume: Option[String], quoteVolume: Option[String], count: Option[Long])

  private def collect(df: DataFrame): Seq[Row6] =
    df.orderBy("ts").select(col("ts"), col("open").cast("string"),
      col("close").cast("string"), col("volume").cast("string"),
      col("quote_volume").cast("string"), col("count"))
      .as[(Long, String, String, Option[String], Option[String], Option[Long])]
      .collect().toSeq
      .map(t => Row6(t._1, t._2, t._3, t._4, t._5, t._6))

  test("binance: positional 12-array, ms, full columns (binance/perp.py:85-100)") {
    val body =
      """[[1499040000000,"0.01634790","0.80000000","0.01575800","0.01577100",
        |"148976.11427815",1499644799999,"2434.19055334",308,
        |"1756.87402397","28.46694368","17928899.62484339"]]""".stripMargin.replace("\n", "")
    val out = collect(KlineAdapters.binance(raw("BTCUSDT", body), 1, 1, M))
    assert(out.size == 1)
    val r = out.head
    assert(r.ts == 1499040000000L) // already aligned
    assert(BigDecimal(r.open) == BigDecimal("0.0163479"))
    assert(BigDecimal(r.volume.get) == BigDecimal("148976.11427815"))
    assert(BigDecimal(r.quoteVolume.get) == BigDecimal("2434.19055334"))
    assert(r.count.contains(308L))
  }

  test("aster spot resolves to the binance shape via the registry (aster/spot.py:66-104)") {
    // sample from the aster spot docstring — binance-wire-identical:
    // 12-element positional arrays, ms epochs, quote vol at [7], count at [8]
    val body =
      """[[1499040000000,"0.01634790","0.80000000","0.01575800","0.01577100",
        |"148976.11427815",1499644799999,"2434.19055334",308,
        |"1756.87402397","28.46694368","17928899.62484339"]]""".stripMargin.replace("\n", "")
    val adapter = KlineAdapters.registry(("aster", 0))
    val r = collect(adapter(raw("BTCUSDT", body), 21, 0, M)).head
    assert(r.ts == 1499040000000L)
    assert(BigDecimal(r.open) == BigDecimal("0.0163479"))
    assert(BigDecimal(r.quoteVolume.get) == BigDecimal("2434.19055334"))
    assert(r.count.contains(308L))
  }

  test("okx: no volume columns → nulls (okx/perp.py:64-78,94-103)") {
    val body =
      """{"code":"0","msg":"","data":[["1597026383085","3.721","3.743","3.677","3.708","1"]]}"""
    val out = collect(KlineAdapters.okx(raw("BTC-USDT-SWAP", body), 2, 1, M))
    val r = out.head
    assert(r.ts == 1597026383085L / M * M) // P2 alignment applied
    assert(r.volume.isEmpty && r.quoteVolume.isEmpty && r.count.isEmpty)
    assert(BigDecimal(r.close) == BigDecimal("3.708"))
  }

  test("bybit: rows under result.list (bybit/perp.py:58-81)") {
    val body =
      """{"retCode":0,"retMsg":"OK","result":{"symbol":"BTCUSD","category":"inverse",
        |"list":[["1670608800000","17071","17073","17027","17055.5","268611","15.74462667"]]}}"""
        .stripMargin.replace("\n", "")
    val r = collect(KlineAdapters.bybit(raw("BTCUSD", body), 3, 1, M)).head
    assert(r.ts == 1670608800000L)
    assert(BigDecimal(r.quoteVolume.get) == BigDecimal("15.74462667"))
  }

  test("mexc perp: struct-of-arrays re-rowed, seconds (mexc/perp.py:60-137)") {
    val body =
      """{"success":true,"code":0,"data":{"time":[1761876000,1761876900],
        |"open":[109573.9,109006.4],"close":[109006.4,109301.5],
        |"high":[109628.1,109426.2],"low":[108953.3,109006.4],
        |"vol":[5587051.0,5739575.0],"amount":[6.106243567181E7,6.270099147368E7]}}"""
        .stripMargin.replace("\n", "")
    val out = collect(KlineAdapters.mexcPerp(raw("BTC_USDT", body), 4, 1, M))
    assert(out.size == 2)
    assert(out.head.ts == 1761876000L * 1000) // s→ms (P4)
    assert(BigDecimal(out(1).open) == BigDecimal("109006.4"))
  }

  test("kraken: result map keyed by pair; quote_volume = vol×vwap; s→ms fix (kraken/spot.py:85-125)") {
    val body =
      """{"error":[],"result":{"XBTUSDT":[[1763404440,"92536.5","92555.8","92536.1",
        |"92536.1","92539.7","0.00889648",5]]}}""".stripMargin.replace("\n", "")
    val r = collect(KlineAdapters.kraken(raw("XBTUSDT", body), 5, 0, M)).head
    // reference bug: it would keep 1763404440 (seconds) and mis-align;
    // we normalize ×1000 uniformly
    assert(r.ts == 1763404440L * 1000)
    assert(BigDecimal(r.quoteVolume.get) ==
      BigDecimal("0.00889648") * BigDecimal("92539.7"))
    assert(r.count.contains(5L))
  }

  test("gate: shuffled field order, seconds, no base volume (gate/spot.py:60-97)") {
    val body =
      """[["1539852480","971519.677","0.0021724","0.0021922","0.0021724","0.0021737","true"]]"""
    val r = collect(KlineAdapters.gate(raw("BTC_USDT", body), 6, 0, M)).head
    assert(r.ts == 1539852480L * 1000)
    assert(BigDecimal(r.open) == BigDecimal("0.0021737"))  // position 6
    assert(BigDecimal(r.close) == BigDecimal("0.0021724")) // position 3
    assert(r.volume.isEmpty)
    assert(BigDecimal(r.quoteVolume.get) == BigDecimal("971519.677"))
  }

  test("gate: 'Candlestick too long ago' error body tolerated as empty (P18)") {
    val err = """{"label":"INVALID_PARAM_VALUE","message":"Candlestick too long ago"}"""
    assert(KlineAdapters.gate(raw("X", err), 6, 0, M).count() == 0)
  }

  test("coinbase: [time, low, high, open, close, volume] order, s→ms fix (coinbase/spot.py:63-93)") {
    val body = """[[1763446800,0.03344,0.033445,0.033441,0.033442,0.08291914]]"""
    val r = collect(KlineAdapters.coinbase(raw("ADA-USD", body), 7, 0, M)).head
    assert(r.ts == 1763446800L * 1000)
    assert(BigDecimal(r.open) == BigDecimal("0.033441"))  // position 4
    assert(BigDecimal(r.close) == BigDecimal("0.033442")) // position 5
    assert(r.quoteVolume.isEmpty)
  }

  test("bitmart: ok body parses; 'no data' variant → empty (bitmart/spot.py:58-90)") {
    val ok = """{"code":1000,"data":[["1573689600","0.021","0.022","0.020","0.0215","100","2.1"]]}"""
    val out = collect(KlineAdapters.bitmart(raw("BTC_USDT", ok), 8, 0, M))
    assert(out.head.ts == 1573689600L * 1000)
    val err = """{"code":50004,"message":"no data"}"""
    assert(KlineAdapters.bitmart(raw("X", err), 8, 0, M).count() == 0)
  }

  test("woox: keyed row objects under data.rows (woox/spot.py:58-110)") {
    val body =
      """{"success":true,"data":{"rows":[{"open":66166.23,"close":66124.56,
        |"low":66038.06,"high":66176.97,"volume":23.45528526,"amount":1550436.21725288,
        |"symbol":"SPOT_BTC_USDT","type":"1m","start_timestamp":1636388220000,
        |"end_timestamp":1636388280000}],"meta":{"total":67377}}}"""
        .stripMargin.replace("\n", "")
    val r = collect(KlineAdapters.woox(raw("SPOT_BTC_USDT", body), 9, 0, M)).head
    assert(r.ts == 1636388220000L)
    assert(BigDecimal(r.quoteVolume.get) == BigDecimal("1550436.21725288"))
  }

  test("registry covers all 13 exchanges × inst types from CLIENT_MAP") {
    assert(KlineAdapters.registry.size == 21)
    assert(KlineAdapters.registry.contains(("binance", 0)))
    assert(KlineAdapters.registry.contains(("aster", 0)))
    assert(KlineAdapters.registry.contains(("aster", 1)))
    assert(KlineAdapters.registry.contains(("weex", 1)))
  }

  test("unified schema column names and nullability match FIXTURES.md §B") {
    val names = KlineAdapters.schema.fields.map(_.name).toSeq
    assert(names == Seq("exchange_id", "inst_type", "symbol", "ts", "dt",
      "open", "high", "low", "close", "volume", "quote_volume", "count"))
  }
}
