package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Source-side kline normalization (SURVEY §2.1 S2/S3, §2.3 P1/P2/P4/P5).
  *
  * Each exchange returns a different raw JSON shape (positional arrays, keyed
  * objects, struct-of-arrays, nested result maps); every adapter maps one
  * shape onto the single nullable unified schema and applies, uniformly:
  *   - P4 time-unit normalization (seconds-based APIs × 1000) — including
  *     kraken/coinbase, where the reference forgets the conversion
  *     (`kraken/spot.py:119`, `coinbase/spot.py:88` — documented divergence);
  *   - P2 floor-to-interval alignment of the timestamp;
  *   - P5 `dt` wall-clock derivation (UTC);
  *   - DECIMAL(38,18) price/volume types (string API values round-trip).
  *
  * Input contract: a DataFrame with `symbol STRING, body STRING` — one raw
  * response body per row, exactly what a paginated fetch task yields. All
  * parsing is `from_json` + `explode`: pure codegen'd map work, no shuffle;
  * at 100 TB the fetch partitioning (by exchange/symbol) is preserved through
  * normalization.
  *
  * Raw shapes documented in the reference (citations per adapter):
  * binance `binance/perp.py:85-100`, okx `okx/perp.py:64-78`,
  * bybit `bybit/perp.py:58-81`, bitget `bitget/perp.py:59-86`,
  * mexc `mexc/perp.py:60-113`, kraken `kraken/spot.py:85-105`,
  * gate `gate/spot.py:60-72`, coinbase `coinbase/spot.py:63-72`,
  * bitmart `bitmart/spot.py:58-74,85-90`, woox `woox/spot.py:58-83`.
  */
object KlineAdapters {

  /** Unified at-rest kline schema (FIXTURES.md §B). */
  val schema: StructType = StructType(Seq(
    StructField("exchange_id", ShortType, nullable = false),
    StructField("inst_type", ByteType, nullable = false),
    StructField("symbol", StringType, nullable = false),
    StructField("ts", LongType, nullable = false),
    StructField("dt", TimestampType, nullable = false),
    StructField("open", DecimalType(38, 18), nullable = true),
    StructField("high", DecimalType(38, 18), nullable = true),
    StructField("low", DecimalType(38, 18), nullable = true),
    StructField("close", DecimalType(38, 18), nullable = true),
    StructField("volume", DecimalType(38, 18), nullable = true),
    StructField("quote_volume", DecimalType(38, 18), nullable = true),
    StructField("count", LongType, nullable = true)))

  private val dec = DecimalType(38, 18)

  /** Finishing pass shared by every adapter: unit-normalize, align, derive
    * dt, cast, project to the unified column order. `tsRaw` must be epoch in
    * `timeUnit` ("s" or "ms"). */
  private def finish(df: DataFrame, exchangeId: Int, instType: Int,
      ivlMs: Long, timeUnit: String, tsRaw: Column,
      open: Column, high: Column, low: Column, close: Column,
      volume: Column, quoteVolume: Column, count: Column): DataFrame = {
    val tsMs = if (timeUnit == "s") tsRaw.cast("long") * 1000L
               else tsRaw.cast("long")
    val aligned = (tsMs / ivlMs).cast("long") * ivlMs
    df.select(
      lit(exchangeId).cast("short").as("exchange_id"),
      lit(instType).cast("byte").as("inst_type"),
      col("symbol"),
      aligned.as("ts"),
      timestamp_millis(aligned).as("dt"),
      open.cast(dec).as("open"),
      high.cast(dec).as("high"),
      low.cast(dec).as("low"),
      close.cast(dec).as("close"),
      volume.cast(dec).as("volume"),
      quoteVolume.cast(dec).as("quote_volume"),
      count.cast("long").as("count"))
  }

  private val nul = lit(null)

  private def arr(body: Column, ddl: String): Column =
    from_json(body, org.apache.spark.sql.types.DataType.fromDDL(ddl))

  /** binance perp/spot: top-level array of 12-element positional arrays,
    * epoch-ms, full volume/quote/count (`binance/perp.py:85-119`). */
  def binance(raw: DataFrame, exchangeId: Int, instType: Int,
      ivlMs: Long): DataFrame = {
    val rows = raw.select(col("symbol"),
      explode(arr(col("body"), "array<array<string>>")).as("r"))
    finish(rows, exchangeId, instType, ivlMs, "ms", element_at(col("r"), 1),
      element_at(col("r"), 2), element_at(col("r"), 3),
      element_at(col("r"), 4), element_at(col("r"), 5),
      element_at(col("r"), 6), element_at(col("r"), 8),
      element_at(col("r"), 9))
  }

  /** okx: `{code, msg, data: [[ts,o,h,l,c,confirm]]}` — NO volumes
    * (`okx/perp.py:64-103`); nullable columns stay null. */
  def okx(raw: DataFrame, exchangeId: Int, instType: Int,
      ivlMs: Long): DataFrame = {
    val rows = raw.select(col("symbol"),
      explode(arr(col("body"),
        "struct<code string, msg string, data array<array<string>>>")
        .getField("data")).as("r"))
    finish(rows, exchangeId, instType, ivlMs, "ms", element_at(col("r"), 1),
      element_at(col("r"), 2), element_at(col("r"), 3),
      element_at(col("r"), 4), element_at(col("r"), 5), nul, nul, nul)
  }

  /** bybit: rows nested at `result.list` (`bybit/perp.py:58-109`). */
  def bybit(raw: DataFrame, exchangeId: Int, instType: Int,
      ivlMs: Long): DataFrame = {
    val rows = raw.select(col("symbol"),
      explode(arr(col("body"),
        "struct<retCode string, result struct<symbol string, category string, list array<array<string>>>>")
        .getField("result").getField("list")).as("r"))
    finish(rows, exchangeId, instType, ivlMs, "ms", element_at(col("r"), 1),
      element_at(col("r"), 2), element_at(col("r"), 3),
      element_at(col("r"), 4), element_at(col("r"), 5),
      element_at(col("r"), 6), element_at(col("r"), 7), nul)
  }

  /** bitget: `{code, msg, data: [[ts,o,h,l,c,vol,quoteVol]]}`, epoch-ms
    * (`bitget/perp.py:59-86`). */
  def bitget(raw: DataFrame, exchangeId: Int, instType: Int,
      ivlMs: Long): DataFrame = {
    val rows = raw.select(col("symbol"),
      explode(arr(col("body"),
        "struct<code string, msg string, data array<array<string>>>")
        .getField("data")).as("r"))
    finish(rows, exchangeId, instType, ivlMs, "ms", element_at(col("r"), 1),
      element_at(col("r"), 2), element_at(col("r"), 3),
      element_at(col("r"), 4), element_at(col("r"), 5),
      element_at(col("r"), 6), element_at(col("r"), 7), nul)
  }

  /** mexc perp: struct-of-arrays re-rowed via arrays_zip (the reference's
    * `zip`, `mexc/perp.py:60-137`); epoch-seconds. */
  def mexcPerp(raw: DataFrame, exchangeId: Int, instType: Int,
      ivlMs: Long): DataFrame = {
    val d = arr(col("body"),
      "struct<success boolean, code string, data struct<" +
        "time array<string>, open array<string>, high array<string>, " +
        "low array<string>, close array<string>, vol array<string>, " +
        "amount array<string>>>").getField("data")
    val rows = raw.select(col("symbol"),
      explode(arrays_zip(d.getField("time"), d.getField("open"),
        d.getField("high"), d.getField("low"), d.getField("close"),
        d.getField("vol"), d.getField("amount"))).as("r"))
    finish(rows, exchangeId, instType, ivlMs, "s", col("r.time"),
      col("r.open"), col("r.high"), col("r.low"), col("r.close"),
      col("r.vol"), col("r.amount"), nul)
  }

  /** kraken: rows under `result.<PAIR>` (a map keyed by pair name);
    * quote_volume derived as volume × vwap (`kraken/spot.py:85-125`).
    * Epoch-seconds — normalized ×1000 here (reference bug: it skips the
    * conversion, landing on a wrong grid; we diverge deliberately). */
  def kraken(raw: DataFrame, exchangeId: Int, instType: Int,
      ivlMs: Long): DataFrame = {
    val parsed = arr(col("body"),
      "struct<error array<string>, result map<string, array<array<string>>>>")
    val rows = raw.select(col("symbol"),
      explode(element_at(parsed.getField("result"), col("symbol"))).as("r"))
    finish(rows, exchangeId, instType, ivlMs, "s", element_at(col("r"), 1),
      element_at(col("r"), 2), element_at(col("r"), 3),
      element_at(col("r"), 4), element_at(col("r"), 5),
      element_at(col("r"), 7),
      // multiply at (18,9) so the product precision fits: (38,18)×(38,18)
      // would overflow 38 digits and Spark truncates the scale
      element_at(col("r"), 7).cast(DecimalType(18, 9)) *
        element_at(col("r"), 6).cast(DecimalType(18, 9)),
      element_at(col("r"), 8))
  }

  /** gate spot: positional but SHUFFLED field order
    * `[tsSec, quoteVol, close, high, low, open, closed]`, seconds, no base
    * volume (`gate/spot.py:60-97`); "Candlestick too long ago" error payload
    * tolerated as empty (P18). */
  def gate(raw: DataFrame, exchangeId: Int, instType: Int,
      ivlMs: Long): DataFrame = {
    val msg = arr(col("body"), "struct<message string>").getField("message")
    val ok = raw.where(msg.isNull || !msg.contains("Candlestick too long ago"))
    val rows = ok.select(col("symbol"),
      explode(arr(col("body"), "array<array<string>>")).as("r"))
    finish(rows, exchangeId, instType, ivlMs, "s", element_at(col("r"), 1),
      element_at(col("r"), 6), element_at(col("r"), 4),
      element_at(col("r"), 5), element_at(col("r"), 3), nul,
      element_at(col("r"), 2), nul)
  }

  /** coinbase: `[[timeSec, low, high, open, close, volume]]` — note l/h/o/c
    * order; no quote volume (`coinbase/spot.py:63-93`). Seconds normalized
    * (reference bug as with kraken). */
  def coinbase(raw: DataFrame, exchangeId: Int, instType: Int,
      ivlMs: Long): DataFrame = {
    val rows = raw.select(col("symbol"),
      explode(arr(col("body"), "array<array<string>>")).as("r"))
    finish(rows, exchangeId, instType, ivlMs, "s", element_at(col("r"), 1),
      element_at(col("r"), 4), element_at(col("r"), 3),
      element_at(col("r"), 2), element_at(col("r"), 5),
      element_at(col("r"), 6), nul, nul)
  }

  /** bitmart: `{code, message, data: [[tSec,o,h,l,c,v,qv]]}`; the "no data"
    * error variant yields an empty set (P18, `bitmart/spot.py:58-90`). */
  def bitmart(raw: DataFrame, exchangeId: Int, instType: Int,
      ivlMs: Long): DataFrame = {
    val parsed = arr(col("body"),
      "struct<code string, message string, data array<array<string>>>")
    val rows = raw.select(col("symbol"),
      explode(coalesce(parsed.getField("data"),
        array().cast("array<array<string>>"))).as("r"))
    finish(rows, exchangeId, instType, ivlMs, "s", element_at(col("r"), 1),
      element_at(col("r"), 2), element_at(col("r"), 3),
      element_at(col("r"), 4), element_at(col("r"), 5),
      element_at(col("r"), 6), element_at(col("r"), 7), nul)
  }

  /** woox: keyed row objects under `data.rows`, epoch-ms
    * (`woox/spot.py:58-110`). */
  def woox(raw: DataFrame, exchangeId: Int, instType: Int,
      ivlMs: Long): DataFrame = {
    val rows = raw.select(col("symbol"),
      explode(arr(col("body"),
        "struct<success boolean, data struct<rows array<struct<" +
          "open string, close string, low string, high string, " +
          "volume string, amount string, symbol string, type string, " +
          "start_timestamp string, end_timestamp string>>>>")
        .getField("data").getField("rows")).as("r"))
    finish(rows, exchangeId, instType, ivlMs, "ms", col("r.start_timestamp"),
      col("r.open"), col("r.high"), col("r.low"), col("r.close"),
      col("r.volume"), col("r.amount"), nul)
  }

  /** CLIENT_MAP analogue (`flows/sync_klines.py:62-82`): (exchange,
    * inst_type) → adapter. Exchanges sharing a response shape share the
    * adapter, like the reference's spot/perp class pairs. */
  val registry: Map[(String, Int), (DataFrame, Int, Int, Long) => DataFrame] =
    Map(
      ("binance", 0) -> (binance _), ("binance", 1) -> (binance _),
      ("okx", 0) -> (okx _), ("okx", 1) -> (okx _),
      ("bybit", 0) -> (bybit _), ("bybit", 1) -> (bybit _),
      ("bitget", 0) -> (bitget _), ("bitget", 1) -> (bitget _),
      ("mexc", 1) -> (mexcPerp _), ("mexc", 0) -> (binance _),
      ("kraken", 0) -> (kraken _),
      ("gate", 0) -> (gate _), ("gate", 1) -> (gate _),
      ("coinbase", 0) -> (coinbase _),
      ("bitmart", 0) -> (bitmart _), ("bitmart", 1) -> (bitmart _),
      ("woox", 0) -> (woox _), ("woox", 1) -> (woox _),
      // aster spot+perp are binance-shaped (`aster/spot.py:66-104` — same
      // 12-element positional arrays, ms epochs, volume/quote/count slots)
      ("aster", 0) -> (binance _), ("aster", 1) -> (binance _),
      ("weex", 1) -> (bitget _))
}
