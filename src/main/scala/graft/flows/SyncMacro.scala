package graft.flows

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

import graft.sinks.UpsertSink
import graft.time.Align
import graft.functions.Funcs

/** Macro-market feeds (reference `macro_markets/`):
  *
  *  - [[macroKlines]] — yfinance-shaped OHLCV download (S5,
  *    `macro_indicators.py:35-82`) → `macro_kline_raw_1m`; the reference's
  *    ThreadPool(8) parallelism is just task parallelism here.
  *  - [[cexInflow]] — OKLink inflow history (S6, `fetcher.py:58-108`) →
  *    5m-aligned netflow rows with ordered keyword entity classification of
  *    the exchange label (P13).
  */
object SyncMacro {

  private val yfSchema = DataType.fromDDL(
    "array<struct<ts long, open double, high double, low double, " +
      "close double, volume double>>")

  def macroKlines(raw: DataFrame, source: String): DataFrame =
    raw.select(col("symbol"),
      explode(from_json(col("body"), yfSchema)).as("r"))
      .select(
        col("r.ts").as("ts"),
        Align.dtString(col("r.ts")).as("dt"),
        col("symbol"),
        col("r.open").as("open"), col("r.high").as("high"),
        col("r.low").as("low"), col("r.close").as("close"),
        col("r.volume").as("volume"),
        lit(source).as("source"))

  private val inflowSchema = DataType.fromDDL(
    "struct<code string, data array<struct<timestamp long, totalValue double>>>")

  /** `fetcher.py:92-109`: inflow points → (aligned ts, exchange, netflow). */
  def cexInflow(raw: DataFrame, rules: Seq[(String, String)]): DataFrame =
    raw.select(col("exchange_label"),
      explode(from_json(col("body"), inflowSchema).getField("data")).as("r"))
      .select(
        Align.alignTo5m(col("r.timestamp")).as("ts"),
        Funcs.classifyByKeywords(col("exchange_label"), rules, "other")
          .as("exchange_class"),
        col("exchange_label"),
        Align.dtString(Align.alignTo5m(col("r.timestamp"))).as("dt"),
        col("r.totalValue").as("netflow"))

  def run(spark: SparkSession, macroPath: String, inflowPath: String,
      yfBodies: DataFrame, inflowBodies: DataFrame,
      rules: Seq[(String, String)]): Unit = {
    UpsertSink.upsert(spark, macroPath, macroKlines(yfBodies, "yfinance"),
      Seq("symbol", "ts"), "ts")
    UpsertSink.append(spark, inflowPath, cexInflow(inflowBodies, rules))
  }
}
