package graft.flows

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

import graft.time.Align
import graft.sinks.UpsertSink

/** `sync_long_short_ratio` (SURVEY §3.2; reference
  * `flows/sync_long_short_ratio.py` + `binance/perp.py:132-185` +
  * `okx/perp.py:116-190`): three ratio endpoints per (exchange, symbol) →
  * 5-minute alignment (P3) → timestamp-keyed full-outer 3-way merge (J3) →
  * `market_sentiment_*` rows. The reference's dict-union merge becomes two
  * `full_outer` joins; missing sides stay NULL (bybit never fills
  * top_trader_acc_*, `bybit/perp.py:171-187`).
  */
object SyncSentiment {

  private val endpointSchema = DataType.fromDDL(
    "array<struct<symbol string, longAccount string, shortAccount string, timestamp long>>")

  /** One endpoint body → (ts aligned to 5m, long, short) series. */
  def series(raw: DataFrame, longName: String, shortName: String): DataFrame =
    raw.select(col("symbol"),
      explode(from_json(col("body"), endpointSchema)).as("r"))
      .select(col("symbol"),
        Align.alignTo5m(col("r.timestamp")).as("ts"),
        col("r.longAccount").cast("double").as(longName),
        col("r.shortAccount").cast("double").as(shortName))

  /** J3: the 3-way ts-keyed full-outer merge. */
  def merge(pos: DataFrame, acc: DataFrame, retail: DataFrame,
      exchangeId: Int, instType: Int): DataFrame =
    pos.join(acc, Seq("symbol", "ts"), "full_outer")
      .join(retail, Seq("symbol", "ts"), "full_outer")
      .select(
        col("ts"),
        Align.dtString(col("ts")).as("dt"),
        col("symbol"),
        lit(exchangeId).cast("short").as("exchange_id"),
        lit(instType).cast("byte").as("inst_type"),
        col("top_trader_pos_long"), col("top_trader_pos_short"),
        col("top_trader_acc_long"), col("top_trader_acc_short"),
        col("retail_acc_long"), col("retail_acc_short"),
        current_timestamp().as("updated_at"))

  /** OKX variant: single ratio r per endpoint, decomposed r/(1+r) and
    * 1-r/(1+r) in exact decimal (P10, `okx/perp.py:116-121`). */
  def okxSeries(raw: DataFrame, longName: String, shortName: String): DataFrame = {
    val schema = DataType.fromDDL("struct<data array<array<string>>>")
    val rows = raw.select(col("symbol"),
      explode(from_json(col("body"), schema).getField("data")).as("r"))
    val (l, s) = graft.functions.Funcs.ratioSplit(element_at(col("r"), 2))
    rows.select(col("symbol"),
      Align.alignTo5m(element_at(col("r"), 1)).as("ts"),
      l.cast("double").as(longName), s.cast("double").as(shortName))
  }

  def run(spark: SparkSession, sinkPath: String, pos: DataFrame,
      acc: DataFrame, retail: DataFrame, exchangeId: Int,
      instType: Int): Unit = {
    val merged = merge(
      series(pos, "top_trader_pos_long", "top_trader_pos_short"),
      series(acc, "top_trader_acc_long", "top_trader_acc_short"),
      series(retail, "retail_acc_long", "retail_acc_short"),
      exchangeId, instType)
    UpsertSink.upsert(spark, sinkPath, merged,
      Seq("exchange_id", "inst_type", "symbol", "ts"), "ts")
  }
}
