package graft.flows

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Funcs
import graft.sinks.UpsertSink
import graft.time.Align

/** Kalshi prediction-market sync (reference `macro_markets/kalshi.py`):
  *
  *  - meta: markets NOT already finalized in the sink — anti-join (J6,
  *    `kalshi.py:157-164`) — upserted into `kalshi_market_meta`;
  *  - snapshot: active markets whose open interest clears a per-series
  *    prefix threshold (P17, `kalshi.py:9-54,171-178`; first matching
  *    prefix wins, default 300), with bid-derived probabilities normalized
  *    `yes/(yes+no)` under None/zero guards (P12, `kalshi.py:77-98`),
  *    appended to `kalshi_market_snapshot`.
  */
object SyncKalshi {

  /** `kalshi.py:9-54` — per-series OI thresholds (prefix → threshold). */
  val OiThresholds: Seq[(String, Int)] = Seq(
    "KXBTC" -> 1000, "KXETH" -> 1000, "KXFED" -> 500, "KXCPI" -> 500)
  val DefaultThreshold = 300

  /** status enum (`kalshi.py:56-62`). */
  val StatusMap: Map[String, Int] = Map(
    "initialized" -> 0, "active" -> 1, "inactive" -> 2,
    "closed" -> 3, "finalized" -> 4)

  def threshold(eventTicker: Column): Column =
    OiThresholds.foldRight(lit(DefaultThreshold): Column) {
      case ((prefix, t), acc) =>
        when(eventTicker.startsWith(prefix + "-"), t).otherwise(acc)
    }

  /** (yesProb, noProb) normalized with the reference's guards. */
  def normalizedProbs(yesBid: Column, noBid: Column): (Column, Column) = {
    val yes = yesBid.cast("double") / 100.0
    val no = noBid.cast("double") / 100.0
    val s = yes + no
    val yesN = when(yesBid.isNull || noBid.isNull || s === 0, lit(null))
      .otherwise(yes / s)
    val noN = when(yesBid.isNull || noBid.isNull || s === 0, lit(null))
      .otherwise(no / s)
    (yesN, noN)
  }

  /** meta rows = markets anti-joined against already-finalized tickers. */
  def nonFinalized(markets: DataFrame, finalizedTickers: DataFrame): DataFrame =
    markets.join(finalizedTickers.select(col("ticker")), Seq("ticker"), "left_anti")

  /** snapshot rows = active ∧ OI > threshold, probability-normalized. */
  def snapshot(markets: DataFrame): DataFrame = {
    val (yesN, noN) = normalizedProbs(col("yes_bid"), col("no_bid"))
    markets
      .where(col("status") === 1 &&
        coalesce(col("open_interest"), lit(0L)) > threshold(col("event_ticker")))
      .select(
        col("updated_ts").as("ts"),
        col("event_ticker"), col("ticker"),
        Align.dtString(col("updated_ts")).as("dt"),
        col("last_price"), col("yes_bid"), col("yes_ask"),
        col("no_bid"), col("no_ask"),
        col("liquidity"), col("volume"), col("open_interest"),
        round(yesN, 6).as("yes_prob"), round(noN, 6).as("no_prob"))
  }

  def run(spark: SparkSession, metaPath: String, snapshotPath: String,
      markets: DataFrame): Unit = {
    val finalized: DataFrame =
      // cold start only on a missing path — a transient read error must NOT
      // empty the finalized set (that would let finalized markets be
      // overwritten, violating the reference's rule)
      try spark.read.parquet(metaPath).where(col("status") === 4)
        .select(col("ticker"))
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("PATH_NOT_FOUND") ||
              e.getMessage.contains("Path does not exist") =>
          markets.select(col("ticker")).limit(0)
      }
    UpsertSink.upsert(spark, metaPath, nonFinalized(markets, finalized),
      Seq("ticker"), "updated_ts")
    UpsertSink.append(spark, snapshotPath, snapshot(markets))
  }
}
