package graft.flows

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

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

  private val pageSchema = DataType.fromDDL(
    "struct<markets: array<struct<event_ticker string, ticker string, " +
      "status string, last_price int, yes_bid int, yes_ask int, no_bid int, " +
      "no_ask int, liquidity bigint, volume bigint, open_interest bigint, " +
      "custom_strike string, rules_primary string, close_time string, " +
      "expiration_time string>>, cursor string>")

  /** Cursor-paginated market fetch (`kalshi.py:115-152`) replayed over
    * RECORDED pages from [[graft.sources.RestSource]] (file
    * `<series>#<page>.json` = the response at hop `page` of the cursor
    * chain; the production variant records pages the same way as it walks
    * the live cursor). The reference's sequential loop becomes a per-series
    * WINDOW over the page index — one shuffle by series for every series at
    * once, instead of a driver-side walk per series:
    *
    *  - zero-`volume` markets are dropped (`if market.get("volume")`);
    *  - an EMPTY page stops the walk before contributing;
    *  - a page whose response carries no cursor is the last one;
    *  - the walk stops once the CUMULATIVE kept-market count exceeds `cap`
    *    — checked after appending, so the capping page itself lands in
    *    full (reference `kalshi.py:146-147`);
    *  - at most `maxPages` hops (`for _ in range(20)`).
    */
  def paginatedMarkets(pages: DataFrame, updatedTs: Long,
      maxPages: Int = 20, cap: Int = 100): DataFrame = {
    val parsed = pages
      .select(split(col("symbol"), "#").as("sp"),
        from_json(col("body"), pageSchema).as("p"))
      .select(element_at(col("sp"), 1).as("series"),
        element_at(col("sp"), 2).cast("int").as("page"),
        coalesce(col("p.markets"), array()).as("markets"),
        coalesce(col("p.cursor"), lit("")).as("cursor"))
    val keptN = size(filter(col("markets"),
      m => coalesce(m.getField("volume"), lit(0L)) =!= 0L))
    val wCum = Window.partitionBy(col("series")).orderBy(col("page"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wPrev = Window.partitionBy(col("series")).orderBy(col("page"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cont = (size(col("markets")) > 0 && col("cum_kept") <= cap &&
      col("cursor") =!= "").cast("int")
    val statusCode = StatusMap.foldLeft(lit(null).cast("int")) {
      case (acc, (name, code)) =>
        when(col("m.status") === name, code).otherwise(acc)
    }
    parsed
      .withColumn("cum_kept", sum(keptN).over(wCum))
      .withColumn("cont", cont)
      .withColumn("eligible", col("page") < maxPages &&
        coalesce(min(col("cont")).over(wPrev), lit(1)) === 1)
      .where(col("eligible"))
      .select(col("series"), explode(col("markets")).as("m"))
      .where(coalesce(col("m.volume"), lit(0L)) =!= 0L)
      .select(lit(updatedTs).as("updated_ts"),
        col("m.event_ticker").as("event_ticker"),
        col("m.ticker").as("ticker"),
        statusCode.as("status"),
        col("m.last_price").as("last_price"),
        col("m.yes_bid").as("yes_bid"), col("m.yes_ask").as("yes_ask"),
        col("m.no_bid").as("no_bid"), col("m.no_ask").as("no_ask"),
        col("m.liquidity").as("liquidity"), col("m.volume").as("volume"),
        col("m.open_interest").as("open_interest"),
        col("m.custom_strike").as("custom_strike"),
        col("m.rules_primary").as("rules_primary"),
        col("m.close_time").as("close_time"),
        col("m.expiration_time").as("expiration_time"))
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
