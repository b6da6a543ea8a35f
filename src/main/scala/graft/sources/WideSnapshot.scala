package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's widest fact table — `market_snapshot`, 70 columns
  * (reference `restore_market_snapshot_from_s3.py:60-83`; FIXTURES.md
  * §market_snapshot): 5 key/time columns plus 65 numeric
  * depth/liquidation/orderbook features.
  *
  * What matters about a wide fact at 100 TB is that a query touching a
  * handful of columns must prune the parquet scan to exactly those columns
  * (ReadSchema) — a scan reading 70 columns for a 7-column aggregate is a
  * 10× I/O regression a narrow test table can never expose. This object
  * derives the 70-column fixture deterministically from `events` (pure
  * row-wise column math — no shuffle, exact IEEE doubles reproducible in
  * the DuckDB oracle) and persists it as parquet once per scale factor.
  */
object WideSnapshot {

  /** the 65 double feature columns, in file order (reference order). */
  val doubleCols: Seq[String] = Seq(
    "mark_price", "index_price", "last_price", "funding_rate",
    "next_funding_time", "open_interest", "volume", "quote_volume", "trades",
    "taker_buy_vol", "taker_sell_vol", "taker_buy_notional",
    "taker_sell_notional",
    "long_liquidation_volume", "long_liquidation_notional",
    "long_liquidation_count",
    "short_liquidation_volume", "short_liquidation_notional",
    "short_liquidation_count",
    "max_long_liquidation_notional", "max_short_liquidation_notional",
    "min_liquidation_price", "max_liquidation_price",
    "bid_p100", "bid_p99", "bid_p98", "bid_p95", "bid_p90", "bid_p75",
    "bid_p50", "bid_p25", "bid_p10", "bid_p5", "bid_p2", "bid_p1", "bid_p0",
    "ask_p0", "ask_p1", "ask_p2", "ask_p5", "ask_p10", "ask_p25", "ask_p50",
    "ask_p75", "ask_p100",
    "bid_total_qty", "top_10bids_level", "ask_total_qty", "top_10asks_level",
    "depth_bid_1bps", "depth_bid_3bps", "depth_bid_5bps", "depth_bid_10bps",
    "depth_bid_20bps",
    "depth_ask_1bps", "depth_ask_3bps", "depth_ask_5bps", "depth_ask_10bps",
    "depth_ask_20bps",
    "curvature_short_bid", "curvature_long_bid", "curvature_short_ask",
    "curvature_long_ask", "worker_id", "version")

  /** feature i = value·(i+2) + (event_id mod (i+3)) — one multiply and one
    * small-int add per cell: IEEE-identical in any engine, distinct per
    * column. */
  private def formula(i: Int): Column =
    col("value") * lit((i + 2).toDouble) +
      (col("event_id") % (i + 3)).cast("double")

  /** the same cell formula rendered as DuckDB SQL (for oracle twins). */
  def formulaSql(name: String): String = {
    val i = doubleCols.indexOf(name)
    require(i >= 0, s"unknown snapshot column $name")
    s"(value * ${i + 2}.0 + CAST(event_id % ${i + 3} AS DOUBLE))"
  }

  /** one 70-column snapshot row per event row. */
  def derive(events: DataFrame): DataFrame =
    events.select(
      col("ts_ms").as("ts") +:
        concat(lit("SYM"), pmod(col("user_id"), lit(40))).as("symbol") +:
        pmod(col("user_id"), lit(5)).cast("smallint").as("exchange_id") +:
        pmod(col("user_id"), lit(2)).cast("tinyint").as("inst_type") +:
        timestamp_millis(col("ts_ms")).as("dt") +:
        doubleCols.zipWithIndex.map { case (n, i) => formula(i).as(n) }: _*)

  /** Write-once fixture for an sf dir (marker: parquet _SUCCESS). The
    * fixture is derived data — parking it under tmp keeps the read-only
    * testdata dir untouched.
    *
    * Concurrency-safe: the fixture is staged under a process-unique dir and
    * atomically renamed into place (the same crash-safe swap the upsert
    * sink uses). Concurrent sessions each build a staging copy and exactly
    * one rename wins; losers discard theirs and read the winner's. A reader
    * can never observe a half-written fixture, because the final path only
    * ever appears via the rename. */
  def ensure(spark: SparkSession, sfDir: String): String = {
    val key = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    val base = new java.io.File(sys.props("java.io.tmpdir"))
    val path = new java.io.File(base, s"graft_snapshot_v1_$key")
    def complete(f: java.io.File) = new java.io.File(f, "_SUCCESS").exists()
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(deleteRec))
      f.delete(); ()
    }
    if (!complete(path)) {
      val staging = new java.io.File(base,
        s"graft_snapshot_v1_${key}.tmp_${java.util.UUID.randomUUID}")
      derive(graft.Tables.events(spark, sfDir))
        .write.mode("overwrite").parquet(staging.toString)
      if (!staging.renameTo(path)) {
        // target already exists: either a stale half-write from a crashed
        // legacy run (no _SUCCESS — replace it) or a concurrent winner
        if (!complete(path)) {
          deleteRec(path)
          if (!staging.renameTo(path)) deleteRec(staging)
        } else deleteRec(staging)
        require(complete(path),
          s"snapshot fixture at $path incomplete after rename race")
      }
    }
    path.toString
  }
}
