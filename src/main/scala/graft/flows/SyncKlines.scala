package graft.flows

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.gaps.GapEngine
import graft.sinks.UpsertSink

/** The flagship flow (SURVEY §3.1 `sync_klines`), restated as ONE set-
  * oriented Spark job instead of the reference's per-symbol loop:
  *
  * reference (`flows/sync_klines.py:103-121` + `_base_.py:124-298`):
  *   per symbol: MAX(dt) round-trip → LAG gap SQL → paginated REST loop →
  *   per-batch Stream Load — O(symbols) scheduler round-trips.
  *
  * here:
  *   1. active symbol dim (J1)                        — one broadcast join
  *   2. sink extents per key (A1 generalized)         — one groupBy
  *   3. gap plan W1∪W2→W3 for EVERY key              — one windowed job
  *   4. fetch windows (S3 pagination, `explode(sequence)`) — map-side
  *   5. fetch: injected `(key, window) → raw body` — in production a
  *      rate-limited REST task per partition (partitioned BY EXCHANGE so one
  *      task owns one exchange's request budget); in tests a fixture lookup
  *   6. adapter normalization (P1/P2/P4/P5)           — map-side
  *   7. keyed upsert merge (K1 semantics)             — one shuffle
  *
  * Scale: stages 3-7 shuffle only on the key/band columns; nothing is
  * collected to the driver; symbol count raises parallelism, not rounds.
  */
object SyncKlines {

  val KeyCols = Seq("exchange_id", "inst_type", "symbol")

  /** Work list: which (key, request window) pairs need fetching. */
  def fetchPlan(spark: SparkSession, sinkPath: String, activeKeys: DataFrame,
      ivlMs: Long, startMs: Long, endMs: Long, limit: Int,
      mergeWithinMs: Long): DataFrame = {
    val existing: DataFrame =
      // only a missing path is a cold start; any other failure (corrupt
      // files, permissions) must surface, not silently replan a full refetch
      try spark.read.parquet(sinkPath).select(
        (KeyCols.map(col) :+ col("ts")): _*)
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("PATH_NOT_FOUND") ||
              e.getMessage.contains("Path does not exist") =>
          activeKeys.select(KeyCols.map(col): _*).limit(0)
            .withColumn("ts", lit(0L))
      }
    val plan = GapEngine.gapPlan(existing, activeKeys, KeyCols, "ts", ivlMs,
      startMs, endMs, mergeWithinMs)
    GapEngine.fetchWindows(plan, KeyCols, ivlMs, limit)
  }

  /** Full sync pass: plan → fetch (injected) → normalize → merge.
    * `fetch` turns each request-window row into a raw response body — the
    * seam where the REST client sits. It runs inside `mapPartitions` after a
    * repartition by exchange, so each exchange's rate budget is owned by one
    * task (SURVEY §4 parallelism row). */
  def run(spark: SparkSession, sinkPath: String, activeKeys: DataFrame,
      exchange: String, exchangeId: Int, instType: Int, ivlMs: Long,
      startMs: Long, endMs: Long, limit: Int, mergeWithinMs: Long)(
      fetch: (String, Long, Long) => String): Unit = {
    import spark.implicits._
    val windows = fetchPlan(spark, sinkPath, activeKeys, ivlMs, startMs,
      endMs, limit, mergeWithinMs)
    // Per-window failure isolation (reference `flows/sync_klines.py:97-100`:
    // try/except per symbol, the loop continues): one window's exhausted
    // retries must not fail the whole sync. A failed window emits nothing —
    // which means its range is STILL A GAP, so the next run's gap scan
    // re-plans exactly the missing windows. Failures are counted on an
    // accumulator and logged after the merge; silent loss is not an option.
    val failed = spark.sparkContext.longAccumulator("graft.fetch_failures")
    val raw = windows
      .repartition(col("exchange_id"))
      .select(col("symbol"), col("req_start"), col("req_end"))
      .as[(String, Long, Long)]
      .mapPartitions { it =>
        // one task = one exchange's sequential, rate-limited fetch loop
        it.flatMap { case (sym, s, e) =>
          try Iterator.single((sym, fetch(sym, s, e)))
          catch {
            case scala.util.control.NonFatal(ex) =>
              failed.add(1)
              org.slf4j.LoggerFactory.getLogger("graft.SyncKlines").warn(
                s"fetch failed for $sym [$s,$e]; window stays a gap: $ex")
              Iterator.empty
          }
        }
      }
      .toDF("symbol", "body")
      // pin the responses: the sink's empty-skip probe and the write are two
      // actions over this subtree, and lineage re-execution must not hit the
      // exchange twice per window (fetches are paid, rate-limited work)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val adapter = graft.sources.KlineAdapters.registry((exchange, instType))
      val rows = adapter(raw, exchangeId, instType, ivlMs)
        .where(col("ts").between(startMs, endMs))
        // date-partition the fact table: a sync pass rewrites only the days
        // it touched, not the table (the 100 TB layout lever)
        .withColumn("dt_date", date_format(col("dt"), "yyyy-MM-dd"))
      UpsertSink.upsert(spark, sinkPath, rows,
        KeyCols :+ "ts", "ts", partitionCol = Some("dt_date"))
      if (failed.value > 0)
        org.slf4j.LoggerFactory.getLogger("graft.SyncKlines").warn(
          s"sync pass completed with ${failed.value} failed fetch " +
            "window(s); their ranges remain gaps and re-plan next run")
    } finally raw.unpersist(false)
  }

  /** A1: per-key watermark over the sink (one job for all keys). */
  def watermarks(spark: SparkSession, sinkPath: String): DataFrame =
    spark.read.parquet(sinkPath)
      .groupBy(KeyCols.map(col): _*)
      .agg(max("ts").as("max_ts"), count(lit(1)).as("n_rows"))
}
