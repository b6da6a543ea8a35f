package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable OHLCV candle algebra, shared by the w17/w18/w19 queries: a
  * candle that carries its FIRST/LAST tick keys (f_ts, f_eid, l_ts,
  * l_eid) is a mergeable aggregate — a merged candle's open/close are
  * elected by min/max over (first/last key, value) structs, so coarser
  * grains (w18's 1m→1h→1d cascade) and incremental micro-batch partials
  * (w19's streaming store) compose by the same ASSOCIATIVE merge, each
  * provably equal to a direct rollup of the raw ticks (the DuckDB twins
  * recompute from raw). This is the a21 mergeable-sketch discipline
  * applied to candles: at 100 TB the day query reads the 1m candle
  * store — three orders of magnitude smaller than the tick corpus — and
  * a streaming ingest merges per-batch partials without read-modify-write.
  * Volume sums in integer micro-units (the cross-engine rule: never
  * order-dependent double addition); O/H/L/C are SELECTIONS of stored
  * doubles. Every level is a pure two-phase hash agg with map-side
  * partials and ZERO window sorts.
  *
  * Reference seam: codeluxer/clx-etl populates its three
  * `kline_{1m,1h,1d}` tables by fetching each interval separately over
  * HTTP (`src/exchanges/_base_.py:311`, `constants.py:16-19`); here the
  * finest grain is the only ingested one.
  */
object Candles {

  /** Raw ticks (series, event_id, ts_ms, value) → unit-grain candles
    * carrying the merge keys. */
  def partials(ticks: DataFrame, unitMs: Long): DataFrame = ticks
    .withColumn("bucket_ms", expr(s"(ts_ms div $unitMs) * $unitMs"))
    .groupBy(col("series"), col("bucket_ms"))
    .agg(
      min(struct(col("ts_ms"), col("event_id"))).as("fk"),
      max(struct(col("ts_ms"), col("event_id"))).as("lk"),
      min(struct(col("ts_ms"), col("event_id"), col("value")))
        .getField("value").as("open"),
      max(struct(col("ts_ms"), col("event_id"), col("value")))
        .getField("value").as("close"),
      max(col("value")).as("high"),
      min(col("value")).as("low"),
      sum(expr("cast(floor(value * 1000000 + 0.5) as bigint)"))
        .as("volume_micro"),
      count(lit(1)).as("n_trades"))
    .select(col("series"), col("bucket_ms"),
      col("fk.ts_ms").as("f_ts"), col("fk.event_id").as("f_eid"),
      col("lk.ts_ms").as("l_ts"), col("lk.event_id").as("l_eid"),
      col("open"), col("close"), col("high"), col("low"),
      col("volume_micro"), col("n_trades"))

  /** Candle MERGE one grain up — reads only candles, never raw ticks.
    * With `unitMs` equal to the candles' own grain this merges
    * same-bucket partials (w19's cross-batch rollup); with a coarser
    * unit it builds the next cascade level (w18). */
  def merge(fine: DataFrame, unitMs: Long): DataFrame = fine
    .withColumn("parent_ms", expr(s"(bucket_ms div $unitMs) * $unitMs"))
    .groupBy(col("series"), col("parent_ms"))
    .agg(
      min(struct(col("f_ts"), col("f_eid"))).as("fk"),
      max(struct(col("l_ts"), col("l_eid"))).as("lk"),
      min(struct(col("f_ts"), col("f_eid"), col("open")))
        .getField("open").as("open"),
      max(struct(col("l_ts"), col("l_eid"), col("close")))
        .getField("close").as("close"),
      max(col("high")).as("high"),
      min(col("low")).as("low"),
      sum(col("volume_micro")).as("volume_micro"),
      sum(col("n_trades")).as("n_trades"))
    .select(col("series"), col("parent_ms").as("bucket_ms"),
      col("fk.f_ts").as("f_ts"), col("fk.f_eid").as("f_eid"),
      col("lk.l_ts").as("l_ts"), col("lk.l_eid").as("l_eid"),
      col("open"), col("close"), col("high"), col("low"),
      col("volume_micro"), col("n_trades"))
}
