package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Candles

class CandleStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ticks = Seq(
    // (event_id, ts_ms, series, value) — two minutes, one hour, with the
    // same minute fed by DIFFERENT batches under event_id % 3 slicing
    (7L, 1000L, "t", 10.0),
    (3L, 1000L, "t", 20.0), // same ts as eid 7: eid tiebreak opens
    (1L, 5000L, "t", 30.0),
    (9L, 61000L, "t", 5.0),
    (4L, 62000L, "t", 40.0))
    .toDF("event_id", "ts_ms", "series", "value")

  private def hourCandles(store: String) = {
    val partials = spark.read.parquet(store).drop("batch")
    Candles.merge(Candles.merge(partials, 60000L), 3600000L)
      .select($"series", $"bucket_ms", $"open", $"close", $"high", $"low",
        $"volume_micro", $"n_trades")
      .as[(String, Long, Double, Double, Double, Double, Long, Long)]
      .collect().sortBy(r => (r._1, r._2)).toList
  }

  test("streaming candle store: batch-split invariant and equal to the " +
      "direct batch rollup") {
    val base = Files.createTempDirectory("candles")
    // 3-way split: each minute bucket receives ticks from several batches
    val s3 = base.resolve("s3").toString
    for (b <- 0 until 3)
      CandleStream.applyBatch(
        ticks.where($"event_id" % 3 === b), b, s3, 60000L)
    // 1-way: everything in one batch
    val s1 = base.resolve("s1").toString
    CandleStream.applyBatch(ticks, 0, s1, 60000L)
    val direct = Candles.merge(Candles.partials(ticks, 60000L), 3600000L)
      .select($"series", $"bucket_ms", $"open", $"close", $"high", $"low",
        $"volume_micro", $"n_trades")
      .as[(String, Long, Double, Double, Double, Double, Long, Long)]
      .collect().sortBy(r => (r._1, r._2)).toList
    assert(hourCandles(s3) == direct)
    assert(hourCandles(s1) == direct)
    // hand-computed: open = v of (ts 1000, eid 3) = 20, close = v of
    // (ts 62000, eid 4) = 40, high 40, low 5, volume 105e6, 5 trades
    assert(direct ==
      List(("t", 0L, 20.0, 40.0, 40.0, 5.0, 105000000L, 5L)))
  }

  test("crash replay: re-applying a batch overwrites its own partition — " +
      "store unchanged") {
    val base = Files.createTempDirectory("candlesreplay")
    val store = base.resolve("store").toString
    for (b <- 0 until 3)
      CandleStream.applyBatch(
        ticks.where($"event_id" % 3 === b), b, store, 60000L)
    val before = hourCandles(store)
    // the crash-replay: batch 1 applied AGAIN with the same id
    CandleStream.applyBatch(
      ticks.where($"event_id" % 3 === 1), 1, store, 60000L)
    assert(hourCandles(store) == before)
  }
}
