package graft.sinks

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

class UpsertSinkSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("upsert").toString + "/t"

  test("upsert: insert then full-row replace, newest wins (Doris UNIQUE key)") {
    val path = tmp()
    val v1 = Seq(("BTC", 1000L, 10.0), ("ETH", 1000L, 20.0))
      .toDF("symbol", "ts", "close")
    UpsertSink.upsert(spark, path, v1, Seq("symbol", "ts"), "ts")
    val v2 = Seq(("BTC", 1000L, 11.0), ("SOL", 1000L, 30.0))
      .toDF("symbol", "ts", "close")
    UpsertSink.upsert(spark, path, v2, Seq("symbol", "ts"), "ts")
    val out = spark.read.parquet(path)
      .as[(String, Long, Double)].collect().sortBy(_._1)
    assert(out.toList == List(("BTC", 1000L, 11.0), ("ETH", 1000L, 20.0),
      ("SOL", 1000L, 30.0)))
  }

  test("upsert is idempotent (re-loading the same batch is a no-op)") {
    val path = tmp()
    val b = Seq(("BTC", 1L, 1.0)).toDF("symbol", "ts", "close")
    UpsertSink.upsert(spark, path, b, Seq("symbol", "ts"), "ts")
    UpsertSink.upsert(spark, path, b, Seq("symbol", "ts"), "ts")
    assert(spark.read.parquet(path).count() == 1)
  }

  test("upsert with partition column only rewrites touched partitions") {
    val path = tmp()
    val v1 = Seq(("BTC", 1L, 1.0, "2024-01-01"), ("BTC", 2L, 2.0, "2024-01-02"))
      .toDF("symbol", "ts", "close", "dt_date")
    UpsertSink.upsert(spark, path, v1, Seq("symbol", "ts"), "ts", Some("dt_date"))
    val v2 = Seq(("BTC", 2L, 22.0, "2024-01-02"))
      .toDF("symbol", "ts", "close", "dt_date")
    UpsertSink.upsert(spark, path, v2, Seq("symbol", "ts"), "ts", Some("dt_date"))
    val out = spark.read.parquet(path)
      .select("symbol", "ts", "close").as[(String, Long, Double)]
      .collect().sortBy(_._2)
    assert(out.toList == List(("BTC", 1L, 1.0), ("BTC", 2L, 22.0)))
  }

  test("append skips empty batches (K3)") {
    val path = tmp()
    UpsertSink.append(spark, path,
      Seq(("a", 1L)).toDF("k", "v").where($"v" > 99))
    assert(!new java.io.File(path).exists())
    UpsertSink.append(spark, path, Seq(("a", 1L)).toDF("k", "v"))
    assert(spark.read.parquet(path).count() == 1)
  }

  test("updateFields: only listed columns update; others keep stored values (MySQL upsert)") {
    val path = tmp()
    val stored = Seq(("binance", "BTCUSDT", 1, "0.01", 2, 100L))
      .toDF("exchange", "symbol", "inst_type", "tick_size", "status", "onboard_time")
    UpsertSink.updateFields(spark, path, stored,
      Seq("exchange", "symbol", "inst_type"), Seq("tick_size", "status"))
    // update tick_size+status; onboard_time in the update must be IGNORED
    val upd = Seq(("binance", "BTCUSDT", 1, "0.001", 3, 999L),
      ("binance", "NEWUSDT", 1, "0.1", 1, 555L))
      .toDF("exchange", "symbol", "inst_type", "tick_size", "status", "onboard_time")
    UpsertSink.updateFields(spark, path, upd,
      Seq("exchange", "symbol", "inst_type"), Seq("tick_size", "status"))
    val out = spark.read.parquet(path)
      .orderBy("symbol")
      .as[(String, String, Int, String, Int, Long)].collect()
    assert(out(0) == ("binance", "BTCUSDT", 1, "0.001", 3, 100L)) // kept 100
    assert(out(1) == ("binance", "NEWUSDT", 1, "0.1", 1, 555L))   // inserted whole
  }
}
