package graft.flows

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

class SyncFundingSpec extends SparkSpec {
  import spark.implicits._

  private val histBody =
    """[{"symbol":"BTCUSDT","fundingTime":1704067200000,"fundingRate":"0.0001"},
      |{"symbol":"ETHUSDT","fundingTime":1704067200000,"fundingRate":"-0.0002"},
      |{"symbol":"NOINFO","fundingTime":1704067200000,"fundingRate":"0.0003"}]"""
      .stripMargin.replace("\n", "")

  private val infoBody =
    """[{"symbol":"BTCUSDT","fundingIntervalHours":8,"adjustedFundingRateCap":"0.02",
      |"adjustedFundingRateFloor":"-0.02"},
      |{"symbol":"ETHUSDT","fundingIntervalHours":3,"adjustedFundingRateCap":"0.03",
      |"adjustedFundingRateFloor":"-0.03"}]""".stripMargin.replace("\n", "")

  test("J4 inner lookup drops info-less history; P11 snaps the interval") {
    val out = SyncFunding.merge(
      Seq(histBody).toDF("body"), Seq(infoBody).toDF("body"), 1, 1)
      .orderBy("symbol")
      .select($"symbol", $"funding_rate", $"funding_interval", $"adjusted_cap")
      .as[(String, Double, Int, Double)].collect()
    assert(out.length == 2) // NOINFO dropped (dict-probe semantics)
    assert(out(0) == (("BTCUSDT", 0.0001, 480, 0.02))) // 8h → 480 on-grid
    assert(out(1) == (("ETHUSDT", -0.0002, 180, 0.03))) // 3h=180 → snaps to 180
  }

  test("J8 dueSymbols prunes symbols whose next funding hasn't arrived") {
    val symbols = Seq("A", "B", "C").toDF("symbol")
    val state = Seq(("A", 100L), ("B", 9999L)).toDF("symbol", "next_funding_time")
    val due = SyncFunding.dueSymbols(symbols, state, nowMs = 500L)
      .as[String].collect().toSet
    assert(due == Set("A", "C")) // A due, B not yet, C unknown → fetch
  }

  test("run upserts idempotently on (exchange, inst, symbol, ts)") {
    val sink = Files.createTempDirectory("funding").toString + "/funding"
    SyncFunding.run(spark, sink, Seq(histBody).toDF("body"),
      Seq(infoBody).toDF("body"), 1, 1)
    SyncFunding.run(spark, sink, Seq(histBody).toDF("body"),
      Seq(infoBody).toDF("body"), 1, 1)
    assert(spark.read.parquet(sink).count() == 2)
  }
}
