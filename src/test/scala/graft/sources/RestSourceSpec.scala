package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

class RestSourceSpec extends SparkSpec {
  import spark.implicits._

  test("DSv2 rest source: one partition per fetch unit, adapters compose") {
    val dir = Files.createTempDirectory("rest")
    Files.write(dir.resolve("BTCUSDT.json"),
      """[[1704067200000,"1","2","0.5","1.5","10",1704067259999,"15",7,"1","1","0"]]"""
        .getBytes)
    Files.write(dir.resolve("ETHUSDT.json"),
      """[[1704067200000,"3","4","2.5","3.5","20",1704067259999,"70",9,"1","1","0"]]"""
        .getBytes)
    val raw = spark.read.format(classOf[RestSource].getName)
      .option("path", dir.toString).load()
    assert(raw.rdd.getNumPartitions == 2) // fetch unit == task
    assert(raw.count() == 2)
    // normalization composes on top as plain projections
    val klines = KlineAdapters.binance(raw, 1, 1, 60000L)
      .select($"symbol", $"ts", $"close".cast("string"))
      .as[(String, Long, String)].collect().sortBy(_._1)
    assert(klines.length == 2)
    assert(klines(0)._1 == "BTCUSDT" && BigDecimal(klines(0)._3) == BigDecimal("1.5"))
    assert(klines(1)._1 == "ETHUSDT" && klines(1)._2 == 1704067200000L)
  }

  test("empty endpoint directory plans zero partitions, not a failure") {
    val dir = Files.createTempDirectory("restempty")
    val raw = spark.read.format(classOf[RestSource].getName)
      .option("path", dir.toString).load()
    assert(raw.count() == 0)
  }
}
