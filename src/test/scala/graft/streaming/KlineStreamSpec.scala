package graft.streaming

import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

class KlineStreamSpec extends SparkSpec {
  import spark.implicits._

  test("cadence map mirrors deploy.py triggers") {
    assert(KlineStream.triggerFor("onchain") ==
      Trigger.ProcessingTime("30 seconds"))
    assert(KlineStream.triggerFor("kalshi") ==
      Trigger.ProcessingTime("60 seconds"))
    assert(KlineStream.triggerFor("klines_1m") == Trigger.AvailableNow())
  }

  test("file-drop ingest stream normalizes and upserts (AvailableNow)") {
    val base = Files.createTempDirectory("stream")
    val drop = base.resolve("drop"); Files.createDirectories(drop)
    val sink = base.resolve("sink").toString
    val ckpt = base.resolve("ckpt").toString

    val body =
      """[[1704067200000,"1","2","0.5","1.5","10",1704067259999,"15",7,"1","1","0"]]"""
    Files.write(drop.resolve("b1.txt"), s"BTCUSDT\t$body".getBytes)

    val q = KlineStream.ingest(spark, drop.toString, ckpt, sink,
      "binance", 1, 1, 60000L, Trigger.AvailableNow())
    q.awaitTermination(60000)

    val rows = spark.read.parquet(sink)
      .select($"symbol", $"ts", $"close".cast("string"))
      .as[(String, Long, String)].collect()
    assert(rows.length == 1)
    assert(rows.head._1 == "BTCUSDT")
    assert(rows.head._2 == 1704067200000L)
    assert(BigDecimal(rows.head._3) == BigDecimal("1.5"))

    // second drop with an overlapping key: upsert replaces, not duplicates
    val body2 =
      """[[1704067200000,"1","2","0.5","1.6","11",1704067259999,"16",8,"1","1","0"]]"""
    Files.write(drop.resolve("b2.txt"), s"BTCUSDT\t$body2".getBytes)
    val q2 = KlineStream.ingest(spark, drop.toString, ckpt, sink,
      "binance", 1, 1, 60000L, Trigger.AvailableNow())
    q2.awaitTermination(60000)
    val after = spark.read.parquet(sink)
      .select($"close".cast("string")).as[String].collect()
    assert(after.map(BigDecimal(_)).toList == List(BigDecimal("1.6")))
  }

  test("ingest micro-batches rewrite only the touched day partitions") {
    val base = Files.createTempDirectory("pstream")
    val drop = base.resolve("drop"); Files.createDirectories(drop)
    val sink = base.resolve("sink").toString
    val ckpt = base.resolve("ckpt").toString
    val day1 = 1704067200000L // 2024-01-01
    val day2 = day1 + 86400000L
    def k(ts: Long) =
      s"""[[$ts,"1","2","0.5","1.5","10",${ts + 59999},"15",7,"1","1","0"]]"""
    Files.write(drop.resolve("d1.txt"), s"BTCUSDT\t${k(day1)}".getBytes)
    KlineStream.ingest(spark, drop.toString, ckpt, sink,
      "binance", 1, 1, 60000L, Trigger.AvailableNow()).awaitTermination(60000)
    val fs = new org.apache.hadoop.fs.Path(sink)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def day1Files = fs.listStatus(
      new org.apache.hadoop.fs.Path(sink, "dt_date=2024-01-01"))
      .map(st => (st.getPath.getName, st.getLen, st.getModificationTime))
      .sortBy(_._1).toList
    val before = day1Files
    assert(before.nonEmpty)
    Thread.sleep(5)
    // next micro-batch lands on day2 only: day1's files must not be touched
    Files.write(drop.resolve("d2.txt"), s"BTCUSDT\t${k(day2)}".getBytes)
    KlineStream.ingest(spark, drop.toString, ckpt, sink,
      "binance", 1, 1, 60000L, Trigger.AvailableNow()).awaitTermination(60000)
    assert(day1Files == before)
    assert(spark.read.parquet(sink).count() == 2)
  }

  test("watermarked windowed agg finalizes windows in append mode") {
    val base = Files.createTempDirectory("wstream")
    val drop = base.resolve("drop"); Files.createDirectories(drop)
    val sink = base.resolve("sink").toString
    val ckpt = base.resolve("ckpt").toString
    val t0 = 1704067200000L
    def k(ts: Long, close: String) =
      s"""[[$ts,"1","2","0.5","$close","10",${ts + 59999},"15",7,"1","1","0"]]"""
    // batch 1: two klines in window0, one in window1
    Files.write(drop.resolve("w1.txt"),
      (Seq(s"BTCUSDT\t${k(t0, "1.5")}", s"BTCUSDT\t${k(t0 + 60000, "2.5")}",
        s"BTCUSDT\t${k(t0 + 300000, "3.5")}")).mkString("\n").getBytes)
    val q = KlineStream.liveWindowQuery(spark, drop.toString, ckpt, sink,
      "binance", 1, 1, 60000L, "5 minutes", "1 minute",
      Trigger.AvailableNow())
    q.awaitTermination(120000)
    // batch 2: advance event time far enough to close earlier windows
    Files.write(drop.resolve("w2.txt"),
      s"BTCUSDT\t${k(t0 + 1200000, "9.9")}".getBytes)
    val q2 = KlineStream.liveWindowQuery(spark, drop.toString, ckpt, sink,
      "binance", 1, 1, 60000L, "5 minutes", "1 minute",
      Trigger.AvailableNow())
    q2.awaitTermination(120000)
    val rows = spark.read.parquet(sink)
      .select(unix_millis($"w_start"), $"n", $"max_close".cast("string"))
      .as[(Long, Long, String)].collect().sortBy(_._1)
    // window0 [t0, t0+5m) finalized with 2 rows, max close 2.5
    val w0 = rows.find(_._1 == t0).get
    assert(w0._2 == 2)
    assert(BigDecimal(w0._3) == BigDecimal("2.5"))
  }

  test("advanceCursor keeps only rows that advance the per-key max ts") {
    import KlineStream._
    // simulate state across two batches with a manual GroupState double
    val out1 = advanceCursor("k",
      Iterator(Keyed("k", 5L), Keyed("k", 3L)), FakeState(None)).toList
    assert(out1.map(_.ts) == List(3L, 5L)) // no state yet: all pass, sorted
  }

  /** minimal GroupState stub for the pure-function test */
  private case class FakeState(init: Option[KlineStream.Cursor])
      extends org.apache.spark.sql.streaming.GroupState[KlineStream.Cursor] {
    private var cur = init
    override def exists: Boolean = cur.isDefined
    override def get: KlineStream.Cursor = cur.get
    override def getOption: Option[KlineStream.Cursor] = cur
    override def update(s: KlineStream.Cursor): Unit = cur = Some(s)
    override def remove(): Unit = cur = None
    override def hasTimedOut: Boolean = false
    override def setTimeoutDuration(d: Long): Unit = ()
    override def setTimeoutDuration(d: String): Unit = ()
    override def setTimeoutTimestamp(t: Long): Unit = ()
    override def setTimeoutTimestamp(t: Long, add: String): Unit = ()
    override def setTimeoutTimestamp(t: java.sql.Date): Unit = ()
    override def setTimeoutTimestamp(t: java.sql.Date, add: String): Unit = ()
    override def getCurrentWatermarkMs(): Long = 0L
    override def getCurrentProcessingTimeMs(): Long = 0L
  }
}
