package graft.streaming

import java.nio.file.Files
import graft.SparkSpec

class EventDedupStreamSpec extends SparkSpec {

  test("w11 dedup: in-batch drop, live-state drop, late drop forms no " +
    "state, TTL re-keep") {
    val H = 3600000000L // one hour in µs; delay = 2 hours
    val base = Files.createTempDirectory("w11spec")
    val drop = base.resolve("drop"); Files.createDirectories(drop)
    val sink = base.resolve("sink").toString
    val ckpt = base.resolve("ckpt").toString
    def l(id: Long, us: Long, v: Double) = s"$id\t$us\t$v"
    // b0: key 1 twice (in-batch dup), key 2 (max event = 110H)
    // b1 (wm = 108H): key 2 verbatim (on time, state alive → drop),
    //   key 3 at 109H (within delay, kept), key 4 at 50H (late → drop,
    //   and late rows form NO state), key 5 at 120H (max → 120H)
    // b2 (wm = 118H): key 1 re-occurs at 200H (state expired at 102H →
    //   kept AGAIN), key 4 at 130H (kept — the earlier late drop left no
    //   state), key 3 verbatim at 109H (late now → drop)
    val batches = Seq(
      Seq(l(1, 100 * H, 1.0), l(1, 100 * H, 1.0), l(2, 110 * H, 2.0)),
      Seq(l(2, 110 * H, 2.0), l(3, 109 * H, 3.0), l(4, 50 * H, 4.0),
        l(5, 120 * H, 5.0)),
      Seq(l(1, 200 * H, 1.5), l(4, 130 * H, 4.5), l(3, 109 * H, 3.0)))
    batches.zipWithIndex.foreach { case (ls, i) =>
      Files.write(drop.resolve(s"f$i.txt"), ls.mkString("\n").getBytes)
      EventWindowStream.deliverDedup(spark, drop.toString, ckpt, sink,
        "2 hours")
    }
    val out = spark.read.parquet(sink)
      .select("event_id", "ts_us", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toList
    assert(out == List((1L, 100 * H, 1.0), (1L, 200 * H, 1.5),
      (2L, 110 * H, 2.0), (3L, 109 * H, 3.0), (4L, 130 * H, 4.5),
      (5L, 120 * H, 5.0)), out)
  }

  test("in-run watermark LAG, pinned: within one lifecycle the late-record " +
    "filter uses the PREVIOUS batch's watermark, so late rows that a " +
    "restart-per-delivery run drops survive one extra batch") {
    val H = 3600000000L
    val base = Files.createTempDirectory("w11one")
    val drop = base.resolve("drop"); Files.createDirectories(drop)
    val sink = base.resolve("sink").toString
    val ckpt = base.resolve("ckpt").toString
    def l(id: Long, us: Long, v: Double) = s"$id\t$us\t$v"
    val batches = Seq(
      Seq(l(1, 100 * H, 1.0), l(1, 100 * H, 1.0), l(2, 110 * H, 2.0)),
      Seq(l(2, 110 * H, 2.0), l(3, 109 * H, 3.0), l(4, 50 * H, 4.0),
        l(5, 120 * H, 5.0)),
      Seq(l(1, 200 * H, 1.5), l(4, 130 * H, 4.5), l(3, 109 * H, 3.0)))
    // stage ALL batch files up front with strictly increasing mtimes,
    // then run ONE lifecycle that takes one file per micro-batch
    batches.zipWithIndex.foreach { case (ls, i) =>
      val f = drop.resolve(f"b$i%04d.txt")
      Files.write(f, ls.mkString("\n").getBytes)
      f.toFile.setLastModified(1700000000000L + i * 60000L)
    }
    EventWindowStream.deliverDedup(spark, drop.toString, ckpt, sink,
      "2 hours", maxFilesPerTrigger = 1)
    val out = spark.read.parquet(sink)
      .select("event_id", "ts_us", "value").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sorted.toList
    // DIFFERS from the 3-lifecycle run above in exactly one row:
    // (4, 50H) is late vs the COMMITTED watermark (108H after b0), which a
    // restart loads into the late filter — but in-run the late filter for
    // b1 still holds b0's ENTRY watermark (0), so the row survives.
    // Eviction/dedup state still uses the advanced watermark either way:
    // (1, 200H) is kept (state expired) and (3, 109H)'s re-delivery drops.
    // This one-batch lag is Spark's two-value watermark propagation
    // (late-events value vs eviction value) — the measured reason the
    // watermarked w9-w12 lifecycles stay one-lifecycle-per-delivery while
    // watermark-free w14 may consolidate.
    assert(out == List((1L, 100 * H, 1.0), (1L, 200 * H, 1.5),
      (2L, 110 * H, 2.0), (3L, 109 * H, 3.0), (4L, 50 * H, 4.0),
      (4L, 130 * H, 4.5), (5L, 120 * H, 5.0)), out)
  }
}
