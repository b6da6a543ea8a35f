package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import Schedules._

/** Calendar fidelity for the deployment schedules (`deploy.py:36-64`):
  * field expansion quirks, second offsets, boundary rollovers, the
  * vixie-cron dom/dow OR rule, and the trigger mapping. All UTC epoch-ms. */
class SchedulesSpec extends AnyFunSuite {

  private def ms(iso: String): Long = java.time.Instant.parse(iso).toEpochMilli

  test("expandField mirrors expand_cron_field: *, */n, lists; dow 7=0") {
    assert(expandField("*", 0, 59) == (0 to 59))
    assert(expandField("", 0, 23) == (0 to 23))
    assert(expandField("*/5", 0, 59) == (0 to 59 by 5))
    assert(expandField("0,1,5,30", 0, 59) == Seq(0, 1, 5, 30))
    assert(expandField("7", 0, 6) == Seq(0)) // cron: 7 is Sunday
    intercept[IllegalArgumentException](expandField("61", 0, 59))
  }

  test("AtSeconds([5], */5): every 5 minutes at second 5") {
    val s = AtSeconds(Seq(5), minutes = "*/5")
    assert(s.nextFire(ms("2026-01-01T00:00:00Z")) == ms("2026-01-01T00:00:05Z"))
    assert(s.nextFire(ms("2026-01-01T00:00:05Z")) == ms("2026-01-01T00:05:05Z"))
    assert(s.nextFire(ms("2026-01-01T00:03:00Z")) == ms("2026-01-01T00:05:05Z"))
    assert(s.periodMs == 300000L)
  }

  test("AtSeconds([5,30], minute 0): two offsets within the hourly slot") {
    val s = AtSeconds(Seq(5, 30), minutes = "0")
    assert(s.nextFire(ms("2026-01-01T13:00:00Z")) == ms("2026-01-01T13:00:05Z"))
    assert(s.nextFire(ms("2026-01-01T13:00:05Z")) == ms("2026-01-01T13:00:30Z"))
    // past both offsets → next hour
    assert(s.nextFire(ms("2026-01-01T13:00:30Z")) == ms("2026-01-01T14:00:05Z"))
    assert(s.fires(ms("2026-01-01T12:59:00Z"), ms("2026-01-01T15:01:00Z"))
      .size == 6)
  }

  test("AtSeconds daily (minute 0, hour 0) rolls over the day boundary") {
    val s = AtSeconds(Seq(5, 30), minutes = "0", hours = "0")
    assert(s.nextFire(ms("2026-01-01T00:00:31Z")) == ms("2026-01-02T00:00:05Z"))
    // gcd of the gaps 25 s (00:00:05→00:00:30) and 86 375 s (day wrap): the
    // coarsest grid that still ticks at BOTH daily offsets
    assert(s.periodMs == 25000L)
  }

  test("periodMs grid contains every fire (gcd-of-gaps invariant)") {
    val schedules = Seq(
      AtSeconds(Seq(5), minutes = "*/5"),
      AtSeconds(Seq(5, 30), minutes = "0"),
      AtSeconds(Seq(5), minutes = "0,1,5,30"),
      AtSeconds(Seq(5, 30), minutes = "0", hours = "0"),
      Cron("1 * * * *"), Cron("0 0 * * *"))
    val from = ms("2026-01-01T00:00:00Z")
    for (s <- schedules) {
      val f = s.fires(from, from + 2L * 86400000L)
      assert(f.sliding(2).forall { case Seq(a, b) => (b - a) % s.periodMs == 0 },
        s"$s: a fire gap is not a multiple of periodMs=${s.periodMs}")
    }
  }

  test("sync_funding_rate (minutes 0,1,5,30): minutely grid, gated to 4/hour") {
    val s = Schedules.deployments("sync_funding_rate")
    // non-uniform BYMINUTE: the old first-step heuristic said 60 s and FIRED
    // 60×/hour; the gcd grid also ticks minutely but the calendar gate
    // passes only the four real fires
    assert(s.periodMs == 60000L)
    val hour = ms("2026-01-01T13:00:00Z")
    val ticks = (0 until 60).map(m => hour + m * 60000L + 5000L)
    val passed = ticks.filter(t => s.onCalendar(t))
    assert(passed == Seq(0, 1, 5, 30).map(m => hour + m * 60000L + 5000L))
    // exact-fire predicate agrees
    assert(ticks.filter(s.isFire) == passed)
    // a tick 800 ms late (trigger jitter) still passes the gate
    assert(s.onCalendar(hour + 5 * 60000L + 5000L + 800L))
    assert(!s.onCalendar(hour + 2 * 60000L + 5000L))
  }

  test("Cron '1 * * * *' (sync_klines_1m): minute 1 of every hour") {
    val s = Cron("1 * * * *")
    assert(s.nextFire(ms("2026-01-01T10:00:59Z")) == ms("2026-01-01T10:01:00Z"))
    assert(s.nextFire(ms("2026-01-01T10:01:00Z")) == ms("2026-01-01T11:01:00Z"))
    assert(s.periodMs == 3600000L)
  }

  test("Cron '0 0 * * *' (sync_symbols): daily midnight incl. month roll") {
    val s = Cron("0 0 * * *")
    assert(s.nextFire(ms("2026-01-31T00:00:00Z")) == ms("2026-02-01T00:00:00Z"))
    // leap year: Feb 28 2028 → Feb 29 2028
    assert(s.nextFire(ms("2028-02-28T12:00:00Z")) == ms("2028-02-29T00:00:00Z"))
  }

  test("Cron vixie dom/dow rule: both restricted → OR; one → AND") {
    // minute 0 hour 0, on the 15th OR on Mondays
    val both = Cron("0 0 15 * 1")
    // 2026-06-15 is a Monday; 2026-06-08 is the Monday before
    assert(both.nextFire(ms("2026-06-06T00:00:00Z")) ==
      ms("2026-06-08T00:00:00Z")) // Monday wins before the 15th
    assert(both.nextFire(ms("2026-06-08T00:00:00Z")) ==
      ms("2026-06-15T00:00:00Z"))
    // dow-only restriction is an AND with the (full) dom range
    val mon = Cron("0 0 * * 1")
    assert(mon.nextFire(ms("2026-06-09T00:00:00Z")) ==
      ms("2026-06-15T00:00:00Z"))
  }

  test("Every(30s): anchored fixed rate, negative-time floor correct") {
    val s = Every(30000L, anchorMs = ms("2026-01-01T00:00:10Z"))
    assert(s.nextFire(ms("2026-01-01T00:00:10Z")) == ms("2026-01-01T00:00:40Z"))
    assert(s.nextFire(ms("2026-01-01T00:00:39Z")) == ms("2026-01-01T00:00:40Z"))
    // before the anchor the modular grid still holds (floorDiv, not /)
    assert(s.nextFire(ms("2025-12-31T23:59:00Z")) == ms("2025-12-31T23:59:10Z"))
  }

  test("alignedTrigger: delay lands on the fire, trigger carries the period") {
    val s = AtSeconds(Seq(5), minutes = "*/5")
    val now = ms("2026-01-01T00:03:17Z")
    val (delay, trigger) = s.alignedTrigger(now)
    assert(now + delay == ms("2026-01-01T00:05:05Z"))
    assert(trigger == org.apache.spark.sql.streaming.Trigger
      .ProcessingTime(300000L))
  }

  test("property: nextFire is the FIRST qualifying instant after the cursor") {
    val schedules = Seq(
      AtSeconds(Seq(5), minutes = "*/5"),
      AtSeconds(Seq(5, 30), minutes = "0"),
      AtSeconds(Seq(0, 59), minutes = "0,1,58", hours = "0,23"),
      AtSeconds(Seq(17), minutes = "*/7", hours = "*/3"))
    // brute-force twin: fires are whole-second instants, so the first
    // candidate strictly after the cursor is the next whole second
    def brute(s: AtSeconds, afterMs: Long): Long = {
      var t = (math.floorDiv(afterMs, 1000L) + 1) * 1000L
      val limit = t + 2L * 86400000L
      while (t < limit) {
        val ldt = java.time.LocalDateTime.ofInstant(
          java.time.Instant.ofEpochMilli(t), java.time.ZoneOffset.UTC)
        if (expandField(s.hours, 0, 23).contains(ldt.getHour) &&
          expandField(s.minutes, 0, 59).contains(ldt.getMinute) &&
          s.seconds.contains(ldt.getSecond)) return t
        t += 1000L
      }
      fail(s"brute scan found no fire for $s")
    }
    val rnd = new scala.util.Random(42)
    val base = ms("2026-02-27T00:00:00Z") // spans a month boundary
    for (s <- schedules; _ <- 1 to 50) {
      val after = base + rnd.nextLong(3L * 86400000L) // sub-second cursors too
      assert(s.nextFire(after) == brute(s, after), s"$s after $after")
    }
  }

  test("deployment table: every production flow keeps its calendar") {
    val d = Schedules.deployments
    assert(d.size == 10)
    // spot-check the three shapes against deploy.py
    assert(d("sync_klines_1m").nextFire(ms("2026-03-01T07:30:00Z")) ==
      ms("2026-03-01T08:01:00Z"))
    // minutes 0,1,5,30 at second 5, in (00:00:00, 01:00:00]
    assert(d("sync_funding_rate").fires(
      ms("2026-01-01T00:00:00Z"), ms("2026-01-01T01:00:00Z")).size == 4)
    assert(d("sync_onchain_large_transfer").periodMs == 30000L)
  }
}
