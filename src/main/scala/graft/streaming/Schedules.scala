package graft.streaming

import java.time.{Instant, LocalDateTime, ZoneOffset}

import org.apache.spark.sql.streaming.Trigger

/** The reference's deployment calendar (`src/deploy.py:36-64,70-172`),
  * restated as pure next-fire arithmetic over epoch-ms UTC.
  *
  * Three schedule shapes exist there:
  *   - `IntervalSchedule(interval=n)` — fixed rate from an anchor;
  *   - second-offset rrules built by `cron_seconds_schedule` —
  *     `FREQ=MINUTELY;BYSECOND=...;BYMINUTE=...;BYHOUR=...`, i.e. fire at
  *     every (hour ∈ H, minute ∈ M, second ∈ S);
  *   - standard 5-field cron (`"1 * * * *"` → minute 1 of every hour).
  *
  * Spark mapping: Structured Streaming triggers are fixed-rate with no
  * phase control, so an offset-aligned schedule becomes
  * `delayUntilNext(now)` (sleep to the first fire) + a
  * `Trigger.ProcessingTime(period)` whose period is the schedule's cadence.
  * [[Schedule.alignedTrigger]] returns both. Exact multi-offset patterns
  * (e.g. seconds 5 AND 30 of minute 0) keep full fidelity in
  * [[Schedule.fires]], which enumerates the calendar — that enumeration is
  * also what an integrity checker compares arrival data against.
  */
object Schedules {

  /** `deploy.py:36-44` `expand_cron_field`: star or empty → full range,
    * star-slash-n → steps from the range floor, `a,b,c` → literal list. */
  def expandField(value: String, min: Int, max: Int): Seq[Int] = value match {
    case "*" | "" => min to max
    case s if s.startsWith("*/") => min to max by s.drop(2).toInt
    case s => s.split(",").toSeq.map(_.trim.toInt).map { v =>
      require(v >= min && v <= max || (min == 0 && v == 7 && max == 6),
        s"cron field value $v outside [$min,$max]")
      if (min == 0 && max == 6 && v == 7) 0 else v // cron: 7 ≡ Sunday ≡ 0
    }.distinct.sorted
  }

  sealed trait Schedule {
    /** First fire time strictly after `afterMs` (epoch ms, UTC). */
    def nextFire(afterMs: Long): Long

    /** All fires in (fromMs, toMs] — the expected run calendar. */
    def fires(fromMs: Long, toMs: Long): Seq[Long] = {
      val b = Seq.newBuilder[Long]
      var t = nextFire(fromMs)
      while (t <= toMs) { b += t; t = nextFire(t) }
      b.result()
    }

    /** The fixed-rate cadence Spark's ProcessingTime trigger runs at: the
      * gcd of consecutive fire gaps, so a grid anchored at any fire ticks AT
      * every fire (each gap is a multiple of the gcd). Non-uniform calendars
      * (sync_funding_rate: minutes 0,1,5,30) therefore tick more often than
      * they fire — pair with [[onCalendar]] in the micro-batch body so the
      * extra ticks do no work. A uniform calendar's gcd is its plain step,
      * so the common case is unchanged. */
    def periodMs: Long

    /** True when `tMs` is exactly a calendar fire. */
    def isFire(tMs: Long): Boolean = nextFire(tMs - 1) == tMs

    /** In-batch calendar gate: does a micro-batch waking at `wallMs` sit on
      * a real fire (within `tolMs` of one)? This is what keeps the gcd-grid
      * trigger from over-calling rate-limited upstreams: the trigger may
      * tick every minute, but only on-calendar ticks pass the gate. */
    def onCalendar(wallMs: Long, tolMs: Long = 1000L): Boolean =
      nextFire(wallMs - tolMs) <= wallMs + tolMs

    /** (initial delay to the next aligned fire, the period trigger). The
      * delay anchors the grid on a fire; [[periodMs]] guarantees every later
      * fire lands on a tick. */
    def alignedTrigger(nowMs: Long): (Long, Trigger) =
      (nextFire(nowMs) - nowMs, Trigger.ProcessingTime(periodMs))
  }

  private def gcd(a: Long, b: Long): Long = if (b == 0L) a else gcd(b, a % b)

  /** gcd of consecutive fire gaps over `horizonMs` from the schedule's
    * first fire after epoch: the coarsest fixed-rate grid that still
    * contains every fire. `floorMs` is the schedule's time resolution — the
    * gcd can never go below it, so reaching it ends the scan early.
    * `fallback` covers schedules with <2 fires in the horizon. */
  private def gridPeriod(s: Schedule, horizonMs: Long, floorMs: Long,
      fallback: Long): Long = {
    var prev = s.nextFire(0L)
    val limit = prev + horizonMs
    var g = 0L
    var t = s.nextFire(prev)
    while (t <= limit && g != floorMs) {
      g = gcd(g, t - prev)
      prev = t
      t = s.nextFire(prev)
    }
    if (g == 0L) fallback else g
  }

  /** `IntervalSchedule(interval=n)` — prefect anchors at deployment time;
    * the anchor is explicit here so tests are deterministic. */
  final case class Every(intervalMs: Long, anchorMs: Long = 0L)
      extends Schedule {
    require(intervalMs > 0)
    def nextFire(afterMs: Long): Long = {
      val k = math.floorDiv(afterMs - anchorMs, intervalMs) + 1
      anchorMs + k * intervalMs
    }
    def periodMs: Long = intervalMs
  }

  /** `cron_seconds_schedule(seconds, minutes, hours)` — the rrule shape:
    * fire at second s ∈ seconds of minute m ∈ minutes of hour h ∈ hours,
    * every day. */
  final case class AtSeconds(seconds: Seq[Int], minutes: String = "*",
      hours: String = "*") extends Schedule {
    private val ss = seconds.distinct.sorted
    private val mm = expandField(minutes, 0, 59)
    private val hh = expandField(hours, 0, 23)
    require(ss.nonEmpty && ss.forall(s => s >= 0 && s <= 59))

    def nextFire(afterMs: Long): Long = {
      // walk minute slots from the current one; within a qualifying slot
      // take the smallest listed second later than the cursor. Bounded by
      // one day + one slot of minutes (a nonempty schedule fires daily).
      var slot = math.floorDiv(afterMs, 60000L) * 60000L
      var guard = 0
      while (guard <= 24 * 60 + 1) {
        val t = LocalDateTime.ofInstant(
          Instant.ofEpochMilli(slot), ZoneOffset.UTC)
        if (hh.contains(t.getHour) && mm.contains(t.getMinute)) {
          ss.find(s => slot + s * 1000L > afterMs) match {
            case Some(s) => return slot + s * 1000L
            case None => ()
          }
        }
        slot += 60000L
        guard += 1
      }
      throw new IllegalStateException("no fire within a day — empty schedule?")
    }

    /** Derived from the full daily fire pattern (the rrule repeats daily by
      * construction), NOT from the first BYMINUTE step: a non-uniform list
      * like sync_funding_rate's minutes 0,1,5,30 gcds to a minutely grid
      * whose off-calendar ticks [[onCalendar]] skips, where the old
      * first-step heuristic would have FIRED every minute (60 calls/hour
      * against a rate-limited API instead of 4). Horizon = 2 days so the
      * day-wrap gap is included. */
    lazy val periodMs: Long =
      Schedules.gridPeriod(this, 2L * 86400000L, 1000L, 86400000L)
  }

  /** Standard 5-field cron, UTC: minute hour day-of-month month
    * day-of-week. Vixie-cron day rule: if BOTH dom and dow are restricted,
    * a day matches when EITHER does. */
  final case class Cron(expr: String) extends Schedule {
    private val Array(mi, hr, dom, mon, dow) = expr.trim.split("\\s+")
    private val mm = expandField(mi, 0, 59)
    private val hh = expandField(hr, 0, 23)
    private val dd = expandField(dom, 1, 31)
    private val mo = expandField(mon, 1, 12)
    private val dw = expandField(dow, 0, 6)
    private val domAny = dom == "*"
    private val dowAny = dow == "*"

    private def dayMatches(t: LocalDateTime): Boolean = {
      val domOk = dd.contains(t.getDayOfMonth)
      val dowOk = dw.contains(t.getDayOfWeek.getValue % 7) // java MON=1..SUN=7
      if (!domAny && !dowAny) domOk || dowOk else domOk && dowOk
    }

    def nextFire(afterMs: Long): Long = {
      var slot = (math.floorDiv(afterMs, 60000L) + 1) * 60000L
      val limit = afterMs + 4L * 366 * 86400000L // any cron fires within 4y
      while (slot < limit) {
        val t = LocalDateTime.ofInstant(
          Instant.ofEpochMilli(slot), ZoneOffset.UTC)
        if (mo.contains(t.getMonthValue) && dayMatches(t) &&
          hh.contains(t.getHour) && mm.contains(t.getMinute)) return slot
        slot += 60000L
      }
      throw new IllegalStateException(s"cron '$expr' never fires")
    }

    /** Same gcd-of-gaps derivation as [[AtSeconds.periodMs]]; cron's repeat
      * horizon spans month-length irregularities (dom/dow interplay), so the
      * scan samples ~800 days. Floor is the minute grid; a schedule with <2
      * fires in the horizon (e.g. yearly) falls back to daily ticks plus the
      * [[onCalendar]] gate. */
    lazy val periodMs: Long =
      Schedules.gridPeriod(this, 800L * 86400000L, 60000L, 86400000L)
  }

  /** The reference's production deployment table (`deploy.py:70-172`),
    * flow → schedule; `None`-scheduled flows (partition health, integrity
    * check) are on-demand and absent. `concurrency_limit=1` maps to one
    * streaming query per flow id — Spark already serializes micro-batches
    * within a query. */
  val deployments: Map[String, Schedule] = Map(
    "sync_symbols" -> Cron("0 0 * * *"),
    "sync_long_short_ratio_5m" -> AtSeconds(Seq(5), minutes = "*/5"),
    "sync_long_short_ratio_1h" -> AtSeconds(Seq(5, 30), minutes = "0"),
    "sync_long_short_ratio_1d" -> AtSeconds(Seq(5, 30), minutes = "0",
      hours = "0"),
    "sync_funding_rate" -> AtSeconds(Seq(5), minutes = "0,1,5,30"),
    "sync_onchain_large_transfer" -> Every(30000L),
    "sync_cex_inflow" -> AtSeconds(Seq(5, 30), minutes = "0"),
    "sync_macro_indicators" -> Every(30000L),
    "sync_kalshi" -> Every(60000L),
    "sync_klines_1m" -> Cron("1 * * * *"))
}
