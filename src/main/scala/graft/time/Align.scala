package graft.time

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Time kernel: interval math + timestamp alignment.
  *
  * Mirrors the reference's floor-to-interval semantics
  * (reference `src/exchanges/_base_.py:276-277` — `ts = ts // ivl * ivl`,
  * "强制对齐 OHLC") and `align_to_5m` (`src/utils/__init__.py:20-29`), but as
  * pure codegen'd column expressions: integer floor-division stays inside
  * whole-stage codegen, no UDF, no shuffle.
  */
object Align {
  /** interval string → milliseconds (reference `src/constants.py:16-19`). */
  val intervalMs: Map[String, Long] = Map(
    "1m" -> 60000L,
    "5m" -> 300000L,
    "1h" -> 3600000L,
    "1d" -> 86400000L)

  /** Floor an epoch-ms column onto an interval grid (P2). */
  def floorTo(tsMs: Column, ivlMs: Long): Column =
    (tsMs.cast("long") / ivlMs).cast("long") * ivlMs

  /** Floor onto a named interval grid. */
  def floorTo(tsMs: Column, interval: String): Column =
    floorTo(tsMs, intervalMs(interval))

  /** `align_to_5m` (P3). */
  def alignTo5m(tsMs: Column): Column = floorTo(tsMs, 300000L)

  /** Derive the `dt` wall-clock string from epoch ms (P5); session TZ is UTC
    * everywhere, standardizing the reference's naive-vs-UTC inconsistency
    * (`_base_.py:310` vs `binance/perp.py:174`). */
  def dtString(tsMs: Column): Column =
    date_format(timestamp_millis(tsMs.cast("long")), "yyyy-MM-dd HH:mm:ss")

  /** Snap a funding interval (minutes) to the nearest standard bucket (P11,
    * reference `okx/perp.py:192-205`): nearest by absolute distance, ties
    * resolved to the smaller bucket (first match in ascending order). */
  val fundingBuckets: Seq[Int] = Seq(60, 120, 180, 240, 360, 480, 720)

  def snapFundingInterval(minutes: Column): Column = {
    val arr = array(fundingBuckets.map(lit): _*)
    // sort buckets by (abs distance, bucket) and take the first
    val best = array_sort(
      transform(arr, b => struct(abs(b - minutes).as("d"), b.as("b"))))
    // a missing interval must stay missing: without the guard, NULL
    // distances tie-break on the bucket field and a fabricated bucket comes
    // out (a silent wrong funding_interval downstream in SyncFunding)
    when(minutes.isNull, lit(null).cast("int"))
      .otherwise(element_at(best, 1).getField("b"))
  }
}
