package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators Spark lacks as primitives, built the scalable way
  * (SURVEY §7.4 preference (a): compose existing ops).
  *
  * - [[asofBackward]] — time-series as-of join without any per-key loop or
  *   theta join: union both sides tagged, ONE window sorted by (ts, side)
  *   per key carries the latest right-side values forward
  *   (`last(..., ignoreNulls)`), then keep left rows. Cost = one shuffle by
  *   key + one sort — same shape as the gap engine, scales by key count.
  *   The naive alternative (range theta join / per-key collect) explodes at
  *   100 TB; this stays a single exchange.
  *
  * - [[rangeJoin]] — interval containment join via bucket expansion: each
  *   range explodes to the fixed-width buckets it covers, the probe side
  *   computes its bucket, candidates equi-join on the bucket (uniform
  *   shuffle), and the exact `between` filter runs only on bucket-mates.
  *   This is the standard replacement for BroadcastNestedLoop range joins
  *   when neither side broadcasts.
  */
object Joins {

  /** Floor-division bucket id, correct on SIGNED domains. A plain
    * `(c / width).cast("long")` truncates toward zero, so a negative value
    * lands one bucket too high and an overlap pair straddling zero can be
    * missed. Subtracting the (always non-negative) `pmod` remainder first
    * makes the numerator an exact multiple of `width`, so the double
    * division is exact and the quotient IS the floor. */
  private def bucketOf(c: Column, width: Long): Column =
    ((c - pmod(c, lit(width))) / width).cast("long")

  /** For every left row, attach the payload of the latest right row with
    * `right.ts <= left.ts` within the same key (backward as-of, the
    * market-data "latest quote at event time" join). Right payload columns
    * come back NULL when no earlier right row exists. */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, payloadCols: Seq[String]): DataFrame = {
    val leftCols = left.columns
    require(payloadCols.intersect(leftCols).isEmpty,
      s"payload columns ${payloadCols.intersect(leftCols)} collide with left columns")
    // union-compatible frames: left rows carry a NULL payload STRUCT, right
    // rows a populated one; the whole struct is carried atomically so the
    // matched values all come from the SAME latest right row — including its
    // legitimately-NULL fields (last(ignoreNulls) per column would smear
    // older values over them). Side 0 sorts before side 1 at equal ts so a
    // right row at exactly left.ts matches (inclusive <=).
    val lExtra = leftCols.filterNot(c => keys.contains(c) || c == tsCol)
    val pStructType = org.apache.spark.sql.types.StructType(
      payloadCols.map(c => right.schema(c).copy(name = c)))
    val l = left
      .select((keys ++ Seq(tsCol) ++ lExtra).map(col) :+
        lit(null).cast(pStructType).as("_p"): _*)
      .withColumn("_side", lit(1))
    val r = right
      .select((keys :+ tsCol).map(col) ++
        lExtra.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(payloadCols.map(col): _*).as("_p"): _*)
      .withColumn("_side", lit(0))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("_m", last(col("_p"), ignoreNulls = true).over(w))
    carried.where(col("_side") === 1)
      .select(leftCols.map(col) ++
        payloadCols.map(c => col("_m").getField(c).as(c)): _*)
  }

  /** Every (a, b) row pair whose [aLo, aHi] and [bLo, bHi] intervals
    * overlap (inclusive), emitted EXACTLY ONCE: both sides explode to the
    * fixed-width buckets they cover, candidates equi-join on the bucket
    * (uniform shuffle), the exact overlap predicate runs on bucket-mates
    * only, and a pair is kept only in the bucket containing the overlap's
    * START (the max of the lo's) — exactly-once without shuffling the
    * candidate stream through a distinct. The replacement for a
    * BroadcastNestedLoop theta join when NEITHER side fits in memory;
    * `bucketWidth` trades per-row explode factor against candidate
    * density (set it near the typical interval length). */
  def overlapJoin(a: DataFrame, b: DataFrame, aLo: String, aHi: String,
      bLo: String, bHi: String, bucketWidth: Long): DataFrame = {
    val ea = a.withColumn("_bucket", explode(sequence(
      bucketOf(col(aLo), bucketWidth),
      bucketOf(col(aHi), bucketWidth))))
    val eb = b.withColumn("_bucket", explode(sequence(
      bucketOf(col(bLo), bucketWidth),
      bucketOf(col(bHi), bucketWidth))))
    ea.join(eb, Seq("_bucket"))
      .where(col(aLo) <= col(bHi) && col(bLo) <= col(aHi))
      .where(col("_bucket") ===
        bucketOf(greatest(col(aLo), col(bLo)), bucketWidth))
      .drop("_bucket")
  }

  /** Probe rows joined to every range containing them:
    * `probe.valueCol BETWEEN ranges.loCol AND ranges.hiCol`, bucket-expanded
    * with `bucketWidth`. Ranges may overlap; output one row per (probe row,
    * containing range). */
  def rangeJoin(probe: DataFrame, ranges: DataFrame, valueCol: String,
      loCol: String, hiCol: String, bucketWidth: Long): DataFrame = {
    val expanded = ranges.withColumn("_bucket",
      explode(sequence(
        bucketOf(col(loCol), bucketWidth),
        bucketOf(col(hiCol), bucketWidth))))
    val probed = probe.withColumn("_bucket",
      bucketOf(col(valueCol), bucketWidth))
    probed.join(expanded, Seq("_bucket"))
      .where(col(valueCol).between(col(loCol), col(hiCol)))
      .drop("_bucket")
  }
}
