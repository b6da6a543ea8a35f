package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * All queries in [[SparkEntry]] take an `sfDir` (e.g. `/root/testdata/sf0.01`)
  * and read one parquet file per table. At cluster scale these would be
  * date-partitioned Parquet/Delta directories; the loader shape is identical
  * (`spark.read.parquet(path)`), so nothing here changes at 100 TB — filters
  * and projections in downstream plans push into the scan (PushedFilters /
  * ReadSchema), and partition pruning applies when the layout is partitioned.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** `events.ts` is parquet timestamp[ns]. Spark 4 rejects NANOS timestamps
    * unless `spark.sql.legacy.parquet.nanosAsLong=true` (our sessions set
    * it), in which case the column arrives as LONG nanoseconds; DuckDB keeps
    * ns natively. Both floor toward negative infinity when converting to
    * epoch-millis, so all query logic works on a `ts_ms` LONG column — the
    * one representation that hash-compares identically across engines.
    * NOTE: ns epochs (~1.7e18) exceed double's 53-bit mantissa, so the
    * ns→ms conversion must be integer `div`, never a double divide.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    val tsMs = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000000")
      case _ => unixMillis(col("ts"))
    }
    raw.withColumn("ts_ms", tsMs)
  }

  /** unix_millis that tolerates TIMESTAMP_NTZ (parquet ns timestamps are read
    * as NTZ by Spark 4 by default; session TZ is UTC so the cast is exact). */
  def unixMillis(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    unix_millis(c.cast("timestamp"))
}
