package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Oracles, Queries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The query surface lives in [[graft.queries.Queries]]; the DuckDB oracle
  * twins in [[graft.queries.Oracles]].
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. */
  def oracleSql: Map[String, String] = Oracles.all
}
