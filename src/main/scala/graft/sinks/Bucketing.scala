package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed-table layout for shuffle-free co-located joins (SURVEY §4 /
  * build-prompt "partitioning & shuffle").
  *
  * Writing both sides of a hot join bucketed (+sorted) by the join key lets
  * Spark plan a sort-merge join with NO Exchange on either side: each task
  * reads bucket i of both tables. At 100 TB this converts the dominant
  * fact⋈fact shuffle (terabytes over the network per query) into pure local
  * reads — the single biggest static-layout lever the engine controls.
  * Bucket count should be sized so bucket × columns fits executor memory
  * (here 8 for tests; thousands at scale).
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table. Idempotent across
    * SESSIONS, not just within one: a previous JVM's warehouse directory
    * survives while the in-memory catalog forgets the table, and a plain
    * Overwrite then fails with LOCATION_ALREADY_EXISTS — so any orphaned
    * location is cleared first. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      keys: Seq[String]): Unit = {
    val s = df.sparkSession
    s.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }
}
