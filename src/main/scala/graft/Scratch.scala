package graft

import org.apache.spark.sql.SparkSession

/** Local profiling scratchpad — not part of the driver contract. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"TIMER $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    args.headOption match {
      case Some("w3") =>
        time("w3_first")(queries.Queries.w3GapIslands(spark, sfDir).count())
        time("w3_second")(queries.Queries.w3GapIslands(spark, sfDir).count())
        queries.Queries.w3GapIslands(spark, sfDir).explain("formatted")
      case Some(q) =>
        val fn = SparkEntry.queries(q)
        time(s"${q}_first")(fn(spark, sfDir).count())
        time(s"${q}_second")(fn(spark, sfDir).count())
        fn(spark, sfDir).explain("formatted")
      case None => println("usage: Scratch <queryName>")
    }
    spark.stop()
  }
}
