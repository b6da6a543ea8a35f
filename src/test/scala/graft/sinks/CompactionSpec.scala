package graft.sinks

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  private def fsOf(path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dataFileCount(path: String, part: String): Int =
    fsOf(path).listStatus(new org.apache.hadoop.fs.Path(path, part))
      .count { f =>
        val n = f.getPath.getName
        f.isFile && !n.startsWith("_") && !n.startsWith(".")
      }

  test("k4 flow: fragmented lang dirs genuinely compact to one file each") {
    val sfDir = "/root/testdata/sf0.001"
    val root = Files.createTempDirectory("k4spec")
      .resolve("docs_by_lang").toString
    val docs = graft.Tables.documents(spark, sfDir)
    for (i <- 0 until 8)
      docs.where(col("doc_id") % 8 === i)
        .write.mode("append").partitionBy("lang").parquet(root)
    val before = dataFileCount(root, "lang=en")
    assert(before > 2, s"fixture not fragmented: $before files")
    val report = Compaction.compactPartitions(spark, root,
      targetFiles = 1, maxFiles = 2)
      .as[(String, Int, Int)].collect()
    assert(report.nonEmpty && report.forall(_._3 <= 2))
    assert(dataFileCount(root, "lang=en") == 1)
    // content preserved exactly (the k4 oracle checks this by hash too)
    assert(spark.read.parquet(root).count() == docs.count())
  }

  test("compactPartitions rewrites only oversized dirs, preserving rows") {
    val path = Files.createTempDirectory("compact").toString + "/t"
    // day1: 8 files (oversized); day2: 1 file (under budget)
    (0 until 64).map(i => (i.toLong, "2024-01-01")).toDF("v", "dt_date")
      .repartition(8)
      .write.partitionBy("dt_date").parquet(path)
    (100 until 104).map(i => (i.toLong, "2024-01-02")).toDF("v", "dt_date")
      .coalesce(1)
      .write.mode("append").partitionBy("dt_date").parquet(path)
    assert(dataFileCount(path, "dt_date=2024-01-01") == 8)
    val day2Before = fsOf(path)
      .listStatus(new org.apache.hadoop.fs.Path(path, "dt_date=2024-01-02"))
      .map(st => (st.getPath.getName, st.getLen, st.getModificationTime))
      .sortBy(_._1).toList
    Thread.sleep(5)
    val before = spark.read.parquet(path).select("v").as[Long].collect().sorted
    val report = Compaction.compactPartitions(spark, path,
      targetFiles = 1, maxFiles = 4)
      .as[(String, Int, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(report("dt_date=2024-01-01") == ((8, 1)))
    assert(report("dt_date=2024-01-02") == ((1, 1)))
    assert(dataFileCount(path, "dt_date=2024-01-01") == 1)
    // under-budget partition untouched byte-for-byte
    assert(fsOf(path)
      .listStatus(new org.apache.hadoop.fs.Path(path, "dt_date=2024-01-02"))
      .map(st => (st.getPath.getName, st.getLen, st.getModificationTime))
      .sortBy(_._1).toList == day2Before)
    // rows identical after compaction
    val after = spark.read.parquet(path).select("v").as[Long].collect().sorted
    assert(after.toList == before.toList)
    // no tmp/aside leftovers
    val parent = new org.apache.hadoop.fs.Path(path).getParent
    assert(!fsOf(path).listStatus(parent).exists(
      _.getPath.getName.matches(".*\\.(tmp|old)-.*")))
  }

  test("compactPartitions on a missing table returns an empty report") {
    assert(Compaction.compactPartitions(spark, "/tmp/compact-none").count() == 0)
  }
}
