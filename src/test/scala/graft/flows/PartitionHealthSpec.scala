package graft.flows

import java.nio.file.Files
import graft.SparkSpec

class PartitionHealthSpec extends SparkSpec {
  import spark.implicits._

  private def mkTable(): String = {
    val path = Files.createTempDirectory("ph").toString + "/t"
    Seq(("BTC", 1L, "2024-01-01"), ("BTC", 2L, "2024-01-02"))
      .toDF("symbol", "ts", "dt_date")
      .write.partitionBy("dt_date").parquet(path)
    path
  }

  private def fsOf(path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("check classifies OK / EMPTY / CORRUPT per partition dir") {
    val path = mkTable()
    val fs = fsOf(path)
    // an empty partition dir (crash leftovers / manual cleanup artifact)
    fs.mkdirs(new org.apache.hadoop.fs.Path(path, "dt_date=2024-01-03"))
    // a corrupt partition: a .parquet file without footer/magic
    val bad = new org.apache.hadoop.fs.Path(path, "dt_date=2024-01-04/part-0.parquet")
    val out = fs.create(bad)
    out.write("this is not a parquet file".getBytes("UTF-8"))
    out.close()
    val st = PartitionHealth.check(spark, path)
      .select("partition", "status").as[(String, String)].collect().toMap
    assert(st("dt_date=2024-01-01") == "OK")
    assert(st("dt_date=2024-01-02") == "OK")
    assert(st("dt_date=2024-01-03") == "EMPTY")
    assert(st("dt_date=2024-01-04") == "CORRUPT")
    assert(st.size == 4)
  }

  test("dropCorrupt deletes only CORRUPT partitions (reference DROP PARTITION FORCE)") {
    val path = mkTable()
    val fs = fsOf(path)
    fs.mkdirs(new org.apache.hadoop.fs.Path(path, "dt_date=2024-01-03"))
    val bad = new org.apache.hadoop.fs.Path(path, "dt_date=2024-01-04/part-0.parquet")
    val out = fs.create(bad)
    out.write("garbage".getBytes("UTF-8"))
    out.close()
    PartitionHealth.dropCorrupt(spark, path)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path, "dt_date=2024-01-04")))
    // healthy and empty partitions stay
    assert(fs.exists(new org.apache.hadoop.fs.Path(path, "dt_date=2024-01-01")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(path, "dt_date=2024-01-03")))
    assert(spark.read.parquet(path).count() == 2)
  }

  test("check on a missing table is empty, not an error") {
    assert(PartitionHealth.check(spark, "/tmp/ph-no-such-table").count() == 0)
  }
}
