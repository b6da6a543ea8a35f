package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Small-file compaction for partitioned parquet sinks.
  *
  * Every partitioned [[UpsertSink.upsert]] writes a touched day dir with up
  * to `spark.sql.shuffle.partitions` files, so a long-running ingest
  * accumulates small files per partition — the classic streaming-sink
  * maintenance problem. Compaction rewrites only the partition dirs whose
  * data-file count exceeds `maxFiles` into `targetFiles` files each, using
  * the same tmp-write + rename-aside swap as the sink itself: readers never
  * see a half-compacted dir, and a crash mid-swap is reconciled by
  * [[UpsertSink.recoverCrash]] on the next sink call (tmp/aside dirs are
  * siblings of the table root, never inside it — partition discovery stays
  * clean even mid-crash).
  *
  * The per-partition loop is driver-side by design (partitions are
  * metadata-scale — days, not rows); each oversized dir costs one
  * read+shuffle-free rewrite of just that dir's data.
  */
object Compaction {

  private def dataFiles(fs: org.apache.hadoop.fs.FileSystem, p: Path) =
    fs.listStatus(p).filter { f =>
      val n = f.getPath.getName
      f.isFile && !n.startsWith("_") && !n.startsWith(".")
    }

  /** Compact oversized partition dirs; returns a report row per partition
    * dir: (partition, files_before, files_after). */
  def compactPartitions(spark: SparkSession, path: String,
      targetFiles: Int = 1, maxFiles: Int = 4): DataFrame = {
    import spark.implicits._
    UpsertSink.recoverCrash(spark, path)
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty[(String, Int, Int)]
      .toDF("partition", "files_before", "files_after")
    val suffix = java.util.UUID.randomUUID().toString.take(8)
    val tmpRoot = new Path(path + ".tmp-" + suffix)
    val asideRoot = new Path(path + ".old-" + suffix)
    val parts = fs.listStatus(root)
      .filter(st => st.isDirectory && st.getPath.getName.contains("="))
      .map(_.getPath).sortBy(_.getName).toSeq
    val report = parts.map { p =>
      val before = dataFiles(fs, p).length
      if (before <= maxFiles) (p.getName, before, before)
      else {
        val tmpDir = new Path(tmpRoot, p.getName)
        // the write is the action that reads `p`; renames happen after
        spark.read.parquet(p.toString)
          .repartition(targetFiles)
          .write.mode(SaveMode.Overwrite).parquet(tmpDir.toString)
        fs.mkdirs(asideRoot)
        fs.rename(p, new Path(asideRoot, p.getName))
        fs.rename(tmpDir, p)
        (p.getName, before, dataFiles(fs, p).length)
      }
    }
    fs.delete(asideRoot, true)
    fs.delete(tmpRoot, true)
    report.toDF("partition", "files_before", "files_after")
  }
}
