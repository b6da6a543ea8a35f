package graft.flows

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** O4: partition health probe (SURVEY §2.7; reference
  * `doris_partition_health_check.py:50-66`): the reference iterates SHOW
  * PARTITIONS and runs `SELECT 1 ... PARTITION(p) LIMIT 1` per partition,
  * classifying failures by corruption keywords and optionally dropping bad
  * partitions (`:70-78`, DROP PARTITION FORCE). Here the table is a
  * partitioned parquet dir: list the `col=value` partition dirs, probe each
  * with a `limit(1)` scan, classify OK / EMPTY / CORRUPT / ERROR, and
  * optionally delete CORRUPT partition dirs.
  *
  * The per-partition loop is driver-side BY DESIGN: partitions are
  * metadata-scale (days, not rows — the same shape as the reference's SHOW
  * PARTITIONS iteration), and each probe reads one footer + at most one row.
  * The fact data itself is never scanned.
  */
object PartitionHealth {

  /** Corruption fingerprints (reference CORRUPTION_KEYWORDS analogue,
    * `doris_partition_health_check.py:21-29`, translated from Doris
    * tablet/segment errors to parquet-on-FS failure modes): a probe failure
    * counts as CORRUPT only when the error looks like storage-level damage;
    * anything else is operational noise (ERROR) and the partition is kept. */
  val corruptionKeywords: Seq[String] = Seq(
    "parquet", "footer", "magic", "checksum", "corrupt", "eof",
    "file not exist", "io error")

  case class PartitionStatus(partition: String, status: String, detail: String)

  private def probe(spark: SparkSession, tablePath: String): Seq[PartitionStatus] = {
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val partDirs = fs.listStatus(root)
      .filter(st => st.isDirectory && st.getPath.getName.contains("="))
      .map(_.getPath).sortBy(_.getName).toSeq
    partDirs.map { p =>
      val dataFiles = fs.listStatus(p).filter { f =>
        val n = f.getPath.getName
        f.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
      if (dataFiles.isEmpty) PartitionStatus(p.getName, "EMPTY", "no data files")
      else try {
        if (spark.read.parquet(p.toString).limit(1).count() == 0L)
          PartitionStatus(p.getName, "EMPTY", "zero rows")
        else PartitionStatus(p.getName, "OK", "")
      } catch {
        case e: Throwable =>
          val msg = String.valueOf(e.getMessage).toLowerCase
          val status =
            if (corruptionKeywords.exists(msg.contains)) "CORRUPT" else "ERROR"
          PartitionStatus(p.getName, status, msg.take(200))
      }
    }
  }

  /** Health report, one row per partition dir. */
  def check(spark: SparkSession, tablePath: String): DataFrame = {
    import spark.implicits._
    probe(spark, tablePath).toDF()
  }

  /** Probe and delete CORRUPT partitions (the reference's
    * `drop_partition ... FORCE`, `:70-78` — destructive, opt-in like its
    * `drop` flag). Returns the pre-drop report. */
  def dropCorrupt(spark: SparkSession, tablePath: String): DataFrame = {
    import spark.implicits._
    val statuses = probe(spark, tablePath)
    val fs = new Path(tablePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    statuses.filter(_.status == "CORRUPT").foreach { s =>
      fs.delete(new Path(tablePath, s.partition), true)
    }
    statuses.toDF()
  }
}
