package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.queries.QuerySpec._

/** Proves the z-order layout claim on real files: the SAME selective
  * predicate touches few files under a Morton layout on EITHER dimension,
  * while a single-column sort only prunes its own column. "Touches" =
  * files containing matching rows (`input_file_name` of the filtered
  * scan) — exactly the lower bound a footer-stats planner can reach. */
class LayoutSpec extends SparkSpec {

  // sf0.01: the full 150-user × [0,490) value domain — at sf0.001 the
  // probe rectangle matches only 8 rows and the blind-axis claim is vacuous
  private val sfDir = "/root/testdata/sf0.01"
  private val nFiles = 16

  private def quantized: DataFrame =
    Tables.events(spark, sfDir).select(
      col("user_id").cast("long").as("ux"),
      least(floor(col("value") / 2).cast("long"), lit(255L)).as("vy"))

  private def contributingFiles(path: String, pred: org.apache.spark.sql.Column): Long =
    spark.read.parquet(path).where(pred)
      .select(input_file_name()).distinct().count()

  test("morton layout prunes files on both dimensions; single-sort on one") {
    val root = Files.createTempDirectory("layout").toString
    val uxSorted = s"$root/by_ux"
    val zSorted = s"$root/by_z"
    quantized.repartitionByRange(nFiles, col("ux"))
      .sortWithinPartitions(col("ux")).write.parquet(uxSorted)
    quantized.withColumn("z", Layout.morton(col("ux"), col("vy"), ZBits))
      .repartitionByRange(nFiles, col("z")).sortWithinPartitions(col("z"))
      .drop("z").write.parquet(zSorted)

    val uxPred = col("ux").between(ZProbeUx._1, ZProbeUx._2)
    val vyPred = col("vy").between(ZProbeVy._1, ZProbeVy._2)

    val uxOnUx = contributingFiles(uxSorted, uxPred)
    val vyOnUx = contributingFiles(uxSorted, vyPred)
    val uxOnZ = contributingFiles(zSorted, uxPred)
    val vyOnZ = contributingFiles(zSorted, vyPred)

    // single-dim sort: perfect on its own column, blind on the other
    assert(uxOnUx <= 3, s"ux-sorted layout spread the ux probe: $uxOnUx")
    assert(vyOnUx >= nFiles - 2,
      s"vy probe should touch ~all ux-sorted files, got $vyOnUx")
    // morton: strictly better than the blind axis on BOTH probes
    assert(uxOnZ < vyOnUx, s"z-layout ux probe $uxOnZ !< blind $vyOnUx")
    assert(vyOnZ < vyOnUx, s"z-layout vy probe $vyOnZ !< blind $vyOnUx")
  }

  test("morton interleave round-trips bit positions") {
    val df = spark.range(0, 256).select(
      (col("id") % 16).as("x"), (col("id") / 16).cast("long").as("y"))
    val z = df.select(col("x"), col("y"),
      Layout.morton(col("x"), col("y"), 4).as("z"))
    // de-interleave in plain Scala and compare
    z.collect().foreach { r =>
      val (x, y, zv) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val dx = (0 until 4).map(b => ((zv >> (2 * b)) & 1L) << b).sum
      val dy = (0 until 4).map(b => ((zv >> (2 * b + 1)) & 1L) << b).sum
      assert(dx == x && dy == y, s"($x,$y) -> $zv -> ($dx,$dy)")
    }
  }
}
