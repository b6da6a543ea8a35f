package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType, StructField,
  StructType}

import graft.SparkSpec
import graft.operators.{MediaSpine, Multimodal, Similarity}

/** M7 streaming multimodal admission — hand-crafted byte payloads so
  * every gate is verifiable on paper. Feature geometry: a payload of one
  * repeated byte pattern yields the SAME normalized 8-dim byte-lane
  * vector at any repetition count (sums scale, normalization cancels),
  * so "x"*32 vs "x"*64 is a perfect near-dup (cosine 1.0). All-positive
  * byte features cluster tightly (ASCII text directions differ only at
  * the 4th decimal — cos(pA, pB) ~0.99974 on paper), so the spec
  * threshold sits at 0.99999: ONLY the exact-pattern repetition crosses
  * it, and every other pair stays below. */
class MediaStreamSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("payload", BinaryType)))

  private def bytes(s: String): Array[Byte] = s.getBytes("UTF-8")

  private def stageFile(rows: Seq[(Long, Array[Byte])], drop: Path,
      b: Int): Unit = {
    val tmp = Files.createTempDirectory(s"mediastage$b")
    rows.toDF("doc_id", "payload")
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    import scala.jdk.CollectionConverters._
    val ls = Files.list(tmp)
    val part = try ls.iterator().asScala
      .find(p => p.getFileName.toString.startsWith("part-") &&
        p.getFileName.toString.endsWith(".parquet")).get
      finally ls.close()
    val f = drop.resolve(s"b$b.parquet")
    Files.move(part, f)
    f.toFile.setLastModified(1700000000000L + b * 1000L)
  }

  /** Feature centroids computed through the SAME staged chain the
    * operator uses (the quantizer is frozen model state). */
  private def centsOf(rows: Seq[(Long, Array[Byte])])
      : Array[(Long, Array[Double])] =
    Similarity.collectCentroids(
      Multimodal.stagedFeatures(rows.toDF("doc_id", "payload"),
        "doc_id", "payload"), "doc_id", "f")

  // distinct byte patterns → distinct feature directions
  private val pA = bytes("x" * 32)            // pattern A
  private val pA2 = bytes("x" * 64)           // A repeated — cosine 1 vs pA
  private val pB = bytes("abcdefgh" * 4)      // pattern B
  private val pC = bytes("aznq" * 8)          // pattern C

  test("m7 admission: sha exact reject (in-batch min id + store " +
      "append-back), feature near-dup reject, census grains") {
    val base = Files.createTempDirectory("mediaadmit")
    val drop = base.resolve("drop"); Files.createDirectories(drop)
    val sha = base.resolve("sha").toString
    val vecIdx = base.resolve("vecIdx").toString
    val census = base.resolve("census").toString
    val ckpt = base.resolve("ckpt").toString
    val cents = centsOf(Seq(0L -> pA, 1L -> pB, 2L -> pC))
    // base stores: doc 100 holds pattern B
    val baseRows = Seq(100L -> pB)
    baseRows.toDF("doc_id", "payload")
      .select(col("doc_id").as("id"), sha2(col("payload"), 256).as("sha"))
      .select(concat(lit("p"), substring(col("sha"), 1, 1)).as("spp"),
        col("sha"), col("id"), lit(-1L).as("batch_id"))
      .repartition(col("spp"))
      .write.mode(SaveMode.Overwrite).partitionBy("spp").parquet(sha)
    Similarity.writeVecIndex(
      Multimodal.stagedFeatures(baseRows.toDF("doc_id", "payload"),
        "doc_id", "payload"), "doc_id", "f", vecIdx, cents, tag = -1L,
      SaveMode.Overwrite)
    // batch 0: 1 = byte-identical to base 100 (sha store reject);
    // 3 and 5 byte-identical pattern C (in-batch: min id 3 wins, 5
    // rejected at the exact gate); 7 = pA (fresh, admitted);
    // 9 = pA2 (exact-fresh — different BYTES than 7 — but feature
    // near-dup of batch-mate 7: cosine 1.0 >= threshold, rejected)
    stageFile(Seq(1L -> pB, 3L -> pC, 5L -> pC, 7L -> pA, 9L -> pA2),
      drop, 0)
    // batch 1: 11 = pC byte-identical to batch 0's EXACT-FRESH 3 (sha
    // append-back reject — 3 was admitted); 13 = pA2 byte-identical to
    // batch 0's exact-fresh 9 (sha append-back reject EVEN THOUGH 9
    // lost the near-dup cut — byte-identical content is a duplicate
    // regardless of its first occurrence's vector fate)
    stageFile(Seq(11L -> pC, 13L -> pA2), drop, 1)
    MediaStream.admitMedia(spark, drop.toString, ckpt, sha, vecIdx,
      census, cents, nprobe = 2, threshold = 0.99999, shards = 4L, schema)
      .awaitTermination(120000)
    val rows = spark.read.parquet(census).distinct()
    val admitted = rows.where($"section" === "admit")
      .select($"k", $"aux").as[(String, Long)].collect().sortBy(_._1)
      .toList
    assert(admitted == List(("3", 0L), ("7", 0L)),
      s"admitted: $admitted")
    // funnel: batch 0 arrived 5, exact-fresh 3 (5 lost in-batch to 3,
    // 1 to the store), admitted 2 (9 near-dup of 7); batch 1 arrived 2,
    // exact-fresh 0 (both shas already stored), admitted 0
    val funnel = rows.where($"section" === "funnel")
      .select($"k", $"cnt").as[(String, Long)].collect().toMap
    assert(funnel("0|0_arrived") == 5 && funnel("0|1_exact") == 3 &&
      funnel("0|2_admit") == 2, s"batch-0 funnel: $funnel")
    assert(funnel("1|0_arrived") == 2 && funnel("1|1_exact") == 0 &&
      funnel("1|2_admit") == 0, s"batch-1 funnel: $funnel")
    // shard manifest: rollup covers exactly the admitted docs' bytes
    val shardToks = rows.where($"section" === "shard")
      .agg(sum($"toks")).as[Long].head()
    assert(shardToks == pC.length + pA.length, s"shard bytes: $shardToks")
    // the sha store is prefix-partitioned on disk and carries every
    // exact-fresh doc (3, 7, AND near-dup-rejected 9), tagged
    val shaRows = spark.read.parquet(sha)
      .select($"id", $"batch_id").distinct()
      .as[(Long, Long)].collect().sortBy(_._1).toList
    assert(shaRows == List((3L, 0L), (7L, 0L), (9L, 0L), (100L, -1L)),
      s"sha store: $shaRows")
    import scala.jdk.CollectionConverters._
    val sppDirs = Files.list(java.nio.file.Paths.get(sha))
    val dirs = try sppDirs.iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("spp=")).toList
      finally sppDirs.close()
    assert(dirs.nonEmpty, "sha store not partitioned by spp")
    // the feature index carries base + ADMITTED features only (9's
    // vector never appended)
    val idxIds = spark.read.parquet(s"$vecIdx/vecs")
      .select($"id").distinct().as[Long].collect().sorted.toList
    assert(idxIds == List(3L, 7L, 100L), s"vec index: $idxIds")
  }

  test("m7 crash-replay idempotency: the same batch applied twice ends " +
      "in the same census/store state") {
    val base = Files.createTempDirectory("mediareplay")
    val sha = base.resolve("sha").toString
    val vecIdx = base.resolve("vecIdx").toString
    val census = base.resolve("census").toString
    val cents = centsOf(Seq(0L -> pA, 1L -> pB, 2L -> pC))
    Similarity.writeVecIndex(
      Multimodal.stagedFeatures(Seq(100L -> pB).toDF("doc_id", "payload"),
        "doc_id", "payload"), "doc_id", "f", vecIdx, cents, tag = -1L,
      SaveMode.Overwrite)
    val b0 = Seq(1L -> pA, 3L -> pB).toDF("doc_id", "payload")
    MediaSpine.ingestBatch(b0, 0L, "doc_id", "payload", sha, vecIdx,
      census, cents, nprobe = 2, threshold = 0.99999, shards = 4L)
    MediaSpine.ingestBatch(b0, 0L, "doc_id", "payload", sha, vecIdx,
      census, cents, nprobe = 2, threshold = 0.99999, shards = 4L)
    // 1 (pA) fresh + feature-fresh → admitted once; 3 (pB) exact-fresh
    // (no pB sha in an EMPTY sha store) but near-dups indexed 100 → sha
    // recorded, vector rejected
    val rows = spark.read.parquet(census).distinct()
    val admitted = rows.where($"section" === "admit")
      .select($"k").as[String].collect().toList
    assert(admitted == List("1"), s"admitted: $admitted")
    val funnel = rows.where($"section" === "funnel").count()
    assert(funnel == 3, s"replay duplicated funnel rows: $funnel")
    val idxIds = spark.read.parquet(s"$vecIdx/vecs")
      .select($"id", $"batch_id").distinct()
      .as[(Long, Long)].collect().sortBy(_._1).toList
    assert(idxIds == List((1L, 0L), (100L, -1L)), s"vec index: $idxIds")
    val shaIds = spark.read.parquet(sha)
      .select($"id").distinct().as[Long].collect().sorted.toList
    assert(shaIds == List(1L, 3L), s"sha store: $shaIds")
  }

  test("m7 across a quantizer-refresh boundary: the feature index is the " +
      "same Similarity layout, so refreshQuantizer + rebuildVecIndex " +
      "serve the multimodal plane unchanged; epoch-1 replay idempotent") {
    val base = Files.createTempDirectory("mediarequant")
    val sha = base.resolve("sha").toString
    val vecIdx0 = base.resolve("vecIdx_e0").toString
    val vecIdx1 = base.resolve("vecIdx_e1").toString
    val census = base.resolve("census").toString
    val cents0 = centsOf(Seq(0L -> pA, 1L -> pB, 2L -> pC))
    Similarity.writeVecIndex(
      Multimodal.stagedFeatures(Seq(100L -> pB).toDF("doc_id", "payload"),
        "doc_id", "payload"), "doc_id", "f", vecIdx0, cents0, tag = -1L,
      SaveMode.Overwrite)
    // epoch 0, batch 0: 1 = pA fresh + feature-fresh → admitted;
    // 3 = pB exact-fresh but near-dups indexed 100 → vector rejected
    MediaSpine.ingestBatch(
      Seq(1L -> pA, 3L -> pB).toDF("doc_id", "payload"), 0L, "doc_id",
      "payload", sha, vecIdx0, census, cents0, nprobe = 2,
      threshold = 0.99999, shards = 4L, epoch = 0L)
    // boundary: the refresh/rebuild pair is plane-agnostic — it reads the
    // SAME `vecs` layout MediaSpine appends to (8-dim byte-lane features)
    val cents1 = Similarity.refreshQuantizer(spark, vecIdx0, cents0,
      dim = 8)
    Similarity.rebuildVecIndex(spark, vecIdx0, vecIdx1, cents1)
    // epoch 1, batch 0 (tag namespace restarts), applied TWICE — the
    // cross-boundary replay shape: 5 = pA2 (exact-fresh BYTES, but its
    // feature direction is identical to epoch-0-admitted 1 — cosine 1.0
    // under ANY quantizer — so the vector gate rejects it against the
    // rebuilt index); 7 = pC fresh in its own cell → admitted
    val b1 = Seq(5L -> pA2, 7L -> pC).toDF("doc_id", "payload")
    MediaSpine.ingestBatch(b1, 0L, "doc_id", "payload", sha, vecIdx1,
      census, cents1, nprobe = 2, threshold = 0.99999, shards = 4L,
      epoch = 1L)
    MediaSpine.ingestBatch(b1, 0L, "doc_id", "payload", sha, vecIdx1,
      census, cents1, nprobe = 2, threshold = 0.99999, shards = 4L,
      epoch = 1L)
    val rows = spark.read.parquet(census).distinct()
    val admitted = rows.where($"section" === "admit")
      .select($"k", $"batch_tag").as[(String, Long)].collect()
      .sortBy(_._1).toList
    assert(admitted == List(("1", 0L), ("7", 1000000L)),
      s"admitted: $admitted")
    // rebuilt index: epoch-0 rows keep their tags; the epoch-1 admit
    // lands under its namespaced tag; the replay appended nothing new
    val idxState = spark.read.parquet(s"$vecIdx1/vecs")
      .select($"id", $"batch_id").distinct()
      .as[(Long, Long)].collect().sortBy(_._1).toList
    assert(idxState == List((1L, 0L), (7L, 1000000L), (100L, -1L)),
      s"vec index: $idxState")
    // sha store: every exact-fresh payload across both epochs, once
    val shaIds = spark.read.parquet(sha)
      .select($"id").distinct().as[Long].collect().sorted.toList
    assert(shaIds == List(1L, 3L, 5L, 7L), s"sha store: $shaIds")
  }

  test("m7 tag namespacing is enforced (batchId < 1e6)") {
    val base = Files.createTempDirectory("mediatagns")
    val cents = centsOf(Seq(0L -> pA, 1L -> pB, 2L -> pC))
    intercept[IllegalArgumentException] {
      MediaSpine.ingestBatch(
        Seq(1L -> pA).toDF("doc_id", "payload"), 1000000L, "doc_id",
        "payload", base.resolve("sha").toString,
        base.resolve("vecIdx").toString,
        base.resolve("census").toString, cents,
        nprobe = 1, threshold = 0.99999, shards = 4L)
    }
  }
}
