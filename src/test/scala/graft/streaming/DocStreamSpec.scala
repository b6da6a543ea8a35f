package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

class DocStreamSpec extends SparkSpec {
  import spark.implicits._

  private val markers = Seq(
    "en" -> Seq("the", "and"), "de" -> Seq("der", "und"))
  private val stopwords = Seq("the", "and")

  test("pipe2 funnel is batch-split invariant: 1 delivery vs 3 deliveries") {
    // passageK=5, 10-token docs → 2 passages each. Hand-computed winners:
    // d1 introduces P_A,P_B (2/2 kept, survives); d2 re-uses P_A (1/2,
    // survives); d3 re-uses P_B and P_A ACROSS batches (0/2, cut); d4
    // re-uses d2's P_C (1/2, survives); d5 is an exact cross-batch dup of
    // d1 (deduped); d6 re-uses P_A (1/2, survives).
    val d1 = "a1 a2 a3 a4 a5 b1 b2 b3 b4 b5"
    val d2 = "a1 a2 a3 a4 a5 c1 c2 c3 c4 c5"
    val d3 = "b1 b2 b3 b4 b5 a1 a2 a3 a4 a5"
    val d4 = "c1 c2 c3 c4 c5 e1 e2 e3 e4 e5"
    val d6 = "f1 f2 f3 f4 f5 a1 a2 a3 a4 a5"
    val all = Seq(1L -> d1, 2L -> d2, 3L -> d3, 4L -> d4, 5L -> d1, 6L -> d6)
    def run(splits: Seq[Seq[(Long, String)]], tag: String): List[Long] = {
      val base = Files.createTempDirectory(s"pipe2$tag")
      val drop = base.resolve("drop"); Files.createDirectories(drop)
      val sink = base.resolve("sink").toString
      val store = base.resolve("pstore").toString
      val ckpt = base.resolve("ckpt").toString
      splits.zipWithIndex.foreach { case (docs, i) =>
        Files.write(drop.resolve(s"f$i.txt"),
          docs.map { case (id, t) => s"$id\t$t" }.mkString("\n").getBytes)
        DocStream.ingestFunnel(spark, drop.toString, ckpt, sink, store,
          minQuality = 0.0, langs = Seq("en"), passageK = 5,
          sampleRates = Map.empty, sampleDefault = 1.0,
          markers = markers, stopwords = stopwords,
          trigger = Trigger.AvailableNow()).awaitTermination(60000)
      }
      spark.read.parquet(sink).select($"doc_id").as[Long]
        .collect().sorted.toList
    }
    val one = run(Seq(all), "one")
    val three = run(Seq(all.take(2), all.slice(2, 4), all.drop(4)), "three")
    assert(one == three, s"split-variant survivors: $one vs $three")
    assert(one == List(1L, 2L, 4L, 6L))
  }

  test("doc ingest quality-gates, dedups within and across micro-batches") {
    val base = Files.createTempDirectory("docstream")
    val drop = base.resolve("drop"); Files.createDirectories(drop)
    val sink = base.resolve("sink").toString
    val ckpt = base.resolve("ckpt").toString

    // doc 1 and 2 share content (batch-internal dup); doc 3 is under the
    // quality gate
    Files.write(drop.resolve("b1.txt"), Seq(
      "1\tthe quick brown fox jumps over the lazy dog",
      "2\tthe quick brown fox jumps over the lazy dog",
      "3\thi").mkString("\n").getBytes)
    DocStream.ingest(spark, drop.toString, ckpt, sink, minTokens = 3,
      markers, stopwords, Trigger.AvailableNow()).awaitTermination(60000)
    val r1 = spark.read.parquet(sink)
      .select($"doc_id", $"lang").as[(Long, String)].collect().toList
    assert(r1 == List((1L, "en"))) // min doc_id wins; short doc gated out

    // batch 2 re-delivers the same content (cross-batch dup) + one new doc
    Files.write(drop.resolve("b2.txt"), Seq(
      "4\tthe quick brown fox jumps over the lazy dog",
      "5\tder hund und die katze laufen schnell").mkString("\n").getBytes)
    DocStream.ingest(spark, drop.toString, ckpt, sink, minTokens = 3,
      markers, stopwords, Trigger.AvailableNow()).awaitTermination(60000)
    val r2 = spark.read.parquet(sink)
      .select($"doc_id", $"lang").as[(Long, String)]
      .collect().sortBy(_._1).toList
    assert(r2 == List((1L, "en"), (5L, "de"))) // 4 deduped across batches
  }

  test("w16 admission: index reject, in-batch reject, append-back reject, " +
      "shingle-less admit") {
    import org.apache.spark.sql.SaveMode
    val base = Files.createTempDirectory("admit")
    val drop = base.resolve("drop"); Files.createDirectories(drop)
    val sink = base.resolve("sink").toString
    val ckpt = base.resolve("ckpt").toString
    val idx = base.resolve("idx").toString
    val corpusText = "x1 x2 x3 x4 x5"
    val freshText = "y1 y2 y3 y4 y5"
    // exact dups only (jaccard 1.0 => identical signatures => every band
    // collides): band collision is then guaranteed, keeping the spec
    // hand-computable; near-dup recall is the LSH s-curve's business
    graft.operators.Dedup.writeTaggedIndex(
      Seq((100L, corpusText)).toDF("doc_id", "text"), "doc_id", "text",
      idx, k = 16, bands = 4, shingleK = 3, tag = -1L, SaveMode.Overwrite)
    // batch 0: doc 1 dups the index, doc 5 dups in-batch doc 3 (smaller
    // id wins), doc 11 has <3 tokens (no shingles -> admitted)
    Files.write(drop.resolve("b0.txt"), Seq(
      s"1\t$corpusText", s"3\t$freshText", s"5\t$freshText",
      "11\tw1 w2").mkString("\n").getBytes)
    drop.resolve("b0.txt").toFile.setLastModified(1700000000000L)
    // batch 1: doc 7 dups doc 3 — rejected ONLY via append-back; doc 9 fresh
    Files.write(drop.resolve("b1.txt"), Seq(
      s"7\t$freshText", "9\tz1 z2 z3 z4 z5").mkString("\n").getBytes)
    drop.resolve("b1.txt").toFile.setLastModified(1700000001000L)
    DocStream.admitNearDup(spark, drop.toString, ckpt, idx, sink,
      k = 16, bands = 4, shingleK = 3, threshold = 0.6)
      .awaitTermination(120000)
    val got = spark.read.parquet(sink).distinct()
      .select($"doc_id", $"batch").as[(Long, Long)]
      .collect().sortBy(_._1).toList
    assert(got == List((3L, 0L), (9L, 1L), (11L, 0L)))

    // crash-replay idempotency: the same batch applied twice (same
    // batchId) ends in the same state — the probe excludes rows tagged
    // with its own batch id and the sink dedupes at read time
    val b2 = Seq((13L, "z1 z2 z3 z4 z5"), (15L, "v1 v2 v3 v4 v5"))
      .toDF("doc_id", "text")
    graft.operators.Dedup.admitBatch(b2, 2L, "doc_id", "text", idx, sink,
      k = 16, bands = 4, shingleK = 3, threshold = 0.6).unpersist()
    graft.operators.Dedup.admitBatch(b2, 2L, "doc_id", "text", idx, sink,
      k = 16, bands = 4, shingleK = 3, threshold = 0.6).unpersist()
    val replayed = spark.read.parquet(sink).distinct()
      .select($"doc_id", $"batch").as[(Long, Long)]
      .collect().sortBy(_._1).toList
    // 13 rejected (dups admitted doc 9 via the index), 15 admitted ONCE
    assert(replayed ==
      List((3L, 0L), (9L, 1L), (11L, 0L), (15L, 2L)))
  }

  test("w16 tagged index is BUCKET-PARTITIONED: pruned reads carry a " +
      "bucket partition filter and touch only the probed bucket dirs") {
    import org.apache.spark.sql.SaveMode
    val base = Files.createTempDirectory("bandprune")
    val idx = base.resolve("idx").toString
    // enough distinct docs that several band-buckets are populated
    val docs = (0L until 24L).map(i =>
      (i, s"w${i}a w${i}b w${i}c w${i}d w${i}e"))
    graft.operators.Dedup.writeTaggedIndex(
      docs.toDF("doc_id", "text"), "doc_id", "text",
      idx, k = 16, bands = 4, shingleK = 3, tag = -1L, SaveMode.Overwrite)
    import scala.jdk.CollectionConverters._
    val ls = Files.list(java.nio.file.Paths.get(idx).resolve("bands"))
    val bucketDirs = try ls.iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith("bucket=")).toList finally ls.close()
    assert(bucketDirs.size >= 3, s"fixture too small: $bucketDirs")
    val probed = bucketDirs.take(2)
      .map(_.stripPrefix("bucket=").toLong).sorted
    val pruned = graft.operators.Dedup.readBucketPruned(spark,
      s"$idx/bands", probed, tag = 9L)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val scan = scans(pruned.queryExecution.executedPlan).head
    assert(scan.partitionFilters
        .exists(_.references.exists(_.name == "bucket")),
      s"no bucket partition filter on the bands scan: " +
        s"${scan.partitionFilters}")
    import org.apache.spark.sql.functions.input_file_name
    val files = pruned.select(input_file_name()).distinct()
      .as[String].collect()
    assert(files.nonEmpty &&
      files.forall(f => probed.exists(b => f.contains(s"/bucket=$b/"))),
      s"unpruned files read: ${files.mkString(", ")}")
  }

  test("w16 admission: an EMPTY middle drop file keeps its own micro-batch " +
      "id, so later batch ids stay aligned with file order") {
    // w16's fixture prep (Queries.scala) writes an empty drop file when a
    // batch has no rows, relying on the file source still allocating that
    // file its own micro-batch id; if the source ever skipped empty files,
    // every later batch id would shift relative to the oracle's
    // (doc_id div 2) % 3 mapping and the hash comparison would fail
    // confusingly far from the cause. Pin the contract here.
    import org.apache.spark.sql.SaveMode
    val base = Files.createTempDirectory("admitempty")
    val drop = base.resolve("drop"); Files.createDirectories(drop)
    val sink = base.resolve("sink").toString
    val ckpt = base.resolve("ckpt").toString
    val idx = base.resolve("idx").toString
    graft.operators.Dedup.writeTaggedIndex(
      Seq((100L, "x1 x2 x3 x4 x5")).toDF("doc_id", "text"), "doc_id",
      "text", idx, k = 16, bands = 4, shingleK = 3, tag = -1L,
      SaveMode.Overwrite)
    Files.write(drop.resolve("b0.txt"),
      "1\ta1 a2 a3 a4 a5".getBytes)
    drop.resolve("b0.txt").toFile.setLastModified(1700000000000L)
    Files.createFile(drop.resolve("b1.txt")) // the empty middle batch
    drop.resolve("b1.txt").toFile.setLastModified(1700000001000L)
    Files.write(drop.resolve("b2.txt"),
      "5\tc1 c2 c3 c4 c5".getBytes)
    drop.resolve("b2.txt").toFile.setLastModified(1700000002000L)
    DocStream.admitNearDup(spark, drop.toString, ckpt, idx, sink,
      k = 16, bands = 4, shingleK = 3, threshold = 0.6)
      .awaitTermination(120000)
    val got = spark.read.parquet(sink).distinct()
      .select($"doc_id", $"batch").as[(Long, Long)]
      .collect().sortBy(_._1).toList
    // doc 5 must carry batch id 2, NOT 1: the empty file consumed id 1
    assert(got == List((1L, 0L), (5L, 2L)))
  }
}
