package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

class DocStreamSpec extends SparkSpec {
  import spark.implicits._

  private val markers = Seq(
    "en" -> Seq("the", "and"), "de" -> Seq("der", "und"))
  private val stopwords = Seq("the", "and")

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
}
