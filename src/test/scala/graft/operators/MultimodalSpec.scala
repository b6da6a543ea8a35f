package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("extractMeta: byte length, digest, header, frame samples") {
    val df = Seq((1L, "abcdefghijklmnopqrstuvwxyz0123456789abcdefghijklmnopq"))
      .toDF("doc_id", "text")
      .select($"doc_id", $"text".cast("binary").as("payload"))
    val out = Multimodal.extractMeta(df, "doc_id", "payload")
      .as[(Long, Long, String, String, String)].head()
    assert(out._2 == 53)                       // n_bytes
    assert(out._3.length == 32)                // md5 hex
    assert(out._4 == "6162636465666768")       // "abcdefgh" hex, lowercase
    val frames = out._5.split("-")
    assert(frames(0) == "61626364")            // bytes 1-4
    assert(frames(1) == "71727374")            // bytes 17-20 ("qrst")
  }

  test("decode and feature-extract stubs: deterministic, right batch shape") {
    val df = Seq((1L, "some image bytes"), (2L, "")).toDF("doc_id", "text")
      .select($"doc_id", $"text".cast("binary").as("payload"))
    val dec = df.select($"doc_id",
      Multimodal.decodeImageStub($"payload").as("whc"))
      .select($"doc_id", $"whc._1", $"whc._2", $"whc._3")
      .as[(Long, Int, Int, Int)].collect().sortBy(_._1)
    assert(dec(0)._4 == 3)                     // channels
    assert(dec(1) == ((2L, 0, 0, 0)))          // empty payload
    val feats = df.select($"doc_id",
      Multimodal.featureExtractStub(8)($"payload").as("emb"))
      .as[(Long, Seq[Float])].collect().sortBy(_._1)
    assert(feats.forall(_._2.length == 8))     // fixed width
    val n = math.sqrt(feats(0)._2.map(x => x.toDouble * x).sum)
    assert(math.abs(n - 1.0) < 1e-5)           // L2-normalized
    assert(feats(1)._2.forall(_ == 0f))        // empty → zero vector
    // determinism: same payload → same vector
    val again = df.where($"doc_id" === 1L).select(
      Multimodal.featureExtractStub(8)($"payload")).as[Seq[Float]].head()
    assert(again == feats(0)._2)
  }

  test("byteFeatures: expression-only extraction matches hand math") {
    // payload "ab" = bytes [97, 98]; dim 2, stride 1: s0 = 97/255,
    // s1 = 98/255; L2-normalize then 6-dp round
    val df = Seq((1L, "ab"), (2L, "")).toDF("doc_id", "text")
      .select($"doc_id", $"text".cast("binary").as("payload"))
    val out = df.select($"doc_id",
      Multimodal.byteFeatures($"payload", dim = 2).as("f"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    val (s0, s1) = (97.0 / 255.0, 98.0 / 255.0)
    val nrm = math.sqrt(s0 * s0 + s1 * s1)
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(out(0)._2 == Seq(r6(s0 / nrm), r6(s1 / nrm)))
    assert(out(1)._2 == Seq(0.0, 0.0)) // empty payload → zero vector, no
                                       // descending-sequence crash
  }

  test("byteSums stride samples each dim's lane") {
    // 8 bytes 'abcdefgh', dim 2, stride 2: dim0 reads positions 1,5
    // (a,e), dim1 reads 2,6 (b,f) — positions 3,4,7,8 skipped
    val df = Seq(("abcdefgh")).toDF("text")
      .select(hex($"text".cast("binary")).as("hx"),
        octet_length($"text".cast("binary")).as("n"))
    val s = df.select(
      Multimodal.byteSums($"hx", $"n", dim = 2, stride = 2).as("s"))
      .as[Seq[Double]].head()
    // per-byte quotients accumulate (matching the fold's order), NOT a
    // summed numerator — the two differ in the last ulp
    assert(s == Seq(97.0 / 255.0 + 101.0 / 255.0,
      98.0 / 255.0 + 102.0 / 255.0))
  }

  test("batchInferSums: results invariant to batch size and partitioning") {
    val docs = (1L to 97L).map(i => (i, ("x" * (i % 50).toInt) + s"doc$i"))
      .toDF("doc_id", "text")
      .select($"doc_id", $"text".cast("binary").as("payload"))
    def run(bs: Int, parts: Int) =
      Multimodal.batchInferSums(docs.repartition(parts), "doc_id",
        "payload", batchSize = bs)
        .select($"doc_id", $"sums", $"n_bytes")
        .as[(Long, Seq[Long], Long)].collect().sortBy(_._1).toSeq
    val base = run(64, 1)
    assert(run(1, 1) == base, "batchSize=1 diverged")
    assert(run(7, 4) == base, "batchSize=7/4 partitions diverged")
    assert(run(1000, 3) == base, "oversized batch diverged")
  }

  test("batchInferSums: one model call per ≤batchSize rows, bounded buffering") {
    val docs = (1L to 100L).map(i => (i, s"payload$i")).toDF("doc_id", "text")
      .select($"doc_id", $"text".cast("binary").as("payload"))
      .repartition(1)
    val acc = spark.sparkContext.longAccumulator("modelCalls")
    Multimodal.batchInferSums(docs, "doc_id", "payload", batchSize = 16,
      calls = Some(acc)).count()
    // 100 rows / 16 per batch = 7 calls — per-row calling (100) is the
    // inference anti-pattern this plumbing exists to prevent
    assert(acc.value == 7L, s"expected 7 model calls, got ${acc.value}")
  }
}
