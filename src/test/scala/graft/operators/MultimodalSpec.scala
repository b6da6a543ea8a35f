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
}
