package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  test("shingleHashes: distinct k-gram hashes; short docs yield none") {
    val out = Seq(
      (1L, "a b c d"),   // shingles: "a b c", "b c d"
      (2L, "a b"),       // shorter than k → none
      (3L, "x x x x x")) // repeated trigram collapses to ONE distinct hash
      .toDF("id", "text")
      .select($"id", size(TextAnalysis.shingleHashes($"text", 3)).as("n"))
      .as[(Long, Int)].collect().toMap
    assert(out(1L) == 2)
    assert(out(2L) == 0)
    assert(out(3L) == 1)
  }

  test("contaminatedDocs flags shingle overlap with the benchmark set only") {
    val corpus = Seq(
      (10L, "the quick brown fox jumps"), // shares "the quick brown", "quick brown fox"
      (11L, "completely different words here"),
      (12L, "too short")).toDF("doc_id", "text")
    val benchmark = Seq(
      (90L, "the quick brown fox")).toDF("doc_id", "text")
    val out = Decontaminate.contaminatedDocs(corpus, benchmark,
      "doc_id", "text", k = 3)
      .as[(Long, Long)].collect().toMap
    assert(out == Map(10L -> 2L)) // clean and short docs never appear
  }

  private val bloomCorpus = Seq(
    (10L, "the quick brown fox jumps over the lazy dog"),
    (11L, "completely different words appear here instead"),
    (12L, "the quick brown cat naps"),
    (13L, "unrelated text with no benchmark overlap at all"),
    (14L, "too short")).toDF("doc_id", "text")
  private val bloomBench = Seq(
    (90L, "the quick brown fox"),
    (91L, "over the lazy dog today")).toDF("doc_id", "text")

  test("contaminatedDocsBloom matches the exact operator") {
    graft.plans.GraftExtensions.register(spark)
    val exact = Decontaminate.contaminatedDocs(bloomCorpus, bloomBench,
      "doc_id", "text", k = 3).as[(Long, Long)].collect().toMap
    val gated = Decontaminate.contaminatedDocsBloom(bloomCorpus, bloomBench,
      "doc_id", "text", k = 3, expectedShingles = 1 << 12)
      .as[(Long, Long)].collect().toMap
    assert(gated == exact)
    assert(exact.nonEmpty) // the fixture genuinely overlaps
  }

  test("contaminatedDocsBloom stays exact under a degenerate all-pass sketch") {
    graft.plans.GraftExtensions.register(spark)
    // capacity 1 at fpp 0.5 → the sketch saturates and passes nearly
    // everything: the verify join must still kill every false positive
    val exact = Decontaminate.contaminatedDocs(bloomCorpus, bloomBench,
      "doc_id", "text", k = 3).as[(Long, Long)].collect().toMap
    val gated = Decontaminate.contaminatedDocsBloom(bloomCorpus, bloomBench,
      "doc_id", "text", k = 3, expectedShingles = 1L, fpp = 0.5)
      .as[(Long, Long)].collect().toMap
    assert(gated == exact)
  }

  test("bloom gate prunes clean shingles map-side before the join") {
    graft.plans.GraftExtensions.register(spark)
    // rebuild just the gate the operator uses and count survivors: with a
    // properly sized sketch, the clean corpus's shingles mostly vanish
    // before any shuffle
    val b = bloomBench.select(
      explode(TextAnalysis.shingleHashes($"text", 3)).as("sh")).distinct()
    val bloom = b.select(xxhash64($"sh").as("shl"))
      .stat.bloomFilter("shl", 1 << 12, 0.01)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos); bos.toByteArray
    }
    val shingles = bloomCorpus.select(
      explode(TextAnalysis.shingleHashes($"text", 3)).as("sh"))
    val total = shingles.count()
    val passed = shingles.where(call_function("bloom_might_contain",
      lit(bytes), xxhash64($"sh"))).count()
    val trueHits = shingles.join(b, Seq("sh"), "left_semi").count()
    assert(passed < total, s"gate passed everything ($passed of $total)")
    assert(passed >= trueHits, "gate must never drop a true hit")
  }
}
