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
}
