package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokens splits on whitespace, drops empties") {
    val out = Seq("  a  b\tc\n", "", "   ").toDF("t")
      .select(TextAnalysis.tokens($"t")).as[Seq[String]].collect()
    assert(out.toList == List(Seq("a", "b", "c"), Seq.empty, Seq.empty))
  }

  test("tokenCount and subwordCount") {
    val df = Seq("hello world, 42 things!").toDF("t")
    assert(df.select(TextAnalysis.tokenCount($"t")).as[Int].head() == 4)
    // words: hello, world, 42, things ; punct chars: ',', '!'
    assert(df.select(TextAnalysis.subwordCount($"t")).as[Int].head() == 6)
  }

  test("langId scores marker hits with declared-order tie-break") {
    val markers = Seq("en" -> Seq("the"), "de" -> Seq("der"))
    val out = Seq("the cat", "der hund", "nichts").toDF("t")
      .select(TextAnalysis.langId($"t", markers)).as[String].collect()
    assert(out.toList == List("en", "de", "en")) // tie (0,0) → first lang
  }

  test("qualityScore is deterministic and bounded") {
    val score = Seq("the quick brown fox jumps").toDF("t")
      .select(TextAnalysis.qualityScore($"t", Seq("the"))).as[Double].head()
    // n=5: len 5/100*0.4=0.02, sw 1/5*0.3=0.06, meanLen 21/5=4.2→1.0*0.3
    assert(math.abs(score - 0.38) < 1e-9)
  }

  test("fingerprint is whitespace/case insensitive") {
    val out = Seq("Hello  World", "hello world", "hello worlds").toDF("t")
      .select(TextAnalysis.fingerprint($"t")).as[String].collect()
    assert(out(0) == out(1))
    assert(out(0) != out(2))
  }

  test("minShingleFingerprint robust to edits far from the min shingle") {
    val base = "a b c d e f g h i j"
    val out = Seq(base, base + " zzz", "a b").toDF("t")
      .select(TextAnalysis.minShingleFingerprint($"t", 5)).as[String].collect()
    // appending may or may not change the min; but short doc falls back
    val fpShort = Seq("a b").toDF("t")
      .select(TextAnalysis.fingerprint($"t")).as[String].head()
    assert(out(2) == fpShort)
  }
}
