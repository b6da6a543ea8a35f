package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class FuncsSpec extends SparkSpec {
  import spark.implicits._

  test("precisionOf counts decimals after rstrip zeros (utils/__init__.py:5-8)") {
    val cases = Seq("0.01000000" -> 2, "1" -> 0, "1.0" -> 0, "0.001" -> 3,
      "12.3450" -> 3, "0.10" -> 1)
    val out = cases.map(_._1).toDF("s")
      .select($"s", Funcs.precisionOf($"s").as("p")).as[(String, Int)]
      .collect().toMap
    cases.foreach { case (in, want) => assert(out(in) == want, in) }
  }

  test("toDecimalStr renders 10^-p fixed point (utils/__init__.py:12-17)") {
    val cases = Seq(0 -> "1", 1 -> "0.1", 3 -> "0.001", 8 -> "0.00000001")
    val out = cases.map(_._1).toDF("p")
      .select($"p", Funcs.toDecimalStr($"p").as("s")).as[(Int, String)]
      .collect().toMap
    cases.foreach { case (in, want) => assert(out(in) == want, s"p=$in") }
  }

  test("ratioSplit: r -> (r/(1+r), 1-r/(1+r)) exactly (okx/perp.py:116-121)") {
    val (l, sh) = Funcs.ratioSplit($"r")
    val out = Seq("3").toDF("r")
      .select(l.cast("string").as("l"), sh.cast("string").as("s"))
      .as[(String, String)].head()
    assert(out._1 == "0.750000000000000000")
    assert(out._2 == "0.250000000000000000")
  }

  test("probNorm guards nulls and zero denominator (kalshi.py:77-98)") {
    val df = Seq((Some(1.0), Some(3.0)), (Some(0.0), Some(0.0)),
      (None, Some(2.0)), (Some(2.0), None))
      .toDF("y", "n")
    val out = df.select(Funcs.probNorm($"y", $"n")).as[Option[Double]].collect()
    assert(out.toList == List(Some(0.25), None, None, None))
  }

  test("classifyByKeywords is first-match-wins, case-insensitive") {
    val rules = Seq("alpha" -> "A", "beta" -> "B")
    val cases = Seq("has ALPHA and beta" -> "A", "only Beta here" -> "B",
      "neither" -> "other")
    val out = cases.map(_._1).toDF("t")
      .select($"t", Funcs.classifyByKeywords($"t", rules).as("c"))
      .as[(String, String)].collect().toMap
    cases.foreach { case (in, want) => assert(out(in) == want, in) }
  }

  test("tagFallback follows the coalesce chain (oklink/fetcher.py:111-140)") {
    val df = Seq(
      (Some("e"), Some("h"), Some("t"), Seq("x")),
      (None, Some("h"), Some("t"), Seq("x")),
      (None, None, None, Seq("x", "y")),
      (None, None, None, Seq.empty[String]))
      .toDF("e", "h", "t", "arr")
    val out = df.select(Funcs.tagFallback($"e", $"h", $"t", $"arr"))
      .as[Option[String]].collect()
    assert(out.toList == List(Some("e"), Some("h"), Some("x"), None))
  }

  test("enumMap maps via literal table, null for unmapped") {
    val out = Seq("O", "F", "?").toDF("s")
      .select(Funcs.enumMap($"s", Map("O" -> 0, "F" -> 1)))
      .as[Option[Int]].collect()
    assert(out.toList == List(Some(0), Some(1), None))
  }

  test("kraken asset canonicalization (kraken/spot.py:8-26)") {
    val out = Seq("XXBT", "ZUSD", "SOL").toDF("a")
      .select(Funcs.canonicalizeKrakenAsset($"a")).as[String].collect()
    assert(out.toList == List("BTC", "USD", "SOL"))
  }

  test("oklinkApiKey matches the reference construction (generate_apikey.py:9-31)") {
    // replicate the reference pipeline off-Spark: rotate first 8 chars to
    // the end, ts + 1111111111111 with the extra digits appended, base64
    val key = "k1k2k3k4-rest-of-the-api-key"
    val ts = 1704067200000L
    val extra = "042"
    val rotated = key.substring(8) + key.substring(0, 8)
    val enc = (ts + 1111111111111L).toString + extra
    val expected = java.util.Base64.getEncoder
      .encodeToString(s"$rotated|$enc".getBytes("UTF-8"))
    val out = Seq((key, ts, extra)).toDF("k", "ts", "x")
      .select(Funcs.oklinkApiKey($"k", $"ts", $"x")).as[String].head()
    assert(out == expected)
  }
}
