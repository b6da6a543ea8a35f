package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("hexThreshold quantizes rates to two hex chars with closed ends") {
    assert(Sampling.hexThreshold(0.0) == "00")
    assert(Sampling.hexThreshold(0.25) == "40")
    assert(Sampling.hexThreshold(0.5) == "80")
    assert(Sampling.hexThreshold(1.0) == "g0") // above every hex pair
    assert(Sampling.hexThreshold(-1.0) == "00")
  }

  test("stratifiedSample is deterministic and tracks the per-stratum rate") {
    val df = (0 until 2000).map(i => (i.toLong, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "s")
    val rates = Map("a" -> 0.25, "b" -> 0.75)
    val once = Sampling.stratifiedSample(df, "id", "s", rates, 0.5)
      .as[(Long, String)].collect().toSet
    val twice = Sampling.stratifiedSample(df, "id", "s", rates, 0.5)
      .as[(Long, String)].collect().toSet
    assert(once == twice) // pure function of the id — no rand()
    val byStratum = once.groupBy(_._2).view.mapValues(_.size).toMap
    // 1000 ids per stratum; md5 uniformity keeps counts near rate*1000
    assert(math.abs(byStratum("a") - 250) < 60, s"a=${byStratum("a")}")
    assert(math.abs(byStratum("b") - 750) < 60, s"b=${byStratum("b")}")
  }

  test("rate 1.0 keeps everything, rate 0.0 keeps nothing") {
    val df = (0 until 100).map(i => (i.toLong, "x")).toDF("id", "s")
    assert(Sampling.stratifiedSample(df, "id", "s", Map.empty, 1.0).count() == 100)
    assert(Sampling.stratifiedSample(df, "id", "s", Map.empty, 0.0).count() == 0)
  }

  test("rebalanceSample: rarest stratum fully kept, mix approaches target") {
    // 4:1 imbalance toward "a"; uniform target → "b" (rarest) keeps ALL
    // rows, "a" keeps ~1/4 of its rows, output lands near 50/50
    val df = (0 until 2500).map(i =>
      (i.toLong, if (i < 2000) "a" else "b")).toDF("id", "s")
    val out = Sampling.rebalanceSample(df, "id", "s",
      Map("a" -> 0.5, "b" -> 0.5))
      .as[(String, Long)].collect()
    val by = out.groupBy(_._1).view.mapValues(_.size).toMap
    assert(by("b") == 500, s"under-represented stratum resampled: ${by("b")}")
    assert(math.abs(by("a") - 500) < 100, s"a=${by("a")}")
    // deterministic: same survivors on a re-run
    val again = Sampling.rebalanceSample(df, "id", "s",
      Map("a" -> 0.5, "b" -> 0.5)).as[(String, Long)].collect()
    assert(out.toSet == again.toSet)
  }

  test("rebalanceSample drops strata absent from the target") {
    val df = (0 until 300).map(i =>
      (i.toLong, Seq("a", "b", "junk")(i % 3))).toDF("id", "s")
    val out = Sampling.rebalanceSample(df, "id", "s",
      Map("a" -> 0.5, "b" -> 0.5))
      .select("s").distinct().as[String].collect().toSet
    assert(out == Set("a", "b"))
  }
}
