package graft.time

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AlignSpec extends SparkSpec {
  import spark.implicits._

  test("floorTo floors onto the grid and is idempotent (seeded property)") {
    val rnd = new scala.util.Random(42)
    val samples = Seq.fill(200)(math.abs(rnd.nextLong() % 4102444800000L))
    val out = samples.toDF("ts")
      .select($"ts", Align.floorTo($"ts", 60000L).as("a"))
      .select($"ts", $"a", Align.floorTo($"a", 60000L).as("b"))
      .as[(Long, Long, Long)].collect()
    out.foreach { case (ts, a, b) =>
      assert(a == ts / 60000L * 60000L)
      assert(b == a) // idempotent
      assert(a % 60000L == 0)
      assert(a <= ts && ts - a < 60000L)
    }
  }

  test("named intervals match constants.py grid") {
    assert(Align.intervalMs == Map("1m" -> 60000L, "5m" -> 300000L,
      "1h" -> 3600000L, "1d" -> 86400000L))
  }

  test("dtString renders UTC wall clock") {
    val out = Seq(1704067200000L).toDF("ts")
      .select(Align.dtString($"ts")).as[String].head()
    assert(out == "2024-01-01 00:00:00")
  }

  test("snapFundingInterval picks nearest bucket, ties to smaller") {
    val cases = Seq(60 -> 60, 90 -> 60, 91 -> 120, 150 -> 120, 151 -> 180,
      700 -> 720, 10000 -> 720, 0 -> 60)
    val out = cases.map(_._1).toDF("m")
      .select($"m", Align.snapFundingInterval($"m").as("b"))
      .as[(Int, Int)].collect().toMap
    cases.foreach { case (in, want) => assert(out(in) == want, s"in=$in") }
  }

  test("snapFundingInterval: NULL in → NULL out (no fabricated bucket)") {
    val out = Seq[(Int, Option[Int])](1 -> Some(90), 2 -> None).toDF("i", "m")
      .select($"i", Align.snapFundingInterval($"m").as("b"))
      .as[(Int, Option[Int])].collect().toMap
    assert(out(1).contains(60))
    assert(out(2).isEmpty)
  }
}
