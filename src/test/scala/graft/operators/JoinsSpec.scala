package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("asofBackward picks latest right row at or before left ts, per key") {
    val left = Seq(("k", 5L, "e1"), ("k", 10L, "e2"), ("k", 99L, "e3"),
      ("z", 7L, "z1")).toDF("key", "ts", "ev")
    val right = Seq(("k", 5L, 50.0), ("k", 9L, 90.0), ("k", 20L, 200.0))
      .toDF("key", "ts", "px")
    val out = Joins.asofBackward(left, right, Seq("key"), "ts", Seq("px"))
      .select($"ev", $"px").as[(String, Option[Double])].collect().toMap
    assert(out("e1").contains(50.0))  // inclusive: right at exactly ts matches
    assert(out("e2").contains(90.0))  // latest ≤ 10 is 9
    assert(out("e3").contains(200.0)) // carried far forward
    assert(out("z1").isEmpty)         // key with no right rows → NULL
  }

  test("asofBackward takes the LATEST right row even when its payload is NULL") {
    // true as-of semantics (= DuckDB ASOF JOIN): the match is the latest
    // ROW; a NULL field in it must not be papered over by an older value
    val left = Seq(("k", 25L, "e")).toDF("key", "ts", "ev")
    val right = Seq(("k", 10L, Some(5.0), "a"), ("k", 20L, None, "b"))
      .toDF("key", "ts", "px", "src")
    val out = Joins.asofBackward(left, right, Seq("key"), "ts",
      Seq("px", "src"))
      .select($"px", $"src").as[(Option[Double], String)].head()
    assert(out == ((None, "b"))) // from the ts=20 row, px stays NULL
  }

  test("rangeJoin matches overlapping ranges, bucket expansion exact") {
    val probe = Seq((1L, 15L), (2L, 25L), (3L, 95L)).toDF("id", "v")
    val ranges = Seq((0, 0L, 20L), (1, 10L, 30L), (2, 90L, 100L))
      .toDF("rid", "lo", "hi")
    val out = Joins.rangeJoin(probe, ranges, "v", "lo", "hi", bucketWidth = 7L)
      .select($"id", $"rid").as[(Long, Int)].collect().toSet
    assert(out == Set((1L, 0), (1L, 1), (2L, 1), (3L, 2)))
  }

  // ---- signed-domain properties (round-10 verdict item: truncate-vs-floor
  // bucket ids would drop pairs straddling zero) ----

  private def checkProp(name: String)(prop: org.scalacheck.Prop): Unit = {
    val params = org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(8)
      .withInitialSeed(org.scalacheck.rng.Seed(42L))
    val res = org.scalacheck.Test.check(params, prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  test("overlapJoin = naive O(n^2) overlap on signed intervals (property)") {
    import org.scalacheck.{Gen, Prop}
    val genIv = for {
      lo <- Gen.choose(-500L, 500L)
      len <- Gen.choose(0L, 120L)
    } yield (lo, lo + len)
    val genSide = Gen.listOfN(12, genIv)
    checkProp("overlapJoin")(Prop.forAll(genSide, genSide,
        Gen.oneOf(1L, 7L, 64L, 1000L)) { (as, bs, width) =>
      val a = as.zipWithIndex.map { case ((l, h), i) => (i, l, h) }
        .toDF("aid", "alo", "ahi")
      val b = bs.zipWithIndex.map { case ((l, h), i) => (i, l, h) }
        .toDF("bid", "blo", "bhi")
      val got = Joins.overlapJoin(a, b, "alo", "ahi", "blo", "bhi", width)
        .select($"aid", $"bid").as[(Int, Int)].collect().toList
      val want = for {
        ((al, ah), i) <- as.zipWithIndex
        ((bl, bh), j) <- bs.zipWithIndex
        if al <= bh && bl <= ah
      } yield (i, j)
      // exactly once: compare as multisets
      got.sorted == want.sorted
    })
  }

  test("rangeJoin = naive containment on signed values (property)") {
    import org.scalacheck.{Gen, Prop}
    val genIv = for {
      lo <- Gen.choose(-500L, 500L)
      len <- Gen.choose(0L, 120L)
    } yield (lo, lo + len)
    checkProp("rangeJoin")(Prop.forAll(
        Gen.listOfN(15, Gen.choose(-600L, 600L)),
        Gen.listOfN(10, genIv),
        Gen.oneOf(1L, 7L, 64L, 1000L)) { (vs, rs, width) =>
      val probe = vs.zipWithIndex.map { case (v, i) => (i, v) }.toDF("id", "v")
      val ranges = rs.zipWithIndex.map { case ((l, h), i) => (i, l, h) }
        .toDF("rid", "lo", "hi")
      val got = Joins.rangeJoin(probe, ranges, "v", "lo", "hi", width)
        .select($"id", $"rid").as[(Int, Int)].collect().toList
      val want = for {
        (v, i) <- vs.zipWithIndex
        ((l, h), j) <- rs.zipWithIndex
        if v >= l && v <= h
      } yield (i, j)
      got.sorted == want.sorted
    })
  }
}
