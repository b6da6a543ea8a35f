package graft.gaps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

class GapEngineSpec extends SparkSpec {
  import spark.implicits._

  private val Ivl = 100L // toy grid

  private def present(rows: Seq[(String, Long)]): DataFrame =
    rows.toDF("k", "ts")

  test("interiorGaps finds exactly the holes") {
    val df = present(Seq("a" -> 0L, "a" -> 100L, "a" -> 400L, "a" -> 500L,
      "b" -> 0L, "b" -> 100L))
    val gaps = GapEngine.interiorGaps(df, Seq("k"), "ts", Ivl)
      .as[(String, Long, Long)].collect().toSet
    assert(gaps == Set(("a", 200L, 300L)))
  }

  test("boundaryGaps covers head, tail, and empty keys") {
    val df = present(Seq("a" -> 200L, "a" -> 300L))
    val keys = Seq("a", "zzz").toDF("k")
    val gaps = GapEngine.boundaryGaps(df, keys, Seq("k"), "ts", Ivl, 0L, 500L)
      .as[(String, Long, Long)].collect().toSet
    assert(gaps == Set(
      ("a", 0L, 100L),      // head
      ("a", 400L, 500L),    // tail
      ("zzz", 0L, 500L)))   // whole range for absent key
  }

  test("mergeRanges coalesces close gaps") {
    val gaps = Seq(("a", 0L, 100L), ("a", 300L, 400L), ("a", 2000L, 2100L))
      .toDF("k", "gap_start", "gap_end")
    val merged = GapEngine.mergeRanges(gaps, Seq("k"), 500L)
      .as[(String, Long, Long)].collect().toSet
    assert(merged == Set(("a", 0L, 400L), ("a", 2000L, 2100L)))
  }

  test("property: filling reported gaps closes the scan (backfill closure)") {
    val rnd = new scala.util.Random(7)
    val cases: Seq[List[Long]] = Seq.fill(12)(
      List.fill(rnd.nextInt(20))(rnd.nextLong(41L) * Ivl).distinct) :+
      List.empty[Long] :+ 0L.to(4000L, Ivl).toList
    cases.foreach { pts =>
      val start = 0L
      val end = 4000L
      val df = present(pts.map("k" -> _))
      val keys = Seq("k").toDF("k")
      val plan = GapEngine.gapPlan(df, keys, Seq("k"), "ts", Ivl,
        start, end, Ivl) // merge adjacent
      val gaps = plan.as[(String, Long, Long)].collect()
      // expand gaps onto the grid and union with the present points
      val filled = gaps.flatMap { case (_, s, e) => s.to(e, Ivl) } ++ pts
      val refilled = present(filled.distinct.map("k" -> _))
      val after = GapEngine.gapPlan(refilled, keys, Seq("k"), "ts", Ivl,
        start, end, Ivl).count()
      assert(after == 0, s"pts=$pts gaps=${gaps.mkString(",")}")
      // gaps cover exactly the missing grid points
      val covered = filled.distinct.sorted.toList
      assert(covered == start.to(end, Ivl).toList.sorted, s"pts=$pts")
    }
  }

  test("property: merged gaps are disjoint, ordered, within span") {
    val rnd = new scala.util.Random(11)
    val cases: Seq[List[(Long, Long)]] = Seq.fill(12)(
      List.fill(rnd.nextInt(15)) {
        val s = rnd.nextLong(51L)
        val len = rnd.nextLong(6L)
        (s * Ivl, (s + len) * Ivl)
      })
    cases.foreach { ranges =>
      val gaps = ranges.map { case (s, e) => ("k", s, e) }
        .toDF("k", "gap_start", "gap_end")
      val merged = GapEngine.mergeRanges(gaps, Seq("k"), 2 * Ivl)
        .as[(String, Long, Long)].collect().sortBy(_._2)
      // pairwise disjoint with at least mergeWithin separation
      merged.sliding(2).foreach {
        case Array((_, _, e1), (_, s2, _)) => assert(s2 - e1 >= 2 * Ivl)
        case _ =>
      }
      if (ranges.nonEmpty) {
        assert(merged.head._2 == ranges.map(_._1).min)
        assert(merged.map(_._3).max == ranges.map(_._2).max)
      }
    }
  }

  test("fetchWindows paginates a gap into limit-sized requests") {
    val gaps = Seq(("a", 0L, 950L)).toDF("k", "gap_start", "gap_end")
    val wins = GapEngine.fetchWindows(gaps, Seq("k"), Ivl, 3)
      .select($"k", $"req_start", $"req_end")
      .as[(String, Long, Long)].collect().sortBy(_._2)
    // step = 300; windows [0,200],[300,500],[600,800],[900,950]
    assert(wins.toList == List(("a", 0L, 200L), ("a", 300L, 500L),
      ("a", 600L, 800L), ("a", 900L, 950L)))
  }
}
