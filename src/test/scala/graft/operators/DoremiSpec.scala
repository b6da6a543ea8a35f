package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class DoremiSpec extends AnyFunSuite {

  test("mwTrajectory replays a hand-computed round exactly") {
    val losses = Seq("a" -> 2000000L, "b" -> 1000000L)
    val out = Doremi.mwTrajectory(losses, 1, 500000L)
    // sw=2e6, alpha=5e5 each; mix = (5e5*2e6 + 5e5*1e6)/1e6 = 1_500_000
    // ex(a)=5e5, ex(b)=0
    // w(a) = 1e6*(1e6 + 5e5*5e5/1e6)/1e6 = 1e6*1_250_000/1e6 = 1_250_000
    assert(out == Seq(
      (1, "a", 2000000L, 500000L, 500000L, 1250000L),
      (1, "b", 1000000L, 500000L, 0L, 1000000L)))
  }

  test("weights tilt monotonically toward the highest-loss domain") {
    val losses = Seq("low" -> 5000000L, "mid" -> 7000000L, "hot" -> 9000000L)
    val out = Doremi.mwTrajectory(losses, 8, 200000L)
    val hotAlphas = out.filter(_._2 == "hot").map(_._4)
    val lowAlphas = out.filter(_._2 == "low").map(_._4)
    assert(hotAlphas == hotAlphas.sorted, "hot domain alpha must not decrease")
    assert(lowAlphas == lowAlphas.sorted.reverse, "low domain alpha must not increase")
    assert(hotAlphas.last > lowAlphas.last)
    // normalized weights stay a (floor-rounded) distribution
    out.groupBy(_._1).values.foreach { rows =>
      val s = rows.map(_._4).sum
      assert(s <= 1000000L && s > 1000000L - rows.size)
    }
  }

  test("excess clips at zero and equal losses stay uniform") {
    val losses = Seq("a" -> 3000000L, "b" -> 3000000L, "c" -> 3000000L)
    val out = Doremi.mwTrajectory(losses, 4, 200000L)
    assert(out.forall(_._5 >= 0L))
    // equal losses: mix average == each loss (exact: alphas are equal and
    // divide evenly), so no excess and weights never move
    assert(out.forall(_._6 == 1000000L))
    assert(out.filter(_._1 == 4).forall(_._4 == 333333L))
  }
}
