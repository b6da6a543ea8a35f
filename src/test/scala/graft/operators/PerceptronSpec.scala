package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PerceptronSpec extends SparkSpec {
  import spark.implicits._

  // separable by epoch 2: positives x1 >= 10, negatives x1 = 0 (the bias
  // weight turns negative on epoch 2 and settles the zero-margin rows)
  private def fixture = Seq(
    (1L, 1, 12L, 1L), (2L, 1, 10L, 1L), (3L, 1, 15L, 1L),
    (4L, -1, 0L, 1L), (5L, -1, 0L, 1L), (6L, -1, 0L, 1L))
    .toDF("id", "y", "x1", "x4")

  test("epoch 1 from w=0 sums every row's y*x (all rows misclassify)") {
    val w = Perceptron.train(fixture, "y", Seq("x1", "x4"), epochs = 1)
    // sum(y*x1) = 12+10+15-0 = 37 ; sum(y*x4) = 3-3 = 0
    assert(w.toSeq == Seq(37L, 0L))
  }

  test("training separates the separable fixture") {
    val w = Perceptron.train(fixture, "y", Seq("x1", "x4"), epochs = 3)
    val preds = fixture.select($"y",
      (Perceptron.dot(w, Seq("x1", "x4")) > 0).as("pos"))
      .as[(Int, Boolean)].collect()
    assert(preds.forall { case (y, pos) => (y > 0) == pos })
  }

  test("training is deterministic across runs and partitionings") {
    val a = Perceptron.train(fixture, "y", Seq("x1", "x4"), epochs = 3)
    val b = Perceptron.train(fixture.repartition(5), "y", Seq("x1", "x4"),
      epochs = 3)
    assert(a.toSeq == b.toSeq)
  }

  test("t14 distillation beats the majority base rate at sf0.001") {
    val out = graft.queries.Queries
      .t14Perceptron(spark, "/root/testdata/sf0.001")
      .select($"pred", $"y").as[(Int, Int)].collect()
    val acc = out.count { case (p, y) => p == y }.toDouble / out.length
    val base = math.max(out.count(_._2 == 1), out.count(_._2 == -1))
      .toDouble / out.length
    assert(acc > base + 0.05,
      f"pocket model acc $acc%.3f vs majority base $base%.3f")
  }

  test("train matches an in-memory pocket loop on seeded data") {
    val rnd = new scala.util.Random(20260813L)
    for (trial <- 1 to 3) {
      val rows = (1 to 120).map { _ =>
        (if (rnd.nextBoolean()) 1 else -1,
          rnd.nextInt(20).toLong, rnd.nextInt(9).toLong, 1L)
      }
      val epochs = 1 + rnd.nextInt(6)
      // reference pocket loop, mirroring the operator's contract exactly
      var w = Array(0L, 0L, 0L)
      var bestErrs = Long.MaxValue
      var bestW = w
      for (e <- 0 to epochs) {
        val mis = rows.filter { case (y, x1, x2, x3) =>
          y * (w(0) * x1 + w(1) * x2 + w(2) * x3) <= 0 }
        if (e >= 1 && mis.size < bestErrs) {
          bestErrs = mis.size; bestW = w
        }
        if (e < epochs)
          w = Array(
            w(0) + mis.map(r => r._1 * r._2).sum,
            w(1) + mis.map(r => r._1 * r._3).sum,
            w(2) + mis.map(r => r._1 * r._4).sum)
      }
      val got = Perceptron.train(
        rows.toDF("y", "x1", "x2", "x3").repartition(7),
        "y", Seq("x1", "x2", "x3"), epochs)
      assert(got.toSeq == bestW.toSeq, s"trial $trial (epochs=$epochs)")
    }
  }

  test("epochs < 1 rejected") {
    intercept[IllegalArgumentException] {
      Perceptron.train(fixture, "y", Seq("x1"), epochs = 0)
    }
  }
}
