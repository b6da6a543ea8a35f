package graft.operators

import graft.SparkSpec

class BigramLmSpec extends SparkSpec {
  import spark.implicits._

  /** Pure-Scala replication of the exact integer/double pipeline. */
  private def brute(docs: Seq[(Long, String)], num: Long)
      : Map[Long, (Long, Long, Long)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    }.filter(_._2.size >= 2)
    val docBigrams = toks.map { case (id, ts) =>
      id -> ts.zip(ts.tail).groupBy(identity).view.mapValues(_.size.toLong).toMap
    }
    val c = docBigrams.flatMap(_._2).groupBy(_._1).view
      .mapValues(_.map(_._2).sum).toMap
    val c1 = c.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val n1a = c.groupBy(_._1._1).view.mapValues(_.size.toLong).toMap
    val n1b = c.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
    val b = c.size.toLong
    val nll = c.map { case (bgm @ (w1, w2), cc) =>
      val denom = (4L * c1(w1) * b).toDouble
      val numer = ((4L * cc - num) * b + num * n1a(w1) * n1b(w2)).toDouble
      bgm -> math.floor((math.log(denom) - math.log(numer)) * 1e6).toLong
    }
    docBigrams.map { case (id, bgs) =>
      val nb = bgs.values.sum
      val sc = bgs.map { case (bgm, occ) => occ * nll(bgm) }.sum
      id -> ((nb, sc, sc / nb))
    }.toMap
  }

  test("docScores matches the pure-Scala Kneser-Ney replication on a seeded corpus") {
    val rnd = new scala.util.Random(20260818L)
    val docs = (1L to 40L).map { id =>
      id -> Seq.fill(rnd.nextInt(30))(s"w${rnd.nextInt(12)}").mkString(" ")
    }
    val expected = brute(docs, 3L)
    val got = BigramLm.docScores(docs.toDF("doc_id", "text"),
        "doc_id", "text", 3L)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == expected)
    assert(expected.nonEmpty)
  }

  test("probabilities are well-formed: nll >= 0 and per-context mass bounded by 1") {
    // P <= 1 per bigram implies every nll_micro >= 0, hence scores >= 0
    val docs = Seq(
      (1L, "a b a b a c"), (2L, "a b c d e f"), (3L, "b c b c b c"),
      (4L, "x y"), (5L, "z"))
    val got = BigramLm.docScores(docs.toDF("doc_id", "text"),
        "doc_id", "text", 3L)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.forall(_._3 >= 0L))
    assert(!got.exists(_._1 == 5L), "single-token doc must be excluded")
    // exact per-context probability mass: sum over observed continuations
    // of [(4c-3)B + 3*N1a*N1b] <= 4*c1*B  (the P<=1 proof aggregated)
    val toks = docs.flatMap { case (_, t) =>
      val ts = t.split(" ").toSeq; ts.zip(ts.tail)
    }
    val c = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = c.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val n1a = c.groupBy(_._1._1).view.mapValues(_.size.toLong).toMap
    val n1b = c.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
    val b = c.size.toLong
    c1.keys.foreach { w1 =>
      val mass = c.collect { case ((a, w2), cc) if a == w1 =>
        (4 * cc - 3) * b + 3 * n1a(w1) * n1b(w2)
      }.sum
      assert(mass <= 4 * c1(w1) * b, s"context $w1 over-allocates mass")
    }
  }
}
