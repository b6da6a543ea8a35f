package graft.operators

import scala.annotation.tailrec

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference greedy left-to-right non-overlapping merge. */
  private def refMerge(syms: List[String], a: String, b: String): List[String] =
    syms match {
      case x :: y :: rest if x == a && y == b => (a + b) :: refMerge(rest, a, b)
      case x :: rest                          => x :: refMerge(rest, a, b)
      case Nil                                => Nil
    }

  /** Reference BPE trainer: max pair count, ties to smallest (lft, rgt). */
  private def refTrain(words: Map[String, Long], n: Int): List[(Long, String, String, Long)] = {
    @tailrec
    def loop(v: Map[List[String], Long], step: Int,
             acc: List[(Long, String, String, Long)]): List[(Long, String, String, Long)] =
      if (step > n) acc.reverse
      else {
        val counts = v.toSeq
          .flatMap { case (syms, f) => syms.zip(syms.tail).map(p => (p, f)) }
          .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        val ((a, b), c) = counts.minBy { case ((l, r), cnt) => (-cnt, l, r) }
        val nv = v.toSeq.map { case (syms, f) => (refMerge(syms, a, b), f) }
          .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        loop(nv, step + 1, (step.toLong, a, b, c) :: acc)
      }
    loop(words.map { case (w, f) => (w.toList.map(_.toString), f) }, 1, Nil)
  }

  test("learnMerges matches the reference trainer, incl. overlapping runs") {
    // "aaaa"/"aaa" force overlap handling: merging (a,a) greedily keeps
    // even offsets — aaaa -> [aa, aa], aaa -> [aa, a].
    val docs = Seq(
      "aaaa aaa banana bandana",
      "banana banana cabana",
      "aaaa the the the cat hat"
    ).toDF("text")
    val words = docs.as[String].collect()
      .flatMap(_.toLowerCase.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) => (w, g.length.toLong) }

    val expected = refTrain(words, 5)
    val got = Bpe.learnMerges(docs, "text", 5)
      .orderBy("step")
      .as[(Long, String, String, Long)].collect().toList
    assert(got == expected)
  }

  test("encodedVocab equals replaying the learned merge table per word") {
    val docs = Seq(
      "aaaa aaa banana bandana",
      "banana banana cabana",
      "aaaa the the the cat hat"
    ).toDF("text")
    val merges = Bpe.learnMerges(docs, "text", 5)
      .orderBy("step").as[(Long, String, String, Long)].collect()
    val got = Bpe.encodedVocab(docs, "text", 5)
      .as[(String, Long)].collect().toMap
    val words = docs.as[String].collect()
      .flatMap(_.toLowerCase.split("\\s+")).filter(_.nonEmpty).distinct
    for (w <- words) {
      val enc = merges.foldLeft(w.toList.map(_.toString)) {
        case (syms, (_, a, b, _)) => refMerge(syms, a, b)
      }
      assert(got(w) == enc.length.toLong, s"word $w")
    }
  }

  test("merge of a just-merged tail does not re-match as left symbol") {
    // One word "abab": after merging (a,b) the syms are [ab, ab]; a second
    // round must elect (ab, ab), not resurrect (a, b).
    val docs = Seq("abab abab").toDF("text")
    val got = Bpe.learnMerges(docs, "text", 2)
      .orderBy("step")
      .as[(Long, String, String, Long)].collect().toList
    assert(got == List((1L, "a", "b", 4L), (2L, "ab", "ab", 2L)))
  }
}
