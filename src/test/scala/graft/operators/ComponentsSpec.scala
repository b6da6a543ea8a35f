package graft.operators

import graft.SparkSpec

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents: chain, clique, singleton — min id wins") {
    val nodes = (1L to 12L).toDF("id")
    // chain 1..8 (diameter 7), clique {9,10,11}, singleton 12
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (6L, 7L), (7L, 8L), (9L, 10L), (10L, 11L), (9L, 11L)).toDF("a", "b")
    val out = Components.connectedComponents(nodes, "id", edges, "a", "b")
      .as[(Long, Long)].collect().toMap
    (1L to 8L).foreach(i => assert(out(i) == 1L, s"node $i"))
    (9L to 11L).foreach(i => assert(out(i) == 9L, s"node $i"))
    assert(out(12L) == 12L)
  }

  test("string ids take the surrogate path — min id still wins") {
    // non-integral ids exercise the zipWithIndex sid compression; the
    // cluster representative must still be the lexicographic min id
    val nodes = Seq("a", "b", "c", "d", "e", "z").toDF("id")
    val edges = Seq(("b", "a"), ("b", "c"), ("d", "e")).toDF("x", "y")
    val out = Components.connectedComponents(nodes, "id", edges, "x", "y")
      .as[(String, String)].collect().toMap
    assert(out("a") == "a" && out("b") == "a" && out("c") == "a")
    assert(out("d") == "d" && out("e") == "d")
    assert(out("z") == "z")
  }

  test("pointer jumping converges on a 40-node path within 10 rounds") {
    // plain 1-hop propagation would need 39 rounds; the jump compresses
    // the remaining diameter roughly 2x per round
    val n = 40
    val nodes = (1L to n.toLong).toDF("id")
    val edges = (1 until n).map(i => (i.toLong, i + 1L)).toDF("a", "b")
    val out = Components.connectedComponents(nodes, "id", edges, "a", "b",
      maxIters = 10).as[(Long, Long)].collect()
    assert(out.forall(_._2 == 1L))
  }
}
