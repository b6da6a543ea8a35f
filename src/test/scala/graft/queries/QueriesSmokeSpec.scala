package graft.queries

import graft.SparkSpec

/** Runs the whole declared surface at sf0.001: every query must plan and
  * execute (the driver's DuckDB gate checks values at sf0.01; this guards
  * against runtime regressions inside `sbt test`). */
class QueriesSmokeSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("oracle map covers exactly the query map") {
    assert(graft.SparkEntry.oracleSql.keySet == graft.SparkEntry.queries.keySet)
  }

  graft.SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name executes at sf0.001") {
      val n = fn(spark, sfDir).count()
      assert(n >= 0)
    }
  }
}
