package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin preserves inner-join semantics exactly") {
    // heavily skewed probe: 1000 rows for key "hot", 5 for "cold"
    val probe = ((1 to 1000).map(i => ("hot", i.toLong)) ++
      (1 to 5).map(i => ("cold", i.toLong))).toDF("k", "v")
    val build = Seq(("hot", "H"), ("cold", "C"), ("unmatched", "U"))
      .toDF("k", "tag")
    val plain = probe.join(build, Seq("k"))
      .select($"k", $"v", $"tag").as[(String, Long, String)]
      .collect().toSet
    val salted = Skew.saltedJoin(probe, build, Seq("k"), factor = 8)
      .select($"k", $"v", $"tag").as[(String, Long, String)]
      .collect().toSet
    assert(salted == plain)
    assert(salted.size == 1005)
  }

  test("salted build side replicates per salt, probe rows stay unique") {
    val probe = (1 to 100).map(i => ("hot", i.toLong)).toDF("k", "v")
    val build = Seq(("hot", "H")).toDF("k", "tag")
    val out = Skew.saltedJoin(probe, build, Seq("k"), factor = 4)
    assert(out.count() == 100)          // no duplicates, no losses
    assert(out.select("v").distinct().count() == 100)
  }
}
