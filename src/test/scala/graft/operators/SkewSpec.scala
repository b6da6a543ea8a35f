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

  test("a hot key of IDENTICAL rows spreads over >= factor/2 partitions") {
    // THE reason the salt is rand(seed) and not a row hash: identical
    // duplicate rows of a hot key would all hash to one salt — a no-op
    // mitigation. rand draws per ROW, so even a degenerate all-duplicates
    // key spreads. Deterministic here: the seed is fixed and AQE is
    // disabled so post-shuffle partitions aren't coalesced back together.
    val factor = 8
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try {
      val probe = (1 to 2000).map(_ => ("hot", 1L)).toDF("k", "v")
      val build = Seq(("hot", "H")).toDF("k", "tag")
      val nParts = Skew.saltedJoin(probe, build, Seq("k"), factor)
        .withColumn("pid", spark_partition_id())
        .select("pid").distinct().count()
      assert(nParts >= factor / 2,
        s"hot key landed in only $nParts partitions (factor=$factor)")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    }
  }
}
