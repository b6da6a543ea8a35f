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

  test("adaptiveSaltedJoin: census marks exactly the hot key, sizes its " +
      "factor, and the join stays semantically invisible") {
    // probe: key a ×8, b ×2 → mean 5; hot iff cnt·2·2 > 3·10 ⇔ cnt > 7.5
    // ⇒ only a is hot, factor = least(greatest(8·2 div 10, 2), 32) = 2
    val probe = ((1 to 8).map(i => ("a", i.toLong)) ++
      Seq(("b", 9L), ("b", 10L))).toDF("k", "uid")
    val build = Seq(("a", "A"), ("b", "B"), ("c", "C")).toDF("k", "tag")
    val (joined, hot, stats) = Skew.adaptiveSaltedJoin(probe, build,
      Seq("k"), "uid", hotNum = 3L, hotDen = 2L, cap = 32)
    val hotRows = hot.as[(String, Long)].collect().toList
    assert(hotRows == List(("a", 2L)))
    val st = stats.collect().head
    assert((st.getLong(0), st.getLong(1), st.getLong(2)) == (2L, 10L, 8L))
    val plain = probe.join(build, Seq("k"))
      .select($"k", $"uid", $"tag").as[(String, Long, String)]
      .collect().toSet
    val got = joined.select($"k", $"uid", $"tag")
      .as[(String, Long, String)].collect().toSet
    assert(got == plain)
    assert(got.size == 10)
    // the repair is real: the physical join key carries the salt
    assert(joined.queryExecution.executedPlan.toString.contains("_salt"))
  }

  test("adaptiveSaltedJoin: duplicate rows of a hot key spread across " +
      "salts via the unique column") {
    val probe = (1 to 100).map(i => ("hot", i.toLong)).toDF("k", "uid")
    val build = Seq(("hot", "H")).toDF("k", "tag")
    // hot iff cnt·1·1 > 0·tot — always; factor = least(greatest(100·1
    // div 100, 2), 8) = 2... force a bigger spread with a 1-key census:
    // cnt=100, n=1, tot=100 → (100·1) div 100 = 1 → clamped to 2
    val (joined, hot, _) = Skew.adaptiveSaltedJoin(probe, build,
      Seq("k"), "uid", hotNum = 1L, hotDen = 2L, cap = 8)
    assert(hot.count() == 1)
    assert(joined.count() == 100)
    // pmod(xxhash64(uid), 2) must land on BOTH salts for 100 distinct uids
    val salts = probe
      .withColumn("s", pmod(xxhash64($"uid"), lit(2L))).select("s")
      .distinct().count()
    assert(salts == 2)
  }
}
