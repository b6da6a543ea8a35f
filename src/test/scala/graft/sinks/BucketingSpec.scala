package graft.sinks

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("co-bucketed tables join with no shuffle exchange") {
    val left = (1L to 1000L).map(i => (i % 97, i)).toDF("k", "lv")
    val right = (1L to 500L).map(i => (i % 97, i * 10)).toDF("k", "rv")
    Bucketing.writeBucketed(left, "bspec_l", 8, Seq("k"))
    Bucketing.writeBucketed(right, "bspec_r", 8, Seq("k"))
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    val prevA = spark.conf.get("spark.sql.adaptive.enabled", "true")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val j = spark.table("bspec_l").join(spark.table("bspec_r"), "k")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), plan) // both sides pre-bucketed
      // and the result is correct
      val n = j.count()
      val expected = left.join(right, "k").count()
      assert(n == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.set("spark.sql.adaptive.enabled", prevA)
      spark.sql("DROP TABLE IF EXISTS bspec_l")
      spark.sql("DROP TABLE IF EXISTS bspec_r")
    }
  }
}
