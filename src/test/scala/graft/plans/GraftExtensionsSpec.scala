package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.Funcs

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("native precision_of matches the built-in composition on all shapes") {
    GraftExtensions.register(spark)
    val cases = Seq("0.01000000", "1", "1.0", "0.001", "12.3450", "0.10",
      "100", "3.14159", "2.5000", "0.0")
    val out = cases.toDF("s")
      .select($"s",
        call_function("precision_of", $"s").as("native"),
        Funcs.precisionOf($"s").as("composed"))
      .as[(String, Int, Int)].collect()
    out.foreach { case (s, n, c) => assert(n == c, s"input=$s native=$n composed=$c") }
    assert(out.length == cases.length)
  }

  test("precision_of is SQL-callable, constant-folds, and stays in codegen") {
    GraftExtensions.register(spark)
    // literal input constant-folds at plan time (proves interpreted eval)
    val folded = spark.sql("SELECT precision_of('0.0250') AS p")
    assert(folded.as[Int].head() == 3)
    assert(folded.queryExecution.executedPlan.toString.contains("3 AS p"))
    // non-constant input must run inside a whole-stage-codegen span: the
    // `*(n)` star prefix marks codegen'd operators (local Seq data would be
    // plan-time evaluated by ConvertToLocalRelation, so use range)
    val df = spark.range(2)
      .selectExpr(
        "precision_of(format_string('%.3f', cast(id as double) / 8)) AS p")
    assert(df.as[Int].collect().sorted.toList == List(0, 3)) // 0.000, 0.125
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan)
  }

  test("null propagates") {
    GraftExtensions.register(spark)
    val out = spark.sql("SELECT precision_of(CAST(NULL AS STRING)) AS p")
      .as[Option[Int]].head()
    assert(out.isEmpty)
  }
}
