package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional comma-separated subset for local iteration
    val only = sys.env.get("SPARK_GRAFT_QUERIES").map(_.split(",").toSet)
    val selected = SparkEntry.queries.filter { case (n, _) =>
      only.forall(_.contains(n))
    }
    // untimed warm-up: JIT/codegen + parquet footer priming, so the first
    // timed query doesn't absorb JVM startup
    try { SparkEntry.entry(spark).count() } catch { case _: Throwable => () }
    // single-run timings swing up to 6× on identical plans (Janino compile,
    // JIT, page cache) — report the MEDIAN of n runs per query plus the raw
    // runs so spread is visible in the JSON.
    // Two noise controls (the round-5 lesson — sub-second medians moved
    // ±3-5× with zero code change): HEAVY queries run LAST so their GC/JIT
    // debt can't pollute a sub-second neighbor's runs, and any query whose
    // first run lands under a second gets 5 runs instead of 3 — the
    // fixed-overhead band is exactly where a median of 3 is noisiest.
    val heavy = Set("d2_jaccard_pairs", "d3_minhash_lsh", "d6_simhash_pairs",
      "d7_contamination", "d9_dup_clusters", "s11_kmeans_train",
      "pipe1_funnel")
    val ordered = selected.toSeq.sortBy { case (n, _) => (heavy(n), n) }
    val baseRuns = sys.env.get("SPARK_GRAFT_RUNS").map(_.toInt.max(1))
    val results = ordered.map { case (name, fn) =>
      def timedRun(): Double = {
        // drop persisted frames from the previous run so every run pays its
        // own cold cost — medians measure the query, not cache residue
        spark.sharedState.cacheManager.clearCache()
        System.gc() // don't bill the previous query's garbage to this one
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
                 catch { case _: Throwable => false }
        // crashed queries record a NEGATIVE timing so failures are visible
        // in the bench JSON instead of blending into the total
        if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      }
      val first = timedRun()
      val total = baseRuns.getOrElse(if (first >= 0 && first < 1.0) 5 else 3)
      name -> (first +: (2 to total).map(_ => timedRun()))
    }
    def median(xs: Seq[Double]): Double =
      if (xs.exists(_ < 0)) -1.0
      else {
        val s = xs.sorted
        if (s.size % 2 == 1) s(s.size / 2)
        else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
      }
    val meds = results.map { case (k, v) => k -> median(v) }
    val qs = meds.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val runsJson = results.map { case (k, v) =>
      s"\"" + k + "\":" + v.mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val total = meds.map(_._2).sum
    val maxRuns = results.map(_._2.size).maxOption.getOrElse(0)
    println(s"""{"metric":"total","value":$total,"unit":"sec","runs_per_query":$maxRuns,"queries":$qs,"runs":$runsJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
