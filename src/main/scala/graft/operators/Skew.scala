package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is pathological (one
  * symbol/user dominating a 100 TB fact table). AQE's skew-join splitting
  * handles sort-merge cases at runtime; explicit salting remains the tool
  * when the small side must replicate — e.g. hot-key dimension joins where a
  * single build-side row matches billions of probe rows in one partition.
  *
  * [[saltedJoin]]: the probe (skewed) side gets a uniform salt in
  * `[0, factor)`; the build side replicates each row `factor` times with
  * every salt value; the join key becomes (key, salt), spreading each hot
  * key over `factor` partitions. Equi-join semantics are preserved exactly
  * (inner joins; each probe row still matches each build row once, because
  * a probe row carries ONE salt and the build side has exactly one replica
  * with that salt).
  */
object Skew {

  /** Inner equi-join on `keys` with the left (probe/skewed) side salted and
    * the right (build) side replicated `factor` times. */
  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
      factor: Int): DataFrame = {
    // per-row uniform salt: rand() spreads IDENTICAL duplicate rows of a hot
    // key (a row hash would give them all the same salt — no-op mitigation).
    // Salt instability across task retries is harmless: the build side
    // carries every salt value, so any drawn salt joins correctly.
    val salted = probe.withColumn("_salt",
      floor(rand(42) * factor).cast("int"))
    val replicated = build
      .withColumn("_salt", explode(sequence(lit(0), lit(factor - 1))))
      .withColumn("_salt", col("_salt").cast("int"))
    salted.join(replicated, keys :+ "_salt").drop("_salt")
  }
}
