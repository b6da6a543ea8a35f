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

  /** ADAPTIVE salted join — the o11 skew census wired to the j9 repair in
    * ONE declarative plan, no driver round-trip: a per-key census of the
    * probe side finds the hot keys (count > hotNum/hotDen × mean) and
    * derives each hot key's OWN salt factor ≈ its skew multiple
    * (count·n_keys div total, clamped to [2, cap] — the number of
    * partitions that key spreads over); the broadcast hot list then salts
    * the probe deterministically (pmod(xxhash64(uniqueCol), factor) — a
    * UNIQUE column, not the key, so identical hot-key rows still spread;
    * deterministic, unlike j9's rand, so the result is replayable) and
    * replicates ONLY the hot keys' build rows factor times. Cold keys
    * join unsalted (salt 0, one replica), so the build-side blowup is
    * Σ factors over the few hot keys instead of j9's factor × |build|.
    * Inner equi-join semantics are preserved exactly: a probe row carries
    * one salt and its key's build rows carry every salt exactly once.
    *
    * Returns (joined, hot list (keys, _factor), 1-row census stats
    * (_n, _tot, _mx)) so callers can surface the detector's numbers.
    * Scale shape: the census is one map-side-combine groupBy over probe
    * keys; the hot list is tiny by construction (keys above the multiple
    * of mean); census subtree recompute per consumer is one extra probe
    * scan — the unpersist discipline (d20 adjudication). */
  def adaptiveSaltedJoin(probe: DataFrame, build: DataFrame,
      keys: Seq[String], uniqueCol: String, hotNum: Long, hotDen: Long,
      cap: Int): (DataFrame, DataFrame, DataFrame) = {
    require(hotNum > 0 && hotDen > 0 && cap >= 2,
      s"adaptiveSaltedJoin: need positive hot ratio and cap >= 2 " +
        s"(got $hotNum/$hotDen, cap=$cap)")
    val kc = keys.map(col)
    val counts = probe.groupBy(kc: _*).agg(count(lit(1)).as("_cnt"))
    val stats = counts.agg(count(lit(1)).as("_n"),
      sum(col("_cnt")).as("_tot"), max(col("_cnt")).as("_mx"))
    // hot iff cnt·hotDen·n > hotNum·tot  ⇔  cnt > (hotNum/hotDen)·mean,
    // kept in exact integer algebra (cross-engine replayable)
    val hot = counts.crossJoin(broadcast(stats))
      .where(col("_cnt") * lit(hotDen) * col("_n") >
        lit(hotNum) * col("_tot"))
      .select(kc :+
        expr(s"least(greatest((_cnt * _n) div _tot, 2L), ${cap}L)")
          .as("_factor"): _*)
    val hotB = broadcast(hot)
    val probeS = probe.join(hotB, keys, "left")
      .withColumn("_salt", when(col("_factor").isNull, lit(0))
        .otherwise(pmod(xxhash64(col(uniqueCol)), col("_factor"))
          .cast("int")))
      .drop("_factor")
    val buildS = build.join(hotB, keys, "left")
      .withColumn("_salt", explode(sequence(lit(0),
        (coalesce(col("_factor"), lit(1L)) - 1).cast("int"))))
      .drop("_factor")
    (probeS.join(buildS, keys :+ "_salt").drop("_salt"), hot, stats)
  }
}
