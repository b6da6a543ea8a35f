package graft.operators

import org.apache.spark.sql.DataFrame

/** Guard against the narrow-scan pathology for compute-bound projections.
  *
  * Operators like MinHash/SimHash signatures, IVF cell assignment, or
  * per-document quality scoring do most of their CPU work in the SCAN
  * stage, before the first exchange. Spark parallelizes that stage by
  * input split — and a parquet file smaller than one row group yields
  * exactly ONE task, so a 32-core executor runs the whole corpus'
  * token-hash / vector math single-threaded (measured on d6: the
  * tokenize+digest projection over one 594 KB file was 13 s of a 24 s
  * query — >90% idle cores).
  *
  * [[Spread.apply]] repartitions to the session default parallelism ONLY
  * when the plan's partitioning is narrower than that, so:
  *  - at test/dev scale (one tiny file) the expensive projection fans out
  *    across every core for the cost of shuffling the raw rows (trivial
  *    by construction: the input was smaller than one split);
  *  - at production scale the scan already has thousands of splits and
  *    this is a literal no-op — no exchange is added to the plan.
  */
object Spread {
  def apply(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // getNumPartitions plans the RDD lineage but launches no job
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
