package graft.streaming

import org.apache.spark.sql.SparkSession

/** Stateful-stream sizing: the shuffle-partition count at a streaming
  * query's FIRST start becomes its state-store partition count for the
  * life of the checkpoint, and every micro-batch pays per-partition state
  * files + commit sync regardless of how little state each holds. So the
  * right count is a deploy-time choice sized to key cardinality and
  * throughput — thousands on a real cluster, a handful for a fixture
  * stream — not whatever batch default the session happens to carry
  * (the same store-volume-not-batch-volume rule as DocStream.prefixHex).
  */
object StreamConf {

  /** Run `body` with `spark.sql.shuffle.partitions` pinned to `n`
    * (n <= 0: leave the session default), restoring the prior value
    * after. Streaming clones the session conf at query start, so the
    * pinned value governs the stream (and its foreachBatch jobs) even
    * though it is restored once `body` returns. */
  def withStatePartitions[A](spark: SparkSession, n: Int)(body: => A): A = {
    if (n <= 0) body
    else {
      val key = "spark.sql.shuffle.partitions"
      val prev = spark.conf.get(key)
      spark.conf.set(key, n)
      try body finally spark.conf.set(key, prev)
    }
  }
}
