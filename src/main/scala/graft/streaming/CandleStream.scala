package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** W19 — streaming OHLCV candle maintenance: per micro-batch, the batch's
  * ticks roll up to unit-grain PARTIAL candles ([[graft.operators.Candles
  * .partials]], the merge keys carried) which land in a partial-candle
  * store under the batch's OWN partition (`store/batch=N`). Serving reads
  * merge the partials with the same associative algebra
  * ([[graft.operators.Candles.merge]] at identity grain), so the store
  * answers exactly what a batch rollup over all ticks would — the
  * mergeability w18 proves for the grain cascade, applied to time-sliced
  * ingest.
  *
  * Crash-replay idempotency WITHOUT tags or read-modify-write: a replayed
  * batch OVERWRITES its own partition with the identical partials (the
  * write is a pure function of the batch), so any crash between commit
  * and checkpoint replays to the same end state — the k1 upsert
  * discipline reduced to partition-overwrite, because partial candles are
  * keyed by the batch that produced them. At 100 TB the store is
  * candle-grain (orders smaller than ticks), each micro-batch writes only
  * its own partition, and a nightly compaction (the k4/o9 machinery) can
  * squash partials to one candle per bucket whenever the partial count
  * grows — serving cost is bounded by partials-per-bucket either way. */
object CandleStream {

  val TickSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts_ms", LongType),
    StructField("series", StringType),
    StructField("value", DoubleType)))

  /** One micro-batch → unit-grain partials → own-partition overwrite. */
  def applyBatch(batch: DataFrame, batchId: Long, storePath: String,
      unitMs: Long): Unit = {
    graft.operators.Candles.partials(batch, unitMs)
      .write.mode("overwrite").parquet(s"$storePath/batch=$batchId")
    ()
  }

  /** Drain `dropDir` (one parquet drop file per micro-batch — the w16
    * mtime-ordered fixture contract) into the partial-candle store. */
  def mergeCandles(spark: SparkSession, dropDir: String,
      checkpointDir: String, storePath: String, unitMs: Long,
      maxFilesPerTrigger: Int = 1,
      statePartitions: Int = 0): StreamingQuery = {
    StreamConf.withStatePartitions(spark, statePartitions) {
      val raw = spark.readStream.format("parquet")
        .schema(TickSchema)
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .load(dropDir)
      raw.writeStream
        .queryName("candle-merge")
        .option("checkpointLocation", checkpointDir)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          applyBatch(batch, batchId, storePath, unitMs)
        }
        .start()
    }
  }
}
