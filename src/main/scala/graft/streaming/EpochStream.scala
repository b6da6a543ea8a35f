package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming driver for the incremental pretraining-epoch spine — the
  * production form of pipe15's batch composition: micro-batches of freshly
  * crawled docs arriving as parquet drop files flow curation → benchmark
  * decontamination → admission-gated dedup → incremental mix ledger →
  * append-only manifest deltas. All per-batch semantics live in
  * [[graft.operators.EpochSpine.ingestBatch]]; curation is injected as a
  * frame transform so the batch and streaming planes share ONE curation
  * implementation (Queries.curationCleaned). */
object EpochStream {

  /** PIPE16. File-source micro-batches run strictly in order (foreachBatch
    * serializes; `maxFilesPerTrigger = 1` pins one drop file per batch);
    * `Trigger.AvailableNow` drains the drop dir and stops — the
    * bulk-catchup lifecycle; production runs the same query on a
    * processing-time trigger. The parquet source needs the explicit
    * `schema` (streaming reads never infer). */
  def runEpoch(spark: SparkSession, dropDir: String, checkpointDir: String,
      curate: DataFrame => DataFrame, benchShinglesPath: String,
      indexPath: String, sinkPath: String, censusPath: String,
      targets: Seq[(String, Long)], k: Int, bands: Int, shingleK: Int,
      threshold: Double, deconK: Int, shards: Long, schema: StructType,
      maxFilesPerTrigger: Int = 1, epoch: Long = 0L,
      statePartitions: Int = 0): StreamingQuery =
    StreamConf.withStatePartitions(spark, statePartitions) {
      spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .load(dropDir)
        .writeStream
        .queryName("epoch-spine")
        .option("checkpointLocation", checkpointDir)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          graft.operators.EpochSpine.ingestBatch(curate(batch), batchId,
            benchShinglesPath, indexPath, sinkPath, censusPath, targets,
            k, bands, shingleK, threshold, deconK, shards, epoch)
          ()
        }
        .start()
    }
}
