package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming ingest for MULTIMODAL payloads — the m-family's streaming
  * plane: one [[graft.operators.MediaSpine.ingestBatch]] per micro-batch
  * of (id, payload binary) parquet drop files (binary payloads need a
  * binary-clean container — the w20 rule for float-lossless vectors,
  * applied to bytes). File-source micro-batches run strictly in order
  * (foreachBatch serializes; `maxFilesPerTrigger` pins one drop file per
  * batch), so admission is deterministic for in-order delivery.
  * `Trigger.AvailableNow` drains the drop dir and stops — the
  * bulk-catchup lifecycle; a production deployment runs the same query
  * with a processing-time trigger. */
object MediaStream {

  def admitMedia(spark: SparkSession, dropDir: String,
      checkpointDir: String, shaPath: String, vecIdxPath: String,
      censusPath: String, cents: Array[(Long, Array[Double])],
      nprobe: Int, threshold: Double, shards: Long, schema: StructType,
      maxFilesPerTrigger: Int = 1, statePartitions: Int = 0,
      epoch: Long = 0L): StreamingQuery = {
    StreamConf.withStatePartitions(spark, statePartitions) {
      val raw = spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .load(dropDir)
      raw.writeStream
        .queryName("media-admission")
        .option("checkpointLocation", checkpointDir)
        .trigger(Trigger.AvailableNow())
        .foreachBatch {
          (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
            graft.operators.MediaSpine.ingestBatch(batch, batchId,
              "doc_id", "payload", shaPath, vecIdxPath, censusPath,
              cents, nprobe, threshold, shards, epoch)
            ()
        }
        .start()
    }
  }
}
