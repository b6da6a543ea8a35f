package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming ingest for an embedding corpus — the vector-plane analogue of
  * [[DocStream]]: micro-batches of (id, vector) rows arriving as parquet
  * drop files are admitted against a persisted, batch-tagged IVF index
  * (reference runs this continuously where it syncs feeds row-at-a-time,
  * e.g. `src/exchanges/_base_.py`'s incremental kline pulls; here the
  * online ingestion surface is embeddings and the dedup plane is
  * semantic). All per-batch semantics live in
  * [[graft.operators.Similarity.admitVecBatch]] so the nightly/bulk and
  * streaming planes share ONE admission rule. */
object VecStream {

  /** W20 — streaming ANN near-dup admission. File-source micro-batches run
    * strictly in order (foreachBatch serializes; `maxFilesPerTrigger` pins
    * one drop file per batch), so admission is deterministic for in-order
    * delivery. `Trigger.AvailableNow` drains the drop dir and stops — the
    * bulk-catchup lifecycle; a production deployment runs the same query
    * with a processing-time trigger. The parquet file source needs the
    * explicit `schema` (streaming reads never infer); drop files carry
    * exact float vectors, so the round trip through the drop dir is
    * bit-lossless — the oracle's cosines see the same doubles. */
  def admitNearDup(spark: SparkSession, dropDir: String,
      checkpointDir: String, indexPath: String, sinkPath: String,
      cents: Array[(Long, Array[Double])], nprobe: Int, threshold: Double,
      schema: StructType, idCol: String = "vec_id",
      vecCol: String = "embedding", maxFilesPerTrigger: Int = 1,
      epoch: Long = 0L): StreamingQuery = {
    val raw = spark.readStream.format("parquet")
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(dropDir)
    raw.writeStream
      .queryName("vec-admission")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.Similarity.admitVecBatch(batch, batchId, idCol,
          vecCol, indexPath, sinkPath, cents, nprobe, threshold, epoch)
        ()
      }
      .start()
  }
}
