package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.TextAnalysis

/** Streaming ingest for a training-data corpus: the document-side analogue
  * of [[KlineStream.ingest]], composing the text-pipeline operators into an
  * idempotent micro-batch flow.
  *
  * Per micro-batch over a drop dir of `(doc_id TAB text)` lines:
  *   1. annotate map-side: content fingerprint, token count, quality score,
  *      language ID ([[TextAnalysis]] — all codegen'd column math);
  *   2. drop rows under the `minTokens` quality gate;
  *   3. exact-dedup WITHIN the batch by fingerprint (min doc_id wins);
  *   4. anti-join the sink's stored fingerprints so re-delivered files and
  *      cross-batch duplicates never append twice — first occurrence wins,
  *      which is the dedup semantic (vs the kline sink's newest-wins merge).
  *
  * Scale shape of the cross-batch dedup: the sink is PARTITIONED by the
  * first fingerprint byte (`fpp`, 256 uniform dirs), and the stored side is
  * semi-joined against the batch's distinct prefixes before the anti-join —
  * so a micro-batch reads only the prefix partitions its own fingerprints
  * land in (plus only the `fp` column within them), not the full corpus
  * column per batch. The anti-join itself shuffles on the uniform 128-bit
  * fingerprint.
  */
object DocStream {

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).nonEmpty
  }

  /** The per-batch transform, factored out for batch reuse/testing. */
  def cleanBatch(batch: DataFrame, minTokens: Int,
      markers: Seq[(String, Seq[String])],
      stopwords: Seq[String]): DataFrame = {
    val scored = batch.select(
      col("doc_id"), col("text"),
      TextAnalysis.fingerprint(col("text")).as("fp"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
      TextAnalysis.qualityScore(col("text"), stopwords).as("quality"),
      TextAnalysis.langId(col("text"), markers).as("lang"))
      .where(col("n_tokens") >= minTokens)
    val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
    scored.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_rn")
  }

  def ingest(spark: SparkSession, dropDir: String, checkpointDir: String,
      sinkPath: String, minTokens: Int,
      markers: Seq[(String, Seq[String])], stopwords: Seq[String],
      trigger: Trigger): StreamingQuery = {
    val raw = spark.readStream.format("text").load(dropDir)
      .select(
        // limit=2: a tab inside the text must not truncate it
        split(col("value"), "\t", 2).getItem(0).cast("long").as("doc_id"),
        split(col("value"), "\t", 2).getItem(1).as("text"))
    raw.writeStream
      .queryName("doc-ingest")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val s = batch.sparkSession
        // "p" guard: an all-numeric-hex dir set ("fpp=42") would make
        // partition discovery infer an INT column and the next batch's
        // non-numeric prefix ("5b") explode the ANSI cast in the semi join
        val deduped = cleanBatch(batch, minTokens, markers, stopwords)
          .withColumn("fpp", concat(lit("p"), substring(col("fp"), 1, 2)))
        val fresh =
          if (exists(s, sinkPath)) {
            val prefixes = deduped.select(col("fpp")).distinct()
            // prefix semi-join + partition pruning: read only the fp
            // partitions this batch can collide with
            val storedFps = s.read.parquet(sinkPath)
              .join(broadcast(prefixes), Seq("fpp"), "left_semi")
              .select(col("fp"))
            deduped.join(storedFps, Seq("fp"), "left_anti")
          } else deduped
        if (!fresh.isEmpty)
          fresh.write.mode(org.apache.spark.sql.SaveMode.Append)
            .partitionBy("fpp").parquet(sinkPath)
      }
      .start()
  }
}
