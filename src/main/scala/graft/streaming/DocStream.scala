package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{Sampling, TextAnalysis}

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
  * Scale shape of the cross-batch dedup: the sink is PARTITIONED by a
  * fingerprint prefix (`fpp`, 16^prefixHex uniform dirs), and the stored
  * side is semi-joined against the batch's distinct prefixes before the
  * anti-join — so a micro-batch reads only the prefix partitions its own
  * fingerprints land in (plus only the `fp` column within them), not the
  * full corpus column per batch. The anti-join itself shuffles on the
  * uniform 128-bit fingerprint.
  *
  * `prefixHex` sizes the layout to the STORE's expected volume, not the
  * batch's: target dirs ≈ store_bytes / desired_partition_bytes, so a
  * 100 TB corpus wants 2 hex chars (256 dirs of ~400 GB — the default)
  * while a fixture-sized store wants 1 (16 dirs): every batch pays one
  * parquet file PER TOUCHED DIR per store, so an over-wide layout turns
  * small batches into a small-files factory (the round-7 bench measured
  * the 256-way layout costing pipe2 ~500 file creations per batch on a
  * 5k-doc corpus).
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

  /** PIPE2 — the pipe1 preprocessing funnel, incremental: quality gate →
    * language filter → exact dedup (in-batch + cross-batch) → passage-level
    * dedup with CROSS-BATCH passage fingerprints → deterministic stratified
    * sample, per micro-batch.
    *
    * Batch-split-invariant for in-order delivery (spec-proven: the same
    * corpus yields the same survivors arriving as one batch or three)
    * because (a) every gate is a pure row predicate, (b) the exact-dedup
    * winner is the first-delivered fingerprint, and (c) a passage
    * fingerprint consumes its global first occurrence whether or not its
    * document survives the cut — exactly pipe1's semantics, where
    * passageDedup runs over the whole exact-deduped corpus BEFORE the
    * survival filter. That is why the passage store records every fresh
    * doc's fingerprints, not just survivors'.
    *
    * The passage store is a second prefix-partitioned parquet table
    * (`pp=p<prefixHex hex chars>`), probed per batch with the same
    * prefix-semi-join +
    * partition-pruning pattern as the doc sink. Its rows are tagged with
    * the writing batch id and it is appended BEFORE the doc sink: a
    * replayed batch excludes its own earlier half-written rows by batch id
    * (duplicate fingerprint rows are harmless — the probe is an anti-join
    * by value), and writing passages first means a crash between the two
    * appends replays as a batch whose docs are all still fresh — the
    * doc-sink anti-join, not the passage store, is what makes the replay
    * idempotent. */
  def ingestFunnel(spark: SparkSession, dropDir: String, checkpointDir: String,
      sinkPath: String, passageStorePath: String, minQuality: Double,
      langs: Seq[String], passageK: Int, sampleRates: Map[String, Double],
      sampleDefault: Double, markers: Seq[(String, Seq[String])],
      stopwords: Seq[String], trigger: Trigger,
      prefixHex: Int = 2, statePartitions: Int = 0): StreamingQuery = {
    require(prefixHex >= 1 && prefixHex <= 4, s"prefixHex=$prefixHex")
    StreamConf.withStatePartitions(spark, statePartitions) {
    val raw = spark.readStream.format("text").load(dropDir)
      .select(
        split(col("value"), "\t", 2).getItem(0).cast("long").as("doc_id"),
        split(col("value"), "\t", 2).getItem(1).as("text"))
    raw.writeStream
      .queryName("doc-funnel")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        val annotated = batch.select(
          col("doc_id"), col("text"),
          TextAnalysis.fingerprint(col("text")).as("fp"),
          TextAnalysis.qualityScore(col("text"), stopwords).as("quality"),
          TextAnalysis.langId(col("text"), markers).as("lang"))
          .where(col("quality") >= minQuality && col("lang").isin(langs: _*))
          .drop("quality")
        val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
        val deduped = annotated.withColumn("_rn", row_number().over(w))
          .where(col("_rn") === 1).drop("_rn")
          .withColumn("fpp", concat(lit("p"), substring(col("fp"), 1, prefixHex)))
        val freshDocs = (if (exists(s, sinkPath)) {
          val prefixes = deduped.select(col("fpp")).distinct()
          val storedFps = s.read.parquet(sinkPath)
            .join(broadcast(prefixes), Seq("fpp"), "left_semi")
            .select(col("fp"))
          deduped.join(storedFps, Seq("fp"), "left_anti")
        } else deduped).persist()
        // passage grain — EXACTLY passageDedup's chunk grammar, so the
        // incremental funnel and pipe1 elect the same winners
        val toksed = freshDocs.select(col("doc_id"),
          transform(TextAnalysis.tokens(col("text")), t => lower(t)).as("toks"))
          .where(size(col("toks")) > 0)
        val nChunks = ((size(col("toks")) + (passageK - 1)) / passageK)
          .cast("int")
        val passages = toksed.select(col("doc_id"),
          posexplode(transform(sequence(lit(0), nChunks - 1),
            i => md5(concat_ws(" ", slice(col("toks"), i * passageK + 1,
              lit(passageK)))))).as(Seq("idx", "pfp")))
          .withColumn("pp", concat(lit("p"), substring(col("pfp"), 1, prefixHex)))
          .persist()
        val storedPfps = if (exists(s, passageStorePath)) {
          val pprefixes = passages.select(col("pp")).distinct()
          s.read.parquet(passageStorePath)
            .where(col("batch_id") =!= batchId) // replayed-batch self-rows
            .join(broadcast(pprefixes), Seq("pp"), "left_semi")
            .select(col("pfp"))
        } else passages.select(col("pfp")).where(lit(false))
        // record this batch's NEW fingerprints before touching the doc sink.
        // The anti-join COLLECTS (batch-fingerprint-sized — two short hash
        // strings per row): emptiness is then a driver-side check instead
        // of a dedicated isEmpty job, the write is a pure LocalRelation
        // append, and the collect doubles as passages' cache fill.
        val newPfpsPlan = passages.select(col("pp"), col("pfp")).distinct()
          .join(storedPfps, Seq("pfp"), "left_anti")
          .withColumn("batch_id", lit(batchId))
        val newPfpsRows = newPfpsPlan.collect()
        // repartition BY the partition column before a partitionBy write:
        // otherwise every task writes a sliver into every prefix dir it
        // holds rows for (up to 256 dirs × tasks tiny files PER BATCH —
        // the small-files debt Compaction exists to clean). Clustered, a
        // prefix dir is written by exactly one task.
        if (newPfpsRows.nonEmpty) {
          import scala.jdk.CollectionConverters._
          s.createDataFrame(newPfpsRows.toSeq.asJava, newPfpsPlan.schema)
            .repartition(col("pp"))
            .write.mode(org.apache.spark.sql.SaveMode.Append)
            .partitionBy("pp").parquet(passageStorePath)
        }
        val wp = Window.partitionBy(col("pfp"))
          .orderBy(col("doc_id"), col("idx"))
        val keptP = passages.withColumn("_rn", row_number().over(wp))
          .where(col("_rn") === 1)
          .join(storedPfps, Seq("pfp"), "left_anti")
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n_kept"))
        val totals = passages.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_passages"))
        // inner join on totals: zero-token docs have no passage rows and
        // drop out — pipe1's join does the same
        val survivors = freshDocs
          .join(totals, Seq("doc_id"))
          .join(keptP, Seq("doc_id"), "left_outer")
          .where(lit(2) * coalesce(col("n_kept"), lit(0L))
            >= col("n_passages"))
          .drop("n_kept", "n_passages")
        val sampled = Sampling.stratifiedSample(survivors, "doc_id", "lang",
          sampleRates, sampleDefault).persist()
        if (!sampled.isEmpty)
          sampled.repartition(col("fpp"))
            .write.mode(org.apache.spark.sql.SaveMode.Append)
            .partitionBy("fpp").parquet(sinkPath)
        sampled.unpersist()
        passages.unpersist()
        freshDocs.unpersist()
        ()
      }
      .start()
    }
  }

  /** W16 — streaming NEAR-DUP admission against a persisted, batch-tagged
    * MinHash index ([[graft.operators.Dedup.admitBatch]] per micro-batch):
    * the nightly build/serve dedup split (d15/pipe13) moved onto the
    * streaming plane, with index APPEND-BACK so batch n+1 rejects
    * near-dups of what batch n admitted. File-source micro-batches run
    * strictly in order (foreachBatch serializes; `maxFilesPerTrigger`
    * pins one drop file per batch), so admission is deterministic for
    * in-order delivery. `Trigger.AvailableNow` drains the drop dir and
    * stops — the bulk-catchup lifecycle; a production deployment runs the
    * same query with a processing-time trigger. */
  def admitNearDup(spark: SparkSession, dropDir: String,
      checkpointDir: String, indexPath: String, sinkPath: String,
      k: Int, bands: Int, shingleK: Int, threshold: Double,
      maxFilesPerTrigger: Int = 1,
      statePartitions: Int = 0,
      epoch: Long = 0L): StreamingQuery = {
    StreamConf.withStatePartitions(spark, statePartitions) {
    val raw = spark.readStream.format("text")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .load(dropDir)
      .select(
        split(col("value"), "\t", 2).getItem(0).cast("long").as("doc_id"),
        split(col("value"), "\t", 2).getItem(1).as("text"))
    raw.writeStream
      .queryName("doc-admission")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // admitBatch returns its admitted-id frame as a driver-local
        // relation (composing callers reuse it); nothing to release here
        graft.operators.Dedup.admitBatch(batch, batchId, "doc_id", "text",
          indexPath, sinkPath, k, bands, shingleK, threshold, epoch)
        ()
      }
      .start()
    }
  }

  def ingest(spark: SparkSession, dropDir: String, checkpointDir: String,
      sinkPath: String, minTokens: Int,
      markers: Seq[(String, Seq[String])], stopwords: Seq[String],
      trigger: Trigger, prefixHex: Int = 2,
      statePartitions: Int = 0): StreamingQuery = {
    require(prefixHex >= 1 && prefixHex <= 4, s"prefixHex=$prefixHex")
    StreamConf.withStatePartitions(spark, statePartitions) {
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
          .withColumn("fpp", concat(lit("p"), substring(col("fp"), 1, prefixHex)))
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
        fresh.persist() // the guard and the write share one execution
        if (!fresh.isEmpty)
          fresh.repartition(col("fpp"))
            .write.mode(org.apache.spark.sql.SaveMode.Append)
            .partitionBy("fpp").parquet(sinkPath)
        fresh.unpersist()
        ()
      }
      .start()
    }
  }
}
