package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Watermarked tumbling-window aggregation over a file-delivered event
  * stream — the Structured Streaming core (event-time windows + watermark
  * late-data policy) driven end-to-end so an oracle can check its OUTPUT,
  * not just its plumbing (w9_stream_windows).
  *
  * Delivery contract: each call processes whatever files are in `dropDir`
  * under `Trigger.AvailableNow` against the SAME checkpoint, so a
  * sequence of calls is a deterministic sequence of micro-batches — the
  * watermark persists in the checkpoint's commit log across calls, which
  * sidesteps file-ordering nondeterminism entirely (same pattern as the
  * pipe2 funnel's sequential deliveries).
  *
  * Semantics the oracle replays (and the spec pins): the watermark for
  * batch b is `max event time over batches < b` minus `delayMs`
  * (microsecond arithmetic — Spark tracks event time in µs); a row whose
  * WINDOW END is at or below that watermark is dropped; in append mode a
  * window is emitted once the post-batch watermark passes its end, and
  * `Trigger.AvailableNow`'s trailing no-data batch flushes every window
  * the final watermark has passed. */
object EventWindowStream {

  /** The text file source, optionally rate-limited to `maxFiles` files per
    * micro-batch. With `maxFiles = 1` a SINGLE `AvailableNow` lifecycle
    * processes N pre-staged drop files as N sequential micro-batches at
    * one query-start/stop cost instead of N (~1.5 s of lifecycle overhead
    * per start, r7 bench). Callers must stage files with strictly
    * increasing modification times
    * ([[graft.queries.Queries.stageBatchFile]]) — the file source orders
    * by modTime, so controlled stamps make batch order deterministic.
    *
    * SEMANTIC CAVEAT, measured (EventDedupStreamSpec pins it): within a
    * single run the LATE-RECORD filter evaluates against the PREVIOUS
    * batch's watermark (Spark's two-value watermark design: late-event
    * filtering lags one batch behind state eviction), while a restarted
    * query loads the committed watermark into both. A watermark-free
    * lifecycle (w14's flatMapGroupsWithState cursor) is therefore
    * bit-identical either way and uses `maxFiles = 1`; the watermarked
    * lifecycles (w9-w12) keep one lifecycle per delivery — the restart
    * semantics their oracles replay. The multi-call path also remains
    * the restart-recovery contract, oracle-proven via pipe2. */
  private def source(spark: SparkSession, dir: String, maxFiles: Int) = {
    val base = spark.readStream.format("text")
    (if (maxFiles > 0) base.option("maxFilesPerTrigger", maxFiles) else base)
      .load(dir)
  }

  /** One delivery round: drain `dropDir` (lines `event_id TAB epoch_us
    * TAB value`), aggregate per `windowDur` tumbling event-time window,
    * append finalized windows to the parquet `sink`. */
  def deliver(spark: SparkSession, dropDir: String, checkpointDir: String,
      sink: String, delay: String, windowDur: String,
      statePartitions: Int = 0, maxFilesPerTrigger: Int = 0): Unit =
      StreamConf.withStatePartitions(spark, statePartitions) {
    val raw = source(spark, dropDir, maxFilesPerTrigger)
      .select(
        split(col("value"), "\t").getItem(0).cast("long").as("event_id"),
        timestamp_micros(split(col("value"), "\t").getItem(1).cast("long"))
          .as("ts"),
        split(col("value"), "\t").getItem(2).cast("double").as("value"))
    val q = raw.withWatermark("ts", delay)
      .groupBy(window(col("ts"), windowDur))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("total_value"))
      .select(unix_millis(col("window.start")).as("win_start"),
        col("n_events"), col("total_value"))
      .writeStream
      .queryName("event-windows")
      .outputMode("append")
      .format("parquet")
      .option("path", sink)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(300000)
    ()
  }

  /** Stream-STREAM interval join (w12): two file-delivered event streams
    * (lines `event_id TAB epoch_us TAB user_id`), inner-joined on user id
    * with `|ts_a − ts_b| ≤ 30 min`, both sides watermarked. Each side
    * buffers rows in state until the watermark passes `ts + 30 min`, so
    * matches across micro-batch boundaries come from buffered state; with
    * delay (2 h) > interval (30 min), any row old enough to be evicted is
    * too old to match a surviving on-time row — which is what makes the
    * batch-mode interval join over non-late rows the exact oracle. Same
    * sequential-delivery contract as [[deliver]]. */
  def deliverJoin(spark: SparkSession, dropA: String, dropB: String,
      checkpointDir: String, sink: String, delay: String,
      statePartitions: Int = 0, maxFilesPerTrigger: Int = 0): Unit =
      StreamConf.withStatePartitions(spark, statePartitions) {
    def side(dir: String, p: String) =
      source(spark, dir, maxFilesPerTrigger).select(
        split(col("value"), "\t").getItem(0).cast("long").as(s"${p}_id"),
        timestamp_micros(split(col("value"), "\t").getItem(1).cast("long"))
          .as(s"ts_$p"),
        split(col("value"), "\t").getItem(2).cast("long").as(s"user_$p"))
    val a = side(dropA, "a").withWatermark("ts_a", delay)
    val b = side(dropB, "b").withWatermark("ts_b", delay)
    val q = a.join(b, expr(
      """user_a = user_b AND
         ts_b BETWEEN ts_a - INTERVAL 30 MINUTES
                  AND ts_a + INTERVAL 30 MINUTES"""))
      .select(col("user_a").as("user_id"), col("a_id"), col("b_id"),
        unix_micros(col("ts_a")).as("us_a"),
        unix_micros(col("ts_b")).as("us_b"))
      .writeStream
      .queryName("event-stream-join")
      .outputMode("append")
      .format("parquet")
      .option("path", sink)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(300000)
    ()
  }

  /** Streaming-dedup variant (w11): lines `event_id TAB epoch_us TAB
    * value`, `dropDuplicatesWithinWatermark` on the event id — the state-TTL
    * dedup shape (state for a key lives until the watermark passes its event
    * time + delay, so re-deliveries inside the delay window drop, late rows
    * drop without forming state, and a key RE-OCCURRING after expiry is kept
    * again). Kept rows emit in their processing batch (append mode has no
    * emission gate for dedup). Same sequential-delivery contract as
    * [[deliver]]. */
  def deliverDedup(spark: SparkSession, dropDir: String,
      checkpointDir: String, sink: String, delay: String,
      statePartitions: Int = 0, maxFilesPerTrigger: Int = 0): Unit =
      StreamConf.withStatePartitions(spark, statePartitions) {
    val raw = source(spark, dropDir, maxFilesPerTrigger)
      .select(
        split(col("value"), "\t").getItem(0).cast("long").as("event_id"),
        timestamp_micros(split(col("value"), "\t").getItem(1).cast("long"))
          .as("ts"),
        split(col("value"), "\t").getItem(2).cast("double").as("value"))
    val q = raw.withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark("event_id")
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("value"))
      .writeStream
      .queryName("event-dedup")
      .outputMode("append")
      .format("parquet")
      .option("path", sink)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(300000)
    ()
  }

  /** CUSTOM-state cursor variant (w14): lines `event_id TAB epoch_us TAB
    * user_id`, per-user running (count, max-ts) cursor maintained in
    * `flatMapGroupsWithState` — the arbitrary-state API the built-in
    * windows can't express (KlineStream's ingest-cursor semantic, A4,
    * driven through the oracle gate). Per micro-batch each ACTIVE user
    * emits one snapshot row (n_batch, cumulative n_total, cumulative
    * max_ts): deterministic under the sequential-delivery contract, and
    * identified by the strictly-increasing n_total rather than a batch
    * id, so the output set is replayable in closed form (per-(user,
    * delivery) aggregate + running window — the w14 oracle). NoTimeout:
    * eviction/TTL semantics are w11's covered ground; this pins the
    * state get/update/emit path itself. */
  def deliverCursor(spark: SparkSession, dropDir: String,
      checkpointDir: String, sink: String,
      statePartitions: Int = 0, maxFilesPerTrigger: Int = 0): Unit =
      StreamConf.withStatePartitions(spark, statePartitions) {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val raw = source(spark, dropDir, maxFilesPerTrigger)
      .select(
        split(col("value"), "\t").getItem(0).cast("long").as("event_id"),
        split(col("value"), "\t").getItem(1).cast("long").as("us"),
        split(col("value"), "\t").getItem(2).cast("long").as("user_id"))
      .as[(Long, Long, Long)]
    val cursed = raw.groupByKey(_._3)
      .flatMapGroupsWithState[(Long, Long), (Long, Long, Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Long, Long)],
         state: GroupState[(Long, Long)]) =>
          var nBatch = 0L
          var mx = Long.MinValue
          rows.foreach { r => nBatch += 1; if (r._2 > mx) mx = r._2 }
          if (nBatch == 0L) Iterator.empty
          else {
            val (n0, m0) = state.getOption.getOrElse((0L, Long.MinValue))
            val n = n0 + nBatch
            val m = math.max(m0, mx)
            state.update((n, m))
            Iterator((uid, nBatch, n, m))
          }
      }
      .toDF("user_id", "n_batch", "n_total", "max_ts_us")
    val q = cursed.writeStream
      .queryName("event-cursor")
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty)
          batch.write.mode(org.apache.spark.sql.SaveMode.Append)
            .parquet(sink)
        ()
      }
      .start()
    q.awaitTermination(300000)
    ()
  }

  /** Session-window variant (w10): lines `event_id TAB epoch_us TAB
    * user_id TAB value`, per-user event-time sessions with `gap`,
    * append-mode emission once the watermark passes a session's end.
    * Same sequential-delivery contract as [[deliver]]. */
  def deliverSessions(spark: SparkSession, dropDir: String,
      checkpointDir: String, sink: String, delay: String,
      gap: String, statePartitions: Int = 0,
      maxFilesPerTrigger: Int = 0): Unit =
      StreamConf.withStatePartitions(spark, statePartitions) {
    val raw = source(spark, dropDir, maxFilesPerTrigger)
      .select(
        timestamp_micros(split(col("value"), "\t").getItem(1).cast("long"))
          .as("ts"),
        split(col("value"), "\t").getItem(2).cast("long").as("user_id"),
        split(col("value"), "\t").getItem(3).cast("double").as("value"))
    val q = raw.withWatermark("ts", delay)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("total_value"))
      .select(col("user_id"),
        unix_millis(col("session_window.start")).as("sess_start"),
        unix_millis(col("session_window.end")).as("sess_end"),
        col("n_events"), col("total_value"))
      .writeStream
      .queryName("event-sessions")
      .outputMode("append")
      .format("parquet")
      .option("path", sink)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(300000)
    ()
  }
}
