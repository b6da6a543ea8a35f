package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The STREAMING-PLANE pretraining-epoch spine — pipe15's batch
  * composition run incrementally, one micro-batch of freshly-crawled
  * (already-curated) docs at a time. Per batch:
  *
  *   1. DECONTAMINATION (stateless): clean_ok docs sharing an 8-gram
  *      shingle with the STAGED benchmark set are dropped
  *      ([[Decontaminate.contaminatedAgainstSet]] — the eval set is hashed
  *      once offline; serving is one equi-join per batch).
  *   2. ADMISSION-GATED DEDUP (stateful — w16's discipline verbatim):
  *      survivors run [[Dedup.admitBatch]] against the batch-tagged
  *      MinHash index (yesterday's curated corpus + everything admitted
  *      before — APPEND-BACK), smaller-id batch-mates reject.
  *   3. INCREMENTAL MIX LEDGER (stateful): admitted docs are taken in
  *      doc_id order per lang while the lang's RUNNING token total (prior
  *      batches' ledger deltas + smaller-id admitted batch-mates) sits
  *      under its target — pipe10's crossing rule, incrementalized: the
  *      crossing doc is included, then the lang is closed for good.
  *   4. MANIFEST + FUNNEL DELTAS (append-only): mixed docs append m6-style
  *      per-shard manifest deltas (portable-hash shard, order-independent
  *      digest term); every stage appends its per-(batch, lang) funnel
  *      census row. Both stores are mergeable rollups at read time.
  *
  * Determinism & crash replay (the admitBatch contract extended to the
  * census store): every persistent write is append-only and TAGGED with the
  * batch's namespaced id; every read of own state excludes rows carrying
  * the CURRENT tag, so a replay after a crash between any two appends
  * recomputes from the state of its first attempt and appends byte-equal
  * rows, which the read-side `distinct()` collapses. The batch outcome is
  * a pure function of (batch, state-before-batch) — the in-batch rules
  * never recurse through a batch-mate's own fate — so a DuckDB oracle can
  * unroll the rounds from scratch (the w16/w20 proof shape).
  *
  * Scale shape: decon and admission shuffle only batch-sized frames
  * against partition-pruned index scans (see [[Dedup.admitBatch]]); the
  * ledger read is a census-grain rollup of (batches × langs) delta rows;
  * the mix window partitions by lang WITHIN the batch (reducer state
  * bounded by batch size, never corpus); manifest/funnel appends are
  * census-grain coalesce(1) files. At 100 TB each micro-batch touches
  * O(batch) data plus the probed index partitions — the corpus is never
  * re-read. */
object EpochSpine {

  private def exists(df: DataFrame, path: String): Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).nonEmpty
  }

  /** One micro-batch. `curated` = (doc_id, lang, clean, clean_ok, words)
    * — the caller curates with the SAME chain as the batch plan
    * (Queries.curationCleaned), keeping one curation implementation
    * across planes. `targets` = per-lang token budgets (model-sized,
    * computed once from yesterday's corpus — causally sound: today's
    * epoch is budgeted from yesterday's supply). All census output
    * (funnel + ledger + manifest deltas) lands in ONE long-format store
    * at `censusPath` — rows (batch_tag, batch, section, lang, stage,
    * shard, cnt, toks, aux) — written by ONE job per batch: per-batch job
    * count is the streaming tier's real cost at fixture scale, so the
    * three census grains ride one union plan over the two persisted
    * batch frames. */
  def ingestBatch(curated: DataFrame, batchId: Long,
      benchShinglesPath: String, indexPath: String, sinkPath: String,
      censusPath: String, targets: Seq[(String, Long)], k: Int,
      bands: Int, shingleK: Int, threshold: Double, deconK: Int,
      shards: Long, epoch: Long = 0L): Unit = {
    require(epoch >= 0 && batchId >= 0 && batchId < 1000000L,
      s"epoch-spine tag namespacing requires 0 <= batchId < 1e6 and " +
        s"epoch >= 0 (got epoch=$epoch, batchId=$batchId)")
    val debug = sys.env.contains("SPARK_GRAFT_P16_DEBUG")
    val t00 = System.nanoTime()
    var tPrev = t00
    def mark(what: String): Unit = if (debug) {
      val now = System.nanoTime()
      println(f"P16DEBUG batch=$batchId $what%-12s ${(now - tPrev) / 1e9}%6.2f s")
      tPrev = now
    }
    val tag = epoch * 1000000L + batchId
    val s = curated.sparkSession
    import s.implicits._
    // localCheckpoint, not persist: every downstream action re-ANALYZES a
    // frame's full logical plan (caching only short-circuits execution),
    // and this frame's lineage is the whole curation chain — measured
    // ~2 s/batch of pure driver-side analysis across the spine's ~10
    // actions until the lineage was truncated (the mixSelectOn/s18
    // plan-duplication lesson applied to the streaming plane)
    val batch = curated
      .select(col("doc_id"), col("lang"), col("clean"), col("clean_ok"),
        col("words"))
      .localCheckpoint()

    // 1. decontamination vs the staged benchmark shingle set (stateless)
    val contaminated = Decontaminate.contaminatedAgainstSet(
      batch.where(col("clean_ok")), s.read.parquet(benchShinglesPath),
      "doc_id", "clean", deconK).select(col("doc_id"))
    // truncates the 8-gram shingle tree out of every admission/census plan
    val deconOk = batch.where(col("clean_ok"))
      .join(contaminated, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("lang"), col("clean"), col("words"))
      .localCheckpoint()
    mark("decon_plan")

    // 3a. mix-ledger READ, fired BEFORE the admission phase as a
    // concurrent driver job (r14 verdict item 3 — per-batch job walls
    // overlap instead of adding): it touches only the census store's
    // PRE-BATCH state (own tag excluded — crash replay), which nothing in
    // the admission phase writes, so the collect races nothing. The
    // ledger state is (langs) rows, i.e. model-sized by construction, and
    // folding it into the targets literal (a) removes a join and (b)
    // removes the census store from the census-WRITE plan's inputs, so no
    // pre-write materialization barrier is needed (appending into one's
    // own scan's source is a listing race).
    val usedMapF = scala.concurrent.Future {
      if (exists(batch, censusPath))
        s.read.parquet(censusPath)
          .where(col("section") === "ledger" && col("batch_tag") =!= tag)
          .distinct()
          .groupBy(col("lang")).agg(sum(col("toks")).as("used"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      else Map.empty[String, Long]
    }(scala.concurrent.ExecutionContext.global)

    // 2. near-dup admission (w16's engine — sink + index appends and the
    // own-tag replay filter live inside admitBatch, which returns the
    // admitted-id frame as a driver-local relation: batch-id-sized,
    // nothing cached to leak across micro-batches)
    val admittedRaw = try {
      Dedup.admitBatch(
        deconOk.select(col("doc_id"), col("clean")), batchId, "doc_id",
        "clean", indexPath, sinkPath, k, bands, shingleK, threshold, epoch)
    } catch {
      case e: Throwable =>
        // settle the ledger future before surfacing the admission failure:
        // abandoning it would leave a driver job running a Spark collect
        // against the census store after the batch has failed, and its own
        // failure (if any) would vanish — attach it as suppressed instead.
        // BOUNDED await: if the failure that killed admission also wedged
        // the context, an unbounded wait here would hang the stream
        // silently instead of failing the batch
        try scala.concurrent.Await
          .ready(usedMapF, scala.concurrent.duration.Duration(60,
            java.util.concurrent.TimeUnit.SECONDS))
          .value.get.failed.foreach { le => if (le ne e) e.addSuppressed(le) }
        catch {
          case te: java.util.concurrent.TimeoutException =>
            e.addSuppressed(te)
          case _: InterruptedException =>
            Thread.currentThread().interrupt()
        }
        throw e
    }
    val admitted = admittedRaw.withColumnRenamed("id", "doc_id")
    mark("admit")

    // 3b. join the ledger read (usually already done — it ran under the
    // admission phase's wall). The in-batch exclusive running total rides
    // the ADMITTED set in doc_id order per lang (the window rides the
    // candidates, not the mixed outcome, so the rule is one window with
    // no recursion through a batch-mate's fate).
    val usedMap: Map[String, Long] = scala.concurrent.Await.result(
      usedMapF, scala.concurrent.duration.Duration.Inf)
    val targetsDf = targets
      .map { case (l, t) => (l, t, usedMap.getOrElse(l, 0L)) }
      .toDF("lang", "target", "used")
    val bw = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // the admitted set WITH lang/words — COLLECTED (admitted-batch-sized:
    // three long/string columns, bounded by the batch) so the mix
    // candidates AND the 3_admit census grain read a LocalRelation: the
    // census union below scans mixCand once and mixed three times
    // (ledger/manifest/4_mix subtrees) inside ONE job, and local rows
    // replace the persist + dedicated fill-count job those concurrent
    // subtree scans used to race for. `mixed` stays a Spark plan over the
    // local rows (the crossing rule's window/join arithmetic remains
    // engine-evaluated — recomputing it per subtree is a tiny local
    // shuffle, no corpus scans).
    val mixCandPlan = deconOk.join(broadcast(admitted), Seq("doc_id"),
        "left_semi")
      .select(col("doc_id"), col("lang"), col("words"))
    val mixCand = {
      import scala.jdk.CollectionConverters._
      s.createDataFrame(mixCandPlan.collect().toSeq.asJava,
        mixCandPlan.schema)
    }
    val mixed = mixCand
      .withColumn("cum_before", coalesce(sum(col("words")).over(bw),
        lit(0L)))
      .join(broadcast(targetsDf), Seq("lang"), "left")
      .where(coalesce(col("used"), lit(0L)) + col("cum_before") <
        coalesce(col("target"), lit(0L)))
      .select(col("doc_id"), col("lang"), col("words"))
    mark("mix")

    // 4. ONE census append: ledger + manifest + funnel deltas unioned
    def censusRow(section: String, lang: Column, stage: Column,
        shard: Column, cnt: Column, toks: Column, aux: Column) =
      Seq(lit(tag).as("batch_tag"), lit(batchId).as("batch"),
        lit(section).as("section"), lang.as("lang"), stage.as("stage"),
        shard.cast("long").as("shard"), cnt.cast("long").as("cnt"),
        toks.cast("long").as("toks"), aux.cast("long").as("aux"))
    val ledgerDelta = mixed.groupBy(col("lang"))
      .agg(count(lit(1)).as("c"), sum(col("words")).as("t"))
      .select(censusRow("ledger", col("lang"), lit(null), lit(null),
        col("c"), col("t"), lit(0L)): _*)
    // manifest: m6's portable-hash shard + order-independent digest term
    // (mergeable across batches by plain sums)
    val h = conv(substring(md5(concat(lit("p16shard:"),
      col("doc_id").cast("string"))), 1, 15), 16, 10).cast("long")
    val manifestDelta = mixed.withColumn("h", h)
      .withColumn("shard", pmod(col("h"), lit(shards)))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("c"), sum(col("words")).as("t"),
        sum(col("h") % 1000000007L).as("hs"))
      .select(censusRow("shard", lit(null), lit(null), col("shard"),
        col("c"), col("t"), col("hs")): _*)
    // funnel: each stage is a JOINLESS aggregate over a frame this batch
    // already persisted (batch, deconOk, mixCand, mixed) — the earlier
    // flag-join form paid three joins of plan/codegen per micro-batch for
    // identical counts; only populated (lang, stage) groups appear, which
    // is exactly the oracle's WHERE-gated GROUP BY semantics
    def stageAgg(df: DataFrame, stage: String): DataFrame =
      df.groupBy(col("lang"))
        .agg(count(lit(1)).as("c"), sum(col("words")).as("t"))
        .select(censusRow("funnel", col("lang"), lit(stage), lit(null),
          col("c"), col("t"), lit(0L)): _*)
    val funnelDelta = batch.groupBy(col("lang"))
      .agg(count(lit(1)).as("c0"), sum(col("words")).as("t0"),
        sum(when(col("clean_ok"), 1L).otherwise(0L)).as("c1"),
        sum(when(col("clean_ok"), col("words")).otherwise(0L)).as("t1"))
      .select(col("lang"), explode(array(
        struct(lit("0_arrived").as("stage"), col("c0").as("cnt"),
          col("t0").as("toks")),
        struct(lit("1_clean").as("stage"), col("c1").as("cnt"),
          col("t1").as("toks")))).as("e"))
      .select(censusRow("funnel", col("lang"), col("e.stage"), lit(null),
        col("e.cnt"), col("e.toks"), lit(0L)): _*)
      .unionByName(stageAgg(deconOk, "2_decon"))
      .unionByName(stageAgg(mixCand, "3_admit"))
      .unionByName(stageAgg(mixed, "4_mix"))
    funnelDelta.unionByName(ledgerDelta).unionByName(manifestDelta)
      .coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Append)
      .parquet(censusPath)
    mark("census")
    // admitted/mixCand are LocalRelations (nothing cached); batch/deconOk
    // are localCheckpoints — their blocks are released by the
    // ContextCleaner when the frames go out of scope
  }
}
