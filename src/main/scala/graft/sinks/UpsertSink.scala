package graft.sinks

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Idempotent keyed sinks emulating the reference's two stores on plain
  * partitioned parquet (no external table format available in this
  * environment; the merge semantics are what Delta `MERGE INTO` would give):
  *
  *  - [[upsert]] — Doris UNIQUE-key table semantics
  *    (`databases/doris/__init__.py:164-239` + table keying): re-loading a
  *    key replaces the whole row, newest batch wins.
  *  - [[updateFields]] — MySQL `ON DUPLICATE KEY UPDATE` semantics
  *    (`databases/mysql/__init__.py:64-82`): only the listed columns update
  *    in place; unlisted columns keep their stored values; new keys insert.
  *  - [[append]] — plain Stream-Load append with the reference's
  *    empty-batch skip (K3, `doris/__init__.py:170-171`).
  *
  * Scale notes: the merge unions touched-partition rows + updates and dedupes
  * by key — one shuffle sized by the TOUCHED partitions, not the table. With
  * a `partitionCol`, only partitions present in the update batch are read,
  * merged, written (to a temp dir) and swapped in dir-by-dir; untouched
  * partition directories are never read or rewritten, so a 100 TB table with
  * daily partitions pays for the touched days, not the table. Writes always
  * land in a temp dir first and move in by rename, so readers never see a
  * half-written partition.
  *
  * Crash safety: every rename-based swap first moves the displaced data
  * ASIDE (`<path>.old-<id>`), then renames the new data in, then drops the
  * aside copy. A crash anywhere in that window leaves either the aside copy
  * or the finished swap on disk; [[recoverCrash]] runs at the start of every
  * sink call and restores/cleans leftovers, so a crashed swap can never be
  * mistaken for an empty sink (which would silently rebuild the table from
  * one batch). True atomic swap needs a transactional table format /
  * metastore pointer — out of scope; this is the strongest guarantee plain
  * directories give.
  */
object UpsertSink {

  private def fsFor(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    val fs = fsFor(spark, path)
    fs.exists(p) && fs.listStatus(p).nonEmpty
  }

  /** Detect and resolve leftovers of a crashed swap before any read of the
    * sink. Leftover kinds, by sibling-name suffix:
    *
    *  - `<path>.tmp-*` — an unfinished temp write: never swapped in, safe to
    *    discard (the producing upsert failed; re-running it re-creates it).
    *  - `<path>.old-*` — displaced pre-swap data. If the table (or the
    *    matching partition dir) is MISSING, the crash hit between the two
    *    renames: restore the aside copy — otherwise the next call would take
    *    the cold-start branch and rebuild the sink from a single batch,
    *    orphaning all prior data. If the destination exists, the swap
    *    completed and only the cleanup was lost: drop the aside copy.
    *
    * Partitioned asides hold `col=value` child dirs and are reconciled
    * per-partition; whole-table asides are restored/dropped wholesale.
    */
  private[sinks] def recoverCrash(spark: SparkSession, path: String): Unit = {
    val fs = fsFor(spark, path)
    val dst = new Path(path)
    val parent = dst.getParent
    if (parent == null || !fs.exists(parent)) return
    val name = dst.getName
    fs.listStatus(parent).map(_.getPath)
      .filter(p => p.getName.startsWith(name + ".tmp-") ||
        p.getName.startsWith(name + ".old-"))
      .sortBy(_.getName)
      .foreach { p =>
        if (p.getName.startsWith(name + ".tmp-")) {
          fs.delete(p, true)
        } else if (!fs.exists(dst)) {
          // whole table gone mid-swap: the aside copy IS the table
          fs.rename(p, dst)
        } else {
          val partChildren = fs.listStatus(p)
            .filter(st => st.isDirectory && st.getPath.getName.contains("="))
          if (partChildren.isEmpty) {
            // whole-table aside and the table exists: swap completed
            fs.delete(p, true)
          } else {
            partChildren.foreach { st =>
              val partDst = new Path(dst, st.getPath.getName)
              if (!fs.exists(partDst)) fs.rename(st.getPath, partDst)
              else fs.delete(st.getPath, true)
            }
            fs.delete(p, true)
          }
        }
      }
  }

  /** Write to a temp dir, move the old table ASIDE (rename, not delete),
    * move the new one in, then drop the old copy. See [[recoverCrash]] for
    * what happens if we die in between. */
  private def swapWrite(spark: SparkSession, df: DataFrame, path: String,
      partitionCol: Option[String]): Unit = {
    val suffix = java.util.UUID.randomUUID().toString.take(8)
    val tmp = path + ".tmp-" + suffix
    val w = df.write.mode(SaveMode.Overwrite)
    partitionCol.fold(w)(c => w.partitionBy(c)).parquet(tmp)
    val fs = fsFor(spark, path)
    val dst = new Path(path)
    val aside = new Path(path + ".old-" + suffix)
    val hadOld = fs.exists(dst)
    if (hadOld) fs.rename(dst, aside)
    fs.rename(new Path(tmp), dst)
    if (hadOld) fs.delete(aside, true)
  }

  /** Swap ONLY the partition dirs present under `tmp` into `path`, leaving
    * every other partition dir untouched (same files, same bytes). Displaced
    * partition dirs go aside first so [[recoverCrash]] can reconcile a crash
    * mid-loop. */
  private def swapPartitions(spark: SparkSession, tmp: String, path: String,
      suffix: String): Unit = {
    val fs = fsFor(spark, path)
    val dstRoot = new Path(path)
    val aside = new Path(path + ".old-" + suffix)
    val parts = fs.listStatus(new Path(tmp))
      .filter(st => st.isDirectory && st.getPath.getName.contains("="))
    if (parts.nonEmpty) fs.mkdirs(aside)
    parts.foreach { st =>
      val dst = new Path(dstRoot, st.getPath.getName)
      if (fs.exists(dst)) fs.rename(dst, new Path(aside, st.getPath.getName))
      fs.rename(st.getPath, dst)
    }
    if (parts.nonEmpty) fs.delete(aside, true)
    fs.delete(new Path(tmp), true) // leftovers: _SUCCESS marker
  }

  /** K3: append, skipping empty batches. Recovery runs first: appending
    * into the no-table window of a crashed swap would re-create the dir and
    * make the NEXT sink call mistake the displaced table for a completed
    * swap and drop it. */
  def append(spark: SparkSession, path: String, batch: DataFrame): Unit =
    if (!batch.isEmpty) {
      recoverCrash(spark, path)
      batch.write.mode(SaveMode.Append).parquet(path)
    }

  /** Full-row upsert keyed on `keys`: rows in `updates` replace stored rows
    * with the same key (within a batch, the highest `versionCol` wins;
    * stored rows lose to any update). */
  def upsert(spark: SparkSession, path: String, updates: DataFrame,
      keys: Seq[String], versionCol: String,
      partitionCol: Option[String] = None): Unit = {
    if (updates.isEmpty) return
    recoverCrash(spark, path)
    if (!exists(spark, path)) {
      val w = updates.write.mode(SaveMode.Overwrite)
      partitionCol.fold(w)(c => w.partitionBy(c)).parquet(path)
      return
    }
    val stored = spark.read.parquet(path)
    val cols = updates.columns
    def merge(oldPart: DataFrame): DataFrame = {
      val merged = oldPart.select(cols.map(col): _*)
        .withColumn("_pri", lit(0))
        .unionByName(updates.withColumn("_pri", lit(1)))
      val w = Window.partitionBy(keys.map(col): _*)
        .orderBy(col("_pri").desc, col(versionCol).desc)
      merged
        .withColumn("_rn", row_number().over(w))
        .where(col("_rn") === 1)
        .drop("_pri", "_rn")
    }
    partitionCol match {
      case Some(c) =>
        // read + merge + rewrite ONLY the touched partitions; everything
        // else stays on disk untouched (no read, no shuffle, no rewrite).
        // Null-safe equality: a NULL partition value lands in the Hive
        // default-partition dir, whose swap would otherwise drop the stored
        // rows a plain-equality semi join fails to pull into the merge.
        val touched = broadcast(
          updates.select(col(c).as("_touched_p")).distinct())
        val merged = merge(
          stored.join(touched, col(c) <=> col("_touched_p"), "left_semi"))
        val suffix = java.util.UUID.randomUUID().toString.take(8)
        val tmp = path + ".tmp-" + suffix
        // cluster rows by key within each written file: parquet row-group
        // min/max stats stay tight, so key/time-filtered reads of a day
        // partition skip most row groups
        val clustered = merged.sortWithinPartitions((col(c) +: keys.map(col)): _*)
        // the tmp write is the action that reads `path`; renames happen after
        clustered.write.mode(SaveMode.Overwrite).partitionBy(c).parquet(tmp)
        swapPartitions(spark, tmp, path, suffix)
      case None =>
        swapWrite(spark, merge(stored), path, None)
    }
  }

  /** Field-subset update (MySQL `ON DUPLICATE KEY UPDATE`): for existing
    * keys, only `updateCols` take the update's values — all other columns
    * keep their stored values; unseen keys insert whole rows.
    *
    * Within a batch, duplicate keys collapse to ONE row before the join
    * (two same-key matches against a full_outer join would otherwise insert
    * duplicate key rows, breaking the unique-key contract). The reference's
    * `executemany` applies rows in batch order, last-wins; row order is not
    * a DataFrame concept, so the winner is deterministic instead: greatest
    * `updateCols` tuple (descending, nulls last). */
  def updateFields(spark: SparkSession, path: String, updates: DataFrame,
      keys: Seq[String], updateCols: Seq[String]): Unit = {
    if (updates.isEmpty) return
    recoverCrash(spark, path)
    val ww = Window.partitionBy(keys.map(col): _*)
      .orderBy(updateCols.map(c => col(c).desc_nulls_last): _*)
    val batch = updates
      .withColumn("_urn", row_number().over(ww))
      .where(col("_urn") === 1)
      .drop("_urn")
    if (!exists(spark, path)) {
      batch.write.mode(SaveMode.Overwrite).parquet(path)
      return
    }
    val stored = spark.read.parquet(path).withColumn("_s", lit(true))
    val cols = stored.columns.filterNot(_ == "_s")
    val u = batch.select(cols.map(c => col(c).as(s"_u_$c")): _*)
      .withColumn("_u", lit(true))
    val joined = stored.join(u,
      keys.map(k => col(k) === col(s"_u_$k")).reduce(_ && _), "full_outer")
    val fromUpdate = col("_u").isNotNull
    val fromStored = col("_s").isNotNull
    val out = joined.select(cols.map { c =>
      if (keys.contains(c))
        coalesce(col(c), col(s"_u_$c")).as(c)
      else if (updateCols.contains(c))
        // update's value (even NULL) whenever an update row exists
        when(fromUpdate, col(s"_u_$c")).otherwise(col(c)).as(c)
      else
        // stored value (even NULL) whenever a stored row exists
        when(fromStored, col(c)).otherwise(col(s"_u_$c")).as(c)
    }: _*)
    swapWrite(spark, out, path, None)
  }
}
