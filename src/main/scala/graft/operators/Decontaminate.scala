package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share word-level
  * `k`-gram shingles with an evaluation/benchmark set — the n-gram overlap
  * check a training-data pipeline runs before any corpus ships.
  *
  * Scale shape: both sides reduce to DISTINCT md5 shingle hashes and meet in
  * one equi-join on the hash — a uniform shuffle key regardless of text
  * skew. The benchmark side is typically tiny next to the corpus (eval sets
  * are thousands of docs, the corpus is billions), so AQE turns the join
  * into a broadcast at runtime; the corpus never shuffles more than its
  * exploded shingle hashes, and nothing is ever pairwise per document.
  */
object Decontaminate {

  /** Corpus docs sharing ≥1 `k`-shingle with `benchmark`: (doc_id,
    * n_shared) where n_shared counts the doc's DISTINCT shingles that occur
    * anywhere in the benchmark set. Clean docs don't appear. */
  def contaminatedDocs(corpus: DataFrame, benchmark: DataFrame, idCol: String,
      textCol: String, k: Int): DataFrame = {
    val c = Spread(corpus).select(col(idCol).as("doc_id"),
      explode(TextAnalysis.shingleHashes(col(textCol), k)).as("sh"))
    val b = benchmark
      .select(explode(TextAnalysis.shingleHashes(col(textCol), k)).as("sh"))
      .distinct()
    // per-doc shingles and the benchmark set are both distinct, so the join
    // emits each (doc, shared-shingle) once and count(*) = distinct overlap
    c.join(b, Seq("sh"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Bloom-gated decontamination — identical output to
    * [[contaminatedDocs]], different shuffle economics (the Dolma-scale
    * variant: gate against a seen-set sketch, verify exactly).
    *
    * The benchmark's distinct shingle hashes fold into a Bloom filter via
    * Spark's distributed `stat.bloomFilter` (a treeAggregate — the driver
    * holds only the sketch, ~1.2 bytes/item at 1% fpp, never rows), the
    * sketch ships to every task as a plan literal, and the corpus's
    * exploded shingles pass Spark's native codegen'd
    * `bloom_might_contain` gate BEFORE the equi-join: at 1% fpp, ~99% of
    * clean-corpus shingles are dropped map-side and never shuffle. The
    * exact join then runs only on probable hits, killing Bloom false
    * positives — the result is byte-identical to the plain equi-join.
    *
    * When to prefer it: the plain join is optimal while the benchmark side
    * broadcasts; once the contamination reference is a SEEN-SET too big to
    * broadcast (cross-epoch dedup, multi-benchmark unions — 10⁸-10⁹
    * entries), the plain join must shuffle the corpus's full shingle
    * explosion, while the gated join shuffles ~(true hits + fpp·clean) —
    * the sketch stays broadcastable (120 MB at 10⁸ items) long after the
    * exact set stopped being. `expectedShingles` sizes the sketch;
    * overshooting wastes sketch bytes, undershooting degrades fpp toward
    * the plain join's shuffle (still exact — the verify join holds). */
  /** [[contaminatedDocs]] against a PRE-STAGED benchmark shingle-hash set
    * (one `sh` string column, DISTINCT — the staging step writes the set
    * deduped, which is what makes it a set; that contract is load-bearing
    * for the count semantics AND for cost: re-distincting here would
    * shuffle the benchmark-sized set on EVERY micro-batch for rows that
    * were already unique, a pure fixed tax on the streaming plane) — the
    * streaming serving form: the eval set is shingled once offline (it
    * changes on benchmark-release cadence, not per batch) and every
    * micro-batch meets it in one equi-join; the set side broadcasts
    * under AQE at eval-set scale. Same output contract as
    * [[contaminatedDocs]]: (doc_id, n_shared), clean docs absent. */
  def contaminatedAgainstSet(corpus: DataFrame, benchShingles: DataFrame,
      idCol: String, textCol: String, k: Int): DataFrame =
    corpus.select(col(idCol).as("doc_id"),
        explode(TextAnalysis.shingleHashes(col(textCol), k)).as("sh"))
      .join(benchShingles.select(col("sh")), Seq("sh"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))

  def contaminatedDocsBloom(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, k: Int,
      expectedShingles: Long = 1L << 22, fpp: Double = 0.01): DataFrame = {
    val b = benchmark
      .select(explode(TextAnalysis.shingleHashes(col(textCol), k)).as("sh"))
      .distinct()
    val bloom = b.select(xxhash64(col("sh")).as("shl"))
      .stat.bloomFilter("shl", expectedShingles, fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    val c = Spread(corpus).select(col(idCol).as("doc_id"),
        explode(TextAnalysis.shingleHashes(col(textCol), k)).as("sh"))
      .where(call_function("bloom_might_contain",
        lit(bytes), xxhash64(col("sh"))))
    c.join(b, Seq("sh"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
  }
}
