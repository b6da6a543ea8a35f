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
    val c = corpus.select(col(idCol).as("doc_id"),
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
}
