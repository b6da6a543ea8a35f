package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge TRAINING in the engine — the tokenizer-building
  * step of a training-data pipeline (Sennrich 2016 word-internal BPE over a
  * whitespace-tokenized corpus). Each round counts adjacent symbol pairs
  * over the weighted vocabulary, elects the most frequent pair (ties to the
  * lexicographically smallest), and applies the merge greedily
  * left-to-right inside every word.
  *
  * Scale shape, like the Lloyd loop (Similarity.kmeans): the per-round data
  * work is a vocab-grain aggregate (Heaps'-law bounded, NOT corpus-grain —
  * the corpus is scanned once to build word frequencies) and the only
  * driver-side collect is the 1-row argmax; the merge apply is a pure
  * map-side fold over the persisted vocabulary. N rounds = N model-sized
  * round trips, the irreducible sequential structure of BPE.
  */
object Bpe {

  /** One canonical greedy left-to-right non-overlapping merge of (a, b):
    * fold the symbol list, merging when the accumulator's last element is
    * an unconsumed `a` and the incoming symbol is `b` (a just-merged "ab"
    * tail can never re-match as `a`). Interpreted HOF — fine at vocab
    * grain, where rows are distinct words, not corpus tokens. */
  private def mergeFold(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1),
            array(concat(element_at(acc, -1), x))))
          .otherwise(concat(acc, array(x))))

  /** Process-wide training memo, keyed by (analyzed-plan semantic hash of
    * the corpus, text column, merge count): a trained tokenizer is a MODEL,
    * and t18 (ship the merge table) and t19 (apply the encoder) are two
    * reads of the same model — without the memo t19 re-paid t18's full
    * 8-round training (~3.1 s of its 3.6 s at sf0.1). The semantic hash
    * covers the source relation (file paths included), so different SF dirs
    * or corpora can never collide. The cached vocab's lineage bakes the
    * elected merges in as literals, so even if an external
    * `clearCache()` drops its persistence, re-evaluation is one chained
    * map-side pass — never the sequential argmax round trips. */
  private val trained = new java.util.concurrent.ConcurrentHashMap[
    (Int, String, Int), (Seq[(Long, String, String, Long)], DataFrame)]()

  private def trainCached(docs: DataFrame, textCol: String,
      n: Int): (Seq[(Long, String, String, Long)], DataFrame) =
    trained.computeIfAbsent(
      (docs.queryExecution.analyzed.semanticHash(), textCol, n),
      _ => train(docs, textCol, n))

  /** The training loop: returns the merge table and the final vocabulary
    * state (word, freq, syms) — which IS the encoder: applying the merge
    * list in rank order to a word reproduces exactly its final syms. The
    * returned vocab DataFrame is left persisted for the caller. */
  private def train(docs: DataFrame, textCol: String,
      n: Int): (Seq[(Long, String, String, Long)], DataFrame) = {
    val words = docs
      .select(explode(TextAnalysis.tokens(lower(col(textCol)))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    var v = words.select(col("word"), col("freq"),
      transform(sequence(lit(1), length(col("word"))),
        i => col("word").substr(i, lit(1))).as("syms"))
      .persist()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    for (step <- 1 to n) {
      // guard size >= 2: sequence(1, 0) would generate DESCENDING [1, 0]
      val top = v.where(size(col("syms")) >= 2)
        .select(col("freq"), col("syms"),
          explode(sequence(lit(1), size(col("syms")) - 1)).as("i"))
        .select(col("freq"), element_at(col("syms"), col("i")).as("lft"),
          element_at(col("syms"), col("i") + 1).as("rgt"))
        .groupBy(col("lft"), col("rgt")).agg(sum(col("freq")).as("c"))
        .orderBy(col("c").desc, col("lft"), col("rgt"))
        .limit(1).collect()
      val row = top.head // corpora with >= n learnable pairs by contract
      val (a, b, c) = (row.getString(0), row.getString(1), row.getLong(2))
      merges += ((step.toLong, a, b, c))
      val nv = v.select(col("word"), col("freq"),
        mergeFold(col("syms"), a, b).as("syms")).persist()
      v.unpersist(false)
      v = nv
    }
    (merges.toSeq, v)
  }

  /** Learn `n` merges over `textCol`; returns (step, lft, rgt, pair_count)
    * — the merge table a tokenizer ships. */
  def learnMerges(docs: DataFrame, textCol: String, n: Int): DataFrame = {
    val spark = docs.sparkSession
    val (merges, _) = trainCached(docs, textCol, n)
    import spark.implicits._
    merges.toDF("step", "lft", "rgt", "pair_count")
  }

  /** The encoder after `n` learned merges: (word, n_sub) — subword count
    * per distinct word. Vocab-grain (Heaps'-law bounded), so downstream
    * corpus joins can broadcast it. Stays persisted across calls (the
    * memoized model — see [[trained]]). */
  def encodedVocab(docs: DataFrame, textCol: String, n: Int): DataFrame =
    trainCached(docs, textCol, n)._2
      .select(col("word"), size(col("syms")).cast("long").as("n_sub"))
}
