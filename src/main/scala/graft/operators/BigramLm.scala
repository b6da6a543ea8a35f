package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interpolated bigram LM with absolute discounting — the Kneser-Ney
  * construction (Kneser & Ney 1995; Chen & Goodman 1999) — trained on the
  * corpus and scoring each document's bigrams under it: t17's unigram
  * perplexity upgraded to a real smoothed bigram model.
  *
  *   P(w2|w1) = max(c−D, 0)/c1 + D·N1+(w1·)/c1 · N1+(·w2)/B,  D = num/4
  *
  * where c = corpus count of (w1,w2), c1 = Σ_w2 c, N1+(w1·)/N1+(·w2) the
  * continuation type counts and B the number of distinct bigram types.
  *
  * Cross-engine exactness: with D rational the probability is the integer
  * ratio [(4c−num)·B + num·N1a·N1b] / (4·c1·B), so the ONLY float work is
  * two ln's of exact integers per DISTINCT corpus bigram, floored to
  * micro-nats at the bigram-type level (t30's discipline); per-doc rollups
  * are integer sums and floor divisions. P ≤ 1 (hence nll ≥ 0, so `div`
  * ≡ floor) because w1's other continuations contribute at least N1a−1
  * to c1: c + D·(N1a−1) ≤ c1.
  *
  * Scale shape: (doc, bigram) and (bigram) aggregates, two type-grain
  * context/continuation rollups, and type-grain scoring joins — every
  * shuffle keys on uniform token hashes; nothing is ever vocab² (the model
  * lives at OBSERVED-bigram grain, Heaps-bounded, like t30's LMs).
  */
object BigramLm {

  /** Per-doc scores: (id, n_bigrams, score_micro, avg_micro). Docs with
    * fewer than 2 tokens have no bigrams and are excluded. */
  def docScores(df: DataFrame, idCol: String, textCol: String,
      discountNum: Long,
      cache: DataFrame => DataFrame = _.persist()): DataFrame = {
    // the P <= 1 / nll >= 0 proof in the scaladoc (and hence `div` == floor
    // on both engines) only covers 0 < D <= 1, i.e. discountNum in (0, 4]
    require(discountNum > 0 && discountNum <= 4,
      s"docScores needs discountNum in (0, 4], got $discountNum")
    val n: Column = size(col("toks"))
    val dt = cache(Spread(df)
      .select(col(idCol).as("doc_id"),
        transform(TextAnalysis.tokens(col(textCol)), t => lower(t))
          .as("toks"))
      .where(size(col("toks")) >= 2)
      // toks is a STAGED column (the cdcEnds lesson): the two slices and
      // the zip_with below read it repeatedly
      .select(col("doc_id"), explode(zip_with(
        slice(col("toks"), lit(1), n - 1), slice(col("toks"), lit(2), n - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy(col("doc_id"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("occ"))) // feeds corpus counts + scoring join
    val bg = cache(dt.groupBy(col("w1"), col("w2"))
      .agg(sum(col("occ")).as("c"))) // feeds ctx, cont, B, score build
    val ctx = bg.groupBy(col("w1"))
      .agg(sum(col("c")).as("c1"), count(lit(1)).as("n1a"))
    val cont = bg.groupBy(col("w2")).agg(count(lit(1)).as("n1b"))
    val bt = bg.agg(count(lit(1)).as("b"))
    val sc = bg.join(ctx, Seq("w1")).join(cont, Seq("w2"))
      .crossJoin(broadcast(bt))
      .select(col("w1"), col("w2"),
        floor((log((lit(4L) * col("c1") * col("b")).cast("double")) -
          log(((lit(4L) * col("c") - lit(discountNum)) * col("b") +
            lit(discountNum) * col("n1a") * col("n1b")).cast("double")))
          * 1e6).cast("long").as("nll_micro"))
    dt.join(sc, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(sum(col("occ")).as("n_bigrams"),
        sum(col("occ") * col("nll_micro")).as("score_micro"))
      .select(col("doc_id"), col("n_bigrams"), col("score_micro"),
        expr("score_micro div n_bigrams").as("avg_micro"))
  }
}
