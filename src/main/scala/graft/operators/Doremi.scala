package graft.operators

/** DoReMi-style domain-mixture reweighting (Xie et al. 2023, "DoReMi:
  * Optimizing Data Mixtures Speeds Up Language Model Pretraining"):
  * multiplicative-weights (Hedge) updates that tilt the training mixture
  * toward domains with EXCESS loss over the current mixture's average —
  * the worst-case-domain emphasis that makes DoReMi's reweighting work.
  *
  * Adaptation for a deterministic engine: the published algorithm scores
  * domains by a proxy model's excess loss against a reference model; here
  * the proxy loss is the per-domain mean token NLL under the corpus
  * unigram LM (t17's LM, t30's integer micro-nat discipline) and the
  * reference is the CURRENT mixture's weighted average loss — a moving
  * baseline, so the trajectory genuinely evolves per step (domains above
  * the average gain weight, which raises the average, which shrinks the
  * excess: the fixpoint is the min-max mixture over this loss vector).
  *
  * All arithmetic is integer ppm/micro-nats with floor division on
  * non-negative values, so the Spark side and the DuckDB oracle's
  * unrolled-CTE replay are bit-identical (the t14/t18/a18 generated-
  * oracle pattern). This is the model-vs-data split (s11/a18): the ONLY
  * corpus-grain work is the per-domain loss aggregation; the recurrence
  * below runs on a domain-count-sized vector.
  */
object Doremi {

  /** The MW trajectory. `losses` = (domain, loss_micro) — non-negative
    * integer micro-nats. Returns (iter, domain, loss_micro, alpha_ppm,
    * excess_micro, w_ppm): alpha is the normalized mixture weight at the
    * START of the iteration, excess the clipped loss over the mixture
    * average, w the unnormalized weight AFTER the update. */
  def mwTrajectory(losses: Seq[(String, Long)], iters: Int, etaPpm: Long)
      : Seq[(Int, String, Long, Long, Long, Long)] = {
    val M = 1000000L
    val ls = losses.sortBy(_._1)
    require(ls.forall(_._2 >= 0), "losses must be non-negative micro-nats")
    var w: Seq[Long] = ls.map(_ => M)
    (1 to iters).flatMap { t =>
      val sw = w.sum
      val alpha = w.map(_ * M / sw)
      val mixLoss = alpha.zip(ls).map { case (a, (_, l)) => a * l }.sum / M
      val excess = ls.map { case (_, l) => math.max(0L, l - mixLoss) }
      val w2 = w.zip(excess).map { case (x, e) =>
        // weights grow multiplicatively; Scala Long wraps silently where
        // the DuckDB oracle's BIGINT raises — fail loudly on this side too
        require(e <= Long.MaxValue / math.max(etaPpm, 1L),
          s"mwTrajectory: etaPpm*excess overflows (eta=$etaPpm, excess=$e)")
        val f = M + etaPpm * e / M
        require(x <= Long.MaxValue / math.max(f, M),
          s"mwTrajectory: weight overflow (w=$x, factor=$f)")
        x * f / M
      }
      val rows = ls.indices.map { i =>
        (t, ls(i)._1, ls(i)._2, alpha(i), excess(i), w2(i))
      }
      w = w2
      rows
    }
  }
}
