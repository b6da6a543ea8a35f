package graft.queries

import graft.SparkSpec
import QuerySpec.PackCtx

/** pipe15 epoch-spine structural invariants at sf0.001 (the DuckDB twin
  * checks exact values at sf0.01; this pins the funnel algebra the twin
  * can't express as a property: monotonicity, packing arithmetic, and the
  * funnel↔manifest reconciliation). */
class Pipe15Spec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = Queries
    .pipe15EpochSpine(spark, "/root/testdata/sf0.001")
    .select($"section", $"k", $"cnt", $"toks", $"aux")
    .as[(String, String, Long, Long, Long)].collect().toList

  private def funnel(stage: String): Map[String, (Long, Long)] =
    rows.collect { case ("funnel", k, c, t, _) if k.endsWith("|" + stage) =>
      k.split('|')(0) -> (c, t)
    }.toMap

  test("funnel stages shrink monotonically per lang (docs AND tokens)") {
    val stages = Seq("0_raw", "1_clean", "2_url", "3_uniq", "4_decon",
      "5_mix").map(funnel)
    for (Seq(prev, next) <- stages.sliding(2);
         (lang, (c, t)) <- next) {
      val (pc, pt) = prev.getOrElse(lang, (0L, 0L))
      assert(c <= pc && t <= pt,
        s"$lang grew between stages: ($pc,$pt) -> ($c,$t)")
    }
    assert(funnel("0_raw").nonEmpty)
  }

  test("mix honors the per-lang token target (aux on the 5_mix rows), " +
      "overshooting only by the crossing doc") {
    // the selection keeps the doc whose EXCLUSIVE running total is under
    // target (the crossing doc), so kept tokens may exceed target by less
    // than one document; bound that document by the corpus's largest raw
    // token count (clean text is extracted from the doc's own tokens,
    // +32 covers retained boilerplate block words)
    import org.apache.spark.sql.functions._
    val maxDoc = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .agg(max(size(graft.operators.TextAnalysis.tokens(col("text")))))
      .head.getInt(0) + 32
    rows.collect { case ("funnel", k, _, t, target)
        if k.endsWith("|5_mix") =>
      assert(t - target < maxDoc,
        s"$k kept $t tokens, over target $target by more than one doc")
    }
  }

  test("pack rows carry ceil-window arithmetic over the mix tokens") {
    val mixToks = funnel("5_mix").map { case (l, (_, t)) => l -> t }
    val pack = rows.collect { case ("pack", k, w, pad, _) => k -> (w, pad) }
      .toMap
    assert(pack.keySet == mixToks.keySet)
    for ((lang, (w, pad)) <- pack) {
      val t = mixToks(lang)
      assert(w == (t + PackCtx - 1) / PackCtx, s"$lang windows")
      assert(pad == w * PackCtx - t, s"$lang padding")
    }
  }

  test("shard manifest reconciles with the final mix (docs and tokens)") {
    val shards = rows.collect { case ("shard", _, c, t, _) => (c, t) }
    val mix = funnel("5_mix").values
    assert(shards.map(_._1).sum == mix.map(_._1).sum)
    assert(shards.map(_._2).sum == mix.map(_._2).sum)
  }
}
