package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PIPE16's per-batch engine ([[EpochSpine.ingestBatch]]) on a
  * hand-computable fixture: every decon/admission/ledger decision is
  * verifiable on paper, and the crash-replay contract is pinned by
  * applying the same batch twice. deconK = 3 and five-word texts keep the
  * shingle sets enumerable by eye. */
class EpochSpineSpec extends SparkSpec {
  import spark.implicits._

  private val K = 16; private val B = 4; private val SK = 3
  private val THR = 0.6; private val DK = 3; private val SHARDS = 4L

  // curated rows are synthesized directly (the spec tests the spine, not
  // the curation chain — SanitySpec/Pipe15Spec cover that): every text has
  // exactly 5 words, so the ledger arithmetic below is integers on paper
  private def curated(rows: (Long, String)*) =
    rows.toDF("doc_id", "clean")
      .select(col("doc_id"), lit("en").as("lang"), col("clean"),
        lit(true).as("clean_ok"),
        size(TextAnalysis.tokens(col("clean"))).cast("long").as("words"))

  test("decon, admission, and the incremental mix ledger: hand-computed " +
      "two-batch run; the crossing doc is included, then the lang closes") {
    val base = Files.createTempDirectory("epochspine")
    val idx = base.resolve("idx").toString
    val sink = base.resolve("sink").toString
    val census = base.resolve("census").toString
    val bench = base.resolve("bench").toString
    // benchmark = one phrase; its 3-gram shingles poison doc 1 below
    Seq("b1 b2 b3 b4").toDF("clean")
      .select(explode(TextAnalysis.shingleHashes(col("clean"), DK))
        .as("sh"))
      .write.parquet(bench)
    // yesterday's corpus: one doc; doc 3 below exactly duplicates it
    Dedup.writeTaggedIndex(Seq((100L, "x1 x2 x3 x4 x5")).toDF(
      "doc_id", "clean"), "doc_id", "clean", idx, K, B, SK, -1L,
      SaveMode.Overwrite)
    val targets = Seq(("en", 12L)) // budget 12 tokens; every doc is 5

    // batch 0: doc 1 contaminated (shares "b1 b2 b3"); doc 3 dups the
    // index; docs 5 and 7 admit AND mix (used 0+0 and 0+5 both < 12)
    EpochSpine.ingestBatch(curated(
      1L -> "b1 b2 b3 zz yy", 3L -> "x1 x2 x3 x4 x5",
      5L -> "y1 y2 y3 y4 y5", 7L -> "z1 z2 z3 z4 z5"),
      0L, bench, idx, sink, census, targets, K, B, SK, THR, DK, SHARDS)
    // batch 1: doc 9 is the CROSSING doc (used 10 + 0 < 12 — included,
    // taking usage to 15); doc 11 admits but the lang is closed
    // (used 10 + cum 5 >= 12)
    val b1 = curated(9L -> "w1 w2 w3 w4 w5", 11L -> "v1 v2 v3 v4 v5")
    EpochSpine.ingestBatch(b1, 1L, bench, idx, sink, census, targets,
      K, B, SK, THR, DK, SHARDS)

    val admitted = spark.read.parquet(sink).distinct()
      .select($"doc_id", $"batch").as[(Long, Long)]
      .collect().sortBy(_._1).toList
    assert(admitted == List((5L, 0L), (7L, 0L), (9L, 1L), (11L, 1L)))
    def censusDf = spark.read.parquet(census).distinct()
    val led = censusDf.where($"section" === "ledger")
      .select($"batch_tag", $"lang", $"cnt", $"toks")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toList
    assert(led == List((0L, "en", 2L, 10L), (1L, "en", 1L, 5L)))
    // funnel: batch 0 arrived 4 → clean 4 → decon 3 → admit 2 → mix 2;
    // batch 1 arrived 2 → ... → admit 2 → mix 1
    val fun = censusDf.where($"section" === "funnel")
      .select($"batch", $"stage", $"cnt").as[(Long, String, Long)]
      .collect().map { case (b, st, c) => (b, st) -> c }.toMap
    assert(fun((0L, "0_arrived")) == 4 && fun((0L, "1_clean")) == 4 &&
      fun((0L, "2_decon")) == 3 && fun((0L, "3_admit")) == 2 &&
      fun((0L, "4_mix")) == 2)
    assert(fun((1L, "3_admit")) == 2 && fun((1L, "4_mix")) == 1)

    // CRASH REPLAY: the same batch applied twice ends in the same state —
    // every store read collapses the byte-equal re-appends
    EpochSpine.ingestBatch(b1, 1L, bench, idx, sink, census, targets,
      K, B, SK, THR, DK, SHARDS)
    assert(spark.read.parquet(sink).distinct().count() == 4)
    assert(censusDf.where($"section" === "ledger").count() == 2)
    val led2 = censusDf.where($"section" === "ledger")
      .select($"batch_tag", $"lang", $"cnt", $"toks")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toList
    assert(led2 == led)
    val man = censusDf.where($"section" === "shard")
      .groupBy($"shard").agg(sum($"cnt").as("c"), sum($"toks").as("t"))
      .as[(Long, Long, Long)].collect().toList
    assert(man.map(_._2).sum == 3 && man.map(_._3).sum == 15,
      s"manifest rollup after replay: $man")
    // the index carries base + admitted, each under its batch tag
    val idxState = spark.read.parquet(s"$idx/toks")
      .select($"id", $"batch_id").distinct()
      .as[(Long, Long)].collect().sortBy(_._1).toList
    assert(idxState == List((5L, 0L), (7L, 0L), (9L, 1L), (11L, 1L),
      (100L, -1L)))
  }

  test("tag namespacing is enforced (batchId < 1e6)") {
    val base = Files.createTempDirectory("epochspinens")
    intercept[IllegalArgumentException] {
      EpochSpine.ingestBatch(curated(1L -> "a b c d e"), 1000000L,
        base.resolve("bench").toString, base.resolve("idx").toString,
        base.resolve("sink").toString, base.resolve("census").toString,
        Seq(("en", 10L)), K, B, SK, THR, DK, SHARDS)
    }
  }
}
