package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f)),
    (1L, Seq(0.9f, 0.1f, 0.0f)),
    (2L, Seq(0.0f, 1.0f, 0.0f)),
    (3L, Seq(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")

  test("dot and cosine match hand math") {
    val df = Seq((Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("a", "b")
    assert(df.select(Similarity.dot($"a", $"b")).as[Double].head() == 11.0)
    val c = Seq((Seq(1.0f, 0.0f), Seq(1.0f, 0.0f))).toDF("a", "b")
      .select(Similarity.cosine($"a", $"b")).as[Double].head()
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("cosineTopK ranks by similarity, excludes self, breaks ties by id") {
    val out = Similarity.cosineTopK(vecs, vecs.where($"vec_id" === 0),
      "vec_id", "embedding", 2)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    assert(out.toList == List((0L, 1L, 1L), (0L, 2L, 2L)))
  }

  test("signMatrix is deterministic") {
    val a = Similarity.signMatrix(4, 8)
    val b = Similarity.signMatrix(4, 8)
    assert(a.map(_.toList).toList == b.map(_.toList).toList)
    assert(a.flatten.forall(s => s == 1 || s == -1))
  }

  test("single-pass lshBucket is bit-identical to the per-bit fold") {
    // legacy per-bit form: one aggregate per hyperplane (the shape the
    // single-pass rewrite replaced) — bucket codes must match exactly,
    // including the double fold order, or the DuckDB oracle twins break
    val signs = Similarity.signMatrix(6, 3)
    def legacy(vec: org.apache.spark.sql.Column) = concat(signs.map { row =>
      val proj = aggregate(
        zip_with(vec, array(row.map(lit): _*), (x, s) => x.cast("double") * s),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, lit("1")).otherwise(lit("0"))
    }: _*)
    val both = vecs.select(
      Similarity.lshBucket($"embedding", signs).as("fast"),
      legacy($"embedding").as("slow"))
      .as[(String, String)].collect()
    assert(both.nonEmpty)
    both.foreach { case (fast, slow) => assert(fast == slow) }
  }

  test("int8 quantization: codes bounded, zero vector safe, dot exact") {
    val df = Seq(
      (1L, Seq(1.0f, -0.5f, 0.25f)),
      (2L, Seq(0.0f, 0.0f, 0.0f))).toDF("id", "v")
    val (codes, scale) = Similarity.quantizeInt8($"v")
    val rows = df.select($"id", codes.as("c"), scale.as("s"))
      .as[(Long, Seq[Int], Double)].collect()
      .map { case (i, c, s) => i -> ((c, s)) }.toMap
    // max |v| = 1.0 → scale 127; floor(-0.5*127) = -64
    assert(rows(1L)._1 == Seq(127, -64, 31))
    assert(rows(1L)._2 == 127.0)
    assert(rows(2L)._1 == Seq(0, 0, 0) && rows(2L)._2 == 0.0)
    val dot = Seq((Seq(127, -64, 31), Seq(127, -64, 31))).toDF("a", "b")
      .select(Similarity.dotInt8($"a", $"b")).as[Long].head()
    assert(dot == 127L * 127 + 64L * 64 + 31L * 31)
  }

  test("ivfTopK nprobe=2 candidates are a superset of probe=1 (recall knob)") {
    val cents = vecs.where($"vec_id" < 2)
    def pairs(nprobe: Int) =
      Similarity.ivfTopK(vecs, vecs, cents, "vec_id", "embedding",
        k = 10, nprobe = nprobe)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val p1 = pairs(1)
    val p2 = pairs(2)
    assert(p1.subsetOf(p2))
    assert(p2.size >= p1.size)
  }

  test("ivfTopK cell assignment is map-side: no shuffle below the cell join") {
    // the corpus must reach the cell equi-join without any KEYED exchange
    // — the assignment argmax folds the broadcast centroid model per row.
    // A hash-partitioned shuffle below the join means the crossJoin+window
    // regression is back. The one allowed node is Spread's RoundRobin
    // repartition (parallelism guard for narrow scans — a no-op at
    // production split counts): it redistributes rows without any key, so
    // it cannot be hiding an aggregation or join.
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val cents = vecs.where($"vec_id" < 2)
    val plan = Similarity.ivfTopK(vecs, vecs.where($"vec_id" < 3), cents,
      "vec_id", "embedding", k = 3).queryExecution.sparkPlan
    val joins = plan.collect { case j: BroadcastHashJoinExec => j }
    assert(joins.nonEmpty, "cell join is not a broadcast hash join:\n" + plan)
    joins.foreach { j =>
      val keyed = j.collect { case s: ShuffleExchangeExec
        if !s.outputPartitioning.toString.contains("RoundRobinPartitioning")
        => s }
      assert(keyed.isEmpty,
        "keyed shuffle below the cell join (assignment is no longer map-side):\n" + j)
    }
  }

  test("contrastivePairs: positives share the label, negatives don't, " +
      "probe=2 reaches the cross-cell hard negative") {
    // two tight clusters on the axes; the boundary query q (id 10, label 0)
    // lands in cell 0, but its HARDEST negative n (id 20, label 1) sits just
    // across the boundary in cell 1 — probe=1 can never see it, probe=2 must
    val lv = Seq(
      (0L, Seq(1.0f, 0.0f), 0),   // centroid/corpus, cell 0
      (1L, Seq(0.0f, 1.0f), 1),   // centroid/corpus, cell 1
      (10L, Seq(0.8f, 0.6f), 0),  // boundary query, cell 0
      (11L, Seq(0.9f, 0.1f), 0),  // same-label neighbor in cell 0
      (20L, Seq(0.6f, 0.8f), 1),  // the cross-cell hard negative
      (21L, Seq(0.1f, 0.9f), 1)).toDF("vec_id", "embedding", "label")
    val cents = lv.where($"vec_id" < 2)
    def mined(nprobe: Int) =
      Similarity.contrastivePairs(lv, lv.where($"vec_id" === 10), cents,
        "vec_id", "embedding", "label", posK = 2, negK = 2, nprobe = nprobe)
        .select("pair_type", "neighbor_id", "rank")
        .as[(String, Long, Long)].collect().toList
    val p2 = mined(2)
    // positives: ids 11 and 0 (label 0), negatives led by the boundary
    // vector 20 — the highest-cosine wrong-label pair is rank-1
    assert(p2.filter(_._1 == "pos").map(_._2).toSet == Set(0L, 11L))
    assert(p2.filter(_._1 == "neg").minBy(_._3) == ("neg", 20L, 1L))
    // probe=1 stays inside cell 0: no wrong-label vector lives there, so
    // the hard negative is invisible — the nprobe knob IS the recall story
    assert(mined(1).forall(_._1 == "pos"))
  }

  // prefix-2 slices must be nonzero: cosine over a zero-norm prefix is a
  // 0/0 (ANSI divide-by-zero) in ANY engine — same contract as the oracle
  private def mrlVecs = Seq(
    (0L, Seq(1.0f, 0.1f, 0.0f)),
    (1L, Seq(0.9f, 0.2f, 0.0f)),
    (2L, Seq(0.1f, 1.0f, 0.0f)),
    (3L, Seq(0.2f, 0.1f, 1.0f))).toDF("vec_id", "embedding")

  test("mrlIvfTopK: index-backed coarse stage — no cartesian/nested-loop node") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec,
      CartesianProductExec}
    val vecs = mrlVecs
    val cents = vecs.where($"vec_id" < 2)
    val df = Similarity.mrlIvfTopK(vecs, vecs.where($"vec_id" < 3), cents,
      "vec_id", "embedding", k = 3, prefixDim = 2, shortlist = 10, nprobe = 2)
    val plan = df.queryExecution.sparkPlan
    val bad = plan.collect {
      case j: BroadcastNestedLoopJoinExec => j
      case j: CartesianProductExec => j
    }
    assert(bad.isEmpty,
      "MRL stage 1 regressed to a crossJoin candidate space:\n" + plan)
    // and the results are well-formed: self excluded, ranks contiguous
    val rows = df.select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (q, n, _) => q != n })
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._3).sorted.toList == (1 to rs.length).map(_.toLong).toList)
    }
  }

  test("mrlIvfTopK agrees with mrlTopK when one cell covers everything") {
    // a single centroid puts the whole corpus in one cell, so the
    // index-backed path degenerates to exactly the brute-force MRL
    val vecs = mrlVecs
    val cents = vecs.where($"vec_id" === 0)
    val a = Similarity.mrlIvfTopK(vecs, vecs, cents, "vec_id", "embedding",
      k = 3, prefixDim = 2, shortlist = 10, nprobe = 1)
      .select("query_id", "neighbor_id", "rank", "sim")
      .as[(Long, Long, Long, Double)].collect().toSet
    val b = Similarity.mrlTopK(vecs, vecs, "vec_id", "embedding",
      k = 3, prefixDim = 2, shortlist = 10)
      .select("query_id", "neighbor_id", "rank", "sim")
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(a == b)
  }

  test("kmeans: Lloyd's converges and separates two angular clusters") {
    // two tight direction clusters; seeds one vector from each
    val around = (base: Seq[Float], eps: Float, ids: Range) =>
      ids.map(i => (i.toLong, base.zipWithIndex.map { case (x, d) =>
        x + (if (d == i % 3) eps else 0f) }))
    val a = around(Seq(1f, 0f, 0f), 0.05f, 0 until 6)
    val b = around(Seq(0f, 1f, 0f), 0.05f, 6 until 12)
    val corpus = (a ++ b).toDF("vec_id", "embedding")
    val init = Similarity.collectCentroids(
      corpus.where($"vec_id".isin(0, 6)), "vec_id", "embedding")
    val model = Similarity.kmeans(corpus, "vec_id", "embedding",
      init, maxIters = 10, dim = 3)
    assert(model.length == 2)
    val assigned = Similarity.assignCells(corpus, model, "vec_id",
      "embedding", "vid", "v", 1)
      .select("vid", "cell").as[(Long, Long)].collect().toMap
    val cellsA = (0L until 6L).map(assigned).toSet
    val cellsB = (6L until 12L).map(assigned).toSet
    assert(cellsA.size == 1 && cellsB.size == 1 && cellsA != cellsB)
    // trained model feeds ivf search directly: each cluster member's
    // neighbors come from its own cluster
    val centsDf = model.toSeq
      .map { case (id, v) => (id, v.map(_.toFloat).toSeq) }
      .toDF("vec_id", "embedding")
    val ann = Similarity.ivfTopK(corpus, corpus.where($"vec_id" === 0L),
      centsDf, "vec_id", "embedding", k = 3)
      .select("neighbor_id").as[Long].collect()
    assert(ann.forall(_ < 6L))
  }

  test("pqTopK: ADC distance is exact when vectors sit on the codebook") {
    // dim 4, m 2, dsub 2: codebook rows are the 2 "centroid" vectors; a
    // corpus vector equal to a centroid encodes to that centroid in both
    // subspaces and its ADC distance to a query IS the true L2² (table
    // lookups sum the real subspace distances)
    val cents = Array(
      (0L, Array(1.0, 0.0, 0.0, 1.0)), (1L, Array(0.0, 1.0, 1.0, 0.0)))
    val corpus = Seq(
      (0L, Seq(1f, 0f, 0f, 1f)),      // = centroid 0
      (1L, Seq(0f, 1f, 1f, 0f)),      // = centroid 1
      (10L, Seq(1f, 0.1f, 1f, 0.1f)), // mixed: sub0→cent0, sub1→cent1
      (11L, Seq(0.9f, 0f, 0f, 0.9f))  // near centroid 0
    ).toDF("vec_id", "embedding")
    val queries = corpus.where($"vec_id" === 0L)
    val out = Similarity.pqTopK(corpus, queries, cents, "vec_id",
      "embedding", k = 3, m = 2, dim = 4)
      .select("neighbor_id", "rank", "adist").as[(Long, Long, Double)]
      .collect().sortBy(_._2)
    // 11 quantizes to (cent0, cent0): ADC(q=cent0) = 0.0 exactly — ranked
    // above 10 (one subspace off) and 1 (both off: 1+1+1+1 = 4)
    assert(out.map(_._1).toSeq == Seq(11L, 10L, 1L))
    assert(out(0)._3 == 0.0) // quantization collapses 11 onto the query
    assert(out(2)._3 == 4.0)
  }

  test("ivfPqTopK: cell-bucketed candidates, no cartesian node, sound ranks") {
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec,
      CartesianProductExec}
    val cents = Array(
      (0L, Array(1.0, 0.0, 0.0, 1.0)), (1L, Array(0.0, 1.0, 1.0, 0.0)))
    val corpus = Seq(
      (0L, Seq(1f, 0f, 0f, 1f)),
      (1L, Seq(0f, 1f, 1f, 0f)),
      (10L, Seq(0.9f, 0.1f, 0.1f, 0.9f)),  // cell 0
      (11L, Seq(0.1f, 0.9f, 0.9f, 0.1f))   // cell 1
    ).toDF("vec_id", "embedding")
    val df = Similarity.ivfPqTopK(corpus, corpus.where($"vec_id" < 2), cents,
      "vec_id", "embedding", k = 3, m = 2, dim = 4, nprobe = 2)
    // the production plan property: candidates come from the cell
    // equi-join, never a corpus crossJoin
    val bad = df.queryExecution.sparkPlan.collect {
      case j: BroadcastNestedLoopJoinExec => j
      case j: CartesianProductExec => j
    }
    assert(bad.isEmpty, "IVF-PQ candidate space regressed to a crossJoin")
    val rows = df.select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (q, n, _) => q != n })
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._3).sorted.toList ==
        (1 to rs.length).map(_.toLong).toList)
    }
    // nprobe=2 with 2 cells = every cell probed: the ADC ranking must agree
    // with flat pqTopK (same codebook, same tables) on the shared top-k
    val flat = Similarity.pqTopK(corpus, corpus.where($"vec_id" < 2), cents,
      "vec_id", "embedding", k = 3, m = 2, dim = 4)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Long)].collect().toSet
    assert(rows.toSet == flat)
  }

  test("semanticDedup: smaller id survives in-cell; dups across cells both live") {
    // two angular clusters; centroids = axis vectors, so cell = cluster
    val cents = Array((0L, Array(1.0, 0.0, 0.0)), (1L, Array(0.0, 1.0, 0.0)))
    val corpus = Seq(
      (10L, Seq(1.0f, 0.01f, 0f)),   // cell 0
      (11L, Seq(1.0f, 0.02f, 0f)),   // cell 0, ~dup of 10 → dropped
      (12L, Seq(0.71f, 0.70f, 0f)),  // cell 0 ┐ near-dups straddling the
      (13L, Seq(0.70f, 0.71f, 0f)),  // cell 1 ┘ boundary: rule is cluster-
      (14L, Seq(0f, 1.0f, 0.5f))     // cell 1  local, so BOTH survive
    ).toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(corpus, "vec_id", "embedding",
      cents, threshold = 0.99)
      .select("id", "cell").as[(Long, Long)].collect().toMap
    assert(!out.contains(11L))            // in-cell dup, larger id dropped
    assert(out.keySet == Set(10L, 12L, 13L, 14L))
    assert(out(10L) == 0L && out(12L) == 0L && out(13L) == 1L)
    // cos(10,12) ≈ 0.72 < 0.99: same cell, not similar enough → kept
  }

  test("adaptiveSemanticDedup splits a hot cell by sqrt(n) smallest-id " +
      "seeds and dedups per sub-bucket") {
    val cents = Array(0L -> Array(1.0, 0.0), 1L -> Array(0.0, 1.0))
    // cell 0 gets 4 members (> cap 3 → subk = floor(sqrt(4)) = 2, seeds
    // 10 and 11); cell 1 gets 2 (unsplit, subcell -1)
    val corpus = Seq(
      (10L, Seq(1.0f, 0.0f)),
      (11L, Seq(0.9f, 0.435f)),
      (12L, Seq(0.999f, 0.01f)),  // seed-10 bucket, cos(10,12) ≈ 1 → drop
      (13L, Seq(0.95f, 0.3f)),    // seed-11 bucket, cos(11,13) ≈ 0.990 → kept
      (20L, Seq(0.0f, 1.0f)),
      (21L, Seq(0.01f, 0.9999f))  // unsplit cell dup of 20 → drop
    ).toDF("vec_id", "embedding")
    val out = Similarity.adaptiveSemanticDedup(corpus, "vec_id",
      "embedding", cents, threshold = 0.995, cellCap = 3)
      .select("id", "cell", "subcell").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.keySet == Set(10L, 11L, 13L, 20L))
    assert(out(10L) == ((0L, 10L)) && out(11L) == ((0L, 11L)))
    assert(out(13L) == ((0L, 11L))) // same bucket as 11, under threshold
    assert(out(20L) == ((1L, -1L))) // cold cell keeps subcell = -1
  }

  test("lshTopK returns bucket-mates ranked by cosine") {
    val out = Similarity.lshTopK(vecs, vecs, "vec_id", "embedding",
      k = 3, nBits = 2, dim = 3)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Long)]
      .collect()
    // every returned neighbor shares the query's bucket; rank starts at 1
    assert(out.forall(_._3 >= 1))
    assert(out.forall(r => r._1 != r._2))
  }
}
