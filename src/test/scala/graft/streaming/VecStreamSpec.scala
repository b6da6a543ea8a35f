package graft.streaming

import java.nio.file.{Files, Path}

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType,
  StructField, StructType}

import graft.SparkSpec
import graft.operators.Similarity

/** W20 streaming ANN admission — hand-computed 2-D geometry so every
  * cosine and every probe ranking is verifiable on paper. Centroids:
  * c0=(1,0), c1=(0,1), c2=(-1,0); nprobe=2 of 3 cells; threshold 0.9. */
class VecStreamSpec extends SparkSpec {
  import spark.implicits._

  private val cents: Array[(Long, Array[Double])] = Array(
    0L -> Array(1.0, 0.0), 1L -> Array(0.0, 1.0), 2L -> Array(-1.0, 0.0))
  private val schema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  private def stageVecFile(rows: Seq[(Long, Array[Float])], drop: Path,
      b: Int): Unit = {
    val tmp = Files.createTempDirectory(s"vecstage$b")
    rows.toDF("vec_id", "embedding")
      .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    import scala.jdk.CollectionConverters._
    val ls = Files.list(tmp)
    val part = try ls.iterator().asScala
      .find(p => p.getFileName.toString.startsWith("part-") &&
        p.getFileName.toString.endsWith(".parquet")).get
      finally ls.close()
    val f = drop.resolve(s"b$b.parquet")
    Files.move(part, f)
    f.toFile.setLastModified(1700000000000L + b * 1000L)
  }

  test("w20 admission: index reject, in-batch reject (smaller id wins), " +
      "append-back reject, cross-cell admit") {
    val base = Files.createTempDirectory("vecadmit")
    val drop = base.resolve("drop"); Files.createDirectories(drop)
    val sink = base.resolve("sink").toString
    val ckpt = base.resolve("ckpt").toString
    val idx = base.resolve("idx").toString
    // base index: 100=(1,0.05) lands in cell 0 (cos ~0.9988)
    Similarity.writeVecIndex(
      Seq(100L -> Array(1.0f, 0.05f)).toDF("vec_id", "embedding"),
      "vec_id", "embedding", idx, cents, tag = -1L, SaveMode.Overwrite)
    // batch 0: 1 dups index member 100 (cos ~0.99995, cell 0 probed);
    // 3=(0.1,1) fresh in cell 1; 5=(0.12,1) dups batch-mate 3
    // (cos ~0.99985 — smaller id wins); 7=(-1,0.05) fresh in cell 2
    // (its probes {2,1} see 3, but cos ~-0.05 clears it)
    stageVecFile(Seq(
      1L -> Array(1.0f, 0.06f), 3L -> Array(0.1f, 1.0f),
      5L -> Array(0.12f, 1.0f), 7L -> Array(-1.0f, 0.05f)), drop, 0)
    // batch 1: 9 dups ADMITTED 3 (append-back reject — 3 is in no base
    // index); 11 dups ADMITTED 7; 13=(0.7,-0.7) probes {0,1}, and its
    // cell-0 candidate 100 scores cos ~0.671 < 0.9 — admitted
    stageVecFile(Seq(
      9L -> Array(0.1f, 1.01f), 11L -> Array(-1.0f, 0.06f),
      13L -> Array(0.7f, -0.7f)), drop, 1)
    VecStream.admitNearDup(spark, drop.toString, ckpt, idx, sink, cents,
      nprobe = 2, threshold = 0.9, schema)
      .awaitTermination(120000)
    val got = spark.read.parquet(sink).distinct()
      .select($"vec_id", $"batch").as[(Long, Long)]
      .collect().sortBy(_._1).toList
    assert(got == List((3L, 0L), (7L, 0L), (13L, 1L)))

    // crash-replay idempotency: the same batch applied twice (same
    // batchId) ends in the same state — the index probe excludes rows
    // tagged with its own batch id, the sink dedupes at read time.
    // 17 dups admitted 3 (rejected); 19=(-0.6,-0.8) probes {2,0} and
    // clears both cells' members (7: cos ~0.559; 13: cos ~0.141; 100:
    // negative) — admitted exactly once
    val b2 = Seq(17L -> Array(0.1f, 1.02f), 19L -> Array(-0.6f, -0.8f))
      .toDF("vec_id", "embedding")
    Similarity.admitVecBatch(b2, 2L, "vec_id", "embedding", idx, sink,
      cents, nprobe = 2, threshold = 0.9)
    Similarity.admitVecBatch(b2, 2L, "vec_id", "embedding", idx, sink,
      cents, nprobe = 2, threshold = 0.9)
    val replayed = spark.read.parquet(sink).distinct()
      .select($"vec_id", $"batch").as[(Long, Long)]
      .collect().sortBy(_._1).toList
    assert(replayed ==
      List((3L, 0L), (7L, 0L), (13L, 1L), (19L, 2L)))
    // the index carries exactly the base + every admitted vector, each
    // under its batch tag (the replayed append may duplicate ROWS of its
    // own tag — harmless: probes read ids through distinct)
    val idxState = spark.read.parquet(s"$idx/vecs")
      .select($"id", $"batch_id").distinct()
      .as[(Long, Long)].collect().sortBy(_._1).toList
    assert(idxState == List((3L, 0L), (7L, 0L), (13L, 1L), (19L, 2L),
      (100L, -1L)))
  }

  test("w20 admission agrees with an independent plain-Scala replay on " +
      "48 seeded clustered vectors (3 batches, append-back chained)") {
    // Independent oracle: the same admission contract implemented as
    // driver-side loops with the SAME left-to-right IEEE folds the plan
    // uses (zip_with/aggregate fold ≡ a while loop in element order), so
    // any drift in the Spark plan's probe ranking, candidate surface,
    // round-6 cut, or append-back chaining shows as a set difference.
    val dim = 6
    val rnd = new java.util.Random(7)
    val bases = Array(
      Array(1.0, 0.8, 0.1, 0.0, 0.2, 0.1),
      Array(0.0, 0.1, 0.9, 1.0, 0.1, 0.0),
      Array(0.2, 0.0, 0.1, 0.1, 0.9, 1.0))
    val vecs: Seq[(Long, Array[Float])] = (0L until 48L).map { id =>
      // every 5th vector gets 10x the noise — likely unique, so both
      // admit and reject outcomes occur in every batch
      val noise = if (id % 5 == 0) 0.5 else 0.05
      val b = bases((id % 3).toInt)
      id -> Array.tabulate(dim)(i =>
        (b(i) + noise * rnd.nextGaussian()).toFloat)
    }
    val cents3: Array[(Long, Array[Double])] =
      bases.zipWithIndex.map { case (b, i) => (i.toLong, b) }
    val nprobe = 2
    val thr = 0.995

    // ---- plain-Scala reference ----
    def dotFF(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def dotFD(a: Array[Float], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i); i += 1 }
      s
    }
    def normF(a: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * a(i).toDouble; i += 1 }
      math.sqrt(s)
    }
    def normD(a: Array[Double]): Double =
      math.sqrt(a.foldLeft(0.0)((acc, x) => acc + x * x))
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def rankedCells(v: Array[Float]): Seq[Long] =
      cents3.map { case (cid, c) =>
        (-(dotFD(v, c) / (normF(v) * normD(c))), cid)
      }.sortBy(identity).map(_._2).toSeq
    def probesOf(v: Array[Float]): Set[Long] =
      rankedCells(v).take(nprobe).toSet
    def cellOf(v: Array[Float]): Long = rankedCells(v).head
    def near(a: Array[Float], b: Array[Float]): Boolean =
      round6(dotFF(a, b) / (normF(a) * normF(b))) >= thr

    val byId = vecs.toMap
    var index: Vector[(Long, Array[Float], Long)] = vecs
      .collect { case (id, v) if id % 2 == 0 => (id, v, cellOf(v)) }
      .toVector
    val expected = scala.collection.mutable.ListBuffer.empty[(Long, Long)]
    for (b <- 0 until 3) {
      val members = vecs.collect {
        case (id, _) if id % 2 == 1 && (id / 2) % 3 == b => id }
      val admitted = members.filterNot { id =>
        val v = byId(id); val pr = probesOf(v)
        val inb = members.exists(a => a < id &&
          pr(cellOf(byId(a))) && near(byId(a), v))
        val idx = index.exists { case (_, iv, ic) => pr(ic) && near(iv, v) }
        inb || idx
      }
      expected ++= admitted.map(id => (id, b.toLong))
      index ++= admitted.map(id => (id, byId(id), cellOf(byId(id))))
    }

    // ---- engine run (direct batch calls — VecStream wrapper covered
    // by the hand-computed test above) ----
    val base = Files.createTempDirectory("vecadmitx")
    val idx = base.resolve("idx").toString
    val sink = base.resolve("sink").toString
    Similarity.writeVecIndex(
      vecs.filter(_._1 % 2 == 0).toDF("vec_id", "embedding"),
      "vec_id", "embedding", idx, cents3, tag = -1L, SaveMode.Overwrite)
    for (b <- 0 until 3) {
      val batch = vecs.collect {
        case (id, v) if id % 2 == 1 && (id / 2) % 3 == b => (id, v) }
        .toDF("vec_id", "embedding")
      Similarity.admitVecBatch(batch, b.toLong, "vec_id", "embedding",
        idx, sink, cents3, nprobe, thr)
    }
    val got = spark.read.parquet(sink).distinct()
      .select($"vec_id", $"batch").as[(Long, Long)].collect().toList

    val exp = expected.toList
    assert(got.toSet == exp.toSet,
      s"engine ${got.sorted} vs reference ${exp.sorted}")
    // the fixture must exercise BOTH outcomes, or the agreement is vacuous
    val allOdd = vecs.count(_._1 % 2 == 1)
    assert(exp.nonEmpty && exp.size < allOdd,
      s"degenerate fixture: ${exp.size} of $allOdd admitted")
  }

  test("w20 index probe is PARTITION-PRUNED: the scan carries a cell " +
      "partition filter and reads only the probed cell= dirs") {
    val base = Files.createTempDirectory("vecprune")
    val idx = base.resolve("idx").toString
    // three vectors per cell, all three cells populated on disk
    val rows = Seq(
      100L -> Array(1.0f, 0.01f), 101L -> Array(1.0f, -0.02f),
      102L -> Array(0.9f, 0.1f),
      110L -> Array(0.01f, 1.0f), 111L -> Array(-0.02f, 1.0f),
      112L -> Array(0.1f, 0.9f),
      120L -> Array(-1.0f, 0.01f), 121L -> Array(-1.0f, -0.02f),
      122L -> Array(-0.9f, 0.1f))
    Similarity.writeVecIndex(rows.toDF("vec_id", "embedding"),
      "vec_id", "embedding", idx, cents, tag = -1L, SaveMode.Overwrite)
    // the unprobed cell's directory really exists — pruning is not vacuous
    assert(Files.isDirectory(
      java.nio.file.Paths.get(idx).resolve("vecs").resolve("cell=1")))
    val pruned = Similarity.readVecIndexPruned(spark, idx, Seq(0L, 2L),
      tag = 5L)
    // plan pin: the file scan carries a PARTITION filter on cell (the
    // P16 PushedFilters discipline applied to the index path)
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case f: FileSourceScanExec => Seq(f)
      case other => other.children.flatMap(scans)
    }
    val scan = scans(pruned.queryExecution.executedPlan).head
    assert(scan.partitionFilters
        .exists(_.references.exists(_.name == "cell")),
      s"no cell partition filter on the index scan: " +
        s"${scan.partitionFilters}")
    // behavior pin: every file actually read lies under a probed cell dir
    import org.apache.spark.sql.functions.input_file_name
    val files = pruned.select(input_file_name()).distinct()
      .as[String].collect()
    assert(files.nonEmpty &&
      files.forall(f => f.contains("/cell=0/") || f.contains("/cell=2/")),
      s"unpruned files read: ${files.mkString(", ")}")
    val ids = pruned.select($"id").as[Long].collect().sorted.toList
    assert(ids == List(100L, 101L, 102L, 120L, 121L, 122L))
  }

  test("w20 admission: tag namespacing is enforced (batchId < 1e6)") {
    val base = Files.createTempDirectory("vecadmitns")
    val b = Seq(1L -> Array(1.0f, 0.0f)).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Similarity.admitVecBatch(b, 1000000L, "vec_id", "embedding",
        base.resolve("idx").toString, base.resolve("sink").toString,
        cents, nprobe = 1, threshold = 0.9)
    }
  }
}
