package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns next to typed metadata, exactly like a production
  * training-data lake (parquet keeps binaries page-compressed; the column is
  * never parsed by the engine, only by explicit decode steps).
  *
  * The actual media decode is STUBBED — this container has no image/audio
  * codecs — but everything the engine is responsible for is real: the binary
  * column representation, metadata extraction (byte length, digest, magic
  * header), deterministic frame/window sampling by byte offsets, and the
  * decode-UDF batch shape (binary → fixed-width feature struct). Swapping the
  * stub for a real decoder changes one function body, not the plan.
  */
object Multimodal {

  /** Byte length, content digest, and leading-bytes "magic header" of a
    * binary payload — pure column expressions, no UDF. */
  def byteMeta(payload: Column): (Column, Column, Column) =
    (octet_length(payload).cast("long"),
      md5(payload),
      lower(hex(substring(payload, 1, 8))))

  /** Sample `n` fixed-width frames at a byte `stride` — the frame-sample
    * primitive for video/audio payloads; offsets past the end yield empty
    * frames (hex ""). */
  def sampleFrames(payload: Column, n: Int, stride: Int, width: Int): Column =
    concat_ws("-", (0 until n).map(i =>
      lower(hex(substring(payload, 1 + i * stride, width)))): _*)

  /** STUB decoder: binary → (width, height, channels) derived
    * deterministically from content bytes. A real implementation would
    * decode the payload with an image codec inside the same UDF signature;
    * the surrounding plan (binary in, fixed struct out, per-row map, no
    * shuffle) is what the engine owns and is identical either way. */
  val decodeImageStub: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (payload: Array[Byte]) =>
      if (payload == null || payload.isEmpty) (0, 0, 0)
      else {
        // deterministic fake: fold bytes into pseudo-dimensions
        val h = payload.foldLeft(17L)((a, b) => a * 31 + (b & 0xff))
        (((h & 0x3ff) + 1).toInt, (((h >> 10) & 0x3ff) + 1).toInt, 3)
      }
    }

  /** STUB feature extractor: binary → fixed-width float vector (the
    * embedding an image/audio model would produce). Deterministic fake:
    * `dim` rolling byte aggregates, L2-normalized — the real model swaps in
    * behind the same `binary → array<float>` signature, preserving the
    * map-only plan and the downstream similarity operators' input shape. */
  def featureExtractStub(dim: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (payload: Array[Byte]) =>
      if (payload == null || payload.isEmpty) Array.fill(dim)(0.0f)
      else {
        val acc = new Array[Float](dim)
        var i = 0
        while (i < payload.length) {
          acc(i % dim) += (payload(i) & 0xff) / 255.0f
          i += 1
        }
        val norm = math.sqrt(acc.map(x => x.toDouble * x).sum).toFloat
        if (norm == 0f) acc else acc.map(_ / norm)
      }
    }

  /** Deterministic byte-level feature extraction as PURE column
    * expressions — the engine-owned half of the decode step with no UDF at
    * all: `dim` interleaved byte-histogram accumulators (slot i%dim gains
    * byte_i/255), L2-normalized in double. This is the exact shape a real
    * decoder hands back (`binary → array<double>` per row, map-only), but
    * expressed through Catalyst so it cross-verifies bit-for-bit against a
    * relational oracle — byte values come off the hex string with exact
    * integer arithmetic, folds are ascending-index. A real model swaps in
    * behind the same signature ([[featureExtractStub]]); downstream ANN
    * operators consume either. */
  /** Per-dim byte-histogram sums from a MATERIALIZED hex column: one fold
    * per dim over a stepped index sequence (positions d+1, d+1+dim, …) —
    * plain double accumulation, no per-byte array allocation. `hexCol`/
    * `nCol` must be real attributes, not expressions: expression trees
    * don't memoize shared subtrees, so an inline hex(payload) would re-hex
    * the whole payload on EVERY byte access inside the folds (measured
    * ~50× slower). Ascending positions within a dim keep the fold order —
    * and therefore the doubles — identical to a single interleaved pass.
    * The n > d guard matters twice over: sequence() with start > stop
    * would DESCEND, and an empty payload must yield all-zero sums. */
  def byteSums(hexCol: Column, nCol: Column, dim: Int,
      stride: Int = 1): Column = {
    val byteAt = (i: Column) => // 1-based byte index → 0..255 as double
      conv(hexCol.substr(i * 2 - 1, lit(2)), 16, 10).cast("double")
    // `stride` > 1 samples every stride-th byte of each dim's lane — the
    // standard cheap-content-fingerprint trade (higher-order folds run
    // interpreted, so per-byte cost is the whole cost; sampling divides it
    // while keeping the feature deterministic)
    array((0 until dim).map { d =>
      when(nCol > d, aggregate(
        sequence(lit(d + 1), nCol, lit(dim * stride)),
        lit(0.0), (a, i) => a + byteAt(i) / lit(255.0)))
        .otherwise(lit(0.0))
    }: _*)
  }

  /** L2-normalize a (small, materialized) sums array; 6-dp rounding, zero
    * vector stays zero. Norm is the ascending-index square fold — the same
    * chain the relational oracle writes out. */
  def normalizeVec(sums: Column): Column = {
    val norm = sqrt(aggregate(
      transform(sums, x => x * x), lit(0.0), (a, x) => a + x))
    transform(sums, x =>
      round(when(norm > 0, x / norm).otherwise(lit(0.0)), 6))
  }

  /** Single-expression composition of [[byteSums]] + [[normalizeVec]] for
    * operator-level use on SMALL payloads. For bulk extraction, stage the
    * hex and sums as real columns between projections (see the m3 query) —
    * inline, the shared hex/sums subtrees re-evaluate per consumer. */
  def byteFeatures(payload: Column, dim: Int): Column =
    normalizeVec(byteSums(hex(payload), octet_length(payload), dim))

  /** BATCHED decode/inference plumbing — the mapInPandas/model-server
    * shape: payloads stream through `mapPartitions`, grouped into
    * micro-batches of ≤ `batchSize`, and each group is one "model call"
    * (a GPU decoder amortizes weights/transfer over the batch; calling
    * per row is the classic 100× inference anti-pattern). Everything the
    * engine owns is real — the binary→struct signature, the bounded
    * batch buffering (never a whole partition in memory), the map-only
    * plan — and the stub "model" computes the SAME interleaved byte-lane
    * sums as [[byteSums]] in exact integers, so the relational oracle
    * cross-checks the batched JVM path bit-for-bit (m4). Per-row outputs
    * are independent of batch/partition boundaries by construction;
    * MultimodalSpec pins that invariance. `calls` counts model
    * invocations for the batching spec. */
  def batchInferSums(df: DataFrame, idCol: String, payloadCol: String,
      dim: Int = 8, stride: Int = 4, batchSize: Int = 64,
      calls: Option[org.apache.spark.util.LongAccumulator] = None)
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          calls.foreach(_.add(1)) // one model call per micro-batch
          batch.iterator.map { case (id, payload) =>
            val sums = new Array[Long](dim)
            val n = if (payload == null) 0 else payload.length
            var d = 0
            while (d < dim) {
              var i = d
              var acc = 0L
              while (i < n) { acc += (payload(i) & 0xff); i += dim * stride }
              sums(d) = acc
              d += 1
            }
            (id, sums, n.toLong)
          }
        }
      }.toDF(idCol, "sums", "n_bytes")
  }

  /** The m3 feature chain as STAGED projections over a whole table:
    * hex → sums → normalized vector, each stage materializing an
    * attribute the next reads so the payload is hexed ONCE and the folds
    * run once per row (inline composition re-evaluates shared subtrees
    * per consumer — expression trees don't memoize; measured ~50×). The
    * output is (idCol, passthrough..., `f` array<double>) — the shape the
    * ANN/admission operators consume. */
  def stagedFeatures(df: DataFrame, idCol: String, payloadCol: String,
      dim: Int = 8, stride: Int = 4, keep: Seq[String] = Nil): DataFrame = {
    val keepCols = keep.map(col)
    df.select(col(idCol) +: keepCols :+ hex(col(payloadCol)).as("hx") :+
        octet_length(col(payloadCol)).as("n"): _*)
      .select(col(idCol) +: keepCols :+
        byteSums(col("hx"), col("n"), dim, stride).as("s"): _*)
      .select(col(idCol) +: keepCols :+ normalizeVec(col("s")).as("f"): _*)
  }

  /** Full metadata extraction over a table with a binary `payloadCol`:
    * one narrow map stage, fully codegen'd except the stub decode. */
  def extractMeta(df: DataFrame, idCol: String, payloadCol: String,
      frames: Int = 4, stride: Int = 16, width: Int = 4): DataFrame = {
    val (nBytes, digest, header) = byteMeta(col(payloadCol))
    df.select(col(idCol),
      nBytes.as("n_bytes"),
      digest.as("digest"),
      header.as("header_hex"),
      sampleFrames(col(payloadCol), frames, stride, width).as("frame_sample"))
  }
}
