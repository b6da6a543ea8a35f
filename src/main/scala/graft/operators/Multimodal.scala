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
