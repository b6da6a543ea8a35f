package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Baseline: brute-force cosine top-k (a broadcast-join + per-row loop —
  * exact, O(n·q), the right choice when the query set is small).
  * Scale path: sign-random-projection LSH — deterministic ±1 hyperplanes
  * derived from md5 so the DuckDB oracle can reproduce the buckets; the
  * candidate join is an equi-join on the bucket code (uniform shuffle), and
  * only bucket-mates pay the exact-cosine cost. An IVF variant would swap the
  * hyperplane code for a k-means coarse quantizer; the join shape is the same.
  *
  * All arithmetic is double-precision with left-to-right array folds, so the
  * oracle computes bit-identical sums.
  */
object Similarity {

  /** Dot product of two float-array columns, accumulated in double,
    * element order left-to-right. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors (self excluded), ties broken by corpus id. The corpus side is
    * the big table; queries broadcast. */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").cast("long").as("rank"), round(col("sim"), 6).as("sim"))
  }

  /** Deterministic ±1 hyperplane matrix `nBits × dim`: sign(j,d) = +1 iff
    * the first hex digit of md5("j_d") is < '8'. Pure function of (j,d) —
    * reproducible anywhere md5 exists. */
  def signMatrix(nBits: Int, dim: Int): Array[Array[Int]] = {
    val mdig = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(nBits, dim) { (j, d) =>
      val hex = mdig.digest(s"${j}_$d".getBytes("UTF-8"))
      if (((hex(0) >> 4) & 0xf) < 8) 1 else -1
    }
  }

  /** LSH bucket code: bit j = (Σ_d sign(j,d)·v[d]) > 0, packed into a
    * string of '0'/'1'. */
  def lshBucket(vec: Column, signs: Array[Array[Int]]): Column = {
    val bitCols = signs.map { row =>
      val proj = aggregate(
        zip_with(vec, array(row.map(lit): _*),
          (x, s) => x.cast("double") * s),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, lit("1")).otherwise(lit("0"))
    }
    concat(bitCols: _*)
  }

  /** ANN via sign-LSH: bucket everything, then exact cosine only within the
    * query's bucket; top-k per query among bucket-mates. Recall < 1 by
    * construction; `nBits` trades bucket size vs recall. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nBits: Int, dim: Int): DataFrame = {
    val signs = signMatrix(nBits, dim)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      lshBucket(col(vecCol), signs).as("bucket"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      lshBucket(col(vecCol), signs).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").cast("long").as("rank"), round(col("sim"), 6).as("sim"))
  }
}
