package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ARRAY<FLOAT>` embedding columns as pure Catalyst
  * expressions (`zip_with`/`aggregate` are codegen-friendly higher-order
  * functions — no UDF, no serialization of the array to Scala objects).
  *
  * The reference's vector surface lives downstream of its REST sink (ChromaDB,
  * README.md:156); here similarity is a first-class engine operation.
  * Arithmetic is promoted to double; `aggregate` folds left-to-right, which
  * is deterministic and matches a sequential oracle sum.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ with double accumulation. */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  def l2Norm(a: Column): Column = sqrt(dotProduct(a, a))

  /** Cosine similarity, 0.0 when either vector has zero norm. */
  def cosineSimilarity(a: Column, b: Column): Column = {
    val denom = l2Norm(a) * l2Norm(b)
    when(denom === 0.0, lit(0.0)).otherwise(dotProduct(a, b) / denom)
  }

  /** Element-wise sum of two vectors (for centroid accumulation). */
  def vecAdd(a: Column, b: Column): Column =
    zip_with(a, b, (x, y) => x.cast("double") + y.cast("double"))

  def vecScale(a: Column, s: Column): Column =
    transform(a, x => x.cast("double") * s)

  /** Random-hyperplane LSH bit: sign of the projection of `v` onto a
    * deterministic pseudo-random plane derived from (seed, dim) via md5 —
    * reproducible on any engine, no RNG state.
    */
  def lshBit(v: Column, seed: Int): Column = {
    // plane component for dim i: maps md5(seed:i) hex prefix to ±1
    val proj = aggregate(
      zip_with(
        v,
        sequence(lit(0), size(v) - 1),
        (x, i) => x.cast("double") *
          (when(conv(substring(md5(concat_ws(":", lit(seed), i)), 1, 4), 16, 10)
            .cast("long") % 2 === 0, lit(1.0)).otherwise(lit(-1.0)))),
      lit(0.0),
      (acc, x) => acc + x)
    when(proj >= 0, lit(1)).otherwise(lit(0))
  }

  /** k-bit signature for hyperplane LSH bucketing. */
  def lshSignature(v: Column, bits: Int): Column =
    (0 until bits).map(i => lshBit(v, i) * lit(1 << i)).reduce(_ + _)
}
