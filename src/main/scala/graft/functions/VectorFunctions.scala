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

  /** Σ aᵢ·bᵢ with double accumulation — the native codegen expression
    * ([[FloatVecDot]]); requires `GraftExpressions.register(spark)` (done by
    * the Tables loaders and test harness). Bit-identical to the HOF form
    * below, ~10× faster on the pair-join hot path.
    */
  def dotProduct(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  /** The pure-Column fallback form (interpreted HOF) — kept for reference
    * and for non-float arrays.
    */
  def dotProductHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  def l2Norm(a: Column): Column = sqrt(dotProduct(a, a))

  /** Cosine similarity, 0.0 when either vector has zero norm. */
  def cosineSimilarity(a: Column, b: Column): Column =
    cosineWithNorms(a, b, l2Norm(a), l2Norm(b))

  /** Cosine with precomputed norms — the join-heavy queries compute each
    * row's norm once BEFORE the pair join (a narrow projection), so scoring a
    * pair is one dot product, not three. Numerically identical to
    * `cosineSimilarity` (same expression shapes, same fold order), so oracle
    * hashes are unchanged.
    */
  def cosineWithNorms(a: Column, b: Column, na: Column, nb: Column): Column = {
    val denom = na * nb
    when(denom === 0.0, lit(0.0)).otherwise(dotProduct(a, b) / denom)
  }

  /** Element-wise sum of two vectors (for centroid accumulation). */
  def vecAdd(a: Column, b: Column): Column =
    zip_with(a, b, (x, y) => x.cast("double") + y.cast("double"))

  def vecScale(a: Column, s: Column): Column =
    transform(a, x => x.cast("double") * s)

  /** Deterministic ±1 hyperplane for (seed, dim): component i is the parity
    * of the first 4 hex chars of md5("seed:i"). Computed once on the driver
    * and shipped as an array literal — the per-row work is one dot product,
    * not 64 md5 calls per bit.
    */
  def lshPlane(seed: Int, dim: Int): Seq[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until dim).map { i =>
      val hex = md.digest(s"$seed:$i".getBytes("UTF-8"))
        .take(2).map("%02x".format(_)).mkString
      if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1.0 else -1.0
    }
  }

  /** Random-hyperplane LSH bit: sign of the projection of `v` onto the
    * deterministic plane — reproducible in any engine, no RNG state.
    * The projection is the codegen'd [[FloatVecDot]] against the plane as a
    * float-array literal (±1 is exact in float, and float·±1 widened to
    * double equals double·±1, so the sign matches the interpreted HOF
    * form bit-for-bit) — a multi-table signature is 8·bits dot products
    * per row, far too hot for interpreted lambda evaluation.
    */
  def lshBit(v: Column, seed: Int, dim: Int): Column = {
    val plane = typedLit(lshPlane(seed, dim).map(_.toFloat))
    when(dotProduct(v, plane) >= 0, lit(1)).otherwise(lit(0))
  }

  /** k-bit signature for hyperplane LSH bucketing (long-packed; `1 << i`
    * as Int would wrap/turn negative from bit 31). `table` selects an
    * independent plane family so L tables can be OR-ed for recall
    * (candidate = bucket match in ANY table): per-table collision
    * probability for angle θ is (1−θ/π)^bits, so L tables lift recall to
    * 1−(1−p)^L while each table's bucket size still bounds the join.
    */
  def lshSignature(v: Column, bits: Int, dim: Int = 64, table: Int = 0): Column = {
    require(bits > 0 && bits <= 63, s"lshSignature supports 1..63 bits, got $bits")
    (0 until bits).map(i => lshBit(v, table * 1000 + i, dim) * lit(1L << i))
      .reduce(_ + _)
  }

  /** All L table signatures in one array column (posexplode → (tbl, bucket)
    * rows for the banded candidate join) — the native fused kernel
    * ([[HyperplaneSigs]]): one pass over the vector for every
    * tables×bits projection instead of tables×bits separate dot-product
    * expression trees. Bucket-identical to [[lshSignaturesHof]]
    * (HyperplaneSigsSpec parity).
    */
  def lshSignatures(v: Column, bits: Int, tables: Int, dim: Int = 64): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.col(HyperplaneSigs(Bridge.expr(v), bits, tables, dim))
  }

  /** The pure-Column composition — kept as the parity oracle for the
    * native kernel.
    */
  def lshSignaturesHof(v: Column, bits: Int, tables: Int, dim: Int = 64): Column =
    array((0 until tables).map(t => lshSignature(v, bits, dim, t)): _*)
}
