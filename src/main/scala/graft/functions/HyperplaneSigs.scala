package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native multi-table hyperplane-LSH signature: ALL `tables` bucket ids of
  * an `ARRAY<FLOAT>` embedding in one pass, as `ARRAY<LONG>`.
  *
  * Value-identical (HyperplaneSigsSpec) to the HOF composition
  * `array(table → Σ_bit (vec_dot(v, plane) >= 0) << bit)` it replaces
  * (VectorFunctions.lshSignaturesHof): the planes are the same
  * deterministic ±1 `lshPlane(table*1000 + bit)` family and the projection
  * is the same left-to-right float→double accumulation, so the sign — and
  * therefore every bucket id — matches bit-for-bit. The difference is
  * shape: the HOF form plans tables×bits separate [[FloatVecDot]] trees
  * (64 expression subtrees and one generated loop EACH at L=16 tables ×
  * 4 bits — the dominant cost of q_sim_topk_lsh's signature stage), while
  * this kernel reads the vector once and runs one fused
  * tables×bits×dim loop inside whole-stage codegen (the [[MinHashSig]] /
  * [[SimHashSig]] escalation applied to the third signature family).
  *
  * Degenerate inputs follow the HOF's observable behavior: a wrong-length
  * vector or a null element made every `vec_dot` null, every
  * `when(dot >= 0, ...)` bit 0, and every bucket id 0 — here the same
  * all-zero signature array. A null VECTOR returns null (the HOF returned
  * all-zero buckets for it; no caller feeds null embeddings — the corpus
  * loaders reject them — and null-in/null-out is the saner contract to
  * pin).
  */
case class HyperplaneSigs(child: Expression, bits: Int, tables: Int, dim: Int)
    extends UnaryExpression {

  require(bits > 0 && bits <= 63, s"hyperplane_sigs supports 1..63 bits, got $bits")
  require(tables > 0, s"hyperplane_sigs needs tables > 0, got $tables")
  // dim is SQL-reachable (hyperplane_sigs(v, bits, tables, dim)) — an
  // unvalidated value would surface as a per-row NegativeArraySizeException
  // at execution instead of failing analysis; the product bound caps the
  // plane table at 16 MB of floats
  require(dim > 0, s"hyperplane_sigs needs dim > 0, got $dim")
  require(tables.toLong * bits * dim <= (1L << 22),
    s"hyperplane_sigs plane table too large: $tables*$bits*$dim floats (max 2^22)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_sigs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sigs requires array<float>, got $t")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSigs =
    copy(child = newChild)

  // resolved once per plan, not per row: the kernel must not pay a boxed
  // cache lookup in its inner loop
  @transient private lazy val planes: Array[Float] =
    HyperplaneSigs.planesFor(bits, tables, dim)

  override def nullSafeEval(input: Any): Any =
    HyperplaneSigs.compute(input.asInstanceOf[ArrayData], bits, tables, dim, planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("hyperplanes", planes, "float[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HyperplaneSigs.compute($c, $bits, $tables, $dim, $planesRef)")
  }
}

object HyperplaneSigs {

  // planes are deterministic in (bits, tables, dim) — computed once per
  // JVM, shared across tasks; a few KB of ±1 floats per shape. The cache
  // is BOUNDED: shapes are user-controlled from SQL, and an unbounded map
  // of 16 MB-max plane tables would be a driver/executor memory leak.
  // Past the cap ONE arbitrary entry is evicted — a wholesale clear()
  // would drop hot entries still in use and turn >32 shapes in steady
  // rotation into a recompute-per-lookup thrash; entries are cheap to
  // recompute either way, so losing an active one occasionally is fine.
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Float]]

  private[functions] def planesFor(bits: Int, tables: Int, dim: Int): Array[Float] = {
    if (planeCache.size > 32) {
      val it = planeCache.keySet.iterator
      if (it.hasNext) { it.next(); it.remove() }
    }
    planeCache.computeIfAbsent((bits, tables, dim), { _ =>
      val flat = new Array[Float](tables * bits * dim)
      var t = 0
      while (t < tables) {
        var b = 0
        while (b < bits) {
          val plane = VectorFunctions.lshPlane(t * 1000 + b, dim)
          var j = 0
          while (j < dim) {
            flat((t * bits + b) * dim + j) = plane(j).toFloat
            j += 1
          }
          b += 1
        }
        t += 1
      }
      flat
    })
  }

  /** Row kernel, shared by eval and generated code; `planes` comes in as a
    * plan-time reference (addReferenceObj / the expression's lazy val), so
    * the hot loop touches no cache.
    */
  def compute(
      arr: ArrayData, bits: Int, tables: Int, dim: Int,
      planes: Array[Float]): ArrayData = {
    val out = new Array[Long](tables)
    val n = arr.numElements()
    var clean = n == dim
    val v = new Array[Double](if (clean) n else 0)
    if (clean) {
      var j = 0
      while (clean && j < n) {
        if (arr.isNullAt(j)) clean = false
        else { v(j) = arr.getFloat(j).toDouble; j += 1 }
      }
    }
    if (clean) {
      var t = 0
      while (t < tables) {
        var sig = 0L
        var b = 0
        while (b < bits) {
          val off = (t * bits + b) * dim
          var acc = 0.0
          var j = 0
          while (j < dim) {
            acc += v(j) * planes(off + j)
            j += 1
          }
          if (acc >= 0) sig |= 1L << b
          b += 1
        }
        out(t) = sig
        t += 1
      }
    }
    // !clean: all-zero buckets — the HOF form's null-dot → bit-0 behavior
    new GenericArrayData(out)
  }
}
