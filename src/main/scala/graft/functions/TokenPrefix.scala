package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native PPJoin prefix kernel: given a doc's DISTINCT token array and the
  * corpus document-frequency table, emit the rare-token PREFIX — the first
  * `|X| − ⌈t·|X|⌉ + 1` tokens under the global (df ASC, token ASC) order —
  * that the set-similarity join (q_dedup_jaccard) self-joins on.
  *
  * Value-identical to the staged Column pipeline
  * `explode → join(broadcast(dfs)) → row_number().over(doc ORDER BY df,
  * token) ≤ sz − ceil(t·sz) + 1` (TokenPrefixSpec asserts parity on the
  * real corpus), but with the plan-shape win the window form cannot have:
  * the exploded token stream no longer shuffles+sorts per doc at all — the
  * prefix is computed row-local in one codegen pass, so the only remaining
  * shuffles in the Jaccard query are the candidate self-join and its
  * dedup. The df table rides in as a plan constant (the VectorIndex
  * centroid-collect pattern): it is vocabulary-sized — one row per
  * distinct token, orders of magnitude below the corpus even at 100 TB —
  * which is the same bound that justified broadcast-joining it.
  *
  * Contracts: null array → null; a null ELEMENT → null row (the corpus
  * loaders reject null text, so this is the same carve-out as
  * [[MinHashSig]]); a token absent from `dfs` sorts last (df = Long.Max),
  * so it can only enter the prefix of a doc whose whole tail is unknown.
  * Token order ties break on the UTF8String binary order — exactly the
  * StringType sort the window form used.
  */
case class TokenPrefix(child: Expression, dfs: Map[String, Long], threshold: Double)
    extends UnaryExpression {

  require(threshold > 0.0 && threshold <= 1.0,
    s"token_prefix threshold must be in (0, 1], got $threshold")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "token_prefix"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_prefix requires array<string>, got $t")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenPrefix =
    copy(child = newChild)

  // UTF8String-keyed view of the df table, built once per plan (not per
  // row) and shipped to executors via addReferenceObj
  @transient private lazy val lookup: java.util.HashMap[UTF8String, java.lang.Long] =
    TokenPrefix.buildLookup(dfs)

  override def nullSafeEval(input: Any): Any =
    TokenPrefix.compute(input.asInstanceOf[ArrayData], lookup, threshold)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dfs", lookup, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.TokenPrefix.compute($c, $ref, $threshold);
       |if (${ev.value} == null) ${ev.isNull} = true;
     """.stripMargin)
  }
}

object TokenPrefix {

  private[functions] def buildLookup(
      dfs: Map[String, Long]): java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](dfs.size * 2)
    dfs.foreach { case (k, v) => m.put(UTF8String.fromString(k), v) }
    m
  }

  /** Row kernel, shared by eval and generated code. Returns null on a null
    * element (the expression maps that to a null row).
    */
  def compute(toks: ArrayData,
      dfs: java.util.HashMap[UTF8String, java.lang.Long],
      t: Double): ArrayData = {
    val n = toks.numElements()
    // prefix length: |X| − ⌈t·|X|⌉ + 1, floored at 0 for the n = 0 edge
    // (same double-multiply-then-ceil as the Column form's ceil(sz * t))
    val len = math.max(0, n - math.ceil(n * t).toInt + 1)
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val toksArr = new Array[UTF8String](n)
    val dfArr = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) return null
      val tok = toks.getUTF8String(i)
      val df = dfs.get(tok)
      toksArr(i) = tok
      dfArr(i) = if (df == null) Long.MaxValue else df.longValue()
      i += 1
    }
    val idx = Array.tabulate(n)(Integer.valueOf)
    java.util.Arrays.sort(idx, new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int = {
        val c = java.lang.Long.compare(dfArr(a), dfArr(b))
        if (c != 0) c else toksArr(a).compareTo(toksArr(b))
      }
    })
    val out = new Array[Any](math.min(len, n))
    i = 0
    while (i < out.length) { out(i) = toksArr(idx(i)); i += 1 }
    new GenericArrayData(out)
  }
}
