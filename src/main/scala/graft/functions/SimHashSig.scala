package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native nbits-bit SimHash over raw text: tokenize → per-token md5 →
  * signed bit-count vote per position → packed LONG.
  *
  * Value-identical to the HOF form `simhash(tokens(text), nbits)`
  * (TextFunctions; SimHashSigSpec asserts parity on the real corpus), but
  * one md5 per TOKEN instead of one per (token × bit): the HOF builds nbits
  * independent aggregate() columns, each of whose lambda recomputes
  * md5(token) to read a single hex digit — 32 digests and 32 interpreted
  * lambda trees per token at the pair-query's width. Here the digest runs
  * once and all nbits positions read their nibble from its bytes, inside
  * whole-stage codegen (same escalation as [[MinHashSig]]).
  *
  * One deliberate divergence: NULL text returns NULL (null-in/null-out),
  * where the HOF composition folds null into signature 0L — the corpus
  * loaders reject null text, and a null row silently hashing into the 0L
  * bucket (colliding with genuinely-empty docs) is the worse contract.
  * Same carve-out as [[HyperplaneSigs]]/[[MinHashSig]]; pinned by the
  * "null text yields null signature" test.
  */
case class SimHashSig(child: Expression, nbits: Int) extends UnaryExpression {

  require(nbits > 0 && nbits <= 63, s"simhash supports 1..63 bits, got $nbits")

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash_sig requires string, got $t")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    SimHashSig.compute(input.asInstanceOf[UTF8String], nbits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashSig.compute($c, $nbits)")
}

object SimHashSig {
  /** Row kernel, shared by eval and generated code. Tokenization matches
    * `split(lower(trim(text)), "\\s+")`; bit i of a token's hash is bit
    * (i%4) of hex digit (i/4) of its md5 (TextFunctions.simhash contract);
    * position i of the result is set iff Σ_tokens (2·bit−1) ≥ 0.
    */
  def compute(text: UTF8String, nbits: Int): Long = {
    val s = text.trim().toLowerCase().toString
    val toks = s.split("\\s+", -1)
    val md = java.security.MessageDigest.getInstance("MD5")
    val counts = new Array[Int](nbits)
    var ti = 0
    while (ti < toks.length) {
      md.reset()
      val digest = md.digest(
        toks(ti).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var i = 0
      while (i < nbits) {
        val hexIdx = i / 4 // hex-string character index = nibble index
        val b = digest(hexIdx / 2) & 0xff
        val nibble = if (hexIdx % 2 == 0) b >>> 4 else b & 0xf
        counts(i) += (((nibble >>> (i % 4)) & 1) * 2 - 1)
        i += 1
      }
      ti += 1
    }
    var out = 0L
    var i = 0
    while (i < nbits) {
      if (counts(i) >= 0) out |= (1L << i)
      i += 1
    }
    out
  }
}
