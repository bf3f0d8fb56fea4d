package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass text statistics for the quality-scoring family:
  * STRUCT<n_tokens INT, sum_tok_len INT, sw_hits INT, non_alnum INT,
  * text_len INT> — everything [[TextFunctions.qualityScore]] and its
  * component ratios need, from ONE traversal of the text.
  *
  * Value-identical to the Column pipeline (TokenStatsSpec asserts parity on
  * the real corpus):
  *   - n_tokens / sum_tok_len / sw_hits over `split(lower(trim(text)),
  *     "\\s+")`, token length counted in code points like Spark's
  *     `length()`;
  *   - non_alnum = characters of the ORIGINAL text outside [a-zA-Z0-9 ]
  *     (the `length(text) - length(regexp_replace(...))` idiom), text_len =
  *     `length(text)`.
  *
  * The HOF form walks the token array once per metric (4 interpreted
  * lambda sweeps + a regex rewrite of the whole text per row); this is the
  * MinHashSig escalation applied to the scoring family: one static-call
  * kernel inside whole-stage codegen.
  */
case class TokenStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = TokenStats.schema
  override def prettyName: String = "token_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"token_stats requires string, got $t")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)

  @transient private lazy val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    stopwords.foreach(s.add)
    s
  }

  override def nullSafeEval(input: Any): Any =
    TokenStats.compute(input.asInstanceOf[UTF8String], stopSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopSet", stopSet, "java.util.HashSet")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TokenStats.compute($c, $setRef)")
  }
}

object TokenStats {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("sum_tok_len", IntegerType, nullable = false),
    StructField("sw_hits", IntegerType, nullable = false),
    StructField("non_alnum", IntegerType, nullable = false),
    StructField("text_len", IntegerType, nullable = false)))

  /** Row kernel, shared by eval and generated code. */
  def compute(text: UTF8String, stops: java.util.HashSet[String]): InternalRow = {
    // original text, code-point semantics = Spark's length()/regexp counts
    val raw = text.toString
    var i = 0
    var textLen = 0
    var nonAlnum = 0
    while (i < raw.length) {
      val cp = raw.codePointAt(i)
      i += Character.charCount(cp)
      textLen += 1
      val alnumOrSpace = (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') ||
        (cp >= '0' && cp <= '9') || cp == ' '
      if (!alnumOrSpace) nonAlnum += 1
    }
    // tokenization identical to split(lower(trim(text)), "\s+") — the
    // UTF8String trim/toLowerCase + JVM split pairing proven by MinHashSig
    val toks = text.trim().toLowerCase().toString.split("\\s+", -1)
    var nTokens = 0
    var sumLen = 0
    var swHits = 0
    var t = 0
    while (t < toks.length) {
      val tok = toks(t)
      nTokens += 1
      sumLen += tok.codePointCount(0, tok.length)
      if (stops.contains(tok)) swHits += 1
      t += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nTokens, sumLen, swHits, nonAlnum, textLen))
  }
}
