package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native k-seed MinHash signature over raw text: tokenize → n-gram
  * shingles → per-seed min of md5(seed:shingle), as ARRAY<STRING> of k
  * lowercase hex digests.
  *
  * Value-identical to the staged Column pipeline
  * `array(seeds.map(minhash(shingles(tokens(text), n), _)))`
  * (TextFunctions; MinHashSigSpec asserts parity on the real corpus), but
  * one tight eval instead of an interpreted higher-order-function tree: the
  * HOF form re-evaluates a lambda per shingle per seed, materializes the
  * token array, the shingle array, and k intermediate transform arrays per
  * row, and falls out of whole-stage codegen. Here codegen emits a single
  * static call (the FloatVecDot escalation applied to the dedup family's
  * hottest kernel), one MessageDigest instance serves the whole row, and
  * shingle bytes are encoded once and reused across all k seeds.
  *
  * One deliberate divergence: NULL text returns NULL, where the HOF
  * composition folds null into an array of k nulls — null-in/null-out is
  * the saner contract and the corpus loaders reject null text anyway
  * (same carve-out as [[SimHashSig]]/[[HyperplaneSigs]]).
  */
case class MinHashSig(child: Expression, shingleN: Int, seeds: Int)
    extends UnaryExpression {

  require(shingleN > 0 && seeds > 0, s"need positive n/k, got ($shingleN, $seeds)")
  // minhash_sig(text, n, k) is SQL-reachable with an arbitrary literal k:
  // cap it (the bits <= 63 guard in HyperplaneSigs) so a huge k can't
  // allocate proportionally per row or bloat the per-JVM prefix cache.
  require(seeds <= 4096, s"minhash_sig supports at most 4096 seeds, got $seeds")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_sig requires string, got $t")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[UTF8String], shingleN, seeds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashSig.compute($c, $shingleN, $seeds)")
}

object MinHashSig {
  private val hexDigits = "0123456789abcdef".toCharArray

  /** Row kernel, shared by eval and generated code. Tokenization matches
    * `split(lower(trim(text)), "\\s+")` and shingling matches
    * TextFunctions.shingles (short docs collapse to one whole-doc shingle).
    */
  // seed prefixes depend only on k — computed once per JVM, not per row
  // (the HyperplaneSigs plane-table pattern); k is a query constant, so
  // the cache normally holds a handful of entries. BOUNDED all the same:
  // k is SQL-supplied, so distinct values could otherwise accumulate
  // k-sized tables per JVM forever. Past the cap one arbitrary entry is
  // evicted (not clear() — a full wipe would invalidate hot entries still
  // in steady rotation); entries are cheap to recompute either way.
  private val prefixCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]

  private def prefixesFor(k: Int): Array[Array[Byte]] = {
    if (prefixCache.size > 32) {
      val it = prefixCache.keySet.iterator
      if (it.hasNext) { it.next(); it.remove() }
    }
    prefixCache.computeIfAbsent(k, kk => Array.tabulate(kk)(seed =>
      (seed.toString + ":").getBytes(java.nio.charset.StandardCharsets.UTF_8)))
  }

  def compute(text: UTF8String, n: Int, k: Int): ArrayData = {
    // UTF8String lowercase (locale-free), then JVM split — identical to
    // Spark's split() on the already-lowercased bytes
    val s = text.trim().toLowerCase().toString
    val toks = s.split("\\s+", -1)
    val shingles: Array[String] =
      if (toks.length < n) Array(toks.mkString(" "))
      else Array.tabulate(toks.length - n + 1)(i =>
        toks.slice(i, i + n).mkString(" "))
    val md = java.security.MessageDigest.getInstance("MD5")
    // min-tracking on the RAW 16-byte digests (r19): unsigned byte order
    // equals the hex-string order (hex is a monotone byte encoding and all
    // digests are equal length), so only the k winners are hex-encoded at
    // the end. The previous per-(shingle × seed) hex String was the
    // kernel's dominant allocation — at 32 concurrent tasks the family's
    // heavy rows were GC-bound, not md5-bound. The digest writes into one
    // reused buffer; a new min is the only copy.
    val mins = new Array[Array[Byte]](k)
    val digest = new Array[Byte](16)
    val seedPrefix = prefixesFor(k)
    var si = 0
    while (si < shingles.length) {
      val shingleBytes = shingles(si).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var seed = 0
      while (seed < k) {
        md.reset()
        md.update(seedPrefix(seed))
        md.update(shingleBytes)
        md.digest(digest, 0, 16)
        if (mins(seed) == null ||
            java.util.Arrays.compareUnsigned(digest, mins(seed)) < 0)
          mins(seed) = digest.clone()
        seed += 1
      }
      si += 1
    }
    new GenericArrayData(
      mins.map(b => UTF8String.fromString(toHex(b))).toArray[Any])
  }

  private def toHex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(i * 2) = hexDigits(b >>> 4)
      out(i * 2 + 1) = hexDigits(b & 0xf)
      i += 1
    }
    new String(out)
  }
}
