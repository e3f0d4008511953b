package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, IntegerType}

/** Shared kernel for the FULL MinHash signature — one pass over the
  * token array computing every shingle, its md5-prefix base hash, and
  * all k affine minima in a tight loop.
  *
  * Why it exists: the HOF formulation (`transform(shingles, md5)` then
  * k × `array_min(transform(hs, affine))`) evaluates entirely in the
  * interpreted expression walker — and, worse, inlining `wordShingles`
  * re-evaluates the regex `split(trim(text))` for EVERY shingle
  * element. Measured on the sf0.1 corpus that stack made the banded
  * pair join ~6 s for 5 000 docs; this kernel does the identical
  * arithmetic in one codegen-friendly static call.
  *
  * Value contract (the cross-engine replay device, byte-identical to
  * the HOF path and the DuckDB oracle):
  *  - shingle i = `concat_ws(' ', words[i..i+n))` for
  *    i ∈ [0, max(len-n, 0)] — short docs yield ONE short shingle,
  *    null tokens contribute nothing (not even a separator);
  *  - base hash = first 8 hex chars of md5(shingle) as a long
  *    (`('0x' || substr(md5(s), 1, 8))::BIGINT` in DuckDB);
  *  - sig[j] = min over shingles of `(h·a_j + b_j) mod p`, p = 2^61-1,
  *    (a_j, b_j) from [[graft.functions.TextFunctions.minhashParams]]
  *    (no overflow: h < 2^32, a < 2^29, b < 2^60 ⇒ h·a+b < 2^62).
  */
object MinhashSigUtil {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  // interleaved (a0, b0, a1, b1, ...) per k — parameters are
  // deterministic, so a per-JVM memo is safe and saves re-derivation
  // on every row batch
  private val params =
    new java.util.concurrent.ConcurrentHashMap[Integer, Array[Long]]()

  private[plans] def paramsFor(k: Int): Array[Long] =
    params.computeIfAbsent(k, _ => {
      val ps = graft.functions.TextFunctions.minhashParams(k)
      val out = new Array[Long](2 * k)
      var j = 0
      while (j < k) { out(2 * j) = ps(j)._1; out(2 * j + 1) = ps(j)._2; j += 1 }
      out
    })

  val Prime: Long = (1L << 61) - 1

  def sig(words: ArrayData, n: Int, k: Int): ArrayData = {
    val count = words.numElements()
    val total = math.max(count - n + 1, 1)
    val ab = paramsFor(k)
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val md = digest.get()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < total) {
      sb.setLength(0)
      val end = math.min(i + n, count)
      // concat_ws semantics: null tokens contribute NOTHING — not even
      // a separator (a null mid-window must not leave a double space)
      var appended = false
      var j = i
      while (j < end) {
        if (!words.isNullAt(j)) {
          if (appended) sb.append(' ')
          sb.append(words.getUTF8String(j).toString)
          appended = true
        }
        j += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 8 hex chars of md5 = first 4 bytes, unsigned
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      var q = 0
      while (q < k) {
        val v = (h * ab(2 * q) + ab(2 * q + 1)) % Prime
        if (v < mins(q)) mins(q) = v
        q += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** `graft_minhash_sig(words, n, k)` → `array<long>` of the k affine
  * MinHash minima over word n-gram shingles. Codegen emits a static
  * call, so the expression stays inside whole-stage codegen.
  */
case class MinhashSigExpr(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = first.dataType.isInstanceOf[ArrayType] &&
      first.dataType.asInstanceOf[ArrayType].elementType == StringType &&
      second.dataType == IntegerType && third.dataType == IntegerType
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<string>, int, int)")
  }

  override protected def nullSafeEval(w: Any, n: Any, k: Any): Any =
    MinhashSigUtil.sig(w.asInstanceOf[ArrayData],
      n.asInstanceOf[Int], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, n, k) =>
      s"graft.plans.MinhashSigUtil.sig($w, $n, $k)")

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): MinhashSigExpr = copy(first = f, second = s, third = t)
}

object MinhashSigFunctions {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_minhash_sig"),
    new ExpressionInfo(classOf[MinhashSigExpr].getName, "graft_minhash_sig"),
    (children: Seq[Expression]) =>
      MinhashSigExpr(children(0), children(1), children(2)))
}

/** The CHAR-gram sibling of [[MinhashSigUtil]]: one pass over the text
  * computing every n-CHARACTER window, its md5-prefix base hash, and
  * all k affine minima — replacing the interpreted
  * `transform(charNgrams(text), md5)` + HOF-minima stack (measured 20×
  * slower for 1.5M grams at sf0.1). Windows index by UNICODE CODE
  * POINT, matching `substr` semantics on StringType (the HOF path and
  * the DuckDB oracle's `text[i:i+n-1]` both count characters, and the
  * corpus includes multi-byte scripts). Value contract: identical to
  * `minhashSigFromHashes(transform(charNgrams(text, n), md5Hash32), k)`
  * — short texts yield ONE (short) window, duplicates cannot move a
  * minimum.
  */
object CharMinhashSigUtil {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def sig(text: org.apache.spark.unsafe.types.UTF8String, n: Int,
      k: Int): ArrayData = {
    val s = text.toString
    // code-point offset index: window i spans code points [i, i+n)
    val cpCount = s.codePointCount(0, s.length)
    val offs = new Array[Int](cpCount + 1)
    var u = 0
    var c = 0
    while (c < cpCount) {
      offs(c) = u
      u = s.offsetByCodePoints(u, 1)
      c += 1
    }
    offs(cpCount) = s.length
    val total = math.max(cpCount - n + 1, 1)
    val ab = MinhashSigUtil.paramsFor(k)
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val md = digest.get()
    var i = 0
    while (i < total) {
      val end = math.min(i + n, cpCount)
      val w = s.substring(offs(i), offs(end))
      md.reset()
      val d = md.digest(w.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      var q = 0
      while (q < k) {
        val v = (h * ab(2 * q) + ab(2 * q + 1)) % MinhashSigUtil.Prime
        if (v < mins(q)) mins(q) = v
        q += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** `graft_char_minhash_sig(text, n, k)` → `array<long>` of the k
  * affine MinHash minima over character n-gram windows. Codegen emits
  * a static call — stays inside whole-stage codegen.
  */
case class CharMinhashSigExpr(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_char_minhash_sig"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = first.dataType == StringType &&
      second.dataType == IntegerType && third.dataType == IntegerType
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (string, int, int)")
  }

  override protected def nullSafeEval(t: Any, n: Any, k: Any): Any =
    CharMinhashSigUtil.sig(
      t.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      n.asInstanceOf[Int], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n, k) =>
      s"graft.plans.CharMinhashSigUtil.sig($t, $n, $k)")

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): CharMinhashSigExpr = copy(first = f, second = s, third = t)
}

object CharMinhashSigFunctions {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_char_minhash_sig"),
    new ExpressionInfo(classOf[CharMinhashSigExpr].getName,
      "graft_char_minhash_sig"),
    (children: Seq[Expression]) =>
      CharMinhashSigExpr(children(0), children(1), children(2)))
}
