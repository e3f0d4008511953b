package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Shared kernel for the hashed word-shingle array — one pass over the
  * token array, one MD5 per shingle, zero intermediate shingle STRINGS
  * materialized in the row (the HOF formulation builds every shingle
  * via interpreted `concat_ws(slice(...))` lambdas and then hashes it
  * as a second expression — measured 5-10× slower on the corpus).
  *
  * Value contract (the cross-engine replay device): element i is the
  * first 60 bits of `md5(concat_ws(' ', words[i..i+n)))` — exactly
  * `('0x' || substr(md5(shingle), 1, 15))::BIGINT` in DuckDB, and
  * exactly what the legacy `conv(substring(md5(...), 1, 15), 16, 10)`
  * column computed, so every oracle stays verbatim.
  */
object ShingleHash60Util {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def hashes(words: ArrayData, n: Int, max: Int): ArrayData = {
    val count = words.numElements()
    // mirror wordShingles: sequence(0, greatest(count - n, 0)) windows
    // (short docs yield ONE short shingle), capped like slice(_, 1, max)
    val total = math.min(math.max(count - n + 1, 1), max)
    val out = new Array[Long](total)
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
      var h = 0L
      var k = 0
      while (k < 8) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
      out(i) = h >>> 4 // first 15 hex chars = top 60 bits, non-negative
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `graft_shingle_hash60(words, n, max)` → `array<long>` of 60-bit
  * md5-prefix hashes of the word n-gram shingles. Codegen emits a
  * static call, so the expression stays inside whole-stage codegen.
  */
case class ShingleHash60Expr(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hash60"

  override protected def nullSafeEval(w: Any, n: Any, m: Any): Any =
    ShingleHash60Util.hashes(w.asInstanceOf[ArrayData],
      n.asInstanceOf[Int], m.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, n, m) =>
      s"graft.plans.ShingleHash60Util.hashes($w, $n, $m)")

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): ShingleHash60Expr = copy(first = f, second = s, third = t)
}

object ShingleHashFunctions {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_shingle_hash60"),
    new ExpressionInfo(classOf[ShingleHash60Expr].getName, "graft_shingle_hash60"),
    (children: Seq[Expression]) =>
      ShingleHash60Expr(children(0), children(1), children(2)))
}
