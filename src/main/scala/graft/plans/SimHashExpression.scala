package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Shared simhash kernel — called from both the interpreted path and the
  * generated code (codegen emits a static call, so the expression stays
  * inside the whole-stage-codegen pipeline with zero closure capture).
  *
  * The per-token 64-bit hash is the first 8 bytes of the token's MD5
  * (the md5-prefix device from the minhash family) — chosen over a
  * murmur composition because an external engine can replay it
  * (`('0x' || substr(md5(t), 1, 16))::UBIGINT`), which is what gives
  * dedup_simhash and text_fingerprint full value oracles. One digest
  * instance per thread; per-token cost is one MD5 block.
  */
object SimHash64Util {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 8 md5 bytes, big-endian — the bit pattern of the first 16
    * hex chars of `md5(t)`.
    */
  def tokenHash64(t: String): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }

  def hash(tokens: ArrayData): Long = {
    val acc = new Array[Int](64)
    val n = tokens.numElements()
    var j = 0
    while (j < n) {
      if (!tokens.isNullAt(j)) {
        val h = tokenHash64(tokens.getUTF8String(j).toString)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      j += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

/** 64-bit SimHash over an `array<string>` token column as a native
  * expression — replaces the Scala UDF on the hot dedup path (no
  * encoder/serialization boundary, participates in codegen).
  * NULL handling deliberately differs from the legacy UDF: a NULL token
  * array yields NULL (null-intolerant expression), not the UDF's -1L —
  * null-text docs no longer cluster together as fake hamming-0 dups.
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHash64Util.hash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SimHash64Util.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

object SimHashFunctions {
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_simhash64"),
    new ExpressionInfo(classOf[SimHash64Expr].getName, "graft_simhash64"),
    (children: Seq[Expression]) => SimHash64Expr(children.head))
}
