package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `md5_fp60(str)` — the engine's 60-bit md5 fingerprint as ONE native
  * expression: the top 60 bits of md5(str) as a non-negative BIGINT,
  * bit-identical to the composed form
  * `conv(substring(md5(str), 1, 15), 16, 10) CAST BIGINT` (15 hex chars
  * = first 7 digest bytes + the high nibble of the 8th) and to the
  * DuckDB twin `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`.
  *
  * The composed form materializes a 32-char hex string, substrings it,
  * and re-parses base-16 per row; this computes the digest and folds 8
  * bytes into the long directly — the fingerprint is the innermost hot
  * expression of every dedup/sampling/shuffle operator, so the saved
  * allocations multiply. Codegen keeps one MessageDigest per operator
  * instance (mutable state slot), where the built-in md5 path creates
  * one per row inside commons-codec. */
case class Md5Fp60(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_fp60"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName takes a STRING, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    Md5Fp60.fp60(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one digest instance per operator, reset per row — no per-row
    // MessageDigest.getInstance, no hex round-trip
    val md = ctx.addMutableState("java.security.MessageDigest", "md5fp60Md",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) {
              |  throw new RuntimeException(e);
              |}""".stripMargin)
    // freshName: with a non-nullable child, nullSafeCodeGen inlines this
    // block without braces, so a fixed local name would collide when two
    // md5_fp60 calls land in the same codegen scope (Janino error →
    // silent interpreted fallback)
    val dig = ctx.freshName("md5fp60Dig")
    nullSafeCodeGen(ctx, ev, c =>
      s"""$md.reset();
         |byte[] $dig = $md.digest($c.getBytes());
         |${ev.value} = graft.functions.Md5Fp60.fromDigest($dig);
         |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Fp60 =
    copy(child = newChild)
}

object Md5Fp60 {
  /** First 15 hex chars of the digest as a long: bytes 0..6 whole, then
    * the high nibble of byte 7. */
  def fromDigest(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xffL) >>> 4)
  }

  def fp60(bytes: Array[Byte]): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    fromDigest(md.digest(bytes))
  }

  def builder(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 1)
      throw new IllegalArgumentException(
        s"md5_fp60(str) takes 1 argument, got ${exprs.length}")
    Md5Fp60(exprs.head)
  }
}
