package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Content-defined chunking boundary detection (q228): the Manber /
  * LBFS fingerprint scheme — a fixed-window polynomial hash slides over
  * the character stream and every position whose hash ≡ 0 (mod d) ends a
  * chunk, so boundaries are a function of LOCAL content and survive
  * insertions/deletions that shift absolute offsets (the property
  * fixed-size chunking lacks, and the whole point of CDC dedup).
  *
  * WHY native: the boundary test is per-CHARACTER work; the HOF form
  * (`filter(sequence(w, n), i -> (Σ_k a^k·ascii(substr(s, i-k, 1))) %
  * d = 0)`) evaluates interpreted at ~1 µs per element-op × window
  * re-reads — the q160-measured trap. The native loop keeps the rolling
  * hash in one long (window sums stay ≪ 2^63 for a = 33, w = 8,
  * ASCII codepoints), no string re-slicing, no boxing.
  *
  * The window hash at position i (1-based) is
  *   H(i) = Σ_{k=0..w-1} a^k · c(i-k)
  * — highest power on the OLDEST char — maintained incrementally as
  * H ← a·H + c(i) − a^w·c(i−w). Exact long arithmetic, no modulus, so
  * the DuckDB oracle reproduces H per position from the same literal
  * power table (`CdcBounds.powers`).
  */
object CdcBounds {
  def powers(a: Long, w: Int): IndexedSeq[Long] =
    (0 until w).map(k => (0 until k).foldLeft(1L)((p, _) => p * a))

  def bounds(s: String, w: Int, a: Long, d: Long): Array[Int] = {
    val n = s.length
    if (n < w) return Array.empty
    val aw = (0 until w).foldLeft(1L)((p, _) => p * a)
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var h = 0L
    var i = 0
    while (i < w) { h = h * a + s.charAt(i); i += 1 }
    if (h % d == 0) out += w
    while (i < n) {
      h = h * a + s.charAt(i) - aw * s.charAt(i - w)
      i += 1
      if (h % d == 0) out += i
    }
    out.toArray
  }
}

/** `cdc_bounds(str, w, a, d)` → array<int> of 1-based chunk-END
  * positions. w/a/d must be foldable integer literals (one chunking
  * geometry per query — the q35 lsh_sig discipline). */
case class CdcBoundsExpr(child: Expression, w: Int, a: Long, d: Long)
    extends UnaryExpression with CodegenFallback {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_bounds"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && w > 0 && a > 1 && d > 1)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName takes (STRING, w>0, a>1, d>1), got " +
        s"(${child.dataType}, $w, $a, $d)")
  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(CdcBounds.bounds(input.toString, w, a, d))
  override protected def withNewChildInternal(
      newChild: Expression): CdcBoundsExpr = copy(child = newChild)
}

object CdcBoundsExpr {
  /** SQL builder: literal geometry args are folded at registration. */
  def builder(exprs: Seq[Expression]): Expression = {
    def lit(e: Expression): Long = e match {
      case Literal(v: Int, IntegerType) => v.toLong
      case Literal(v: Long, LongType) => v
      case other => throw new IllegalArgumentException(
        s"cdc_bounds geometry must be an integer literal, got $other")
    }
    CdcBoundsExpr(exprs(0), lit(exprs(1)).toInt, lit(exprs(2)),
      lit(exprs(3)))
  }
}
