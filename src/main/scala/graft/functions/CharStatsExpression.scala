package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native per-document character statistics for the q328 gibberish gate:
  * ONE tight JVM loop over the UTF-8 bytes per row returning everything
  * the gate needs — length, distinct-byte class count, Σ count² (the
  * Simpson-diversity numerator) and the longest identical-byte run.
  *
  * WHY native (the [[BlobStats]] argument): the exploded form ships one
  * (doc_id, char) row per CHARACTER through an exchange and pays a
  * two-level aggregate just to recover per-doc scalars, and the
  * higher-order-function form evaluates interpreted per element. The
  * loop reads the byte array in place — no explode, no shuffle, no
  * boxing — so the gate runs at parquet-scan speed; the exploded form
  * is kept spec-side as the equivalence reference.
  *
  * Byte convention: "character" means UTF-8 BYTE. The corpora are
  * ASCII (letters + spaces, ASCII plants), where byte == codepoint ==
  * DuckDB's string_split(text, '') element, so the oracle's
  * character-level SQL replay agrees exactly (spec-pinned). Diversity
  * math stays in integers (Simpson needs no logarithm — that is the
  * point of choosing it over Shannon here: zero libm, exact parity). */
object CharStats {

  val CharStatsType: StructType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_classes", LongType, nullable = false),
    StructField("sumsq", LongType, nullable = false),
    StructField("max_run", LongType, nullable = false)))

  def charStats(bytes: Array[Byte]): GenericInternalRow = {
    val counts = new Array[Long](256)
    var maxRun = 0L
    var run = 0L
    var prev = -1
    var i = 0
    while (i < bytes.length) {
      val v = bytes(i) & 0xff
      counts(v) += 1
      if (v == prev) run += 1
      else { prev = v; run = 1L }
      if (run > maxRun) maxRun = run
      i += 1
    }
    var classes = 0L
    var sumsq = 0L
    var c = 0
    while (c < 256) {
      val k = counts(c)
      if (k > 0) { classes += 1; sumsq += k * k }
      c += 1
    }
    new GenericInternalRow(
      Array[Any](bytes.length.toLong, classes, sumsq, maxRun))
  }
}

/** `char_run_stats(string)` → struct<n_chars, n_classes, sumsq, max_run>. */
case class CharRunStats(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = CharStats.CharStatsType
  override def prettyName: String = "char_run_stats"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName takes STRING, got ${child.dataType}")
  override protected def nullSafeEval(input: Any): Any =
    CharStats.charStats(input.asInstanceOf[UTF8String].getBytes)
  override protected def withNewChildInternal(
      newChild: Expression): CharRunStats = copy(child = newChild)
}
