package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern literal matcher (Aho & Corasick 1975,
  * CACM 18(6) — public construction) for the q333 blocklist audit:
  * ONE pass over the UTF-8 bytes per document finds every occurrence
  * of every pattern in a fixed literal blocklist, instead of one full
  * text scan PER pattern (the `replace`/`regexp_count` form pays
  * |patterns| scans per row — at 100 TB and a realistic 10³–10⁴-term
  * safety blocklist that multiplier is the whole job).
  *
  * Matching semantics are pinned to the SQL-replay oracle: per pattern,
  * GREEDY LEFTMOST NON-OVERLAPPING occurrences — exactly what
  * `(len(t) - len(replace(t, p, ''))) / len(p)` counts — enforced by a
  * per-pattern last-match-end cursor (a match ending at e counts only
  * if it starts after the previous counted end), so bordered patterns
  * ("hash" in "hashash") and nested patterns ("custom" inside
  * "customer") agree with the oracle by construction, not by pattern
  * curation.
  *
  * The automaton (dense byte-indexed goto table + BFS failure links,
  * pattern-id end lists folded through the suffix chain) is built once
  * per JVM in the companion and shared by every task — patterns are a
  * fixed foldable blocklist, the build is O(Σ|p|·256) on a ~hundred-
  * state machine. Byte convention: corpora are ASCII (byte ==
  * codepoint == DuckDB character), spec-pinned like [[CharStats]]. */
object MultiMatch {

  /** The fixed demo blocklist: high/low-frequency corpus vocabulary,
    * a bordered pattern ("hash"), a nested pair ("custom" ⊂
    * "customer"), and a never-occurring probe ("qzx") so zero counts,
    * self-overlap, and containment are all exercised on real data. */
  val Blocklist: Seq[String] = Seq(
    "key", "scan", "slow", "fast", "table", "value", "merge", "batch",
    "spark", "window", "order", "data", "column", "join", "query",
    "filter", "vector", "stream", "hash", "custom", "customer", "qzx")

  val StatsType: StructType = StructType(Seq(
    StructField("n_hits", LongType, nullable = false),
    StructField("n_patterns", LongType, nullable = false),
    StructField("max_pattern_hits", LongType, nullable = false)))

  /** Dense-goto Aho–Corasick automaton over bytes. */
  final class Automaton(patterns: Seq[String]) {
    private val patLens: Array[Int] = patterns.map(_.length).toArray
    val nPatterns: Int = patterns.length

    private val goto_ = mutable.ArrayBuffer[Array[Int]](Array.fill(256)(-1))
    private val ends = mutable.ArrayBuffer[List[Int]](Nil)

    patterns.zipWithIndex.foreach { case (p, id) =>
      var s = 0
      p.getBytes("UTF-8").foreach { b =>
        val c = b & 0xff
        if (goto_(s)(c) == -1) {
          goto_(s)(c) = goto_.length
          goto_ += Array.fill(256)(-1)
          ends += Nil
        }
        s = goto_(s)(c)
      }
      ends(s) = id :: ends(s)
    }

    // BFS failure links; fold end lists through the suffix chain and
    // complete the goto function so the scan loop is branch-free.
    private val fail = new Array[Int](goto_.length)
    locally {
      val queue = mutable.Queue[Int]()
      var c = 0
      while (c < 256) {
        val nxt = goto_(0)(c)
        if (nxt == -1) goto_(0)(c) = 0
        else { fail(nxt) = 0; queue.enqueue(nxt) }
        c += 1
      }
      while (queue.nonEmpty) {
        val s = queue.dequeue()
        ends(s) = ends(s) ::: ends(fail(s))
        var c = 0
        while (c < 256) {
          val nxt = goto_(s)(c)
          if (nxt == -1) goto_(s)(c) = goto_(fail(s))(c)
          else { fail(nxt) = goto_(fail(s))(c); queue.enqueue(nxt) }
          c += 1
        }
      }
    }

    private val gotoFlat: Array[Int] = {
      val a = new Array[Int](goto_.length * 256)
      var s = 0
      while (s < goto_.length) {
        System.arraycopy(goto_(s), 0, a, s * 256, 256)
        s += 1
      }
      a
    }
    private val endIds: Array[Array[Int]] = ends.map(_.toArray).toArray

    /** One pass; greedy leftmost non-overlapping counts per pattern. */
    def stats(bytes: Array[Byte]): GenericInternalRow = {
      val counts = new Array[Long](nPatterns)
      val lastEnd = Array.fill(nPatterns)(-1)
      var s = 0
      var i = 0
      while (i < bytes.length) {
        s = gotoFlat(s * 256 + (bytes(i) & 0xff))
        val ids = endIds(s)
        var j = 0
        while (j < ids.length) {
          val id = ids(j)
          if (i - patLens(id) + 1 > lastEnd(id)) {
            counts(id) += 1
            lastEnd(id) = i
          }
          j += 1
        }
        i += 1
      }
      var nHits = 0L
      var nPat = 0L
      var maxHits = 0L
      var k = 0
      while (k < nPatterns) {
        val c = counts(k)
        nHits += c
        if (c > 0) nPat += 1
        if (c > maxHits) maxHits = c
        k += 1
      }
      new GenericInternalRow(Array[Any](nHits, nPat, maxHits))
    }
  }

  lazy val blocklistAutomaton: Automaton = new Automaton(Blocklist)
}

/** `multi_match_stats(string)` →
  * struct<n_hits, n_patterns, max_pattern_hits> over
  * [[MultiMatch.Blocklist]]. */
case class MultiMatchStats(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = MultiMatch.StatsType
  override def prettyName: String = "multi_match_stats"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName takes STRING, got ${child.dataType}")
  override protected def nullSafeEval(input: Any): Any =
    MultiMatch.blocklistAutomaton.stats(
      input.asInstanceOf[UTF8String].getBytes)
  override protected def withNewChildInternal(
      newChild: Expression): MultiMatchStats = copy(child = newChild)
}
