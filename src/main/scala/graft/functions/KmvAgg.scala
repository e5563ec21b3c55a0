package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV (k-minimum-values) distinct sketch as a native
  * `TypedImperativeAggregate`: `kmv_agg(hash, k)` keeps the k SMALLEST
  * DISTINCT hash values seen and emits them sorted ascending as
  * array<long> — the sketch of Bar-Yossef et al. 2002 / Beyer et al.
  * SIGMOD 2007, whose kth value estimates the distinct count and whose
  * union with another sketch is just the k smallest of the two arrays.
  *
  * This is [[TopKAgg]]'s shape pointed the other way (k smallest, not
  * largest) plus DISTINCTNESS — a KMV sketch is a SET of hashes, so
  * duplicates must not occupy buffer slots. The window/sort idiom it
  * replaces (`row_number() OVER (PARTITION BY g ORDER BY h) <= k` over
  * a pre-deduplicated frame) shuffles every distinct element per group;
  * this ships k-long partials that map-side combine, and needs no
  * upstream `distinct()` at all — the buffer dedupes as it selects.
  *
  * Buffer: parallel k-array with linear scans (k ≤ a few hundred by
  * design — the sketch's whole point is smallness); distinctness via a
  * worst-bound check + linear membership scan, O(k) per update worst
  * case but O(1) once the buffer's max is below the incoming hash (the
  * common case on uniform hashes: acceptance probability is k/n). */
case class KmvAgg(
    hash: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvAgg.State] with ExpectsInputTypes {

  import KmvAgg.State

  override def prettyName: String = "kmv_agg"
  override def children: Seq[Expression] = Seq(hash)
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def nullable: Boolean = false // empty group → empty array
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): State = new State(k)

  override def update(buf: State, input: InternalRow): State = {
    val h = hash.eval(input)
    if (h != null) buf.add(h.asInstanceOf[Long])
    buf
  }

  override def merge(a: State, b: State): State = { a.mergeIn(b); a }

  override def eval(buf: State): Any =
    new GenericArrayData(buf.sortedValues)

  override def serialize(buf: State): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): State =
    State.fromBytes(bytes, k)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvAgg =
    copy(hash = newChildren(0))
}

object KmvAgg {

  final class State(val k: Int) {
    var n: Int = 0
    val vs = new Array[Long](k)

    private def maxIndex: Int = {
      var m = 0; var i = 1
      while (i < n) { if (vs(i) > vs(m)) m = i; i += 1 }
      m
    }

    private def contains(h: Long): Boolean = {
      var i = 0
      while (i < n) { if (vs(i) == h) return true; i += 1 }
      false
    }

    def add(h: Long): Unit = {
      if (n < k) { if (!contains(h)) { vs(n) = h; n += 1 } }
      else if (k > 0) {
        val m = maxIndex
        if (h < vs(m) && !contains(h)) vs(m) = h
      }
    }

    def mergeIn(b: State): Unit = {
      var i = 0
      while (i < b.n) { add(b.vs(i)); i += 1 }
    }

    def sortedValues: Array[Long] = {
      val out = java.util.Arrays.copyOf(vs, n)
      java.util.Arrays.sort(out)
      out
    }

    def toBytes: Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 + n * 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(n)
      var i = 0
      while (i < n) { bb.putLong(vs(i)); i += 1 }
      bb.array()
    }
  }

  object State {
    def fromBytes(bytes: Array[Byte], k: Int): State = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val st = new State(k)
      st.n = bb.getInt()
      var i = 0
      while (i < st.n) { st.vs(i) = bb.getLong(); i += 1 }
      st
    }
  }

  /** Registry builder: `kmv_agg(hash, k)` with a foldable k. */
  def builder(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"kmv_agg(hash, k) takes 2 arguments, got ${exprs.length}")
    if (!exprs(1).foldable)
      throw new IllegalArgumentException("kmv_agg: k must be a literal")
    val k = exprs(1).eval() match {
      case n: Number if n.intValue() > 0 => n.intValue()
      case other => throw new IllegalArgumentException(
        s"kmv_agg: k must be a positive integer, got $other")
    }
    KmvAgg(exprs(0), k)
  }
}
