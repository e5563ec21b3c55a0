package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Space-Saving heavy-hitters sketch (Metwally, Agrawal & El Abbadi
  * 2005, public algorithm; merge rule per Agarwal et al. 2012
  * "Mergeable Summaries") as a native `TypedImperativeAggregate`: at
  * most `capacity` (item, count, err) counters; an untracked arrival
  * evicts the minimum counter and inherits its count as the new
  * entry's error bound. Guarantees, independent of input order and of
  * how partials merge:
  *
  *   - every item with true frequency > N/capacity is tracked;
  *   - for every tracked item, true ≤ est and est − err ≤ true.
  *
  * This is the heavy-hitter profile at 100 TB: counters stay O(capacity)
  * per partition, partials merge associatively in the shuffle, and no
  * full (key → count) aggregation ever materializes — the exact
  * group-by this replaces is the thing that OOMs on a hot-key scan.
  *
  * State is three parallel arrays + size; `merge` adds the other side's
  * minimum counter to items it doesn't track (the mergeable-summaries
  * upper bound) and trims back to capacity keeping the largest
  * estimates. Output is the counter list as array<array<long>> rows of
  * [item, est, err], sorted (est desc, item asc) for determinism.
  */
case class SpaceSavingAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SpaceSavingAgg.State] with ExpectsInputTypes {

  import SpaceSavingAgg.State

  override def prettyName: String = "space_saving_agg"
  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def nullable: Boolean = false // empty group → empty array
  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)

  override def createAggregationBuffer(): State = new State(capacity)

  override def update(buf: State, input: InternalRow): State = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: State, b: State): State = { a.mergeIn(b); a }

  override def eval(buf: State): Any = {
    val entries: Array[Any] = buf.sortedEntries.map { case (item, est, err) =>
      new GenericArrayData(Array(item, est, err)): Any
    }
    new GenericArrayData(entries)
  }

  override def serialize(buf: State): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): State =
    State.fromBytes(bytes, capacity)

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SpaceSavingAgg =
    copy(child = newChildren.head)
}

object SpaceSavingAgg {

  /** Counter table: parallel arrays, linear probes — capacity is small
    * (tens), so scans beat hashing on real CPUs and the state
    * serializes flat. */
  final class State(val capacity: Int) {
    var n: Int = 0
    val items = new Array[Long](capacity)
    val counts = new Array[Long](capacity)
    val errs = new Array[Long](capacity)

    private def indexOf(x: Long): Int = {
      var i = 0
      while (i < n) { if (items(i) == x) return i; i += 1 }
      -1
    }

    private def minIndex: Int = {
      var m = 0; var i = 1
      while (i < n) { if (counts(i) < counts(m)) m = i; i += 1 }
      m
    }

    /** Minimum counter of a FULL table — the untracked-item upper
      * bound; 0 while space remains (untracked truly means count 0). */
    def minBound: Long = if (n < capacity) 0L else counts(minIndex)

    def add(x: Long): Unit = {
      val i = indexOf(x)
      if (i >= 0) counts(i) += 1
      else if (n < capacity) {
        items(n) = x; counts(n) = 1L; errs(n) = 0L; n += 1
      } else {
        val m = minIndex
        errs(m) = counts(m)
        items(m) = x
        counts(m) += 1
      }
    }

    /** Mergeable-summaries combine: items tracked on one side only get
      * the other side's min counter added to estimate AND error (their
      * unseen count is at most that bound), then trim to capacity by
      * estimate. */
    def mergeIn(b: State): Unit = {
      val mA = minBound
      val mB = b.minBound
      val all = scala.collection.mutable.LinkedHashMap.empty[Long, (Long, Long)]
      var i = 0
      while (i < n) {
        all(items(i)) = (counts(i) + mB, errs(i) + mB)
        i += 1
      }
      i = 0
      while (i < b.n) {
        val x = b.items(i)
        all.get(x) match {
          case Some((c, e)) =>
            // both sides tracked it: undo the mB bound, add the real count
            all(x) = (c - mB + b.counts(i), e - mB + b.errs(i))
          case None =>
            all(x) = (b.counts(i) + mA, b.errs(i) + mA)
        }
        i += 1
      }
      val kept = all.toArray
        .sortBy { case (item, (c, _)) => (-c, item) }
        .take(capacity)
      n = kept.length
      i = 0
      while (i < n) {
        items(i) = kept(i)._1
        counts(i) = kept(i)._2._1
        errs(i) = kept(i)._2._2
        i += 1
      }
    }

    def sortedEntries: Array[(Long, Long, Long)] =
      (0 until n).map(i => (items(i), counts(i), errs(i))).toArray
        .sortBy { case (item, c, _) => (-c, item) }

    def toBytes: Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 + n * 24)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(n)
      var i = 0
      while (i < n) {
        bb.putLong(items(i)); bb.putLong(counts(i)); bb.putLong(errs(i))
        i += 1
      }
      bb.array()
    }
  }

  object State {
    def fromBytes(bytes: Array[Byte], capacity: Int): State = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val st = new State(capacity)
      st.n = bb.getInt()
      var i = 0
      while (i < st.n) {
        st.items(i) = bb.getLong(); st.counts(i) = bb.getLong()
        st.errs(i) = bb.getLong()
        i += 1
      }
      st
    }
  }

  /** Registry builder: `space_saving_agg(x, capacity)` with a foldable
    * capacity literal. */
  def builder(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"space_saving_agg(x, capacity) takes 2 arguments, got ${exprs.length}")
    if (!exprs(1).foldable)
      throw new IllegalArgumentException(
        "space_saving_agg: capacity must be a literal")
    val cap = exprs(1).eval() match {
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"space_saving_agg: capacity must be a positive integer, got $other")
    }
    if (cap <= 0)
      throw new IllegalArgumentException(
        s"space_saving_agg: capacity must be positive, got $cap")
    SpaceSavingAgg(exprs(0), cap)
  }
}
