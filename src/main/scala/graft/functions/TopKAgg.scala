package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact per-group top-k as a native `TypedImperativeAggregate`:
  * `topk_agg(score, id, k)` keeps the k largest (score, id) pairs under
  * (score DESC, id ASC) ordering and emits them sorted, as
  * array<array<long>> rows of [score, id].
  *
  * This is the scale-first replacement for the
  * `row_number() OVER (PARTITION BY g ORDER BY s DESC) <= k` idiom: an
  * aggregate SELECTS (O(n·k) compares on a k-sized buffer, k-row
  * partials that map-side combine and merge associatively in the
  * shuffle) where the window SORTS (every group's full row set is
  * shuffled — WindowGroupLimit trims map-side since Spark 3.5, but each
  * retained row still pays the per-partition sort, and the group's rows
  * must co-locate before ranking). At 100 TB with millions of groups
  * the aggregate form ships exactly k·|groups| longs per shuffle side
  * and never sorts anything wider than k.
  *
  * Scores are LongType by design: every ranked quantity in this engine
  * is either an integer count or a ×1e6/×1e9 fixed-point freeze (the
  * oracle-parity discipline), and long compares keep the buffer loop
  * branch-cheap. Ties break to the SMALLER id — deterministic output,
  * same rule as the window idiom's `ORDER BY score DESC, id ASC`.
  */
case class TopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKAgg.State] with ExpectsInputTypes {

  import TopKAgg.State

  override def prettyName: String = "topk_agg"
  override def children: Seq[Expression] = Seq(score, id)
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
  override def nullable: Boolean = false // empty group → empty array
  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)

  override def createAggregationBuffer(): State = new State(k)

  override def update(buf: State, input: InternalRow): State = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.add(s.asInstanceOf[Long], i.asInstanceOf[Long])
    buf
  }

  override def merge(a: State, b: State): State = { a.mergeIn(b); a }

  override def eval(buf: State): Any = {
    val entries: Array[Any] = buf.sortedEntries.map { case (s, i) =>
      new GenericArrayData(Array(s, i)): Any
    }
    new GenericArrayData(entries)
  }

  override def serialize(buf: State): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): State =
    State.fromBytes(bytes, k)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKAgg {

  /** k-bounded selection buffer: parallel arrays + linear worst-scan.
    * k is small (single digits to hundreds), so the O(k) replace scan
    * beats a heap's pointer chasing and the state serializes flat. */
  final class State(val k: Int) {
    var n: Int = 0
    val scores = new Array[Long](k)
    val ids = new Array[Long](k)

    /** true iff (s1, i1) ranks strictly better than (s2, i2) under
      * (score DESC, id ASC). */
    @inline private def better(s1: Long, i1: Long, s2: Long, i2: Long) =
      s1 > s2 || (s1 == s2 && i1 < i2)

    private def worstIndex: Int = {
      var w = 0; var i = 1
      while (i < n) {
        if (better(scores(w), ids(w), scores(i), ids(i))) w = i
        i += 1
      }
      w
    }

    def add(s: Long, i: Long): Unit = {
      if (n < k) { scores(n) = s; ids(n) = i; n += 1 }
      else if (k > 0) {
        val w = worstIndex
        if (better(s, i, scores(w), ids(w))) { scores(w) = s; ids(w) = i }
      }
    }

    def mergeIn(b: State): Unit = {
      var i = 0
      while (i < b.n) { add(b.scores(i), b.ids(i)); i += 1 }
    }

    def sortedEntries: Array[(Long, Long)] =
      (0 until n).map(i => (scores(i), ids(i))).toArray
        .sortBy { case (s, i) => (-s, i) }

    def toBytes: Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 + n * 16)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(n)
      var i = 0
      while (i < n) { bb.putLong(scores(i)); bb.putLong(ids(i)); i += 1 }
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
      while (i < st.n) {
        st.scores(i) = bb.getLong(); st.ids(i) = bb.getLong()
        i += 1
      }
      st
    }
  }

  /** Registry builder: `topk_agg(score, id, k)` with a foldable k. */
  def builder(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 3)
      throw new IllegalArgumentException(
        s"topk_agg(score, id, k) takes 3 arguments, got ${exprs.length}")
    if (!exprs(2).foldable)
      throw new IllegalArgumentException("topk_agg: k must be a literal")
    val k = exprs(2).eval() match {
      case n: Number if n.intValue() > 0 => n.intValue()
      case other => throw new IllegalArgumentException(
        s"topk_agg: k must be a positive integer, got $other")
    }
    TopKAgg(exprs(0), exprs(1), k)
  }
}
