package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Element-wise MAX merge of HLL register VECTORS — [[HllAgg]]'s
  * sibling for when the rows already carry whole m-register arrays
  * (union-of-sketches, e.g. q380's HyperBall ball growth: each node
  * max-merges its neighbors' full register vectors every round).
  * Feeding arrays through [[HllAgg]] would mean exploding them back to
  * (bucket, rank) pairs — |rows|·m exploded rows per round where this
  * aggregate moves |rows| array payloads and combines them map-side
  * (measured 28.5 s → relational vs array form at sf0.1 on q380).
  * State and merge law are identical to [[HllAgg]] (plain per-bucket
  * max — order-independent, exactly reproducible relationally), so the
  * DuckDB oracle twin remains `GROUP BY (key, bucket) → max(rank)`. */
case class HllMergeAgg(
    child: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with ExpectsInputTypes {

  override def prettyName: String = "hll_merge_agg"
  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType, containsNull = false))
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](m)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val regs = v.asInstanceOf[ArrayData]
      val n = math.min(regs.numElements(), m)
      var i = 0
      while (i < n) {
        val r = regs.getLong(i)
        if (r > buf(i)) buf(i) = r
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(x => x: Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val buf = new Array[Long](m)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllMergeAgg =
    copy(child = newChildren.head)
}

object HllMergeAgg {

  /** Registry builder: `hll_merge_agg(regs_array, m)` with a foldable m. */
  def builder(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"hll_merge_agg(regs, m) takes 2 arguments, got ${exprs.length}")
    if (!exprs(1).foldable)
      throw new IllegalArgumentException("hll_merge_agg: m must be a literal")
    val m = exprs(1).eval() match {
      case n: Number if n.intValue() > 0 => n.intValue()
      case other => throw new IllegalArgumentException(
        s"hll_merge_agg: m must be a positive integer, got $other")
    }
    HllMergeAgg(exprs(0), m)
  }
}
