package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** HyperLogLog register vector (Flajolet et al. 2007, public algorithm)
  * as a native `TypedImperativeAggregate`: `m` registers, each holding
  * the MAXIMUM observed rank of the hash suffixes that landed in it.
  * The distinct-count estimate is derived from the registers by the
  * caller (harmonic mean + linear-counting small-range correction) —
  * the aggregate itself only maintains the max-rank vector, which is
  * the mergeable, shuffle-friendly part.
  *
  * Like [[CountMinAgg]] (and unlike Space-Saving), the state is
  * merge-order INDEPENDENT: `register[j] = max(rank(x) : bucket(x) = j)`
  * is a plain per-bucket MAX, exactly reproducible from the data
  * regardless of partitioning. The q224 audit exploits that: the DuckDB
  * oracle rebuilds the same registers with `GROUP BY bucket → max(rank)`
  * and the estimates match bit-for-bit.
  *
  * The caller precomputes `(bucket, rank)` per row as an `array<long>`
  * (engine-portable: bucket = low bits of `md5_fp60(key)`, rank =
  * trailing-zero count of the remaining bits + 1 via pure bit
  * arithmetic — see `ProfileOps.hllAudit`); the aggregate is
  * hash-agnostic. State is a flat `Array[Long](m)` — O(m) per
  * partition, element-wise max merge in the shuffle: the 100 TB
  * distinct-count shape where the exact `count(DISTINCT key)` is itself
  * a full key shuffle.
  */
case class HllAgg(
    child: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with ExpectsInputTypes {

  override def prettyName: String = "hll_agg"
  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType, containsNull = false))
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](m)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val pair = v.asInstanceOf[ArrayData]
      if (pair.numElements() >= 2) {
        val b = pair.getLong(0)
        val r = pair.getLong(1)
        // defensive clamp: a bad caller bucket must not write out of range
        if (b >= 0 && b < m && r > buf(b.toInt)) buf(b.toInt) = r
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

  override def withNewMutableAggBufferOffset(newOffset: Int): HllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllAgg =
    copy(child = newChildren.head)
}

object HllAgg {

  /** Registry builder: `hll_agg(pair_array, m)` with a foldable m. */
  def builder(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"hll_agg(pair, m) takes 2 arguments, got ${exprs.length}")
    if (!exprs(1).foldable)
      throw new IllegalArgumentException("hll_agg: m must be a literal")
    val m = exprs(1).eval() match {
      case n: Number if n.intValue() > 0 => n.intValue()
      case other => throw new IllegalArgumentException(
        s"hll_agg: m must be a positive integer, got $other")
    }
    HllAgg(exprs(0), m)
  }
}
