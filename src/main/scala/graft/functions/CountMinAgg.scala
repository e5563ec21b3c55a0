package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-Min sketch (Cormode & Muthukrishnan 2005, public algorithm) as
  * a native `TypedImperativeAggregate`: a depth×width counter matrix;
  * each input row increments one counter per hash row; the point
  * estimate for a key is the MINIMUM of its depth counters. Guarantees:
  * est ≥ true always, and est ≤ true + (e/width)·N with probability
  * 1 − e^−depth.
  *
  * Unlike Space-Saving ([[SpaceSavingAgg]], whose counter VALUES depend
  * on merge order), CMS counters are plain sums — `counter[j][h] =
  * Σ count(k : h_j(k) = h)` — so the sketch state is EXACTLY
  * reproducible from the data regardless of partitioning or merge
  * order. The q175 audit exploits that: the DuckDB oracle rebuilds the
  * same counters in SQL and the estimates match hash-for-hash.
  *
  * The caller precomputes the depth bucket indices per row (an
  * `array<long>` column of `md5_fp60(j || ':' || key) % width` values —
  * engine-portable hashing, same construction as [[Md5Fp60]]'s DuckDB
  * twin); the aggregate itself is hash-agnostic. State is the flat
  * `Array[Long](depth*width)` — O(1) per partition, associative
  * element-wise merge in the shuffle, the 100 TB frequency-profile
  * shape where the exact group-by is itself the skew hazard.
  */
case class CountMinAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with ExpectsInputTypes {

  override def prettyName: String = "count_min_agg"
  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType, containsNull = false))
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val idx = v.asInstanceOf[ArrayData]
      val d = math.min(depth, idx.numElements())
      var j = 0
      while (j < d) {
        val h = idx.getLong(j)
        // defensive clamp: a bad caller index must not corrupt a
        // neighboring hash row
        if (h >= 0 && h < width) buf(j * width + h.toInt) += 1L
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
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
    val buf = new Array[Long](depth * width)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(child = newChildren.head)
}

object CountMinAgg {

  /** Registry builder: `count_min_agg(idx_array, depth, width)` with
    * foldable depth/width literals. */
  def builder(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 3)
      throw new IllegalArgumentException(
        s"count_min_agg(idx, depth, width) takes 3 arguments, got ${exprs.length}")
    def lit(i: Int, name: String): Int = {
      if (!exprs(i).foldable)
        throw new IllegalArgumentException(
          s"count_min_agg: $name must be a literal")
      exprs(i).eval() match {
        case n: Number if n.intValue() > 0 => n.intValue()
        case other => throw new IllegalArgumentException(
          s"count_min_agg: $name must be a positive integer, got $other")
      }
    }
    CountMinAgg(exprs(0), lit(1, "depth"), lit(2, "width"))
  }
}
