package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-Sketch (Charikar, Chen & Farach-Colton 2002, "Finding frequent
  * items in data streams" — public algorithm) as a native
  * `TypedImperativeAggregate`: the SIGNED sibling of [[CountMinAgg]].
  * Each input row adds ±1 (a hash-derived sign per depth row) to one
  * counter per hash row; the point estimate for a key is the MEDIAN of
  * its depth sign-corrected counters. Where CMS is biased UP (every
  * collision inflates), Count-Sketch collisions cancel in expectation —
  * the estimator is UNBIASED, the property q341 measures against CMS
  * on the same stream.
  *
  * Counters are plain signed sums — merge-order independent, exactly
  * reproducible in SQL — so the q341 oracle rebuilds the same matrix
  * hash-for-hash (the q175 discipline).
  *
  * Input encoding: ONE `array<long>` per row, element j carrying both
  * the bucket and the sign as `sign_j · (h_j + 1)` (h_j ∈ [0, width);
  * the +1 keeps bucket 0's sign observable). The caller derives h_j and
  * sign_j from engine-portable md5 hashing; the aggregate is
  * hash-agnostic. State: flat `Array[Long](depth·width)`, O(1) per
  * partition, element-wise associative merge. */
case class CountSketchAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with ExpectsInputTypes {

  override def prettyName: String = "count_sketch_agg"
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
        val enc = idx.getLong(j)
        val sign = if (enc < 0) -1L else 1L
        val h = math.abs(enc) - 1
        // defensive clamp as in CountMinAgg
        if (h >= 0 && h < width) buf(j * width + h.toInt) += sign
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

  override def withNewMutableAggBufferOffset(newOffset: Int): CountSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountSketchAgg =
    copy(child = newChildren.head)
}

object CountSketchAgg {

  /** Registry builder: `count_sketch_agg(enc_array, depth, width)` with
    * foldable depth/width literals; enc element j = sign·(bucket+1). */
  def builder(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 3)
      throw new IllegalArgumentException(
        s"count_sketch_agg(enc, depth, width) takes 3 arguments, got ${exprs.length}")
    def lit(i: Int, name: String): Int = {
      if (!exprs(i).foldable)
        throw new IllegalArgumentException(
          s"count_sketch_agg: $name must be a literal")
      exprs(i).eval() match {
        case n: Number if n.intValue() > 0 => n.intValue()
        case other => throw new IllegalArgumentException(
          s"count_sketch_agg: $name must be a positive integer, got $other")
      }
    }
    CountSketchAgg(exprs(0), lit(1, "depth"), lit(2, "width"))
  }
}
