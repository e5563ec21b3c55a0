package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** THE MinHash permutation family — single source of truth shared by the
  * expression form (`DedupOps.minhashSignatures`), the generated DuckDB
  * oracle (`OracleGen.q31MinhashLsh` via DedupOps' forwarders), and the
  * native aggregate below. a_i ≤ 2·perms+3 keeps a_i·x well under 2^63
  * for x < [[Prime]] (ANSI-safe, no overflow on either engine). */
object MinHashPerms {
  val Prime = 2147483647L // 2^31 - 1
  def permA(i: Int): Long = 2L * i + 3
  def permB(i: Int): Long = 7L * i + 1
}

/** Native MinHash signature aggregate: ONE buffer holding all `perms`
  * permutation minima, updated with a primitive loop per input row —
  * versus the column-expression form (16 separate `min(...)` aggregate
  * expressions), which pays per-expression dispatch and 16 buffer slots
  * with independent null tracking.
  *
  * Semantics match the expression form used by
  * `graft.operators.DedupOps.minhashSignatures` (same [[MinHashPerms]]
  * family, same 60-bit input hash domain): the spec asserts
  * bit-equality of signatures, and the bench note on which form wins at
  * which scale lives next to the call site. NULL inputs are ignored
  * like any aggregate, and a group with no non-null input yields NULL
  * (the 16-min() form's per-slot NULLs collapse to one NULL array).
  *
  * This is the custom-`Aggregator`/`TypedImperativeAggregate` tier of
  * the extension ladder — used when the aggregate's state is a small
  * fixed vector that built-in per-column aggregates would fragment.
  * The buffer serializes as packed little-endian longs for shuffle
  * (partial aggregation works: `merge` is element-wise min).
  */
case class MinHashAgg(
    child: Expression,
    perms: Int,
    prime: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with ExpectsInputTypes {

  override def prettyName: String = "minhash_agg"
  override def children: Seq[Expression] = Seq(child)
  // Seq[DataType] <: Seq[AbstractDataType] (AbstractDataType is
  // private[sql]; the public subtype suffices for the override)
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def nullable: Boolean = true // NULL for all-null/empty groups
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  import MinHashPerms.{permA, permB}

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(perms)(Long.MaxValue)

  override def update(buf: Array[Long], input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      var i = 0
      while (i < perms) {
        val h = (x * permA(i) + permB(i)) % prime
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < perms) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    // untouched buffer ⟺ no non-null input: every real update writes
    // h < Prime < Long.MaxValue into slot 0
    if (buf(0) == Long.MaxValue) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(perms * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Array.fill(perms)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren.head)
}

object MinHashAgg {
  /** Registry builder: `minhash_agg(x, perms, prime)` with foldable
    * perms/prime literals. The analyzer wraps the returned
    * AggregateFunction in an AggregateExpression itself, exactly as it
    * does for built-in aggregates; x's LongType is enforced by
    * ExpectsInputTypes at analysis, arity/foldability here. */
  def builder(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 3)
      throw new IllegalArgumentException(
        s"minhash_agg(x, perms, prime) takes 3 arguments, got ${exprs.length}")
    if (!exprs(1).foldable || !exprs(2).foldable)
      throw new IllegalArgumentException(
        "minhash_agg: perms and prime must be literals")
    MinHashAgg(exprs(0),
      exprs(1).eval().asInstanceOf[Number].intValue(),
      exprs(2).eval().asInstanceOf[Number].longValue())
  }
}
