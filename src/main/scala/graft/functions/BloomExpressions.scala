package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(bloom_bytes, key)` — membership probe against a
  * serialized [[org.apache.spark.util.sketch.BloomFilter]].
  *
  * This is the runtime-filter / semi-join-pruning primitive made explicit
  * (the reference's marker-ledger guard is the same idea at file
  * granularity — skip work whose key is already known; here the key set
  * is compressed to bits so it broadcasts at 100 TB). The driver builds
  * the filter from the small/dimension side (`df.stat.bloomFilter`), the
  * serialized bits ride into the plan as one binary literal, and the
  * probe runs inside whole-stage codegen against the fact table BEFORE
  * any shuffle — false positives are then eliminated by the exact join,
  * so results are bit-identical to the unpruned plan while the shuffled
  * volume shrinks to ~selectivity × fact size. Same contract as Spark's
  * own InjectRuntimeFilter / DPP, but available to hand-built plans.
  *
  * The left child must be foldable (a literal): the filter is
  * deserialized ONCE per task lazily, not per row, and codegen pins the
  * deserialized object via a reference-object slot.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a BINARY serialized bloom filter, got ${left.dataType}")
    else if (!left.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a foldable (literal) bloom filter argument")
    else if (right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName probes LONG keys, got ${right.dataType}")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val bloom: BloomFilter = {
    val bytes = left.eval(null).asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  override protected def nullSafeEval(b: Any, v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the deserialized filter rides the codegen references array — the
    // generated probe is one virtual call per row, no per-row parsing
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (_, v) => s"${ev.value} = $ref.mightContainLong($v);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
