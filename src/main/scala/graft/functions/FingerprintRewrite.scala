package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Cast, Conv, Expression, Literal, Md5, Substring}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, LongType, StringType}

/** Optimizer rule: rewrite the engine-portable fingerprint idiom
  * `CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT)` into the
  * native [[Md5Fp60]] expression.
  *
  * The composed chain is the form users (and the DuckDB oracles) write
  * because it is expressible in both engines; this rule means writing
  * it in Spark SQL still executes the allocation-free native path —
  * the same contract Catalyst's own `RewriteDistinctAggregates` etc.
  * provide: declarative idiom in, specialized operator out. Proven
  * bit-identical by Md5Fp60Spec, so the rewrite is purely physical. */
object FingerprintRewrite extends Rule[LogicalPlan] {

  private object IntLit {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, _) => Some(v)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // the analyzer inserts a string→binary cast under md5; md5 of a
      // string's UTF-8 bytes is exactly what Md5Fp60 digests
      case Cast(
            Conv(Substring(Md5(Cast(x, BinaryType, _, _)),
              IntLit(1), IntLit(15)), IntLit(16), IntLit(10), _),
            LongType, _, _) if x.dataType == StringType =>
        Md5Fp60(x)
    }
}
