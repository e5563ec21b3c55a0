package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** The tier-(c) rung of the custom-operator ladder — a whole-operator
  * extension: logical node + planner [[SparkStrategy]] + physical
  * [[TokenBucketExec]], injected through `SparkSessionExtensions`
  * (`injectPlannerStrategy`). The operator is q322's token-bucket
  * admission recurrence (per-user burst/refill, exact integer µs-token
  * state), the one genuinely non-associative per-key sequential
  * computation in the engine.
  *
  * WHY a physical operator instead of q322's
  * repartition+sortWithinPartitions+mapPartitions: the exec DECLARES
  * its requirements — `requiredChildDistribution` (clustered by
  * user_id) and `requiredChildOrdering` (user, ts, event id) — so
  * EnsureRequirements plans the exchange and sort instead of the query
  * author hand-placing them. That makes the operator compose: if the
  * child is already hash-partitioned by user_id (a bucketed table, an
  * upstream aggregate), Catalyst inserts NO exchange, where the
  * explicit `repartition` form always pays one; and AQE/exchange-reuse
  * see a normal exchange, not an opaque barrier. Same recurrence, same
  * answer (spec-pinned against the mapPartitions form) — but the plan
  * is Catalyst's to optimize. Per-partition state is O(1): one open
  * (user, tokens, prevTs) triple.
  *
  * Input contract: child must expose BIGINT columns `user_id`, `us`
  * (event-time micros) and `event_id` (the deterministic tiebreak);
  * output appends `admitted` (0/1 BIGINT). */
case class TokenBucketNode(
    burstCapUs: Long, tokenUs: Long, child: LogicalPlan,
    // a constructor FIELD, not a val: tree transforms go through
    // copy(child = ...), and a per-instance val would mint a fresh
    // exprId on every copy, orphaning upstream references
    admitted: AttributeReference =
      AttributeReference("admitted", LongType, nullable = false)())
    extends UnaryNode {

  override def output: Seq[Attribute] = child.output :+ admitted

  // the recurrence reads every input column positionally — nothing
  // below may be pruned away
  override def references: AttributeSet = AttributeSet(child.output)
  override def producedAttributes: AttributeSet = AttributeSet(admitted)

  override protected def withNewChildInternal(
      newChild: LogicalPlan): TokenBucketNode = copy(child = newChild)
}

/** Planner strategy: one logical node → one physical operator. */
object TokenBucketStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: TokenBucketNode =>
      TokenBucketExec(n.burstCapUs, n.tokenUs, n.admitted,
        planLater(n.child)) :: Nil
    case _ => Nil
  }
}

case class TokenBucketExec(
    burstCapUs: Long, tokenUs: Long, admitted: AttributeReference,
    child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ admitted

  private def attr(name: String): Attribute =
    child.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"token_bucket child must expose a '$name' column"))

  // EnsureRequirements turns these into exactly the exchange + sort the
  // recurrence needs — or NONE, when the child already satisfies them
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(attr("user_id"))) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(attr("user_id"), Ascending),
      SortOrder(attr("us"), Ascending),
      SortOrder(attr("event_id"), Ascending)))

  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val userIdx = child.output.indexWhere(_.name == "user_id")
    val usIdx = child.output.indexWhere(_.name == "us")
    val cap = burstCapUs
    val unit = tokenUs
    val childOutput = child.output
    val admittedAttr = admitted
    child.execute().mapPartitions({ iter =>
      val joiner = new JoinedRow
      val admitRow = new GenericInternalRow(1)
      val proj = UnsafeProjection.create(
        childOutput :+ admittedAttr, childOutput :+ admittedAttr)
      // first-row state is an explicit boolean, NOT a sentinel user id
      // (a legitimate first user_id == Long.MinValue must still open a
      // fresh bucket at full capacity)
      var first = true
      var user = 0L
      var tokens = 0L
      var prevUs = 0L
      iter.map { row =>
        val u = row.getLong(userIdx)
        val us = row.getLong(usIdx)
        if (first || u != user) { first = false; user = u; tokens = cap }
        else tokens = math.min(cap, tokens + (us - prevUs))
        prevUs = us
        val ok = tokens >= unit
        if (ok) tokens -= unit
        admitRow.setLong(0, if (ok) 1L else 0L)
        proj(joiner(row, admitRow))
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(
      newChild: SparkPlan): TokenBucketExec = copy(child = newChild)
}

object TokenBucket {

  /** DataFrame-level entry: append `admitted` under the token-bucket
    * recurrence. The logical node goes through the injected strategy —
    * the plan is visible to (and plannable by) Catalyst end to end. */
  def apply(df: DataFrame, burstCapUs: Long, tokenUs: Long): DataFrame =
    graft.sparkbridge.PlanBridge.ofRows(df.sparkSession,
      TokenBucketNode(burstCapUs, tokenUs,
        df.queryExecution.analyzed))
}
