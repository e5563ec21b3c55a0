package graft.sparkbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Builds a DataFrame from a raw LogicalPlan (needed to hand a custom
  * logical node — [[graft.plans.TokenBucketNode]] — to the session's
  * planner; the public Dataset API has no such entry point).
  *
  * `classic.Dataset.ofRows` is `private[sql]`, so the call goes through
  * the session's own SQL artifact machinery instead: a temp view cannot
  * carry an unresolved custom node, but `SparkSession.sessionState`'s
  * executePlan + a `Dataset` constructor via reflection is stable
  * public-bytecode surface (the same route third-party Spark
  * extensions use when they stay outside the `org.apache.spark.sql`
  * package). */
object PlanBridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame = {
    val m = Class.forName("org.apache.spark.sql.classic.Dataset")
      .getMethod("ofRows",
        Class.forName("org.apache.spark.sql.classic.SparkSession"),
        classOf[LogicalPlan])
    m.invoke(null, spark, plan).asInstanceOf[DataFrame]
  }
}
