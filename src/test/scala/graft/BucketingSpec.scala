package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Scale-evidence: bucketed tables make repeated fact-to-fact joins
  * shuffle-free — the co-location strategy for the 100 TB case where
  * lineitem⋈orders can no longer broadcast. Asserts on the PLAN (no
  * Exchange on either side of the SortMergeJoin), not just the result.
  */
class BucketingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSession.spark

  test("bucketed join plans without exchanges; result matches unbucketed") {
    // warehouse dir is a static conf — TestSession points it at a tmpdir
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_buckets")
    spark.sql("USE graft_buckets")
    try {
      val dir = TestSession.sfDir("0.001")
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      val ord = spark.read.parquet(s"$dir/orders.parquet")
      li.write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("li_b")
      ord.write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("ord_b")

      // force SMJ (what a 100 TB join uses) so bucketing is load-bearing
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_b")
        .join(spark.table("ord_b"),
          spark.table("li_b")("l_orderkey") === spark.table("ord_b")("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"),
        s"bucketed join should be shuffle-free, got:\n$plan")

      val n = joined.count()
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      val expected = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .count()
      assert(n == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
      spark.sql("USE default")
    }
  }
}
