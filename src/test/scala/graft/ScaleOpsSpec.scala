package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ScaleOps

class ScaleOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSession.spark
  val dir = "/root/testdata/sf0.001"

  test("salted two-phase aggregation equals the naive aggregate") {
    import org.apache.spark.sql.functions._
    val salted = ScaleOps.saltedTokenCounts(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val naive = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == naive)
  }

  test("flatMapGroupsWithState sessionization equals the window-function form") {
    val windowed = ScaleOps.sessionize(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val stateful = ScaleOps.sessionizeStateful(spark, dir).collect()
      .map(s => (s.user_id, s.session_idx, s.n_events)).toSet
    assert(stateful == windowed)
    assert(windowed.nonEmpty)
    // sessions actually split: more sessions than users
    val users = windowed.map(_._1).size
    assert(windowed.size > spark.read.parquet(s"$dir/events.parquet")
      .select("user_id").distinct().count())
  }
}
