package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.Compaction

class CompactionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSession.spark

  test("compaction collapses a many-small-file directory, preserving rows and content") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact")
      .resolve("t").toString
    val src = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    src.repartition(40).write.parquet(dir)
    val before = spark.read.parquet(dir)
    val wantRows = before.count()
    val wantSum = before.selectExpr(
      "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS STRING)").head().getString(0)

    val r = Compaction.compact(spark, dir, targetFileBytes = 512L * 1024 * 1024)
    assert(r.filesBefore >= 40 && r.filesAfter == 1,
      s"expected 1 output file, got $r")
    assert(r.rows == wantRows)
    val after = spark.read.parquet(dir)
    assert(after.count() == wantRows)
    assert(after.selectExpr(
      "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS STRING)")
      .head().getString(0) == wantSum)
    // idempotent: compacting a compact directory is a no-op shape-wise
    val r2 = Compaction.compact(spark, dir, targetFileBytes = 512L * 1024 * 1024)
    assert(r2.filesAfter == 1 && r2.rows == wantRows)
  }
}
