package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.Compaction

class CompactionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSession.spark

  test("compaction collapses a many-small-file directory, preserving rows and content") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact")
      .resolve("t").toString
    val src = spark.read.parquet(s"${TestSession.sfDir("0.001")}/lineitem.parquet")
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

  test("compaction rejects partitioned (subdirectory) layouts instead of flattening them") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact-part")
      .resolve("t").toString
    spark.read.parquet(s"${TestSession.sfDir("0.001")}/lineitem.parquet")
      .write.partitionBy("l_returnflag").parquet(dir)
    val e = intercept[IllegalArgumentException] {
      Compaction.compact(spark, dir)
    }
    assert(e.getMessage.contains("subdirectories"))
    // layout untouched by the rejected call
    assert(spark.read.parquet(dir).columns.contains("l_returnflag"))
  }

  test("recover restores the live directory after a crash between the swap renames") {
    import org.apache.hadoop.fs.Path
    val dir = java.nio.file.Files.createTempDirectory("graft-compact-rec")
      .resolve("t").toString
    val src = spark.read.parquet(s"${TestSession.sfDir("0.001")}/region.parquet")
    src.write.parquet(dir)
    val wantRows = src.count()
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate the crash window: live moved aside, tmp never moved in
    assert(fs.rename(new Path(dir), new Path(dir + "._compact_old")))
    assert(!fs.exists(new Path(dir)))
    assert(Compaction.recover(spark, dir))
    assert(spark.read.parquet(dir).count() == wantRows)
    assert(!fs.exists(new Path(dir + "._compact_old")))
    // healthy state: recover is a no-op that just clears stray dirs
    assert(!Compaction.recover(spark, dir))
  }
}
