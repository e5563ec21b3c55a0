package graft

import java.nio.file.Files
import java.time.LocalDate
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.config._
import graft.plans.IngestionJob
import graft.sources.InMemoryMarkerLedger
import graft.streaming.StreamingIngest

/** §2.8 streaming extension: the Structured-Streaming ingest
  * (file source + AvailableNow + checkpoint) must ingest exactly the
  * same row set as the batch job (discovery + marker anti-join) across
  * (1) the initial run, (2) an idempotent re-run, and (3) a
  * late-arriving partition — proving the file-source checkpoint carries
  * the marker ledger's per-file contract. */
class IngestStreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSession.spark

  private val tableCfg = TableConfig(
    "HOST_CIG_Lineitem", "Lineitem", isEnabled = true,
    columns = Seq(
      ColumnMeta("l_orderkey", TypeClass.IntLike),
      ColumnMeta("l_linenumber", TypeClass.IntLike),
      ColumnMeta("l_returnflag"),
      ColumnMeta("MissingCol"),
      ColumnMeta("Environment"),
      ColumnMeta("CIGCopyTime"),
      ColumnMeta("CIGProcessed")))

  private def drop(root: String, rel: String): Unit =
    spark.read.parquet(s"${TestSession.sfDir("0.001")}/lineitem.parquet").limit(50)
      .write.mode("overwrite").parquet(s"$root/$rel")

  /** Rows as comparable strings (all columns are strings post-pipeline). */
  private def rowSet(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  private def readStreamOut(outRoot: String, envs: Seq[String]): DataFrame =
    envs.map(e => spark.read.parquet(
        s"$outRoot/${tableCfg.targetName}/env=$e"))
      .reduce(_ unionByName _)

  test("AvailableNow streaming ingest == batch marker ingest across rerun and late file") {
    val root = Files.createTempDirectory("graft-sing").toString
    val outB = Files.createTempDirectory("graft-sing-b").toString
    val outS = Files.createTempDirectory("graft-sing-s").toString
    val ckpt = Files.createTempDirectory("graft-sing-c").toString
    drop(root, "environment=NL/Lineitem/2019/07/03")
    drop(root, "environment=BE/Lineitem/2019/07/04")
    drop(root, "environment=NL/Lineitem/2019/07/01") // before ingestion date
    drop(root, "environment=US/Lineitem/2019/07/03") // env not allowed
    drop(root, "environment=NL/Unknown/2019/07/03")  // entity not in config

    val cfg = IngestionConfig(
      environments = Seq("NL", "BE"),
      ingestionDate = LocalDate.of(2019, 7, 3),
      dataFolder = root,
      tables = Seq(tableCfg))
    val ledger = new InMemoryMarkerLedger
    val sink = new IngestionJob.ParquetSink(outB)

    // run 1: both paths see NL/07-03 + BE/07-04 (old/US/unknown excluded)
    val b1 = IngestionJob.run(spark, cfg, ledger, sink)
    val s1 = StreamingIngest.runAvailableNow(spark, cfg, ckpt, outS)
    assert(b1.rowsWritten == 100)
    assert(s1.map(_.rowsWritten).sum == 100,
      s"streaming run 1 reports: $s1")
    val batch1 = rowSet(spark.read.parquet(s"$outB/${tableCfg.targetName}"))
    val stream1 = rowSet(readStreamOut(outS, cfg.environments))
    assert(stream1 == batch1,
      s"row sets diverge: batch ${batch1.size}, streaming ${stream1.size}")

    // run 2, nothing new: the checkpoint is the marker — zero re-ingest
    val b2 = IngestionJob.run(spark, cfg, ledger, sink)
    val s2 = StreamingIngest.runAvailableNow(spark, cfg, ckpt, outS)
    assert(b2.ingested.isEmpty && b2.skippedByMarker == 2)
    assert(s2.map(_.rowsWritten).sum == 0, s"streaming re-ran files: $s2")
    assert(rowSet(readStreamOut(outS, cfg.environments)) == batch1)

    // late-arriving partition: exactly its rows land, once, on each path
    drop(root, "environment=NL/Lineitem/2019/07/05")
    val b3 = IngestionJob.run(spark, cfg, ledger, sink)
    val s3 = StreamingIngest.runAvailableNow(spark, cfg, ckpt, outS)
    assert(b3.rowsWritten == 50 && b3.ingested.size == 1)
    assert(s3.map(_.rowsWritten).sum == 50, s"late-file streaming: $s3")
    val batch3 = rowSet(spark.read.parquet(s"$outB/${tableCfg.targetName}"))
    val stream3 = rowSet(readStreamOut(outS, cfg.environments))
    assert(batch3.size == 150)
    assert(stream3 == batch3)

    // and the next drain is again a no-op
    val s4 = StreamingIngest.runAvailableNow(spark, cfg, ckpt, outS)
    assert(s4.map(_.rowsWritten).sum == 0)
  }
}
