package graft

import java.nio.file.{Files, Paths}
import java.time.LocalDate
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.config._
import graft.plans.{FreshnessCheck, IngestionJob}
import graft.sources.{Discovery, InMemoryMarkerLedger}

/** End-to-end ingestion over a synthetic partitioned tree (FIXTURES §1):
  * two environments, a disabled table, an out-of-date file, a malformed
  * path — run twice to prove marker idempotency. */
class IngestionJobSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSession.spark

  private def buildTree(root: String): Unit = {
    val li = spark.read
      .parquet(s"${TestSession.sfDir("0.001")}/lineitem.parquet").limit(50)
    def drop(rel: String): Unit =
      li.write.mode("overwrite").parquet(s"$root/$rel")
    drop("environment=NL/Lineitem/2019/07/03")
    drop("environment=BE/Lineitem/2019/07/04")
    drop("environment=NL/Disabled/2019/07/03")  // disabled table
    drop("environment=NL/Lineitem/2019/07/01")  // before ingestion date
    drop("environment=US/Lineitem/2019/07/03")  // env not in allow-list
    drop("badshape/Lineitem/2019/07/03")        // malformed (no '=')
    drop("environment=NL/Unknown/2019/07/03")   // entity not in config
  }

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
  private val disabledCfg =
    TableConfig("HOST_CIG_Disabled", "Disabled", isEnabled = false,
      columns = Seq(ColumnMeta("l_orderkey")))

  test("ingestion end-to-end: discovery, filters, pipeline, marker idempotency") {
    val root = Files.createTempDirectory("graft-ingest").toString
    val out = Files.createTempDirectory("graft-out").toString
    buildTree(root)

    val cfg = IngestionConfig(
      environments = Seq("NL", "BE"),
      ingestionDate = LocalDate.of(2019, 7, 3),
      dataFolder = root,
      tables = Seq(tableCfg, disabledCfg))
    val ledger = new InMemoryMarkerLedger
    val sink = new IngestionJob.ParquetSink(out)

    val r1 = IngestionJob.run(spark, cfg, ledger, sink)
    // NL/07-03 + BE/07-04 pass every filter; disabled/old/US/unknown don't
    assert(r1.ingested.size == 2, s"ingested: ${r1.ingested}")
    assert(r1.skippedByMarker == 0)
    assert(r1.rowsWritten == 100)

    val written = spark.read.parquet(s"$out/HOST_CIG_Lineitem")
    assert(written.count() == 100)
    assert(written.columns.toSeq == tableCfg.columnNames)
    val envs = written.select("Environment").distinct().collect()
      .map(_.getString(0)).toSet
    assert(envs == Set("NL", "BE"))
    // T1-defaulted column arrives as NULL after P11
    assert(written.filter(written("MissingCol").isNotNull).count() == 0)
    assert(written.select("CIGCopyTime").distinct().head().getString(0)
      == "2019-07-03")

    // second run: everything already marked → no-op
    val r2 = IngestionJob.run(spark, cfg, ledger, sink)
    assert(r2.ingested.isEmpty && r2.skippedByMarker == 2)
    assert(spark.read.parquet(s"$out/HOST_CIG_Lineitem").count() == 100)
  }

  test("mailbox layout end-to-end: datasource dirs, env from prefix") {
    val root = Files.createTempDirectory("graft-mailbox").toString
    val out = Files.createTempDirectory("graft-mailbox-out").toString
    val li = spark.read
      .parquet(s"${TestSession.sfDir("0.001")}/lineitem.parquet").limit(30)
    li.write.mode("overwrite")
      .parquet(s"$root/NL_Hosting_Mailbox/Lineitem/2019/07/03")
    li.write.mode("overwrite")
      .parquet(s"$root/BE_Hosting_Mailbox/Lineitem/2019/07/03")
    val cfg = IngestionConfig(
      environments = Seq("NL_Hosting_Mailbox"), // allow-list is by datasource
      ingestionDate = LocalDate.of(2019, 7, 3),
      dataFolder = root,
      tables = Seq(tableCfg))
    val r = IngestionJob.run(spark, cfg, new InMemoryMarkerLedger,
      new IngestionJob.ParquetSink(out), mailbox = true)
    assert(r.rowsWritten == 30 && r.ingested.size == 1, s"$r")
    val written = spark.read.parquet(s"$out/HOST_CIG_Lineitem")
    // environment column is the datasource prefix before '_'
    assert(written.select("Environment").distinct().head().getString(0) == "NL")
  }

  test("CSV source format rides the same layout through the same pipeline") {
    val root = Files.createTempDirectory("graft-csv").toString
    val out = Files.createTempDirectory("graft-csv-out").toString
    val li = spark.read
      .parquet(s"${TestSession.sfDir("0.001")}/lineitem.parquet").limit(40)
      .selectExpr("l_orderkey", "l_linenumber", "l_returnflag")
    li.coalesce(1).write.mode("overwrite").option("header", "true")
      .csv(s"$root/environment=NL/Lineitem/2019/07/03")
    val cfg = IngestionConfig(
      environments = Seq("NL"),
      ingestionDate = LocalDate.of(2019, 7, 3),
      dataFolder = root,
      tables = Seq(tableCfg))
    val r = IngestionJob.run(spark, cfg, new InMemoryMarkerLedger,
      new IngestionJob.ParquetSink(out), format = "csv")
    assert(r.rowsWritten == 40 && r.ingested.size == 1)
    val written = spark.read.parquet(s"$out/HOST_CIG_Lineitem")
    assert(written.count() == 40)
    assert(written.columns.toSeq == tableCfg.columnNames)
    // CSV arrives all-string; the stringly-typed pipeline is agnostic
    assert(written.select("Environment").distinct().head().getString(0) == "NL")
    intercept[IllegalArgumentException] {
      IngestionJob.run(spark, cfg, new InMemoryMarkerLedger,
        new IngestionJob.ParquetSink(out), format = "avro")
    }
  }

  test("ORC source format ingests through the same pipeline") {
    val root = Files.createTempDirectory("graft-orc").toString
    val out = Files.createTempDirectory("graft-orc-out").toString
    spark.read.parquet(s"${TestSession.sfDir("0.001")}/lineitem.parquet").limit(20)
      .selectExpr("l_orderkey", "l_linenumber", "l_returnflag")
      .write.mode("overwrite").orc(s"$root/environment=NL/Lineitem/2019/07/03")
    val cfg = IngestionConfig(
      environments = Seq("NL"),
      ingestionDate = LocalDate.of(2019, 7, 3),
      dataFolder = root,
      tables = Seq(tableCfg))
    val r = IngestionJob.run(spark, cfg, new InMemoryMarkerLedger,
      new IngestionJob.ParquetSink(out), format = "orc")
    assert(r.rowsWritten == 20 && r.ingested.size == 1)
    assert(spark.read.parquet(s"$out/HOST_CIG_Lineitem").count() == 20)
  }

  test("discovery parses layouts and drops malformed paths") {
    assert(Discovery.parseFilePath(
      "/data/environment=NL/Accounts/2019/12/31/x.parquet", mailbox = false)
      .contains(Discovery.IngestionFile("NL", "Accounts",
        LocalDate.of(2019, 12, 31),
        "/data/environment=NL/Accounts/2019/12/31/x.parquet")))
    // mailbox keeps the FULL datasource (the reference allow-lists on
    // DataSource; T0a shortens to the env prefix inside the pipeline)
    assert(Discovery.parseFilePath(
      "/data/NL_Hosting_Mailbox/BankLinks/2019/12/31/x.parquet",
      mailbox = true).exists(f =>
        f.environment == "NL_Hosting_Mailbox" && f.entity == "BankLinks"))
    assert(Discovery.parseFilePath(
      "/data/badshape/Accounts/2019/12/31/x.parquet", mailbox = false).isEmpty)
    // a stray Hive-partitioned dir with a different key is NOT an env root
    assert(Discovery.parseFilePath(
      "/data/foo=NL/Accounts/2019/07/03/x.parquet", mailbox = false).isEmpty)
    assert(Discovery.parseFilePath(
      "/data/environment=NL/Accounts/2019/xx/31/x.parquet",
      mailbox = false).isEmpty)
  }

  test("Hadoop FileSystem discovery matches the local walk") {
    val root = Files.createTempDirectory("graft-hfs").toString
    buildTree(root)
    val local = Discovery.discover(root, mailbox = false)
    val hadoop = Discovery.discoverHadoop(root, mailbox = false,
      spark.sparkContext.hadoopConfiguration)
    assert(local.nonEmpty && hadoop == local)
  }

  test("date-path construction prunes to explicit day prefixes") {
    val paths = Discovery.datePaths("/d", "NL", "Accounts",
      LocalDate.of(2019, 12, 30), LocalDate.of(2020, 1, 2))
    assert(paths == Seq(
      "/d/environment=NL/Accounts/2019/12/30",
      "/d/environment=NL/Accounts/2019/12/31",
      "/d/environment=NL/Accounts/2020/01/01",
      "/d/environment=NL/Accounts/2020/01/02"))
  }

  test("freshness: static and grace exemptions as anti-joins") {
    import spark.implicits._
    val today = LocalDate.of(2024, 2, 1)
    val latest = Seq(
      ("NL", "Fresh", "2024-02-01"),
      ("NL", "StalePlain", "2024-01-01"),
      ("NL", "StaticOk", "2023-06-01"),
      ("NL", "StaticTooOld", "2019-01-01"),
      ("NL", "InGrace", "2024-01-30"),
      ("NL", "PastGrace", "2024-01-20"))
      .toDF("environment", "source_name", "d")
      .selectExpr("environment", "source_name",
        "CAST(d AS DATE) AS latest_date")
    val stale = FreshnessCheck.findStale(spark, latest,
      staticRules = Seq(
        FreshnessCheck.StaticRule("NL", "StaticOk", LocalDate.of(2023, 1, 1)),
        FreshnessCheck.StaticRule("NL", "StaticTooOld", LocalDate.of(2020, 1, 1))),
      graceRules = Seq(
        FreshnessCheck.GraceRule("NL", "InGrace", 7),
        FreshnessCheck.GraceRule("NL", "PastGrace", 7)),
      today = today)
    val names = stale.select("source_name").collect().map(_.getString(0)).toSet
    assert(names == Set("StalePlain", "StaticTooOld", "PastGrace"))
  }

  test("streaming ingestion: the same cleanup pipeline runs under readStream") {
    val root = Files.createTempDirectory("graft-stream-ingest").toString
    val li = spark.read
      .parquet(s"${TestSession.sfDir("0.001")}/lineitem.parquet").limit(40)
    li.write.mode("overwrite").parquet(s"$root/drop1")
    val schema = spark.read.parquet(s"$root/drop1").schema
    val stream = spark.readStream.schema(schema).parquet(s"$root/drop1")
    val cleaned = graft.transforms.CigTransforms.sentinelsToNull(
      graft.transforms.CigTransforms.pipeline(
        stream, tableCfg, "NL_Hosting", LocalDate.of(2019, 7, 3)))
    val q = cleaned.writeStream.outputMode("append")
      .format("memory").queryName("stream_ingest").start()
    try {
      q.processAllAvailable()
      val out = spark.table("stream_ingest")
      assert(out.count() == 40)
      assert(out.columns.toSeq == tableCfg.columnNames)
      assert(out.select("Environment").distinct().head().getString(0) == "NL")
    } finally q.stop()
  }

  test("config JSON round-trip with typed column specs") {
    val tables = JsonConfig.parseTables(
      """[{"target_name": "HOST_CIG_T", "source": "T", "is_enabled": true,
        |  "columns": ["ID:str:notnull", "Amount:int", "Created:datetime",
        |              "Notes:text", "Plain"]}]""".stripMargin)
    assert(tables.head.columns == Seq(
      ColumnMeta("ID", TypeClass.Str, nullable = false),
      ColumnMeta("Amount", TypeClass.IntLike),
      ColumnMeta("Created", TypeClass.DateTime),
      ColumnMeta("Notes", TypeClass.TextMax),
      ColumnMeta("Plain")))
    val cfg = JsonConfig.parseIngestionConfig(
      """{"environments": ["NL", "BE"], "ingestion_date": "2019-07-03",
        |"data_folder": "/tmp/x"}""".stripMargin, tables)
    assert(cfg.environments == Seq("NL", "BE"))
    assert(cfg.enabledTables.size == 1)
    intercept[IllegalArgumentException] {
      JsonConfig.parseTables("[]")
    }
  }
}
