package graft.plans

import java.time.{LocalDate, LocalDateTime}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{count, lit}

import graft.config.{IngestionConfig, TableConfig}
import graft.sources.{Discovery, MarkerEntry, MarkerLedger}
import graft.transforms.CigTransforms

/** The end-to-end ingestion job: the Spark re-expression of the
  * reference's Luigi DAG (`main.py` EP1 / `main_mailbox.py` EP2).
  *
  * Plan per run:
  *  1. discover ingestion files under the data root (driver-side LIST with
  *     explicit date-pruned prefixes — no executor listing),
  *  2. filter: entity ∈ config (P3), environment allow-list (P4),
  *     date ≥ ingestion_date + is_enabled (P5),
  *  3. anti-join against the marker ledger (P10) — already-complete
  *     (file, env, table) triples are skipped, making re-runs idempotent,
  *  4. per (table, environment): ONE `spark.read.parquet(files…)` over all
  *     that table's remaining files (Spark's per-file tasks subsume the
  *     reference's one-file-one-task fan-out), then the fused T0→T8
  *     cleanup pipeline, P11 sentinel→NULL, and the sink append,
  *  5. touch the marker for each completed file.
  *
  * Sinks are pluggable: parquet for tests/this container, JDBC writer
  * (`df.write.mode(Append).jdbc` with `batchsize`/`numPartitions`) in
  * production — same contract as the reference's batched ODBC insert
  * (`ParquetFileInsertion.py:60-65`), including its at-least-once
  * semantics on task retry (marker touched only after a full success).
  *
  * Scale: the whole pipeline is narrow (scan → project), so throughput is
  * bounded by input split count × sink write speed; there is no shuffle.
  */
object IngestionJob {

  /** Pluggable sink: receives the cleaned frame for (table, environment). */
  trait Sink {
    def write(df: DataFrame, config: TableConfig, environment: String): Unit
  }

  /** Parquet sink; with `partitionByEnvironment` the output mirrors the
    * input's Hive layout (`.../Environment=NL/...`) so downstream reads
    * prune by environment for free. */
  final class ParquetSink(outRoot: String,
      partitionByEnvironment: Boolean = false) extends Sink {
    override def write(df: DataFrame, config: TableConfig,
        environment: String): Unit = {
      val w = df.write.mode(SaveMode.Append)
      (if (partitionByEnvironment) w.partitionBy("Environment") else w)
        .parquet(s"$outRoot/${config.targetName}")
    }
  }

  final class JdbcSink(url: String, props: java.util.Properties,
      batchSize: Int = 10000, numPartitions: Int = 8) extends Sink {
    /** Writer options actually applied — SQL Server URLs pick up the
      * dialect set (driver, batching, isolation; JdbcPathSpec pins the
      * exact map), other backends just the batch size. */
    val writerOptions: Map[String, String] =
      if (graft.sources.SqlServerDialect.isSqlServer(url))
        graft.sources.SqlServerDialect.writerOptions(batchSize)
      else Map("batchsize" -> batchSize.toString)
    override def write(df: DataFrame, config: TableConfig,
        environment: String): Unit =
      df.coalesce(numPartitions)
        .write.mode(SaveMode.Append)
        .options(writerOptions)
        .jdbc(url, s"raw.${config.targetName}", props)
  }

  final case class RunReport(
      discovered: Int, skippedByMarker: Int, ingested: Seq[String],
      rowsWritten: Long)

  /** Source formats the job can ingest. The reference is parquet-only;
    * CSV/JSON ride the same partition layout and — because the cleanup
    * pipeline is deliberately stringly-typed (SURVEY §1.2) — CSV's
    * all-string schema needs no special casing: the pipeline casts every
    * column to string regardless. */
  val SourceFormats: Map[String, (String, Map[String, String])] = Map(
    "parquet" -> (".parquet", Map.empty),
    "orc" -> (".orc", Map.empty),
    "csv" -> (".csv", Map("header" -> "true")),
    "json" -> (".json", Map.empty))

  def run(spark: SparkSession, cfg: IngestionConfig, ledger: MarkerLedger,
      sink: Sink, mailbox: Boolean = false,
      format: String = "parquet"): RunReport = {

    val (ext, readOptions) = SourceFormats.getOrElse(format,
      throw new IllegalArgumentException(
        s"unknown source format '$format' (expected one of ${SourceFormats.keys.mkString(", ")})"))

    // first config wins per source, as in the reference's enrich-first-
    // match (`main.py:82-84`); toMap would silently keep the LAST and
    // swap the target table
    val byEntity: Map[String, TableConfig] =
      cfg.enabledTables.groupBy(_.source).map { case (src, cfgs) =>
        if (cfgs.size > 1)
          System.err.println(s"[ingest] WARN: ${cfgs.size} enabled tables " +
            s"share source '$src'; using first (${cfgs.head.targetName})")
        src -> cfgs.head
      }

    // 1-2. discover + filter (driver-side; file lists are small metadata)
    val files = Discovery.discover(cfg.dataFolder, mailbox, ext)
      .filter(f => byEntity.contains(f.entity))           // P3 semi-join
      .filter(f => cfg.environments.contains(f.environment)) // P4
      .filter(f => !f.date.isBefore(cfg.ingestionDate))   // P5

    // 3. marker anti-join (P10): ONE ledger read snapshotted to a set —
    // a per-file exists() would be N JDBC round-trips on the JDBC ledger
    val doneKeys: Set[(String, String, String)] =
      ledger.all.map(e => (e.parquetSource, e.environment, e.targetTable))
        .toSet
    val (done, todo) = files.partition { f =>
      doneKeys((f.path, f.environment, byEntity(f.entity).targetName))
    }

    // 4. one read+pipeline per (table, environment) over all its files
    var rows = 0L
    val ingested = scala.collection.mutable.ArrayBuffer[String]()
    todo.groupBy(f => (f.entity, f.environment)).toSeq.sortBy(_._1)
      .foreach { case ((entity, env), group) =>
        val table = byEntity(entity)
        val raw = spark.read.format(format).options(readOptions)
          .load(group.map(_.path): _*)
        val cleaned = CigTransforms.sentinelsToNull(
          CigTransforms.pipeline(raw, table, env, cfg.ingestionDate))
        // row count piggybacks on the write via an observed metric —
        // no second scan
        val obs = new org.apache.spark.sql.Observation()
        sink.write(cleaned.observe(obs, count(lit(1)).as("n")), table, env)
        rows += obs.get("n").asInstanceOf[Long]
        // 5. mark each file complete (after the whole group's write, as
        // the reference touches after a successful task run)
        group.foreach { f =>
          ledger.touch(MarkerEntry(f.path, table.targetName, env, f.date,
            LocalDateTime.now()))
          ingested += f.path
        }
      }
    RunReport(files.size, done.size, ingested.toSeq, rows)
  }
}
