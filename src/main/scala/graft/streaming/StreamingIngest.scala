package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.config.{IngestionConfig, TableConfig}
import graft.transforms.CigTransforms

/** Structured-Streaming form of the ingestion job (§2.8's streaming
  * extension): `readStream` file source globbed over the reference
  * layout `environment=E/Entity/yyyy/MM/dd/` (three wildcard date
  * levels), `Trigger.AvailableNow`, parquet sink.
  *
  * The file-source checkpoint IS the marker ledger: Spark's
  * FileStreamSource log records every processed file, so a re-run
  * ingests nothing and a late-arriving file (a new path under the glob)
  * is picked up exactly once on the next run — the same per-file
  * idempotency contract the batch job implements with the marker
  * anti-join (reference `main.py:46-48` semantics,
  * `check_mark...` per-file markers). IngestStreamingSpec pins the
  * equivalence: batch-with-ledger and streaming-with-checkpoint ingest
  * identical row sets across initial run, no-op re-run, and late file.
  *
  * One stream per (environment, entity), mirroring the reference's
  * per-(env, entity) Luigi tasks and the batch job's group-by: the
  * cleanup pipeline stamps environment-derived literals, and the
  * parquet sink's `_spark_metadata` commit log is per output directory,
  * so per-pair streams keep both exact. `AvailableNow` drains whatever
  * is present then stops — the scheduled-batch shape the reference runs
  * — while the same code with a processing-time trigger is the
  * continuous form.
  *
  * Date filtering (P5) happens on the partition path parsed from
  * `_metadata.file_path`, BEFORE the transform pipeline. Files older
  * than the ingestion date are still recorded by the source log (read
  * then dropped), which matches the batch job: it never re-ingests them
  * either unless the ingestion date moves backward — a reconfiguration
  * the reference does not support and which here would need a fresh
  * checkpoint, the documented operational rule for retention-window
  * changes.
  */
object StreamingIngest {

  final case class StreamReport(environment: String, entity: String,
      targetTable: String, rowsWritten: Long)

  /** Drain all currently-available files for every enabled (env, entity)
    * pair; returns per-stream row counts (0 for pairs whose glob matched
    * nothing, including never-materialized source dirs). */
  def runAvailableNow(spark: SparkSession, cfg: IngestionConfig,
      checkpointRoot: String, outRoot: String): Seq[StreamReport] = {
    val pairs = for {
      env <- cfg.environments
      table <- cfg.enabledTables
    } yield (env, table)
    pairs.map { case (env, table) =>
      val rows = runOne(spark, cfg, env, table, checkpointRoot, outRoot)
      StreamReport(env, table.source, table.targetName, rows)
    }
  }

  private def runOne(spark: SparkSession, cfg: IngestionConfig, env: String,
      table: TableConfig, checkpointRoot: String, outRoot: String): Long = {
    val glob = s"${cfg.dataFolder}/environment=$env/${table.source}/*/*/*"
    // driver-side existence probe (Hadoop FS, so s3a roots work the same
    // way): a readStream over a glob with zero matches throws at start,
    // and the schema must be supplied explicitly for file streams anyway
    val path = new org.apache.hadoop.fs.Path(glob)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val matched = Option(fs.globStatus(path)).map(_.toSeq).getOrElse(Seq.empty)
    if (matched.isEmpty) return 0L

    val schema = spark.read.parquet(glob).schema
    val raw = spark.readStream.schema(schema).parquet(glob)
    val dated = raw
      .withColumn("__d", to_date(regexp_extract(
        col("_metadata.file_path"), "/([0-9]{4}/[0-9]{2}/[0-9]{2})/", 1),
        "yyyy/MM/dd"))
      .filter(col("__d") >= lit(java.sql.Date.valueOf(cfg.ingestionDate)))
      .drop("__d")
    val cleaned = CigTransforms.sentinelsToNull(
      CigTransforms.pipeline(dated, table, env, cfg.ingestionDate))

    // FileStreamSink reports numOutputRows = -1, so the written-row
    // count rides an observed metric (no second scan) — the streaming
    // twin of the batch job's Observation on the sink write
    val query = cleaned
      .observe("ingest", count(lit(1)).as("rows"))
      .writeStream
      .format("parquet")
      .option("path", s"$outRoot/${table.targetName}/env=$env")
      .option("checkpointLocation", s"$checkpointRoot/$env/${table.source}")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    query.recentProgress.flatMap(p =>
      Option(p.observedMetrics.get("ingest")).map(_.getLong(0))).sum
  }
}
