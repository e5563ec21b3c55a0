package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction: rewrite a parquet directory into ~target-size
  * files. The operational pass every large parquet lake needs — daily
  * ingests append file-per-task outputs, and a 100 TB table whose
  * partitions hold thousands of KB-size files pays listing, footer, and
  * task-scheduling overhead on every scan.
  *
  * Mechanics: size the directory via one driver-side LIST, compute the
  * target file count, rewrite with `repartition(n)` (round-robin — even
  * output sizes), then swap directories. The swap is rename-based:
  * readers racing the swap see the old OR the new complete directory,
  * never a mix (same guarantee level as the reference's
  * whole-file-or-nothing ingest; a table format (Delta/Iceberg) is the
  * production-grade answer when concurrent writers exist).
  */
object Compaction {

  final case class CompactReport(
      filesBefore: Int, filesAfter: Int,
      bytesBefore: Long, rows: Long)

  def compact(spark: SparkSession, dir: String,
      targetFileBytes: Long = 128L * 1024 * 1024): CompactReport = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(path)
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
    val bytes = files.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)

    val df = spark.read.parquet(dir)
    val tmp = new Path(dir + "._compact_tmp")
    val old = new Path(dir + "._compact_old")
    fs.delete(tmp, true); fs.delete(old, true)
    df.repartition(nOut).write.parquet(tmp.toString)
    val rows = spark.read.parquet(tmp.toString).count()

    // swap: old dir aside, tmp in place, drop old
    if (!fs.rename(path, old))
      throw new java.io.IOException(s"compact: cannot move $path aside")
    if (!fs.rename(tmp, path)) {
      fs.rename(old, path) // restore
      throw new java.io.IOException(s"compact: cannot move $tmp into place")
    }
    fs.delete(old, true)

    val after = fs.listStatus(path)
      .count(f => f.isFile && !f.getPath.getName.startsWith("_") &&
        f.getPath.getName.endsWith(".parquet"))
    CompactReport(files.length, after, bytes, rows)
  }
}
