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
  * output sizes), then swap directories. FLAT layouts only: a directory
  * containing subdirectories (Hive partitions) is rejected up front —
  * `repartition(n).write` would flatten the partition layout and the
  * top-level LIST undercounts its bytes. Compact each leaf partition
  * directory individually instead.
  *
  * The swap is two renames (live → `._compact_old`, tmp → live), so it
  * is NOT atomic: a reader racing the swap can see path-not-found in the
  * gap, and a crash between the renames leaves the data parked at
  * `._compact_old` with nothing at the live path. [[recover]] repairs
  * that state and should run at startup before reads; a table format
  * (Delta/Iceberg) is the production-grade answer when concurrent
  * readers/writers exist.
  */
object Compaction {

  /** Startup repair for a crash between [[compact]]'s two renames: if the
    * live path is missing but `._compact_old` exists, move it back.
    * Returns true when a restore happened. No-op (false) otherwise —
    * including the crash-before-first-rename case, where the live dir is
    * still intact and stray `._compact_tmp`/`._compact_old` dirs are just
    * deleted. */
  def recover(spark: SparkSession, dir: String): Boolean = {
    val path = new Path(dir) // Path normalizes trailing slashes
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = sibling(path, "._compact_old")
    val tmp = sibling(path, "._compact_tmp")
    if (!fs.exists(path) && fs.exists(old)) {
      if (!fs.rename(old, path))
        throw new java.io.IOException(s"recover: cannot restore $old to $path")
      fs.delete(tmp, true)
      true
    } else {
      if (fs.exists(path)) { fs.delete(tmp, true); fs.delete(old, true) }
      false
    }
  }

  final case class CompactReport(
      filesBefore: Int, filesAfter: Int,
      bytesBefore: Long, rows: Long)

  /** Sibling path `<dir><suffix>` built via parent/name so a trailing
    * slash in the caller's dir string cannot nest the scratch dirs
    * INSIDE the live directory (Path normalizes the slash; plain string
    * concat would not — and renaming a dir into its own child fails
    * mid-swap). */
  private def sibling(p: Path, suffix: String): Path =
    if (p.getParent == null) new Path(p.toString + suffix)
    else new Path(p.getParent, p.getName + suffix)

  /** Names Spark/Hadoop treat as hidden metadata ('_SUCCESS', '.crc',
    * '._compact_*' debris) — excluded from both the data-size LIST and
    * the partitioned-layout guard. */
  private def isHidden(name: String): Boolean =
    name.startsWith("_") || name.startsWith(".")

  def compact(spark: SparkSession, dir: String,
      targetFileBytes: Long = 128L * 1024 * 1024): CompactReport = {
    val path = new Path(dir) // normalizes trailing slashes
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = fs.listStatus(path)
    val subdirs = entries.filter(e =>
      e.isDirectory && !isHidden(e.getPath.getName))
    if (subdirs.nonEmpty)
      throw new IllegalArgumentException(
        s"compact: $dir has subdirectories (${subdirs.head.getPath.getName}, " +
          s"…) — partitioned layouts must be compacted per leaf directory")
    val files = entries
      .filter(f => f.isFile && !isHidden(f.getPath.getName))
    val bytes = files.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)

    val df = spark.read.parquet(dir)
    val tmp = sibling(path, "._compact_tmp")
    val old = sibling(path, "._compact_old")
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
      .count(f => f.isFile && !isHidden(f.getPath.getName) &&
        f.getPath.getName.endsWith(".parquet"))
    CompactReport(files.length, after, bytes, rows)
  }
}
