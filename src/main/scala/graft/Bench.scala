package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  * A short untimed warmup absorbs JVM/session startup so timings reflect
  * steady-state plan execution, which is what scales.
  *
  * Cross-round de-noising: host CPU throughput on shared infrastructure
  * swings several-fold minute to minute (measured: identical binaries
  * moved 32s → 48s aggregate across two rounds), so raw seconds are not
  * comparable across runs. Each timed rep is therefore paired with a
  * fixed CPU-bound calibration op run IMMEDIATELY before it on the same
  * thread pool; the calibrated series rescales by the RUN-WIDE median of
  * all probes to a fixed nominal host speed ([[Bench.CalibRef]]). Pairing
  * each rep with its own probe over-corrects — taking min over
  * sec·(CalibRef/probe) selects for reps whose probe got lucky and was
  * measured at ±2× between identical runs — so a single per-run scale
  * factor is applied to every rep, and the JSON reports BOTH the min and
  * the median of the rescaled reps. `queries` stays raw (driver
  * contract); `queries_calibrated` (min) and `queries_calibrated_median`
  * are the cross-round-comparable series. */
object Bench {

  /** Nominal seconds for [[calibOnce]] on an unloaded host — the fixed
    * reference speed the calibrated series is expressed in. Pinned once
    * (never retuned per run, or rounds would stop being comparable). */
  val CalibRef = 0.25

  /** Fixed CPU-bound probe: Σ id·id over a 32-way parallel range —
    * saturates the same executor thread pool the queries use, no I/O,
    * no shuffle, so its runtime tracks instantaneous host CPU
    * throughput and nothing else. */
  def calibOnce(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    spark.range(0, 100000000L, 1, 32)
      .selectExpr("sum(CAST(id AS DOUBLE) * id)").collect()
    (System.nanoTime() - t0) / 1e9
  }

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

    // diagnostic mode: sample the calibration probe alone (used to pin
    // CalibRef and to sanity-check host speed before a timed run)
    if (args.contains("--calib-probe")) {
      calibOnce(spark) // codegen warmup
      val xs = (1 to 8).map(_ => calibOnce(spark))
      println(xs.map(x => f"$x%.4f").mkString("calib samples: ", " ", " s"))
      spark.stop()
      return
    }

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
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    // the heaviest queries dominate cross-round comparisons, so they get
    // extra reps: more samples tighten both the min and the median of the
    // rescaled series where agreement matters most
    val heavyReps = sys.env.getOrElse("SPARK_GRAFT_HEAVY_REPS", (reps + 2).toString).toInt
    val heavy = Set("q86_knn_graph", "q70_pagerank", "q59_dup_clusters", "q97_digest_drilldown")
    // prime the calibration op's own codegen so the first paired probe
    // isn't inflated by Janino compile
    calibOnce(spark)
    // SPARK_GRAFT_ONLY=q86_knn_graph,q70_pagerank → time just those
    // (single-query iteration; the driver leaves it unset)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }.map {
      case (name, fn) =>
        if (doWarm) {
          try fn(spark, sfDir).count() catch { case _: Throwable => () }
          spark.catalog.clearCache()
        }
        // each rep still runs a probe back to back with the query — the
        // probes collectively sample host speed across the whole run, and
        // their run-wide median becomes the single rescale factor below
        val nReps = if (heavy(name)) heavyReps else reps
        val samples = (1 to nReps).map { _ =>
          val calib = calibOnce(spark)
          val t0 = System.nanoTime()
          val ok = try { fn(spark, sfDir).count(); true }
            catch { case e: Throwable =>
              System.err.println(s"[bench] $name failed: ${e.getMessage}")
              false
            }
          val sec = (System.nanoTime() - t0) / 1e9
          spark.catalog.clearCache()
          (if (ok) sec else -1.0, calib)
        }
        (name, samples)
    }
    def median(xs: Seq[Double]): Double =
      if (xs.isEmpty) -1.0 else { val s = xs.sorted; s(s.size / 2) }
    // ONE scale factor for the whole run: the median of every probe taken
    // during it. Per-rep pairing divides each rep by its own noisy probe
    // (min then selects the luckiest pairing); a run-wide median is stable
    // at ~n_queries·reps samples and rescales all reps identically.
    val calibMed = median(results.flatMap(_._2.filter(_._1 >= 0).map(_._2)))
    val scale = if (calibMed > 0) CalibRef / calibMed else 1.0
    val rows = results.map { case (name, samples) =>
      val secs = samples.map(_._1).filter(_ >= 0)
      val raw = if (secs.nonEmpty) secs.min else -1.0
      val cal = if (secs.nonEmpty) secs.min * scale else -1.0
      val calMedOfReps = if (secs.nonEmpty) median(secs) * scale else -1.0
      (name, raw, cal, calMedOfReps)
    }
    def obj(kv: Seq[(String, Double)]): String =
      kv.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qs = obj(rows.map(r => (r._1, r._2)))
    val qsCal = obj(rows.map(r => (r._1, r._3)))
    val qsCalMed = obj(rows.map(r => (r._1, r._4)))
    val total = rows.map(_._2).filter(_ >= 0).sum
    val totalCal = rows.map(_._3).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","calib_ref":$CalibRef,"calib_median":$calibMed,"reps":$reps,"value_calibrated":$totalCal,"queries_calibrated":$qsCal,"queries_calibrated_median":$qsCalMed}""")
    spark.stop()
  }
}
