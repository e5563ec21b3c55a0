package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** TEMPORARY round-13 profiling scratch — not part of any surface. */
object ScratchProf {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.driver.maxResultSize", "4g")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    import graft.operators._
    // warm the co-activity artifact
    time("cooc build") { GraphOps.cooccurEdges(spark, sfDir).count() }
    val und = GraphOps.cooccurEdges(spark, sfDir)
    val e0 = time("e0 cut") { CurationOps.cutLineage(
      und.select(col("ua").as("a"), col("ub").as("b"))) }
    println("edges: " + e0.count())
    val sup0 = time("edgeSupports round0 (cut)") {
      CurationOps.cutLineage(GraphOps.edgeSupports(e0)) }
    time("edgeSupports round0 again (no cut, count)") {
      GraphOps.edgeSupports(e0).selectExpr("sum(supp)").collect() }
    // sub-steps
    val ed = e0.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(e0.select(col("b").as("src"), col("a").as("dst")))
    val adj = ed.groupBy("src").agg(collect_list(col("dst")).as("nbrs"))
    time("adj agg only") { adj.selectExpr("count(1)", "sum(size(nbrs))").collect() }
    val j1 = e0.join(adj.select(col("src").as("a"), col("nbrs").as("na")), Seq("a"))
    time("join1 only") { j1.selectExpr("count(1)").collect() }
    val j2 = j1.join(adj.select(col("src").as("b"), col("nbrs").as("nb")), Seq("b"))
    time("join2 no intersect") { j2.selectExpr("count(1)").collect() }
    time("join2 + intersect") {
      j2.select(size(array_intersect(col("na"), col("nb"))).cast("bigint").as("supp"))
        .selectExpr("sum(supp)").collect() }
    // degree stats
    ed.groupBy("src").agg(count(lit(1)).as("d"))
      .selectExpr("count(1) AS n", "sum(d) AS m2", "max(d) AS dmax",
        "sum(d*d) AS sumd2").show()
    spark.stop()
  }
}
