package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object AbTopK {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.driver.maxResultSize", "4g")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorFunctions.register(spark)
    val base = graft.operators.EtlOps.events(spark, sfDir)
      .select((col("user_id") % 50).as("g"), col("event_id"),
        floor(col("value") * 1e6).cast("bigint").as("s"))
      .withColumn("k", explode(expr("sequence(0, 63)")))
      .select(col("g"), (col("event_id") * 64 + col("k")).as("event_id"),
        (col("s") + col("k") * 31).as("s")).persist()
    base.count()
    def time(tag: String, f: => Long): Unit =
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[ab] $tag rep$i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
      }
    import org.apache.spark.sql.expressions.Window
    def native() = base.groupBy("g")
      .agg(expr("topk_agg(s, event_id, 3)").as("tk"))
      .select(col("g"), explode(col("tk"))).count()
    def window() = base
      .withColumn("rn", row_number().over(Window.partitionBy("g")
        .orderBy(col("s").desc, col("event_id"))))
      .filter(col("rn") <= 3).count()
    time("heavy-native", native())
    time("heavy-window", window())
    time("heavy-native", native())
    time("heavy-window", window())
    spark.stop()
  }
}
