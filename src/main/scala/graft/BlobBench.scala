package graft

import org.apache.spark.sql.SparkSession

/** Isolates the multimodal OPERATOR cost from the synthetic-fixture
  * generation cost: materializes the blob corpora to parquet once
  * (production's "blobs come from storage" shape), then times the
  * native stats / HOF-reference forms over the materialized blobs with
  * a full-evaluation noop sink.
  *
  *   runMain graft.BlobBench <sfDir> <workDir>
  */
object BlobBench {
  def main(args: Array[String]): Unit = {
    val (sfDir, work) = (args(0), args(1))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.MultimodalOps
    MultimodalOps.imageGateCorpus(spark, sfDir)
      .write.mode("overwrite").parquet(s"$work/img")
    MultimodalOps.audioCorpus(spark, sfDir)
      .write.mode("overwrite").parquet(s"$work/wav")
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[blobbench] $tag: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val img = spark.read.parquet(s"$work/img")
    val wav = spark.read.parquet(s"$work/wav")
    img.count(); wav.count() // warm FS metadata
    for (_ <- 1 to 2) {
      time("pixel_stats native") {
        img.selectExpr("doc_id", "blob_pixel_stats(img) AS st")
          .write.format("noop").mode("overwrite").save()
      }
      time("wave_stats native") {
        wav.selectExpr("doc_id",
          s"blob_wave_stats(wav, ${MultimodalOps.AudioMid}) AS st")
          .write.format("noop").mode("overwrite").save()
      }
      time("phash native") {
        MultimodalOps.perceptualHash(img)
          .write.format("noop").mode("overwrite").save()
      }
      time("phash HOF reference") {
        MultimodalOps.perceptualHashReference(img)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
