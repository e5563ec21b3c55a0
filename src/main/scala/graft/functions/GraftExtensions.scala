package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the native expressions
  * ([[DotProduct]], [[LshSignature]], [[RollingHash]]) as permanent SQL
  * functions at session build time —
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`.
  *
  * This is the idiomatic injection path (same mechanism Delta/Iceberg
  * use): functions exist before any query is planned and survive
  * `newSession()`. [[VectorFunctions.register]] remains as the runtime
  * fallback for driver-owned sessions built without the config; it
  * skips names that already exist so the two paths compose quietly. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(clazz: Class[_], name: String) =
    new ExpressionInfo(clazz.getName, name)

  override def apply(e: SparkSessionExtensions): Unit = {
    // tier (c) of the custom-operator ladder: whole-operator planner
    // strategy (logical TokenBucketNode → physical TokenBucketExec)
    e.injectPlannerStrategy(_ => graft.plans.TokenBucketStrategy)
    e.injectFunction((FunctionIdentifier("dot_product"),
      info(classOf[DotProduct], "dot_product"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("lsh_sig"),
      info(classOf[LshSignature], "lsh_sig"),
      (exprs: Seq[Expression]) =>
        LshSignature(exprs.head, VectorFunctions.DefaultAnnPlanes)))
    e.injectFunction((FunctionIdentifier("rolling_hash"),
      info(classOf[RollingHash], "rolling_hash"),
      (exprs: Seq[Expression]) => RollingHash(exprs.head)))
    e.injectFunction((FunctionIdentifier("minhash_agg"),
      info(classOf[MinHashAgg], "minhash_agg"),
      MinHashAgg.builder(_)))
    e.injectFunction((FunctionIdentifier("space_saving_agg"),
      info(classOf[SpaceSavingAgg], "space_saving_agg"),
      SpaceSavingAgg.builder(_)))
    e.injectFunction((FunctionIdentifier("count_min_agg"),
      info(classOf[CountMinAgg], "count_min_agg"),
      CountMinAgg.builder(_)))
    e.injectFunction((FunctionIdentifier("topk_agg"),
      info(classOf[TopKAgg], "topk_agg"),
      TopKAgg.builder(_)))
    e.injectFunction((FunctionIdentifier("hll_agg"),
      info(classOf[HllAgg], "hll_agg"),
      HllAgg.builder(_)))
    e.injectFunction((FunctionIdentifier("kmv_agg"),
      info(classOf[KmvAgg], "kmv_agg"),
      KmvAgg.builder(_)))
    e.injectFunction((FunctionIdentifier("hll_merge_agg"),
      info(classOf[HllMergeAgg], "hll_merge_agg"),
      HllMergeAgg.builder(_)))
    e.injectFunction((FunctionIdentifier("bloom_might_contain"),
      info(classOf[BloomMightContain], "bloom_might_contain"),
      (exprs: Seq[Expression]) => BloomMightContain(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("md5_fp60"),
      info(classOf[Md5Fp60], "md5_fp60"),
      Md5Fp60.builder(_)))
    e.injectFunction((FunctionIdentifier("blob_pixel_stats"),
      info(classOf[BlobPixelStats], "blob_pixel_stats"),
      (exprs: Seq[Expression]) => BlobPixelStats(exprs.head)))
    e.injectFunction((FunctionIdentifier("char_run_stats"),
      info(classOf[CharRunStats], "char_run_stats"),
      (exprs: Seq[Expression]) => CharRunStats(exprs.head)))
    e.injectFunction((FunctionIdentifier("blob_wave_stats"),
      info(classOf[BlobWaveStats], "blob_wave_stats"),
      (exprs: Seq[Expression]) => BlobWaveStats(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("blob_phash"),
      info(classOf[BlobPhash], "blob_phash"),
      (exprs: Seq[Expression]) => BlobPhash(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("cdc_bounds"),
      info(classOf[CdcBoundsExpr], "cdc_bounds"),
      CdcBoundsExpr.builder(_)))
    e.injectFunction((FunctionIdentifier("count_sketch_agg"),
      info(classOf[CountSketchAgg], "count_sketch_agg"),
      CountSketchAgg.builder(_)))
    e.injectFunction((FunctionIdentifier("multi_match_stats"),
      info(classOf[MultiMatchStats], "multi_match_stats"),
      (exprs: Seq[Expression]) => MultiMatchStats(exprs.head)))
    e.injectFunction((FunctionIdentifier("sorted_inter_count"),
      info(classOf[SortedInterCount], "sorted_inter_count"),
      (exprs: Seq[Expression]) => SortedInterCount(exprs(0), exprs(1))))
    // the portable conv(substring(md5(x),1,15),16,10) idiom executes as
    // the native expression even when written longhand in SQL
    e.injectOptimizerRule(_ => FingerprintRewrite)
  }
}
