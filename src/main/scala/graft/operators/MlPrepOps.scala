package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Feature-engineering operators for ML training data: the hashing
  * trick (fixed-width sparse bag-of-words without a vocabulary) and
  * corpus-level boilerplate removal (the cleanup step between raw
  * crawl text and tokenization).
  *
  * Both are single-shuffle shapes over the token/segment key — the
  * vocabulary-free property of feature hashing is precisely what makes
  * it 100 TB-friendly (no global dictionary build, no broadcast of an
  * unbounded vocab; every executor maps tokens to buckets independently
  * and only the (doc, bucket) partials shuffle).
  */
object MlPrepOps {

  import EtlOps.t
  import TextOps.md5Fingerprint60

  // --- q84: feature hashing ---------------------------------------------

  /** Hashed feature width. 64 buckets keeps the verifier output compact;
    * the operator is width-agnostic (the production value would be 2¹⁸+). */
  val HashDim = 64

  /** q84 — hashing-trick featurization: every token maps to bucket
    * h(tok) mod [[HashDim]] with a ±1 sign drawn from the next hash bit
    * (the signed sum cancels collision bias — Weinberger et al. 2009,
    * public "feature hashing" construction). Output is the sparse
    * per-document vector as (doc_id, bucket, cnt, signed_cnt) rows.
    *
    * One explode + one (doc, bucket) aggregate with map-side partials;
    * no vocabulary pass, no dictionary broadcast — the property that
    * lets this run on an unbounded corpus. */
  def featureHash(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .withColumn("fp", md5Fingerprint60(col("tok")))
      .withColumn("bucket", col("fp") % HashDim)
      .withColumn("sign", (expr(s"fp div $HashDim") % 2) * 2 - 1)
      .groupBy("doc_id", "bucket")
      .agg(count(lit(1)).as("cnt"), sum(col("sign")).as("signed_cnt"))
      .orderBy("doc_id", "bucket")

  // --- q85: boilerplate removal -----------------------------------------

  /** Segment width (tokens) and the cross-document frequency at which a
    * segment counts as boilerplate. */
  val BoilerSegTokens = 3
  val BoilerMinDocs = 2

  /** q85 — boilerplate-segment removal: split every document into
    * non-overlapping [[BoilerSegTokens]]-token segments, call a segment
    * boilerplate when its fingerprint appears in ≥ [[BoilerMinDocs]]
    * distinct documents, and rebuild each document from its surviving
    * segments in order. Reports per doc the segment counts and the
    * cleaned text's md5 (NULL when everything was boilerplate — the
    * degenerate doc a real pipeline drops).
    *
    * Distributed shape: segmentation is a narrow map; the boilerplate
    * table is one (fingerprint → distinct-doc count) aggregate; marking
    * is a fingerprint-keyed join (broadcastable — boilerplate by
    * definition concentrates into few distinct fingerprints); the
    * rebuild is one doc-keyed aggregate using collect_list + array_sort,
    * so segment order never depends on shuffle arrival order. */
  def boilerplateRemoval(s: SparkSession, dir: String): DataFrame = {
    val st = BoilerSegTokens
    val segs = t(s, dir, "documents")
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"),
        explode(expr(s"sequence(0, size(toks) - 1, $st)")).as("s"),
        col("toks"))
      .select(col("doc_id"), col("s"),
        array_join(expr(s"slice(toks, s + 1, $st)"), " ").as("seg"))
      .withColumn("fp", md5(col("seg")))
    val boiler = segs.groupBy("fp")
      .agg(countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= BoilerMinDocs)
      .select(col("fp"), lit(true).as("is_boiler"))
    segs.join(broadcast(boiler), Seq("fp"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_seg"),
        sum(when(col("is_boiler").isNull, 1L).otherwise(0L)).as("n_kept"),
        array_sort(collect_list(
          when(col("is_boiler").isNull, struct(col("s"), col("seg")))))
          .as("kept"))
      .select(col("doc_id"), col("n_seg"), col("n_kept"),
        when(col("n_kept") > 0,
          md5(array_join(expr("transform(kept, x -> x.seg)"), " ")))
          .as("clean_md5"))
      .orderBy("doc_id")
  }

  // --- q88: inverted index build ----------------------------------------

  /** Posting-list head length: the index row keeps full df/tf stats but
    * only the first [[PostingsCap]] doc entries inline — the impact-
    * ordered-prefix layout search engines ship, and what keeps a row
    * bounded when a stopword's posting list is the whole corpus. */
  val PostingsCap = 20

  /** q88 — inverted index over the corpus: per term, document frequency,
    * total term frequency, and the head of the (doc_id-ordered) posting
    * list rendered as `doc:tf` pairs.
    *
    * Distributed shape: one (term, doc) aggregate — THE canonical
    * map-side-combinable shuffle — then a term-keyed window for the
    * head cut and one term aggregate. Postings assemble via
    * collect_list + array_sort so their order never depends on shuffle
    * arrival. Index build is a pure group-by at any corpus size; the
    * cap bounds per-row memory against stopword skew. */
  def invertedIndex(s: SparkSession, dir: String): DataFrame = {
    val tf = t(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"))
      .persist() // feeds both the stats aggregate and the head window
    val stats = tf.groupBy("term")
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("tf_total"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("term")).orderBy(col("doc_id"))
    val heads = tf
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= PostingsCap)
      .groupBy("term")
      .agg(array_sort(collect_list(struct(col("doc_id"), col("tf"))))
        .as("entries"))
      .select(col("term"),
        array_join(expr(
          "transform(entries, e -> concat(CAST(e.doc_id AS STRING), ':', CAST(e.tf AS STRING)))"),
          ",").as("postings_head"))
    stats.join(heads, "term")
      .select(col("term"), col("df"), col("tf_total"), col("postings_head"))
      .orderBy("term")
  }
}
