package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mixture-construction and data-ordering operators — the steps that
  * decide WHICH documents a training run sees, HOW OFTEN, and IN WHAT
  * ORDER: model-based quality gating (the fastText/CCNet classifier
  * stage), temperature-scaled source balancing (the multilingual
  * p_i^alpha resampling rule), DSIR-style importance weighting against a
  * target domain (hashed n-gram log-likelihood ratios), and the
  * deterministic two-level epoch shuffle a distributed loader uses, with
  * a mixing audit over the result.
  *
  * These extend the reference's ingest surface (nightly parquet drops →
  * cleaned SQL tables, `/root/reference/ParquetFileInsertion.py:30-66`)
  * with the corpus-shaping steps a 100 TB pretraining pipeline runs
  * after cleaning. Shared design rule: every "model" these operators
  * consult (classifier weights, bucket log-ratios, shuffle permutation)
  * is either a pure hash function — O(1) closure, nothing shipped — or a
  * bounded-size table that broadcasts; the corpus itself is touched in
  * one or two map-combinable passes and never globally sorted.
  */
object MixtureOps {

  import EtlOps.t

  /** 60-bit md5 fingerprint of a salted key — the engine-portable
    * deterministic randomness source (DuckDB twin:
    * `CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)`). */
  private def p60(c: Column): Column = call_function("md5_fp60", c)

  // --- q129: hashed linear-classifier quality gate ----------------------

  /** Feature-hashing bucket count for the classifier (the hashing trick:
    * word → bucket, collisions accepted, vector size fixed). */
  val ClfBuckets = 4096

  /** The "trained" weight for one token, as a SQL expression over `tok`:
    * bucket = h60("clf"‖token) mod [[ClfBuckets]], weight =
    * h60("wgt"‖bucket) mod 2001 − 1000 ∈ [−1000, 1000]. A deterministic
    * stand-in for a trained fastText/LR vector (no model artifact exists
    * in the sandbox); swapping in real weights turns the inner hash into
    * a [[ClfBuckets]]-row broadcast lookup keyed by the SAME bucket id —
    * identical plan shape, one md5 fewer. */
  private def clfWeightSql(tok: String): String =
    s"md5_fp60(concat('wgt', CAST(" +
      s"md5_fp60(concat('clf', $tok))" +
      s" % $ClfBuckets AS STRING))) % 2001 - 1000"

  /** q129 — model-based quality gate (the GPT-3/CCNet classifier stage):
    * score every document with a hashed-bag-of-words linear classifier
    * and keep documents with a non-negative logit. Reports how the gate
    * reshapes each source: documents seen, documents kept, and the
    * summed logit (integer — exact under any aggregation order).
    *
    * Scale (100 TB): scoring is a fold over the token array INSIDE one
    * projection (`aggregate(split(text), 0, acc + w(tok))`) — no
    * explode, no per-token rows, no per-document shuffle; the only
    * exchange in the whole plan is the final per-source aggregate, which
    * map-side combines to |sources| rows per task. The classifier
    * evaluates inside whole-stage codegen; model size never appears in
    * the plan because weights are a pure function of the bucket hash. */
  /** The q129 classifier logit as a reusable per-row expression over
    * the `text` column (one definition for the gate and q194's
    * agreement audit). */
  private[graft] def logitOf: Column = expr(
    s"aggregate(split(text, ' '), CAST(0 AS BIGINT), " +
      s"(acc, w) -> acc + (${clfWeightSql("w")}))")

  def classifierGate(s: SparkSession, dir: String): DataFrame = {
    val logit = logitOf
    t(s, dir, "documents")
      .select(col("doc_id"), col("source"), logit.as("logit"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("logit") >= 0, 1L).otherwise(0L)).as("n_kept"),
        sum(col("logit")).as("logit_sum"))
      .withColumn("kept_frac",
        round(col("n_kept").cast("double") / col("n_docs").cast("double"), 6))
      .orderBy("source")
  }

  def classifierGateOracle: String = {
    val w =
      s"CAST('0x' || substr(md5('wgt' || CAST(" +
        s"CAST('0x' || substr(md5('clf' || w), 1, 15) AS BIGINT)" +
        s" % $ClfBuckets AS VARCHAR)), 1, 15) AS BIGINT) % 2001 - 1000"
    s"""WITH tok AS (SELECT doc_id, source,
       |    unnest(string_split(text, ' ')) AS w FROM documents),
       |sc AS (SELECT doc_id, source, CAST(sum($w) AS BIGINT) AS logit
       |  FROM tok GROUP BY doc_id, source)
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN logit >= 0 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_kept,
       |  CAST(sum(logit) AS BIGINT) AS logit_sum,
       |  round(CAST(sum(CASE WHEN logit >= 0 THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE), 6) AS kept_frac
       |FROM sc GROUP BY source ORDER BY source""".stripMargin
  }

  // --- q195: classifier calibration audit (reliability diagram + ECE) ----

  /** Reliability-diagram bin count. */
  val CalBins = 10

  /** q195 — calibration audit of the q129 quality classifier against
    * the q104 rule stack as reference labels: documents bin by their
    * min–max-normalized logit ([[CalBins]] equal-width bins — the q87
    * two-pass shape, no global sort), and each bin reports mean
    * confidence vs observed pass rate plus the expected calibration
    * error Σ n_b·|acc_b − conf_b|/N. The reliability diagram a curation
    * team reads before trusting classifier scores as probabilities —
    * κ (q194) says the gates agree, THIS says whether the score's
    * magnitude means anything.
    *
    * Parity: logits are exact integers, so bin ids, per-bin logit sums
    * and pass counts are exact; conf/acc are divisions over integers in
    * one fixed order; each bin's ECE term freezes to ×1e9 fixed point
    * before the 10-row sum.
    *
    * Scale (100 TB): two corpus passes (global min/max broadcast, then
    * bin + aggregate) — both collapse map-side; everything after is
    * [[CalBins]] rows. */
  /** Shared scored+binned frame for q195/q268: per doc the exact
    * integer logit, the gopher reference label, the global (lmin,
    * lmax, n_all) scalars and the equal-width bin id. */
  private[operators] def calBinned(s: SparkSession,
      dir: String): DataFrame = {
    val base = t(s, dir, "documents").select(
      logitOf.as("logit"),
      graft.operators.TrainPrepOps.gopherPassOf(col("text")).as("pass"))
      .persist()
    val st = base.agg(min(col("logit")).as("lmin"),
      max(col("logit")).as("lmax"), count(lit(1)).as("n_all"))
    base.crossJoin(broadcast(st))
      .withColumn("bin",
        least(lit(CalBins - 1L), floor(
          (col("logit") - col("lmin")).cast("double") * CalBins /
            (col("lmax") - col("lmin")).cast("double")).cast("long")))
  }

  def calibrationAudit(s: SparkSession, dir: String): DataFrame = {
    val binned = calBinned(s, dir)
    val perBin = binned.groupBy("bin")
      .agg(count(lit(1)).as("n_docs"), sum(col("logit")).as("logit_sum"),
        sum(when(col("pass"), 1L).otherwise(0L)).as("n_pass"),
        first(col("lmin")).as("lmin"), first(col("lmax")).as("lmax"),
        first(col("n_all")).as("n_all"))
    val conf = (col("logit_sum") - col("n_docs") * col("lmin"))
      .cast("double") /
      (col("lmax") - col("lmin")).cast("double") /
      col("n_docs").cast("double")
    val acc = col("n_pass").cast("double") / col("n_docs").cast("double")
    val w = Window.partitionBy()
    perBin
      .withColumn("gap_fp",
        floor(abs(acc - conf) * lit(1e9)).cast("long") * col("n_docs"))
      .withColumn("ece",
        round(sum(col("gap_fp")).over(w).cast("double") / lit(1e9) /
          col("n_all").cast("double"), 6))
      .select(col("bin"), col("n_docs"), col("n_pass"),
        round(conf, 6).as("mean_conf"), round(acc, 6).as("pass_rate"),
        round(abs(acc - conf), 6).as("gap"), col("ece"))
      .orderBy("bin")
  }

  def calibrationAuditOracle: String = {
    val wSql =
      s"CAST('0x' || substr(md5('wgt' || CAST(" +
        s"CAST('0x' || substr(md5('clf' || w), 1, 15) AS BIGINT)" +
        s" % $ClfBuckets AS VARCHAR)), 1, 15) AS BIGINT) % 2001 - 1000"
    val gopher =
      s"""len(string_split_regex(trim(text), '\\s+')) >= 10
         |  AND len(string_split_regex(trim(text), '\\s+')) <= 100000
         |  AND CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
         |    / CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) >= 3.0
         |  AND CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
         |    / CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) <= 10.0
         |  AND CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
         |    / CAST(length(text) AS DOUBLE) < 0.1
         |  AND len(regexp_extract_all(text, '\\b(the|and|of|to|in|is|you|that)\\b')) >= 2""".stripMargin
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |  FROM documents),
       |lg AS (SELECT doc_id, CAST(sum($wSql) AS BIGINT) AS logit
       |  FROM tok GROUP BY doc_id),
       |base AS (SELECT lg.logit, ($gopher) AS pass
       |  FROM documents JOIN lg USING (doc_id)),
       |st AS (SELECT min(logit) AS lmin, max(logit) AS lmax,
       |    count(*) AS n_all FROM base),
       |binned AS (SELECT logit, pass,
       |    least(${CalBins - 1},
       |      CAST(floor(CAST(logit - lmin AS DOUBLE) * $CalBins
       |        / CAST(lmax - lmin AS DOUBLE)) AS BIGINT)) AS bin,
       |    lmin, lmax, n_all
       |  FROM base CROSS JOIN st),
       |per_bin AS (SELECT bin, count(*) AS n_docs,
       |    CAST(sum(logit) AS BIGINT) AS logit_sum,
       |    CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       |    any_value(lmin) AS lmin, any_value(lmax) AS lmax,
       |    any_value(n_all) AS n_all
       |  FROM binned GROUP BY bin),
       |g AS (SELECT *,
       |    CAST(logit_sum - n_docs * lmin AS DOUBLE)
       |      / CAST(lmax - lmin AS DOUBLE) / CAST(n_docs AS DOUBLE)
       |      AS conf,
       |    CAST(n_pass AS DOUBLE) / CAST(n_docs AS DOUBLE) AS acc
       |  FROM per_bin),
       |g2 AS (SELECT *,
       |    CAST(floor(abs(acc - conf) * 1000000000.0) AS BIGINT) * n_docs
       |      AS gap_fp
       |  FROM g)
       |SELECT bin, n_docs, n_pass,
       |  round(conf, 6) AS mean_conf,
       |  round(acc, 6) AS pass_rate,
       |  round(abs(acc - conf), 6) AS gap,
       |  round(CAST(sum(gap_fp) OVER () AS DOUBLE) / 1000000000.0
       |    / CAST(n_all AS DOUBLE), 6) AS ece
       |FROM g2 ORDER BY bin""".stripMargin
  }

  // --- q268: Brier score with Murphy decomposition ------------------------

  /** q268 — Brier score of the q129 classifier's normalized score as a
    * probability, with the Murphy decomposition over q195's bins:
    * Brier = RELIABILITY − RESOLUTION + UNCERTAINTY + a binning
    * residual (within-bin forecast variance MINUS twice the within-bin
    * forecast–outcome covariance — sign-indefinite, reported honestly
    * as `binning_resid`). q195's
    * ECE answers "is the score calibrated"; Murphy separates the two
    * ways a score earns its Brier — being WRONG about levels
    * (reliability) vs not SORTING outcomes at all (no resolution) —
    * and the skill score 1 − BS/UNC says whether the classifier beats
    * always-predicting-the-base-rate.
    *
    * Exactness: with R = lmax−lmin and L′ = logit−lmin (integers), the
    * raw Brier numerator Σ(L′ − o·R)² is an exact bigint; the bin
    * terms freeze to ×1e9 before their 10-row sums (the q195
    * discipline); uncertainty is a rational.
    *
    * Scale (100 TB): reuses q195's two corpus passes; everything else
    * is [[CalBins]]-row algebra. */
  def brierDecomposition(s: SparkSession, dir: String): DataFrame = {
    val binned = calBinned(s, dir)
      .withColumn("lp", col("logit") - col("lmin"))
      .withColumn("r", col("lmax") - col("lmin"))
      .withColumn("o", when(col("pass"), 1L).otherwise(0L))
    val perBin = binned.groupBy("bin").agg(
      count(lit(1)).as("n_k"), sum(col("lp")).as("s_k"),
      sum(col("o")).as("o_k"),
      sum((col("lp") - col("o") * col("r")) *
        (col("lp") - col("o") * col("r"))).as("sq_k"),
      min(col("r")).as("r"), min(col("n_all")).as("n_all"))
    val glob = perBin.agg(
      sum(col("n_k")).as("n"), sum(col("o_k")).as("o_tot"),
      sum(col("sq_k")).as("sq"), min(col("r")).as("r"))
    val terms = perBin.crossJoin(broadcast(glob.select(
        col("n"), col("o_tot"))))
      .withColumn("pbar", col("s_k").cast("double") /
        (col("n_k") * col("r")).cast("double"))
      .withColumn("obar", col("o_k").cast("double") /
        col("n_k").cast("double"))
      .withColumn("obar_g", col("o_tot").cast("double") /
        col("n").cast("double"))
      .withColumn("rel_fp", floor((col("pbar") - col("obar")) *
        (col("pbar") - col("obar")) * 1e9).cast("bigint") * col("n_k"))
      .withColumn("res_fp", floor((col("obar") - col("obar_g")) *
        (col("obar") - col("obar_g")) * 1e9).cast("bigint") *
        col("n_k"))
      .agg(sum(col("rel_fp")).as("rel_fp"),
        sum(col("res_fp")).as("res_fp"))
    glob.crossJoin(broadcast(terms))
      .selectExpr("n",
        "round(CAST(sq AS DOUBLE) / (CAST(r AS DOUBLE) * r * n), 6) " +
          "AS brier",
        "round(CAST(rel_fp AS DOUBLE) / 1e9 / n, 6) AS reliability",
        "round(CAST(res_fp AS DOUBLE) / 1e9 / n, 6) AS resolution",
        "round(CAST(o_tot AS DOUBLE) / n * (1.0 - CAST(o_tot " +
          "AS DOUBLE) / n), 6) AS uncertainty",
        "round(CAST(sq AS DOUBLE) / (CAST(r AS DOUBLE) * r * n) - " +
          "(CAST(rel_fp AS DOUBLE) / 1e9 / n - CAST(res_fp AS DOUBLE)" +
          " / 1e9 / n + CAST(o_tot AS DOUBLE) / n * (1.0 - " +
          "CAST(o_tot AS DOUBLE) / n)), 6) AS binning_resid",
        "round(1.0 - CAST(sq AS DOUBLE) / (CAST(r AS DOUBLE) * r * n)" +
          " / (CAST(o_tot AS DOUBLE) / n * (1.0 - CAST(o_tot " +
          "AS DOUBLE) / n)), 6) AS skill")
  }

  def brierDecompositionOracle: String = {
    val wSql =
      s"CAST('0x' || substr(md5('wgt' || CAST(" +
        s"CAST('0x' || substr(md5('clf' || w), 1, 15) AS BIGINT)" +
        s" % $ClfBuckets AS VARCHAR)), 1, 15) AS BIGINT) % 2001 - 1000"
    val gopher = graft.operators.CurationOps.GopherSql
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |  FROM documents),
       |lg AS (SELECT doc_id, CAST(sum($wSql) AS BIGINT) AS logit
       |  FROM tok GROUP BY doc_id),
       |base AS (SELECT lg.logit, ($gopher) AS pass
       |  FROM documents JOIN lg USING (doc_id)),
       |st AS (SELECT min(logit) AS lmin, max(logit) AS lmax,
       |    count(*) AS n_all FROM base),
       |binned AS (SELECT logit - lmin AS lp, lmax - lmin AS r,
       |    CASE WHEN pass THEN 1 ELSE 0 END AS o,
       |    least(${CalBins - 1},
       |      CAST(floor(CAST(logit - lmin AS DOUBLE) * $CalBins
       |        / CAST(lmax - lmin AS DOUBLE)) AS BIGINT)) AS bin
       |  FROM base CROSS JOIN st),
       |per_bin AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_k,
       |    CAST(sum(lp) AS BIGINT) AS s_k,
       |    CAST(sum(o) AS BIGINT) AS o_k,
       |    CAST(sum((lp - o * r) * (lp - o * r)) AS BIGINT) AS sq_k,
       |    CAST(min(r) AS BIGINT) AS r
       |  FROM binned GROUP BY bin),
       |gl AS (SELECT CAST(sum(n_k) AS BIGINT) AS n,
       |    CAST(sum(o_k) AS BIGINT) AS o_tot,
       |    CAST(sum(sq_k) AS BIGINT) AS sq,
       |    CAST(min(r) AS BIGINT) AS r FROM per_bin),
       |tm AS (SELECT
       |    CAST(sum(CAST(floor((CAST(s_k AS DOUBLE) / (n_k * per_bin.r) -
       |      CAST(o_k AS DOUBLE) / n_k) * (CAST(s_k AS DOUBLE) /
       |      (n_k * per_bin.r) - CAST(o_k AS DOUBLE) / n_k) * 1e9) AS BIGINT)
       |      * n_k) AS BIGINT) AS rel_fp,
       |    CAST(sum(CAST(floor((CAST(o_k AS DOUBLE) / n_k -
       |      CAST(o_tot AS DOUBLE) / n) * (CAST(o_k AS DOUBLE) / n_k -
       |      CAST(o_tot AS DOUBLE) / n) * 1e9) AS BIGINT) * n_k)
       |      AS BIGINT) AS res_fp
       |  FROM per_bin, gl)
       |SELECT n,
       |  round(CAST(sq AS DOUBLE) / (CAST(r AS DOUBLE) * r * n), 6)
       |    AS brier,
       |  round(CAST(rel_fp AS DOUBLE) / 1e9 / n, 6) AS reliability,
       |  round(CAST(res_fp AS DOUBLE) / 1e9 / n, 6) AS resolution,
       |  round(CAST(o_tot AS DOUBLE) / n * (1.0 - CAST(o_tot
       |    AS DOUBLE) / n), 6) AS uncertainty,
       |  round(CAST(sq AS DOUBLE) / (CAST(r AS DOUBLE) * r * n) -
       |    (CAST(rel_fp AS DOUBLE) / 1e9 / n - CAST(res_fp AS DOUBLE)
       |    / 1e9 / n + CAST(o_tot AS DOUBLE) / n * (1.0 -
       |    CAST(o_tot AS DOUBLE) / n)), 6) AS binning_resid,
       |  round(1.0 - CAST(sq AS DOUBLE) / (CAST(r AS DOUBLE) * r * n)
       |    / (CAST(o_tot AS DOUBLE) / n * (1.0 - CAST(o_tot
       |    AS DOUBLE) / n)), 6) AS skill
       |FROM gl, tm""".stripMargin
  }

  // --- q130: temperature-scaled source balancing ------------------------

  /** q130 — temperature-scaled source sampling (the multilingual
    * p_i^α rule, α = 1/2): a source's share of the training mixture is
    * proportional to sqrt(its document count), which flattens the head
    * and boosts the tail relative to natural frequency. Weights are
    * carried as floor(sqrt(n)·1e9) BIGINT fixed-point — IEEE-754
    * guarantees sqrt is correctly rounded, so both engines derive the
    * identical integer — and the per-source document target is exact
    * integer arithmetic from there. Within a source, WHICH documents get
    * the extra copy is decided by fingerprint rank, so every engine and
    * every run materializes the same mixture. Output per source: natural
    * count, fixed-point weight, target document count, the base
    * copies-per-doc / extra-copy split, and the realized total (provably
    * equal to the target — the hash gate checks the rank logic).
    *
    * Scale (100 TB): two tiny aggregates (|sources| rows), one broadcast
    * of the |sources|-row plan, and one fingerprint-rank window HASH-
    * partitioned by source. α other than 1/2 needs pow(), which is not
    * correctly rounded — at scale, compute the |sources|-row weight
    * table driver-side in exact arithmetic instead. N·w_fp here fits
    * BIGINT to ~10⁸ docs per source; past that, carry the product as
    * DECIMAL(38,0) (the shape is unchanged). */
  def temperatureMix(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("source"))
    val cnts = docs.groupBy("source").agg(count(lit(1)).as("n_docs"))
      .withColumn("w_fp",
        floor(sqrt(col("n_docs").cast("double")) * 1e9).cast("bigint"))
    val tot = cnts.agg(
      sum(col("w_fp")).as("S"), sum(col("n_docs")).as("N"))
    val plan = cnts.crossJoin(broadcast(tot))
      .withColumn("target", expr("(N * w_fp) div S"))
      .withColumn("base", expr("target div n_docs"))
      .withColumn("extra", expr("target % n_docs"))
      .select("source", "n_docs", "w_fp", "target", "base", "extra")
    val rk = row_number().over(
      Window.partitionBy("source").orderBy(col("fp"), col("doc_id")))
    val realized = docs
      .withColumn("fp", p60(concat(lit("temp"), col("doc_id").cast("string"))))
      .join(broadcast(plan.select("source", "base", "extra")), "source")
      .withColumn("rk", rk)
      .select(col("source"),
        (col("base") + when(col("rk") <= col("extra"), 1L).otherwise(0L))
          .as("n_copies"))
      .groupBy("source").agg(sum(col("n_copies")).as("realized"))
    plan.join(realized, "source").orderBy("source")
  }

  def temperatureMixOracle: String =
    """WITH c AS (SELECT source, count(*) AS n_docs,
      |    CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 1e9) AS BIGINT)
      |      AS w_fp
      |  FROM documents GROUP BY source),
      |t AS (SELECT CAST(sum(w_fp) AS BIGINT) AS S,
      |    CAST(sum(n_docs) AS BIGINT) AS N FROM c),
      |g AS (SELECT c.source, c.n_docs, c.w_fp, (N * w_fp) // S AS target
      |  FROM c, t),
      |g2 AS (SELECT *, target // n_docs AS base, target % n_docs AS extra
      |  FROM g),
      |d AS (SELECT doc_id, source,
      |    CAST('0x' || substr(md5('temp' || CAST(doc_id AS VARCHAR)), 1, 15)
      |      AS BIGINT) AS fp
      |  FROM documents),
      |r AS (SELECT d.source, base, extra,
      |    row_number() OVER (PARTITION BY d.source ORDER BY fp, doc_id)
      |      AS rk
      |  FROM d JOIN g2 ON d.source = g2.source),
      |p AS (SELECT source, CAST(sum(base +
      |    CASE WHEN rk <= extra THEN 1 ELSE 0 END) AS BIGINT) AS realized
      |  FROM r GROUP BY source)
      |SELECT g2.source, n_docs, w_fp, target, base, extra, realized
      |FROM g2 JOIN p ON g2.source = p.source ORDER BY g2.source""".stripMargin

  // --- q131: DSIR importance weighting ----------------------------------

  /** Hashed-feature space size for the importance weights. */
  val DsirBuckets = 1024

  /** The target domain the raw corpus is scored against. */
  val DsirTarget = "src0"

  /** The per-bucket log-likelihood-ratio, as one SQL string shared
    * verbatim by both engines (same literal, same operator order — the
    * only float step in the operator, frozen to ×1e6 fixed point the
    * moment it is computed; 1-ulp libm divergence would need the true
    * value within ~1e-9 of an integer to flip the floor). */
  private val DsirLamSql: String =
    s"CAST(floor((ln((coalesce(tc, 0) + 1.0) / (ttot + $DsirBuckets.0))" +
      s" - ln((rc + 1.0) / (rtot + $DsirBuckets.0))) * 1000000.0) AS BIGINT)"

  /** q131 — DSIR-style importance weighting (Xie et al. 2023, "Data
    * Selection via Importance Resampling"): score every document by how
    * much more likely its hashed unigrams are under a target domain
    * ([[DsirTarget]]) than under the raw corpus. Per hash bucket b the
    * weight is λ_b = ln p̂_target(b) − ln p̂_raw(b) (add-1 smoothed),
    * frozen to ×1e6 fixed point; a document's score is the integer sum
    * of λ over its token occurrences, so aggregation order cannot
    * perturb it. Add-1 smoothing over a small target sample biases every
    * λ negative (smoothing mass flattens p̂_target far more than p̂_raw),
    * so the keep rule centers on the corpus: a document is kept when its
    * MEAN token LLR beats the raw-corpus mean token LLR — written as the
    * integer cross-multiplication score·rtok > wsum·ntok (wsum =
    * Σ_b rc_b·λ_b), so no division and no floor-mode divergence between
    * engines (Spark `div` truncates toward zero, DuckDB `//` floors).
    * Reports the per-source keep rate and summed score — which sources
    * the target domain pulls into the mixture.
    *
    * Scale (100 TB): the "model" is [[DsirBuckets]] rows, built by ONE
    * map-combinable aggregate over the token stream (raw and target
    * counts as two sum-columns of the same groupBy — not separate
    * passes); the totals reduce the 1024-row grid, not the corpus. One
    * broadcast hash join applies the model, and the per-doc /
    * per-source rollups both map-side combine. No global sort, no
    * all-pairs anything; the corpus is read exactly twice (model pass,
    * scoring pass) as the published pipeline does — the plan audit pins
    * two parquet scans. */
  def dsirWeights(s: SparkSession, dir: String): DataFrame = {
    val tok = t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        explode(split(col("text"), " ")).as("w"))
      .withColumn("b", p60(concat(lit("dsir"), col("w"))) % DsirBuckets)
      .select("doc_id", "source", "b")
    // totals and the centering constant are unbounded windows OVER THE
    // 1024-ROW GRID, not separate aggregates: a DataFrame reused through
    // .agg() re-executes its whole lineage (no CTE sharing), which would
    // re-scan the corpus once per derived scalar
    val wAll = Window.partitionBy()
    val model = tok.groupBy("b")
      .agg(
        count(lit(1)).as("rc"),
        sum(when(col("source") === DsirTarget, 1L).otherwise(0L)).as("tc"))
      .withColumn("rtot", sum(col("rc")).over(wAll))
      .withColumn("ttot", sum(col("tc")).over(wAll))
      .withColumn("lam_fp", expr(DsirLamSql))
      .withColumn("wsum", sum(expr("rc * lam_fp")).over(wAll))
      .select("b", "lam_fp", "wsum", "rtot")
    val scored = tok.join(broadcast(model), "b")
      .groupBy("doc_id", "source")
      .agg(sum(col("lam_fp")).as("score"), count(lit(1)).as("ntok"),
        first(col("wsum")).as("wsum"), first(col("rtot")).as("rtok"))
    scored.groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("score") * col("rtok") > col("wsum") * col("ntok"), 1L)
          .otherwise(0L)).as("n_kept"),
        sum(col("score")).as("score_sum"))
      .withColumn("kept_frac",
        round(col("n_kept").cast("double") / col("n_docs").cast("double"), 6))
      .orderBy("source")
  }

  def dsirWeightsOracle: String =
    s"""WITH tok AS (SELECT doc_id, source,
       |    CAST('0x' || substr(md5('dsir' || w), 1, 15) AS BIGINT)
       |      % $DsirBuckets AS b
       |  FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
       |        FROM documents)),
       |grid AS (SELECT b, count(*) AS rc,
       |    CAST(sum(CASE WHEN source = '$DsirTarget' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS tc
       |  FROM tok GROUP BY b),
       |tots AS (SELECT CAST(sum(rc) AS BIGINT) AS rtot,
       |    CAST(sum(tc) AS BIGINT) AS ttot FROM grid),
       |lam AS (SELECT b, rc, $DsirLamSql AS lam_fp FROM grid, tots),
       |ctr AS (SELECT CAST(sum(rc * lam_fp) AS BIGINT) AS wsum,
       |    CAST(sum(rc) AS BIGINT) AS rtok FROM lam),
       |ds AS (SELECT doc_id, source, CAST(sum(lam_fp) AS BIGINT) AS score,
       |    count(*) AS ntok
       |  FROM tok JOIN lam ON tok.b = lam.b GROUP BY doc_id, source)
       |SELECT source, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN score * rtok > wsum * ntok THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_kept,
       |  CAST(sum(score) AS BIGINT) AS score_sum,
       |  round(CAST(sum(CASE WHEN score * rtok > wsum * ntok
       |      THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE), 6) AS kept_frac
       |FROM ds, ctr GROUP BY source ORDER BY source""".stripMargin

  // --- q132: deterministic epoch shuffle + mixing audit -----------------

  /** Number of loader shards the shuffled epoch is split into. */
  val ShuffleShards = 8

  /** q132 — deterministic two-level epoch shuffle with a mixing audit:
    * the order a training run reads documents is (shard, position) where
    * shard = h60("shuf"‖doc) mod [[ShuffleShards]] and position is the
    * rank of a second independent fingerprint within the shard — the
    * seeded, reproducible global shuffle every data loader needs,
    * without ever sorting the corpus globally. The audit measures how
    * well the shuffle mixes sources: per shard, the fraction of adjacent
    * pairs that share a source, against the exact expectation for a
    * uniform random order of that shard's composition
    * (Σ c_s(c_s−1) / n(n−1)) — a hash-ordered shuffle should sit at
    * expectation, and a loader bug that clusters a source shows up as
    * observed ≫ expected.
    *
    * Scale (100 TB): shard assignment is a stateless projection; the
    * position/adjacency windows are HASH-partitioned by shard and
    * shards are hash-balanced, so each window task sees |corpus|/S rows
    * — at real scale S is O(10⁴) loader files and the per-shard rank
    * becomes q114's two-pass enumeration, same audit unchanged. Both
    * aggregates map-side combine. */
  def epochShuffleAudit(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
      .select(col("doc_id"), col("source"))
      .withColumn("shard",
        p60(concat(lit("shuf"), col("doc_id").cast("string"))) % ShuffleShards)
      .withColumn("ordk",
        p60(concat(lit("ord"), col("doc_id").cast("string"))))
    val w = Window.partitionBy("shard").orderBy(col("ordk"), col("doc_id"))
    val adj = d.withColumn("prev_src", lag(col("source"), 1).over(w))
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("prev_src") === col("source"), 1L).otherwise(0L))
          .as("n_same"))
    val exp = d.groupBy("shard", "source").agg(count(lit(1)).as("c"))
      .groupBy("shard")
      .agg(sum(expr("c * (c - 1)")).as("num"), sum(col("c")).as("n"))
    adj.join(exp, "shard")
      .select(col("shard"), col("n_docs"), col("n_same"),
        when(col("n_docs") > 1,
          round(col("n_same").cast("double") /
            (col("n_docs") - 1).cast("double"), 6)).otherwise(0.0)
          .as("same_rate"),
        when(col("n_docs") > 1,
          round(col("num").cast("double") /
            expr("CAST(n * (n - 1) AS DOUBLE)"), 6)).otherwise(0.0)
          .as("expected_rate"))
      .orderBy("shard")
  }

  // --- q133: end-to-end training manifest -------------------------------

  /** q133 — the training manifest, end to end: the composition of the
    * assembly stages into the artifact a trainer actually reads. One
    * DAG: (1) classifier gate (q129's fold — logit ≥ 0), (2) exact
    * content dedup keeping the lowest doc_id per md5(text) (q29's rule,
    * q120's one-window no-join-back shape), (3) temperature-scaled
    * per-source copy targets over the SURVIVORS (q130's sqrt fixed-point
    * plan), (4) copy materialization by fingerprint rank, and (5) the
    * deterministic two-level shuffle (q132) assigning every copy its
    * (shard, position). Output: one row per training-pass appearance —
    * `(doc_id, source, copy_n, shard, pos)` in read order. A user of the
    * engine runs this ONE query to turn a raw corpus into a training
    * manifest; the stage queries exist separately for auditing.
    *
    * Scale (100 TB): gate + content hash are a single narrow pass; dedup
    * is one hash exchange on the content hash (window, no join-back);
    * the mixture plan is |sources| rows broadcast back; the copy explode
    * is bounded by the epoch budget; shard/position assignment
    * hash-partitions by shard. Nothing global except the output-contract
    * sort. The five stages fuse into four hash exchanges + broadcasts —
    * materializing intermediate tables between stages (what a
    * Luigi/pandas pipeline must do) is exactly what this composition
    * avoids. */
  def trainingManifest(s: SparkSession, dir: String): DataFrame =
    trainingManifestOf(t(s, dir, "documents"))

  /** The manifest pipeline over an arbitrary (doc_id, source, text)
    * corpus snapshot — q133 runs it on the full table, q136 on two
    * snapshots to audit churn. */
  private[graft] def trainingManifestOf(docs: DataFrame): DataFrame =
    manifestFromGated(gatedOf(docs))

  /** Stage 1 of the manifest: per-doc content hash + classifier-gate
    * logit, filtered to survivors. This is the only corpus-text-scan
    * stage, and it is per-doc (no cross-doc state), so a SNAPSHOT
    * FILTER on doc_id commutes with it — q136 computes it once on the
    * full corpus, materializes, and derives both snapshots from the
    * result. */
  private[graft] def gatedOf(docs: DataFrame): DataFrame = {
    val logit = expr(
      s"aggregate(split(text, ' '), CAST(0 AS BIGINT), " +
        s"(acc, w) -> acc + (${clfWeightSql("w")}))")
    docs
      .select(col("doc_id"), col("source"), md5(col("text")).as("h"),
        logit.as("logit"))
      .filter(col("logit") >= 0)
  }

  /** Stages 2–5 of the manifest over a pre-gated (doc_id, source, h)
    * frame: dedup window, temperature targets, copy explode, two-level
    * shuffle. */
  private[graft] def manifestFromGated(gated: DataFrame): DataFrame = {
    val keep = gated
      .withColumn("mid", min(col("doc_id")).over(Window.partitionBy("h")))
      .filter(col("doc_id") === col("mid"))
      .select("doc_id", "source")
    // totals as unbounded windows over the |sources|-row grid (q131's
    // lesson: a reused DataFrame re-executes its lineage, so a separate
    // .agg() would scan the corpus a third time)
    val wAll = Window.partitionBy()
    val plan = keep.groupBy("source").agg(count(lit(1)).as("n_docs"))
      .withColumn("w_fp",
        floor(sqrt(col("n_docs").cast("double")) * 1e9).cast("bigint"))
      .withColumn("S", sum(col("w_fp")).over(wAll))
      .withColumn("N", sum(col("n_docs")).over(wAll))
      .withColumn("target", expr("(N * w_fp) div S"))
      .withColumn("tbase", expr("target div n_docs"))
      .withColumn("extra", expr("target % n_docs"))
      .select("source", "tbase", "extra")
    val rk = row_number().over(
      Window.partitionBy("source").orderBy(col("fp"), col("doc_id")))
    val copies = keep
      .withColumn("fp", p60(concat(lit("mtemp"), col("doc_id").cast("string"))))
      .join(broadcast(plan), "source")
      .withColumn("rk", rk)
      .withColumn("n_copies",
        col("tbase") + when(col("rk") <= col("extra"), 1L).otherwise(0L))
      .filter(col("n_copies") >= 1) // sequence(1, 0) would DESCEND
      .select(col("doc_id"), col("source"),
        explode(sequence(lit(1L), col("n_copies"))).as("copy_n"))
    val ck = concat(col("doc_id").cast("string"), lit("_"),
      col("copy_n").cast("string"))
    copies
      .withColumn("shard", p60(concat(lit("mshuf"), ck)) % ShuffleShards)
      .withColumn("ordk", p60(concat(lit("mord"), ck)))
      .withColumn("pos", row_number().over(
        Window.partitionBy("shard").orderBy(col("ordk"), col("doc_id"),
          col("copy_n"))).cast("bigint"))
      .select("doc_id", "source", "copy_n", "shard", "pos")
      .orderBy("shard", "pos")
  }

  /** The manifest pipeline as a suffixed CTE chain over a filtered
    * snapshot — shared by the q133 oracle (one chain, no filter) and the
    * q136 oracle (two chains joined). The last CTE, `mf<sfx>`, holds the
    * finished manifest (doc_id, source, copy_n, shard, pos). */
  private def manifestSqlCtes(sfx: String, pred: String): String = {
    def n(x: String) = x + sfx
    val w =
      s"CAST('0x' || substr(md5('wgt' || CAST(" +
        s"CAST('0x' || substr(md5('clf' || w), 1, 15) AS BIGINT)" +
        s" % $ClfBuckets AS VARCHAR)), 1, 15) AS BIGINT) % 2001 - 1000"
    s"""${n("tok")} AS (SELECT doc_id, source, md5(text) AS h,
       |    unnest(string_split(text, ' ')) AS w FROM documents
       |  WHERE $pred),
       |${n("sc")} AS (SELECT doc_id, source, h,
       |    CAST(sum($w) AS BIGINT) AS logit
       |  FROM ${n("tok")} GROUP BY doc_id, source, h),
       |${n("keep")} AS (SELECT doc_id, source FROM (
       |    SELECT *, min(doc_id) OVER (PARTITION BY h) AS mid
       |    FROM ${n("sc")} WHERE logit >= 0) WHERE doc_id = mid),
       |${n("c")} AS (SELECT source, count(*) AS n_docs,
       |    CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 1e9) AS BIGINT)
       |      AS w_fp
       |  FROM ${n("keep")} GROUP BY source),
       |${n("t")} AS (SELECT CAST(sum(w_fp) AS BIGINT) AS S,
       |    CAST(sum(n_docs) AS BIGINT) AS N FROM ${n("c")}),
       |${n("g")} AS (SELECT ${n("c")}.source, n_docs,
       |    (N * w_fp) // S AS target FROM ${n("c")}, ${n("t")}),
       |${n("g2")} AS (SELECT source, target // n_docs AS tbase,
       |    target % n_docs AS extra FROM ${n("g")}),
       |${n("d")} AS (SELECT doc_id, source,
       |    CAST('0x' || substr(md5('mtemp' || CAST(doc_id AS VARCHAR)), 1, 15)
       |      AS BIGINT) AS fp FROM ${n("keep")}),
       |${n("r")} AS (SELECT ${n("d")}.doc_id, ${n("d")}.source, tbase, extra,
       |    row_number() OVER (PARTITION BY ${n("d")}.source
       |      ORDER BY fp, doc_id) AS rk
       |  FROM ${n("d")} JOIN ${n("g2")} USING (source)),
       |${n("cp")} AS (SELECT doc_id, source,
       |    tbase + CASE WHEN rk <= extra THEN 1 ELSE 0 END AS n_copies
       |  FROM ${n("r")}),
       |${n("ex")} AS (SELECT doc_id, source,
       |    unnest(range(1, n_copies + 1)) AS copy_n
       |  FROM ${n("cp")} WHERE n_copies >= 1),
       |${n("m")} AS (SELECT doc_id, source, copy_n,
       |    CAST('0x' || substr(md5('mshuf' || CAST(doc_id AS VARCHAR) || '_'
       |      || CAST(copy_n AS VARCHAR)), 1, 15) AS BIGINT)
       |      % $ShuffleShards AS shard,
       |    CAST('0x' || substr(md5('mord' || CAST(doc_id AS VARCHAR) || '_'
       |      || CAST(copy_n AS VARCHAR)), 1, 15) AS BIGINT) AS ordk
       |  FROM ${n("ex")}),
       |${n("mf")} AS (SELECT doc_id, source, copy_n, shard,
       |    row_number() OVER (PARTITION BY shard ORDER BY ordk, doc_id,
       |      copy_n) AS pos
       |  FROM ${n("m")})""".stripMargin
  }

  // the chain is stripMargin'd already — concatenate, never re-strip
  // (a second stripMargin would eat the leading '|' of any '||' that
  // starts an interpolated line)
  def trainingManifestOracle: String =
    "WITH " + manifestSqlCtes("", "TRUE") +
      "\nSELECT doc_id, source, copy_n, shard, pos FROM mf" +
      "\nORDER BY shard, pos"

  // --- q136: manifest churn under corpus growth -------------------------

  /** Snapshot A drops every doc with doc_id ≡ 9 (mod 10) — "last 10% of
    * the crawl hasn't arrived yet". */
  val ChurnHoldoutMod = 10

  /** q136 — manifest churn audit: rebuild the q133 manifest on a corpus
    * snapshot missing 10% of documents and diff it against the full
    * manifest, per shard — the operational question behind incremental
    * training-set assembly ("what does a nightly corpus drop do to the
    * epoch order?"). Because every assignment is content/id-hashed,
    * shard membership of a surviving (doc, copy) NEVER changes — churn
    * is confined to (a) entries appearing/disappearing as gate survivors
    * and mixture targets move, and (b) position drift within a shard,
    * which the audit quantifies as mean |Δpos|. A loader that re-reads
    * only changed shards can bound its restart cost with exactly this
    * report.
    *
    * Scale (100 TB): ONE corpus text scan — the gate stage is per-doc,
    * so the snapshot filter commutes with it and both manifest DAGs
    * grow from the same materialized gate output (the round-6 shape
    * re-scanned the corpus per snapshot); then the two post-gate chains
    * (windows over slim (doc_id, source, h) rows), one full-outer join
    * on (doc_id, copy_n), and a per-shard aggregate — the join keys are
    * the manifest's own identity, so the diff co-partitions with the
    * manifests. */
  def manifestChurn(s: SparkSession, dir: String): DataFrame = {
    val gated = CurationOps.cutLineage(gatedOf(t(s, dir, "documents")))
    val a = manifestFromGated(
        gated.filter(col("doc_id") % ChurnHoldoutMod =!= (ChurnHoldoutMod - 1)))
      .select(col("doc_id"), col("copy_n"), col("shard").as("shard_a"),
        col("pos").as("pos_a"))
    val b = manifestFromGated(gated)
      .select(col("doc_id"), col("copy_n"), col("shard").as("shard_b"),
        col("pos").as("pos_b"))
    val common = col("pos_a").isNotNull && col("pos_b").isNotNull
    a.join(b, Seq("doc_id", "copy_n"), "full_outer")
      .groupBy(coalesce(col("shard_b"), col("shard_a")).as("shard"))
      .agg(
        count(col("pos_a")).as("n_a"),
        count(col("pos_b")).as("n_b"),
        sum(when(common, 1L).otherwise(0L)).as("n_common"),
        sum(when(col("pos_a").isNull, 1L).otherwise(0L)).as("n_new"),
        sum(when(col("pos_b").isNull, 1L).otherwise(0L)).as("n_dropped"),
        sum(when(common, abs(col("pos_b") - col("pos_a"))).otherwise(0L))
          .as("shift_sum"))
      .select(col("shard"), col("n_a"), col("n_b"), col("n_common"),
        col("n_new"), col("n_dropped"),
        round(col("shift_sum").cast("double") /
          col("n_common").cast("double"), 6).as("mean_pos_shift"))
      .orderBy("shard")
  }

  def manifestChurnOracle: String = {
    val tail =
      """j AS (SELECT coalesce(mf_b.shard, mf_a.shard) AS shard,
        |    mf_a.pos AS pos_a, mf_b.pos AS pos_b
        |  FROM mf_a FULL OUTER JOIN mf_b
        |    ON mf_a.doc_id = mf_b.doc_id AND mf_a.copy_n = mf_b.copy_n)
        |SELECT shard, count(pos_a) AS n_a, count(pos_b) AS n_b,
        |  CAST(sum(CASE WHEN pos_a IS NOT NULL AND pos_b IS NOT NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
        |  CAST(sum(CASE WHEN pos_a IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_new,
        |  CAST(sum(CASE WHEN pos_b IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dropped,
        |  round(CAST(CAST(sum(CASE WHEN pos_a IS NOT NULL AND pos_b
        |      IS NOT NULL THEN abs(pos_b - pos_a) ELSE 0 END) AS BIGINT)
        |      AS DOUBLE)
        |    / CAST(CAST(sum(CASE WHEN pos_a IS NOT NULL AND pos_b IS NOT
        |      NULL THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE), 6)
        |    AS mean_pos_shift
        |FROM j GROUP BY shard ORDER BY shard""".stripMargin
    "WITH " +
      manifestSqlCtes("_a",
        s"doc_id % $ChurnHoldoutMod <> ${ChurnHoldoutMod - 1}") + ",\n" +
      manifestSqlCtes("_b", "TRUE") + ",\n" + tail
  }

  def epochShuffleAuditOracle: String =
    s"""WITH d AS (SELECT doc_id, source,
       |    CAST('0x' || substr(md5('shuf' || CAST(doc_id AS VARCHAR)), 1, 15)
       |      AS BIGINT) % $ShuffleShards AS shard,
       |    CAST('0x' || substr(md5('ord' || CAST(doc_id AS VARCHAR)), 1, 15)
       |      AS BIGINT) AS ordk
       |  FROM documents),
       |sq AS (SELECT shard, source,
       |    lag(source) OVER (PARTITION BY shard ORDER BY ordk, doc_id)
       |      AS prev_src FROM d),
       |a AS (SELECT shard, count(*) AS n_docs,
       |    CAST(sum(CASE WHEN prev_src = source THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_same FROM sq GROUP BY shard),
       |e AS (SELECT shard, CAST(sum(c * (c - 1)) AS BIGINT) AS num,
       |    CAST(sum(c) AS BIGINT) AS n FROM (
       |    SELECT shard, source, count(*) AS c FROM d GROUP BY shard, source)
       |  GROUP BY shard)
       |SELECT a.shard, n_docs, n_same,
       |  CASE WHEN n_docs > 1 THEN round(CAST(n_same AS DOUBLE)
       |    / CAST(n_docs - 1 AS DOUBLE), 6) ELSE 0.0 END AS same_rate,
       |  CASE WHEN n_docs > 1 THEN round(CAST(num AS DOUBLE)
       |    / CAST(n * (n - 1) AS DOUBLE), 6) ELSE 0.0 END AS expected_rate
       |FROM a JOIN e ON a.shard = e.shard ORDER BY a.shard""".stripMargin

  // --- q167: feasible uniform mixture via exact water-filling ------------

  /** Budget as a fraction of total corpus chars: numerator/denominator
    * of 9/10 = 90%. */
  val WaterfillBudgetNum = 9L
  val WaterfillBudgetDen = 10L

  /** q167 — FEASIBLE mixture allocation by exact water-filling: a
    * recipe that says "mix the sources uniformly up to budget B"
    * (the equal-mix ask) is usually infeasible — small sources run out
    * — and the standard answer caps them at availability and spreads
    * the freed budget over the rest, i.e. finds the water level λ with
    * Σ min(avail_i, λ) = B. Iterating cap-and-redistribute converges
    * slowly and needs driver loops; the CLOSED FORM is one window pass
    * over sources sorted by availability: source j is capped iff
    * prefix_j + avail_j·(K−j) ≤ B (even granting every later source
    * avail_j still fits), the capped set is provably a prefix of that
    * order, and λ = (B − prefix_{j*}) div (K − j*) with the remainder
    * spread one char each to the first uncapped sources. Pure integer
    * arithmetic end to end; Σ alloc = B EXACTLY (spec-pinned).
    *
    * Scale (100 TB): the per-source availability aggregate is the only
    * corpus-sized work (map-combinable); the water-filling itself runs
    * on the |sources|-row frame — the global-ordered windows are over
    * ~tens of rows, not data. */
  def waterfillAlloc(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val av = t(s, dir, "documents").groupBy("source")
      .agg(sum(col("n_chars")).as("avail"))
    val wOrd = Window.orderBy(col("avail"), col("source"))
    val wAll = Window.partitionBy()
    av
      .withColumn("j", row_number().over(wOrd).cast("bigint"))
      .withColumn("prefix", sum(col("avail")).over(wOrd))
      .withColumn("k", count(lit(1)).over(wAll))
      .withColumn("b",
        expr(s"(sum(avail) OVER () * $WaterfillBudgetNum) " +
          s"div $WaterfillBudgetDen"))
      .withColumn("is_capped",
        col("prefix") + col("avail") * (col("k") - col("j")) <= col("b"))
      .withColumn("jstar",
        max(when(col("is_capped"), col("j")).otherwise(0L)).over(wAll))
      .withColumn("pstar",
        max(when(col("is_capped"), col("prefix")).otherwise(0L)).over(wAll))
      .withColumn("lam",
        expr("(b - pstar) div (k - jstar)"))
      .withColumn("rem", expr("(b - pstar) % (k - jstar)"))
      .withColumn("alloc", when(col("is_capped"), col("avail"))
        .otherwise(col("lam") +
          when(col("j") - col("jstar") <= col("rem"), 1L).otherwise(0L)))
      .select(col("source"), col("avail"), col("b").as("budget"),
        col("alloc"), col("is_capped").as("capped"),
        round(col("alloc") / col("avail"), 6).as("fill_frac"))
      .orderBy("source")
  }

  def waterfillAllocOracle: String =
    s"""WITH av AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS avail
       |  FROM documents GROUP BY source),
       |w AS (SELECT source, avail,
       |    CAST(row_number() OVER (ORDER BY avail, source) AS BIGINT) AS j,
       |    CAST(sum(avail) OVER (ORDER BY avail, source
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS prefix,
       |    CAST(count(*) OVER () AS BIGINT) AS k,
       |    (CAST(sum(avail) OVER () AS BIGINT) * $WaterfillBudgetNum)
       |      // $WaterfillBudgetDen AS b
       |  FROM av),
       |f AS (SELECT *,
       |    prefix + avail * (k - j) <= b AS is_capped FROM w),
       |g AS (SELECT *,
       |    max(CASE WHEN is_capped THEN j ELSE 0 END) OVER () AS jstar,
       |    max(CASE WHEN is_capped THEN prefix ELSE 0 END) OVER () AS pstar
       |  FROM f),
       |h AS (SELECT *, (b - pstar) // (k - jstar) AS lam,
       |    (b - pstar) % (k - jstar) AS rem FROM g)
       |SELECT source, avail, b AS budget,
       |  CASE WHEN is_capped THEN avail
       |    ELSE lam + CASE WHEN j - jstar <= rem THEN 1 ELSE 0 END END
       |    AS alloc,
       |  is_capped AS capped,
       |  round(CASE WHEN is_capped THEN avail
       |    ELSE lam + CASE WHEN j - jstar <= rem THEN 1 ELSE 0 END END
       |    / avail, 6) AS fill_frac
       |FROM h ORDER BY source""".stripMargin

  // --- q206: temperature sensitivity curve --------------------------------

  /** Token budget priced across the temperature grid. */
  val TempCurveBudget = 1000000L

  /** q206 — temperature sensitivity curve: ONE run prices the whole
    * temperature grid τ ∈ {0.5, 1, 2, 4} for the p_s^(1/τ) source
    * re-balancing rule (q130 fixes a single τ; choosing τ is the actual
    * design decision, and this is the table that decides it — the q196
    * "one run prices every threshold" pattern applied to mixture
    * design). Per (τ, source): normalized sampling weight, the token
    * allocation out of a fixed [[TempCurveBudget]], and the effective
    * epoch count alloc/tokens — the number a data lead reads to spot
    * "τ=4 would repeat src5 eleven times" before launching a run.
    *
    * Parity: the τ grid is restricted to powers of two so p^(1/τ) needs
    * NO libm pow — τ=0.5 is p·p (exact IEEE multiply), τ=1 is p, τ=2 is
    * sqrt(p), τ=4 is sqrt(sqrt(p)); IEEE 754 requires sqrt to be
    * correctly rounded, so both engines produce bit-identical doubles
    * (the same argument that keeps exp/ln out of q142/q190). Each term
    * is then frozen to ×1e12 fixed point and normalized by an
    * order-free INTEGER sum; weights/epochs are one double division
    * each, allocations are exact integer (budget·fp) div denom.
    *
    * Scale (100 TB): the corpus collapses once to |sources| token
    * counts (map-combinable sum); the grid explode and normalization
    * act on |grid|·|sources| metadata rows. Adding τ values costs
    * nothing — the corpus is NOT re-scanned per τ. */
  def temperatureCurve(s: SparkSession, dir: String): DataFrame = {
    import TextOps.wsTokenCount
    // normalizers are WINDOW sums over the |sources|- and
    // |grid|·|sources|-row metadata frames: the whole query is one
    // linear plan off a single corpus scan (a self-join against a
    // derived totals frame would recompute the scan per consumer)
    val cnts = t(s, dir, "documents")
      .groupBy("source")
      .agg(sum(wsTokenCount(col("text"))).as("tk"))
      .withColumn("tk_tot",
        sum(col("tk")).over(Window.partitionBy(lit(1))))
    val terms = cnts
      .withColumn("p", col("tk").cast("double") / col("tk_tot").cast("double"))
      .select(col("source"), col("tk"),
        explode(array(
          struct(lit("0.5").as("tau"), (col("p") * col("p")).as("f")),
          struct(lit("1").as("tau"), col("p").as("f")),
          struct(lit("2").as("tau"), sqrt(col("p")).as("f")),
          struct(lit("4").as("tau"), sqrt(sqrt(col("p"))).as("f"))))
          .as("g"))
      .select(col("source"), col("tk"), col("g.tau").as("tau"),
        floor(col("g.f") * 1e12).cast("bigint").as("w_fp"))
    terms
      .withColumn("den", sum(col("w_fp")).over(Window.partitionBy("tau")))
      .select(col("tau"), col("source"), col("tk"),
        round(col("w_fp").cast("double") / col("den").cast("double"), 6)
          .as("weight"),
        expr(s"($TempCurveBudget * w_fp) div den").as("alloc_tokens"))
      .withColumn("epochs", round(
        col("alloc_tokens").cast("double") / col("tk").cast("double"), 6))
      .orderBy("tau", "source")
  }

  def temperatureCurveOracle: String =
    s"""WITH c AS (SELECT source,
       |    CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
       |      AS tk
       |  FROM documents GROUP BY source),
       |t AS (SELECT CAST(sum(tk) AS BIGINT) AS tk_tot FROM c),
       |pr AS (SELECT source, tk,
       |    CAST(tk AS DOUBLE) / CAST(tk_tot AS DOUBLE) AS p FROM c, t),
       |g AS (
       |  SELECT source, tk, '0.5' AS tau,
       |    CAST(floor(p * p * 1e12) AS BIGINT) AS w_fp FROM pr
       |  UNION ALL SELECT source, tk, '1',
       |    CAST(floor(p * 1e12) AS BIGINT) FROM pr
       |  UNION ALL SELECT source, tk, '2',
       |    CAST(floor(sqrt(p) * 1e12) AS BIGINT) FROM pr
       |  UNION ALL SELECT source, tk, '4',
       |    CAST(floor(sqrt(sqrt(p)) * 1e12) AS BIGINT) FROM pr),
       |d AS (SELECT tau, CAST(sum(w_fp) AS BIGINT) AS den
       |  FROM g GROUP BY tau)
       |SELECT g.tau, g.source, g.tk,
       |  round(CAST(w_fp AS DOUBLE) / CAST(den AS DOUBLE), 6) AS weight,
       |  ($TempCurveBudget * w_fp) // den AS alloc_tokens,
       |  round(CAST(($TempCurveBudget * w_fp) // den AS DOUBLE) /
       |    CAST(g.tk AS DOUBLE), 6) AS epochs
       |FROM g JOIN d USING (tau) ORDER BY g.tau, g.source""".stripMargin

  // --- q266: offline bandit replay (off-policy evaluation) ---------------

  /** q266 — offline replay evaluation of a greedy arm-selection policy
    * (Li et al.'s replay method): treat the event types as arms and
    * the logged stream as a uniform logging policy; each day the
    * candidate policy picks the arm with the best CUMULATIVE mean
    * reward through yesterday, and is scored on exactly the logged
    * events whose arm matches the choice. This is the evaluation loop
    * a data-mixture bandit (the adaptive version of q130/q206's static
    * temperature mixing) runs before any policy ships.
    *
    * Exactness: cumulative means are rationals over integer sums
    * (values frozen ×100); the per-day argmax orders one exact double
    * division with an alphabetical tie-break. The OUTPUT roundings are
    * exact integer half-up on the underlying rationals ((200a+b) div
    * (2b), then one bigint→double cast and one /10000.0 — bit-identical
    * on both engines): round-13 found an exact tie cell (30703/8/100 =
    * 38.378750) where Spark's shortest-repr double round (HALF_UP on
    * "38.37875" → .3788) and DuckDB's IEEE-value round (38.3787499…99 →
    * .3787) disagree, so no double ever reaches a round() here.
    *
    * Scale (100 TB): one (arm, day) cell collapse; cumulative sums and
    * the per-day argmax are windows over |arms|·|calendar| cells; the
    * replay join is cell-keyed. */
  def banditReplay(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = EtlOps.t(s, dir, "events").selectExpr(
        "event_type AS arm",
        "CAST(datediff(ts, DATE '2024-01-01') AS BIGINT) AS d",
        "CAST(round(value * 100, 0) AS BIGINT) AS v")
      .groupBy("arm", "d")
      .agg(sum(col("v")).as("sv"), count(lit(1)).as("c")).persist()
    val wCum = Window.partitionBy("arm").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = cells
      .withColumn("cumv", sum(col("sv")).over(wCum))
      .withColumn("cumc", sum(col("c")).over(wCum))
    // the policy for day d+1 reads the cumulative board through d
    val board = cum.select((col("d") + 1).as("d"), col("arm"),
      (col("cumv").cast("double") / col("cumc")).as("m"),
      col("cumv"), col("cumc"))
    val chosen = board.withColumn("rn", row_number().over(
        Window.partitionBy("d").orderBy(col("m").desc, col("arm"))))
      .filter(col("rn") === 1)
      .select(col("d"), col("arm"), col("cumv"), col("cumc"))
    chosen.join(cells, Seq("arm", "d"))
      .selectExpr("d AS day", "arm AS chosen_arm", "c AS n_matched",
        "CAST((200L*sv + c) DIV (2*c) AS DOUBLE) / 10000.0 AS replay_reward",
        "CAST((200L*cumv + cumc) DIV (2*cumc) AS DOUBLE) / 10000.0 AS board_mean")
      .orderBy("day")
  }

  def banditReplayOracle: String =
    s"""WITH cells AS (SELECT event_type AS arm,
       |    CAST(date_diff('day', DATE '2024-01-01', ts) AS BIGINT)
       |      AS d,
       |    CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
       |      AS sv,
       |    CAST(count(*) AS BIGINT) AS c
       |  FROM events GROUP BY 1, 2),
       |cum AS (SELECT *,
       |    CAST(sum(sv) OVER w AS BIGINT) AS cumv,
       |    CAST(sum(c) OVER w AS BIGINT) AS cumc
       |  FROM cells
       |  WINDOW w AS (PARTITION BY arm ORDER BY d ROWS BETWEEN
       |    UNBOUNDED PRECEDING AND CURRENT ROW)),
       |board AS (SELECT d + 1 AS d, arm,
       |    CAST(cumv AS DOUBLE) / cumc AS m, cumv, cumc FROM cum),
       |ch AS (SELECT d, arm, cumv, cumc,
       |    row_number() OVER (PARTITION BY d ORDER BY m DESC, arm)
       |      AS rn
       |  FROM board QUALIFY rn = 1)
       |SELECT ch.d AS day, ch.arm AS chosen_arm, c AS n_matched,
       |  CAST((200*sv + c) // (2*c) AS DOUBLE) / 10000.0
       |    AS replay_reward,
       |  CAST((200*cumv + cumc) // (2*cumc) AS DOUBLE) / 10000.0
       |    AS board_mean
       |FROM ch JOIN cells ON cells.arm = ch.arm AND cells.d = ch.d
       |ORDER BY day""".stripMargin

  // --- q289: doubly-robust off-policy evaluation ---------------------------

  /** Known logging-policy inverse propensity (the stream logs all
    * [[DrArms]] arms; the DESIGN propensity 1/5 is what IPS/DR divide
    * by — with the EMPIRICAL propensity both collapse to the replay
    * mean and the comparison is vacuous). */
  val DrArms = 5

  /** q289 — doubly-robust off-policy evaluation: completes the OPE
    * triad (q234 importance-weighted eval, q266 replay) with the
    * estimator production systems actually ship (Dudík et al.): per
    * day, DM trusts the model (the q266 cumulative board), IPS trusts
    * only matched logged rewards reweighted by the known 1/[[DrArms]]
    * logging propensity, and DR = DM + IPS-weighted residual — unbiased
    * like IPS when the model is wrong, low-variance like DM when it is
    * right. The output pins the textbook ordering: DR's between-day
    * variance must undercut IPS's (the board is a decent model here).
    *
    * Exactness: daily estimates are fixed-order double expressions over
    * exact integer cells, frozen to ×1e9 BIGINTs before the cross-day
    * moment sums (squares in DECIMAL(38,0)/HUGEINT); mean and variance
    * are final divisions.
    *
    * Scale (100 TB): the q266 (arm, day) cell collapse; estimators are
    * calendar-cell algebra. */
  def drOpe(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = EtlOps.t(s, dir, "events").selectExpr(
        "event_type AS arm",
        "CAST(datediff(ts, DATE '2024-01-01') AS BIGINT) AS d",
        "CAST(round(value * 100, 0) AS BIGINT) AS v")
      .groupBy("arm", "d")
      .agg(sum(col("v")).as("sv"), count(lit(1)).as("c")).persist()
    val wCum = Window.partitionBy("arm").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = cells
      .withColumn("cumv", sum(col("sv")).over(wCum))
      .withColumn("cumc", sum(col("c")).over(wCum))
    val board = cum.select((col("d") + 1).as("d"), col("arm"),
      (col("cumv").cast("double") / col("cumc")).as("m"))
    val chosen = board.withColumn("rn", row_number().over(
        Window.partitionBy("d").orderBy(col("m").desc, col("arm"))))
      .filter(col("rn") === 1).select(col("d"), col("arm"),
        col("m").as("q"))
    val nd = cells.groupBy("d").agg(sum(col("c")).as("n_d"))
    val daily = chosen
      .join(cells.select(col("arm"), col("d"),
        col("sv").as("sv_c"), col("c").as("c_c")),
        Seq("arm", "d"), "left")
      .join(nd, Seq("d"))
      .selectExpr("d",
        "CAST(floor(q / 100.0 * 1e9) AS BIGINT) AS dm_fp",
        s"CAST(floor($DrArms.0 * coalesce(sv_c, 0) / 100.0 / n_d " +
          "* 1e9) AS BIGINT) AS ips_fp",
        s"CAST(floor((q / 100.0 + $DrArms.0 * " +
          "(coalesce(sv_c, 0) / 100.0 - coalesce(c_c, 0) * q / 100.0)" +
          " / n_d) * 1e9) AS BIGINT) AS dr_fp")
    val est = daily.selectExpr(
      "stack(3, 'dm', dm_fp, 'ips', ips_fp, 'dr', dr_fp) " +
        "AS (estimator, fp)")
    est.groupBy("estimator").agg(
        count(lit(1L)).as("n_days"),
        sum(col("fp")).as("sf"),
        sum(expr("CAST(fp AS DECIMAL(38,0)) * fp")).as("sff"))
      .selectExpr("estimator", "n_days",
        "round(CAST(sf AS DOUBLE) / n_days / 1e9, 4) AS value_hat",
        "round(sqrt((CAST(sff AS DOUBLE) - CAST(sf AS DOUBLE) * sf " +
          "/ n_days) / (n_days - 1.0)) / 1e9, 4) AS day_sd")
      .orderBy("estimator")
  }

  def drOpeOracle: String =
    s"""WITH cells AS (SELECT event_type AS arm,
       |    CAST(date_diff('day', DATE '2024-01-01', ts) AS BIGINT)
       |      AS d,
       |    CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
       |      AS sv,
       |    CAST(count(*) AS BIGINT) AS c
       |  FROM events GROUP BY 1, 2),
       |cum AS (SELECT *,
       |    CAST(sum(sv) OVER w AS BIGINT) AS cumv,
       |    CAST(sum(c) OVER w AS BIGINT) AS cumc
       |  FROM cells
       |  WINDOW w AS (PARTITION BY arm ORDER BY d ROWS BETWEEN
       |    UNBOUNDED PRECEDING AND CURRENT ROW)),
       |board AS (SELECT d + 1 AS d, arm,
       |    CAST(cumv AS DOUBLE) / cumc AS m FROM cum),
       |ch AS (SELECT d, arm, m AS q,
       |    row_number() OVER (PARTITION BY d ORDER BY m DESC, arm)
       |      AS rn
       |  FROM board QUALIFY rn = 1),
       |nd AS (SELECT d, CAST(sum(c) AS BIGINT) AS n_d FROM cells
       |  GROUP BY d),
       |daily AS (SELECT ch.d,
       |    CAST(floor(ch.q / 100.0 * 1e9) AS BIGINT) AS dm_fp,
       |    CAST(floor($DrArms.0 * coalesce(cells.sv, 0) / 100.0
       |      / nd.n_d * 1e9) AS BIGINT) AS ips_fp,
       |    CAST(floor((ch.q / 100.0 + $DrArms.0 *
       |      (coalesce(cells.sv, 0) / 100.0 - coalesce(cells.c, 0)
       |      * ch.q / 100.0) / nd.n_d) * 1e9) AS BIGINT) AS dr_fp
       |  FROM ch
       |  LEFT JOIN cells ON cells.arm = ch.arm AND cells.d = ch.d
       |  JOIN nd ON nd.d = ch.d),
       |lng AS (SELECT 'dm' AS estimator, dm_fp AS fp FROM daily
       |  UNION ALL SELECT 'ips', ips_fp FROM daily
       |  UNION ALL SELECT 'dr', dr_fp FROM daily)
       |SELECT estimator, count(*) AS n_days,
       |  round(CAST(sum(fp) AS DOUBLE) / count(*) / 1e9, 4)
       |    AS value_hat,
       |  round(sqrt((CAST(sum(CAST(fp AS HUGEINT) * fp) AS DOUBLE)
       |    - CAST(sum(fp) AS DOUBLE) * sum(fp) / count(*))
       |    / (count(*) - 1.0)) / 1e9, 4) AS day_sd
       |FROM lng GROUP BY estimator ORDER BY estimator""".stripMargin

  // --- q311: isotonic (PAV) score calibration -----------------------------

  /** q311 — isotonic calibration of the q129 classifier against the
    * q104 rule labels over q195's score bins: the pool-adjacent-
    * violators fit via its exact minimax characterization
    * fit(i) = max_{j≤i} min_{k≥i} mean(pass over bins j..k) — the
    * monotone probability map production actually applies to raw
    * scores (Platt's alternative; Zadrozny & Elkan 2002). q195's ECE
    * says HOW miscalibrated the raw score is; THIS is the repaired
    * curve, with each bin's pooling flag showing where the raw
    * reliability diagram violated monotonicity.
    *
    * Exactness: cumulative pass/doc counts are exact integers, every
    * segment mean is ONE double division of those, and min/max over
    * identically-computed doubles are order-free — the fit is
    * bit-identical on both engines with no fixed-point needed.
    *
    * Scale (100 TB): reuses q195's two corpus passes (shared
    * [[calBinned]]); the minimax triple is [[CalBins]]³ = 1000 tiny
    * rows of bin algebra — constant, whatever the corpus. */
  def isotonicCalibration(s: SparkSession, dir: String): DataFrame = {
    val perBin = calBinned(s, dir).groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("pass"), 1L).otherwise(0L)).as("n_pass"))
    val w = Window.partitionBy(lit(1)).orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = perBin
      .withColumn("cp", sum(col("n_pass")).over(w))
      .withColumn("cn", sum(col("n_docs")).over(w))
      .persist()
    val anchor = s.range(1).selectExpr("-1L AS jb", "0L AS cpj", "0L AS cnj")
    val jz = cum.selectExpr("bin AS jb", "cp AS cpj", "cn AS cnj")
      .unionAll(anchor)
    val k = cum.selectExpr("bin AS kb", "cp AS cpk", "cn AS cnk")
    val i = cum.select(col("bin"))
    // segment means m(j..k) for the minimax: j = jb+1 ≤ i ≤ k
    val fit = i
      .join(jz, col("jb") < col("bin"))
      .join(k, col("kb") >= col("bin"))
      .withColumn("m", (col("cpk") - col("cpj")).cast("double") /
        (col("cnk") - col("cnj")).cast("double"))
      .groupBy("bin", "jb").agg(min(col("m")).as("inner"))
      .groupBy("bin").agg(max(col("inner")).as("iso"))
    perBin.join(fit, "bin")
      .withColumn("raw_rate",
        col("n_pass").cast("double") / col("n_docs").cast("double"))
      .select(col("bin"), col("n_docs"), col("n_pass"),
        round(col("raw_rate"), 6).as("raw_rate"),
        round(col("iso"), 6).as("iso_rate"),
        (round(col("iso"), 6) =!= round(col("raw_rate"), 6)).as("pooled"))
      .orderBy("bin")
  }

  def isotonicCalibrationOracle: String = {
    import graft.operators.CurationOps.{ClfLogitWSql, GopherSql}
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |  FROM documents),
       |lg AS (SELECT doc_id, CAST(sum($ClfLogitWSql) AS BIGINT) AS logit
       |  FROM tok GROUP BY doc_id),
       |base AS (SELECT lg.logit, ($GopherSql) AS pass
       |  FROM documents JOIN lg USING (doc_id)),
       |st AS (SELECT min(logit) AS lmin, max(logit) AS lmax FROM base),
       |binned AS (SELECT pass,
       |    least(${CalBins - 1},
       |      CAST(floor(CAST(logit - lmin AS DOUBLE) * $CalBins
       |        / CAST(lmax - lmin AS DOUBLE)) AS BIGINT)) AS bin
       |  FROM base CROSS JOIN st),
       |per_bin AS (SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_pass
       |  FROM binned GROUP BY bin),
       |cum AS (SELECT bin, n_docs, n_pass,
       |    CAST(sum(n_pass) OVER (ORDER BY bin) AS BIGINT) AS cp,
       |    CAST(sum(n_docs) OVER (ORDER BY bin) AS BIGINT) AS cn
       |  FROM per_bin),
       |jz AS (SELECT bin AS jb, cp AS cpj, cn AS cnj FROM cum
       |  UNION ALL SELECT -1, 0, 0),
       |inner_min AS (SELECT i.bin, jz.jb,
       |    min(CAST(k.cp - jz.cpj AS DOUBLE)
       |      / CAST(k.cn - jz.cnj AS DOUBLE)) AS innerv
       |  FROM cum i
       |  JOIN jz ON jz.jb < i.bin
       |  JOIN cum k ON k.bin >= i.bin
       |  GROUP BY i.bin, jz.jb),
       |fit AS (SELECT bin, max(innerv) AS iso FROM inner_min
       |  GROUP BY bin)
       |SELECT p.bin, p.n_docs, p.n_pass,
       |  round(CAST(p.n_pass AS DOUBLE) / CAST(p.n_docs AS DOUBLE), 6)
       |    AS raw_rate,
       |  round(f.iso, 6) AS iso_rate,
       |  round(f.iso, 6) <>
       |    round(CAST(p.n_pass AS DOUBLE) / CAST(p.n_docs AS DOUBLE), 6)
       |    AS pooled
       |FROM per_bin p JOIN fit f USING (bin) ORDER BY p.bin""".stripMargin
  }

  // --- q343: IPF raking to reference marginals ------------------------------

  /** Full IPF rounds (each = one row step + one column step). */
  val IpfRounds = 3

  /** q343 — iterative proportional fitting / raking (Deming & Stephan
    * 1940 — the survey-weighting classic): reweight one hash-split
    * half of the corpus so its (lang × source) cell masses match the
    * marginals OBSERVED on the other half — the standard fix when a
    * corpus slice over/under-represents languages or sources relative
    * to a reference population. (The split is md5(doc_id) parity, NOT
    * doc_id parity: sources cycle with doc_id in the fixture, so an
    * arithmetic split makes the two halves' source sets DISJOINT and
    * the rake degenerate.) [[IpfRounds]] rounds of alternating
    * row (lang) and column (source) mass scaling; output: each cell's
    * count, its final rake weight, and the residual marginal gaps
    * (shares of population mass) the fixed rounds leave.
    *
    * Parity: targets are exact-integer ratios; each half-step's
    * achieved marginal mass is Σ floor(n·w·1e9) BIGINT (order-free),
    * and the weight update w·(D/(afp/1e9)) is a parenthesis-pinned
    * double chain — engine-identical given identical inputs, so the
    * whole 6-half-step recurrence is deterministic (the q308/q332
    * discipline). The marginal sums are PARTITIONED WINDOWS over the
    * cell frame rather than aggregate-rejoins — one exchange per half
    * step and no self-join (the q335 rollup lesson).
    *
    * Scale (100 TB): the corpus collapses ONCE to |lang × source|
    * metadata cells; all six half-steps are window passes over that
    * metadata frame. This is why raking is free at any corpus size —
    * the data is touched once. */
  def ipfRaking(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = t(s, dir, "documents")
      .select(TextOps.md5Fingerprint60(col("doc_id").cast("string"))
        .as("hsplit"), col("lang"), col("source"))
    val cells = docs.filter(col("hsplit") % 2 === 1)
      .groupBy("lang", "source").agg(count(lit(1)).as("n")).persist()
    val nPop = cells.agg(sum(col("n")).as("n_pop"))
    val ref = docs.filter(col("hsplit") % 2 === 0)
    val nRef = ref.agg(count(lit(1)).as("n_ref"))
    val dl = ref.groupBy("lang").agg(count(lit(1)).as("r_l"))
      .crossJoin(broadcast(nRef)).crossJoin(broadcast(nPop))
      .selectExpr("lang", "(CAST(r_l AS DOUBLE) * n_pop) / n_ref AS d_l")
    val ds = ref.groupBy("source").agg(count(lit(1)).as("c_s"))
      .crossJoin(broadcast(nRef)).crossJoin(broadcast(nPop))
      .selectExpr("source",
        "(CAST(c_s AS DOUBLE) * n_pop) / n_ref AS d_s")
    val wl = Window.partitionBy("lang")
    val ws = Window.partitionBy("source")
    val fp = expr("CAST(floor((n * w) * 1e9) AS BIGINT)")
    var w = cells.withColumn("w", lit(1.0))
      .join(broadcast(dl), Seq("lang"))
      .join(broadcast(ds), Seq("source"))
    (1 to IpfRounds).foreach { _ =>
      w = w.withColumn("afp", sum(fp).over(wl))
        .withColumn("w", expr("w * (d_l / (CAST(afp AS DOUBLE) / 1e9))"))
        .drop("afp")
      w = w.withColumn("afp", sum(fp).over(ws))
        .withColumn("w", expr("w * (d_s / (CAST(afp AS DOUBLE) / 1e9))"))
        .drop("afp")
    }
    w.withColumn("afp_l", sum(fp).over(wl))
      .withColumn("afp_s", sum(fp).over(ws))
      .crossJoin(broadcast(nPop))
      .selectExpr("lang", "source", "n", "round(w, 6) AS weight",
        "round((CAST(afp_l AS DOUBLE) / 1e9 - d_l) / n_pop, 6) + 0.0" +
          " AS lang_gap",
        "round((CAST(afp_s AS DOUBLE) / 1e9 - d_s) / n_pop, 6) + 0.0" +
          " AS source_gap")
      .orderBy("lang", "source")
  }

  def ipfRakingOracle: String = {
    val steps = (1 to IpfRounds).map { r =>
      val prev = if (r == 1) "w0" else s"wc${r - 1}"
      s"""wr$r AS (SELECT lang, source, n, d_l, d_s,
         |    w * (d_l / (CAST(sum(CAST(floor((n * w) * 1e9) AS BIGINT))
         |      OVER (PARTITION BY lang) AS DOUBLE) / 1e9)) AS w
         |  FROM $prev),
         |wc$r AS (SELECT lang, source, n, d_l, d_s,
         |    w * (d_s / (CAST(sum(CAST(floor((n * w) * 1e9) AS BIGINT))
         |      OVER (PARTITION BY source) AS DOUBLE) / 1e9)) AS w
         |  FROM wr$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH hs AS (SELECT lang, source,
       |    ${OracleGen.fp60("CAST(doc_id AS VARCHAR)")} % 2 AS hsplit
       |  FROM documents),
       |pop AS (SELECT lang, source, count(*) AS n FROM hs
       |  WHERE hsplit = 1 GROUP BY lang, source),
       |np AS (SELECT CAST(sum(n) AS BIGINT) AS n_pop FROM pop),
       |ref AS (SELECT lang, source FROM hs WHERE hsplit = 0),
       |nr AS (SELECT count(*) AS n_ref FROM ref),
       |dl AS (SELECT lang,
       |    (CAST(count(*) AS DOUBLE) * n_pop) / n_ref AS d_l
       |  FROM ref, np, nr GROUP BY lang, n_pop, n_ref),
       |ds AS (SELECT source,
       |    (CAST(count(*) AS DOUBLE) * n_pop) / n_ref AS d_s
       |  FROM ref, np, nr GROUP BY source, n_pop, n_ref),
       |w0 AS (SELECT pop.lang, pop.source, pop.n, dl.d_l, ds.d_s,
       |    CAST(1.0 AS DOUBLE) AS w
       |  FROM pop JOIN dl USING (lang) JOIN ds USING (source)),
       |$steps
       |SELECT lang, source, n, round(w, 6) AS weight,
       |  round((CAST(sum(CAST(floor((n * w) * 1e9) AS BIGINT))
       |    OVER (PARTITION BY lang) AS DOUBLE) / 1e9 - d_l)
       |    / (SELECT n_pop FROM np), 6) + 0.0 AS lang_gap,
       |  round((CAST(sum(CAST(floor((n * w) * 1e9) AS BIGINT))
       |    OVER (PARTITION BY source) AS DOUBLE) / 1e9 - d_s)
       |    / (SELECT n_pop FROM np), 6) + 0.0 AS source_gap
       |FROM wc$IpfRounds ORDER BY lang, source""".stripMargin
  }

  // --- q370: DoReMi-style domain reweighting --------------------------------

  /** Exponentiated-gradient step size (nats⁻¹). */
  val DoremiEta = 1.0

  /** q370 — DoReMi-shaped domain reweighting (Xie et al., NeurIPS
    * 2023): per source, the excess loss of the POOLED unigram LM over
    * that source's OWN specialist LM (both Laplace-smoothed, both
    * scored on the source's token stream), and the exponentiated-
    * gradient mixture weights w_d ∝ exp(η·excess_d). A domain the
    * pooled model underfits relative to what a specialist proves
    * learnable gets upweighted — DoReMi's core signal, with the
    * specialist standing in for the reference model and the pooled LM
    * for the proxy. With losses fixed (no retraining inside a query)
    * the EG iteration telescopes, so ONE closed-form update is the
    * honest form. q102 epochs a GIVEN mixture; THIS proposes one.
    *
    * Parity: both LMs freeze per (token, source) to floor(ln p·10⁹)
    * BIGINT (the q324/q331 ln discipline), so per-source loss sums are
    * exact integers; the exp weights freeze ×10⁹ before the
    * cross-source normalizer sum; every division is pinned.
    *
    * Scale (100 TB): two token-level aggregates (pooled and per-source
    * counts ride the SAME (source, token) frame), one occurrence-level
    * join against a vocab-sized broadcast, one |sources|-row tail. */
  def doremiWeights(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .selectExpr("source", "explode(split(text, ' ')) AS tok")
      .persist()
    val st = toks.groupBy("source", "tok").agg(count(lit(1)).as("c"))
      .persist()
    val sTot = st.groupBy("source")
      .agg(sum("c").as("n"), count(lit(1)).as("v"))
    val pooled = st.groupBy("tok").agg(sum("c").as("pc"))
    val pTot = pooled.agg(sum("pc").as("pn"), count(lit(1)).as("pv"))
    // frozen per-(source, token) log-probs, both models
    val lnp = st.join(sTot, Seq("source"))
      .join(pooled, Seq("tok")).crossJoin(broadcast(pTot))
      .selectExpr("source", "tok", "c",
        "CAST(floor(ln(CAST(c + 1 AS DOUBLE) / CAST(n + v AS DOUBLE))" +
          " * 1e9) AS BIGINT) AS own_fp",
        "CAST(floor(ln(CAST(pc + 1 AS DOUBLE) / CAST(pn + pv AS DOUBLE))" +
          " * 1e9) AS BIGINT) AS pool_fp")
    val loss = lnp.groupBy("source")
      .agg(sum(col("c")).as("n_toks"),
        sum(-col("own_fp") * col("c")).as("own_sum"),
        sum(-col("pool_fp") * col("c")).as("pool_sum"))
      .selectExpr("source", "n_toks",
        "CAST(pool_sum AS DOUBLE) / 1e9 / CAST(n_toks AS DOUBLE)" +
          " AS loss_pooled",
        "CAST(own_sum AS DOUBLE) / 1e9 / CAST(n_toks AS DOUBLE)" +
          " AS loss_own")
      .selectExpr("source", "n_toks", "loss_pooled", "loss_own",
        "loss_pooled - loss_own AS excess",
        s"CAST(floor(exp($DoremiEta * (loss_pooled - loss_own)) * 1e9)" +
          " AS BIGINT) AS w_fp")
      .persist()
    val tot = broadcast(loss.agg(sum("w_fp").as("sw"),
      count(lit(1)).as("nd")))
    loss.crossJoin(tot)
      .selectExpr("source", "n_toks",
        "round(loss_pooled, 6) AS loss_pooled",
        "round(loss_own, 6) AS loss_own",
        "round(excess, 6) AS excess",
        "round(1.0 / CAST(nd AS DOUBLE), 6) AS w_uniform",
        "round(CAST(w_fp AS DOUBLE) / CAST(sw AS DOUBLE), 6)" +
          " AS w_doremi")
      .orderBy("source")
  }

  def doremiWeightsOracle: String =
    s"""WITH toks AS (SELECT source, unnest(string_split(text, ' '))
       |    AS tok FROM documents),
       |st AS (SELECT source, tok, count(*) AS c FROM toks
       |  GROUP BY source, tok),
       |stot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n,
       |    count(*) AS v FROM st GROUP BY source),
       |pooled AS (SELECT tok, CAST(sum(c) AS BIGINT) AS pc FROM st
       |  GROUP BY tok),
       |ptot AS (SELECT CAST(sum(pc) AS BIGINT) AS pn, count(*) AS pv
       |  FROM pooled),
       |lnp AS (SELECT st.source, st.tok, st.c,
       |    CAST(floor(ln(CAST(st.c + 1 AS DOUBLE)
       |      / CAST(stot.n + stot.v AS DOUBLE)) * 1e9) AS BIGINT)
       |      AS own_fp,
       |    CAST(floor(ln(CAST(pooled.pc + 1 AS DOUBLE)
       |      / CAST(ptot.pn + ptot.pv AS DOUBLE)) * 1e9) AS BIGINT)
       |      AS pool_fp
       |  FROM st JOIN stot ON st.source = stot.source
       |  JOIN pooled ON st.tok = pooled.tok, ptot),
       |loss0 AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_toks,
       |    CAST(sum(-own_fp * c) AS BIGINT) AS own_sum,
       |    CAST(sum(-pool_fp * c) AS BIGINT) AS pool_sum
       |  FROM lnp GROUP BY source),
       |loss1 AS (SELECT source, n_toks,
       |    CAST(pool_sum AS DOUBLE) / 1e9 / CAST(n_toks AS DOUBLE)
       |      AS loss_pooled,
       |    CAST(own_sum AS DOUBLE) / 1e9 / CAST(n_toks AS DOUBLE)
       |      AS loss_own
       |  FROM loss0),
       |loss AS (SELECT source, n_toks, loss_pooled, loss_own,
       |    loss_pooled - loss_own AS excess,
       |    CAST(floor(exp($DoremiEta * (loss_pooled - loss_own)) * 1e9)
       |      AS BIGINT) AS w_fp
       |  FROM loss1),
       |tot AS (SELECT CAST(sum(w_fp) AS BIGINT) AS sw, count(*) AS nd
       |  FROM loss)
       |SELECT source, n_toks,
       |  round(loss_pooled, 6) AS loss_pooled,
       |  round(loss_own, 6) AS loss_own,
       |  round(excess, 6) AS excess,
       |  round(1.0 / CAST(nd AS DOUBLE), 6) AS w_uniform,
       |  round(CAST(w_fp AS DOUBLE) / CAST(sw AS DOUBLE), 6) AS w_doremi
       |FROM loss, tot ORDER BY source""".stripMargin
}
