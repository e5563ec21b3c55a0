package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Time-indexed analytics over the event stream and order history:
  * cohort retention, sliding-window distinct users, calendar gap-fill
  * with forward-fill, and exponentially-weighted smoothing.
  *
  * These generalize the reference's freshness monitor
  * (`check_bucket_latest_folders.py:52-62` — "latest date per group")
  * from a single max-date scalar to the full time-bucketed shapes a
  * training-data pipeline reports daily.
  *
  * Scale stance: every operator shuffles on a (key, time-bucket) pair
  * with map-side partial aggregation. The sliding distinct avoids the
  * O(days²) self-join by EXPLODING each observation into the ≤7 windows
  * it participates in (shuffle volume = 7× the distinct user-day table,
  * constant factor, not quadratic); the calendar spine is generated, not
  * scanned; the EWMA turns a sequential recurrence into one windowed
  * fixed-point sum so it needs no iterative driver loop.
  *
  * Parity: dates use day arithmetic only (no engine week semantics);
  * counts are BIGINT; ratios are one BIGINT/BIGINT float division;
  * EWMA weights are powers of two (exact scaling) summed in fixed-point.
  */
object TimeSeriesOps {

  import EtlOps.t

  /** Cohort-week anchor: the Monday the synthetic event stream starts.
    * Week indices are `(day - anchor) div 7` on BOTH engines — engine
    * week-truncation (ISO vs locale) never enters. */
  val CohortAnchor = "2024-01-01"

  // --- q80: cohort retention ---------------------------------------------

  /** q80 — weekly cohort retention: users bucketed by first-active week,
    * then for every (cohort, later week) the fraction of the cohort
    * still active. The canonical product-analytics triangle matrix.
    *
    * Distributed shape: one distinct on (user, week) — the only pass
    * over raw events — then a per-user min-aggregate and a user-keyed
    * join, all partitioned on user_id so the exchanges chain on one
    * layout; the final (cohort, offset) aggregate and the cohort-size
    * table are tiny. At 100 TB the raw scan happens once. */
  def cohortRetention(s: SparkSession, dir: String): DataFrame = {
    // uw (distinct user-weeks — orders of magnitude smaller than raw
    // events) feeds both the cohort min-aggregate and the activity join:
    // persist so the raw scan + distinct shuffle run once
    val uw = EtlOps.events(s, dir)
      .select(col("user_id"),
        expr(s"CAST(datediff(CAST(ts AS DATE), DATE'$CohortAnchor') div 7 AS BIGINT)")
          .as("wk"))
      .distinct()
      .persist()
    val cohort = uw.groupBy("user_id").agg(min(col("wk")).as("cohort_wk"))
    val sizes = cohort.groupBy("cohort_wk")
      .agg(count(lit(1)).as("cohort_n"))
    uw.join(cohort, "user_id")
      .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), "cohort_wk")
      .select(col("cohort_wk"), col("week_offset"), col("n_active"),
        (col("n_active") / col("cohort_n")).as("retention"))
      .orderBy("cohort_wk", "week_offset")
  }

  // --- q81: sliding-window distinct users --------------------------------

  /** q81 — DAU and trailing-7-day distinct users per active day. The
    * rolling distinct cannot be a window aggregate (no DISTINCT inside
    * frames on either engine); the scalable form explodes each distinct
    * user-day into the ≤7 window days it serves, then one
    * (window-day)-keyed distinct count. Shuffle volume is 7× the
    * user-day table — linear, where the naive day×day range self-join
    * is quadratic in the calendar and rescans users per day. */
  def rollingDistinctUsers(s: SparkSession, dir: String): DataFrame = {
    // ud feeds the day list, the DAU aggregate, and the window explode —
    // persist the (small) distinct user-day table so raw events are
    // scanned once
    val ud = EtlOps.events(s, dir)
      .select(col("user_id"), col("ts").cast("date").as("d"))
      .distinct()
      .persist()
    val days = ud.select(col("d")).distinct()
    val dau = ud.groupBy("d").agg(count(lit(1)).as("dau"))
    val contrib = ud.select(col("user_id"),
      explode(expr("sequence(d, date_add(d, 6))")).as("wd"))
    contrib.join(days.withColumnRenamed("d", "wd"), "wd")
      .groupBy(col("wd").as("day"))
      .agg(countDistinct(col("user_id")).as("u7"))
      .join(dau.withColumnRenamed("d", "day"), "day")
      .select(col("day"), col("dau"), col("u7"))
      .orderBy("day")
  }

  // --- q82: calendar gap-fill + forward fill -----------------------------

  /** q82 — per-priority daily order revenue on a complete calendar
    * spine: missing days appear with n_orders = 0 and the last known
    * revenue carried forward (the standard time-series densification
    * before any per-day model sees the data).
    *
    * The spine is GENERATED (sequence over the global min/max date ×
    * distinct priorities) — never scanned; the left join keys on
    * (priority, day); the forward fill is one window pass per priority.
    * Parity: revenue sums go through DECIMAL then one double cast, and
    * the filled value is a straight copy of an already-exact double. */
  def gapFillForwardFill(s: SparkSession, dir: String): DataFrame = {
    // one scan of the fact table: bounds and the priority list derive
    // from the (tiny) daily aggregate, not from re-reading orders
    val daily = t(s, dir, "orders")
      .select(col("o_orderpriority").as("prio"),
        col("o_orderdate").cast("date").as("day"),
        col("o_totalprice"))
      .groupBy("prio", "day")
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,4)"))
          .cast("double").as("rev"))
      .persist()
    val bounds = daily.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
    val spine = daily.select("prio").distinct()
      .crossJoin(broadcast(bounds))
      .select(col("prio"), explode(expr("sequence(lo, hi)")).as("day"))
    val w = Window.partitionBy(col("prio")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, 0)
    spine.join(daily, Seq("prio", "day"), "left")
      .select(col("prio"), col("day"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        last(col("rev"), ignoreNulls = true).over(w).as("rev_ffill"),
        col("rev").isNull.as("is_gap"))
      .orderBy("prio", "day")
  }

  // --- q83: exponentially-weighted moving average ------------------------

  /** EWMA lookback: only the newest [[EwmaN]] events per user enter the
    * average — beyond that, α = ½ weights are below 2⁻³¹ and the
    * contribution is sub-ulp anyway. Bounding the window also bounds the
    * weight exponent so the power-of-two weight stays an exact BIGINT
    * shift. */
  val EwmaN = 32

  /** q83 — per-user EWMA of event values with α = ½. The recurrence
    * ewma_t = ½·x_t + ½·ewma_{t-1} unrolls to Σ wᵢ·xᵢ with weights
    * ½, ¼, … (newest first; the oldest term keeps the closing ½ⁿ⁻¹):
    * a SEQUENTIAL definition turned into one order-free aggregate, which
    * is what makes it distributable — one shuffle on user_id, no
    * iteration.
    *
    * Parity: each weight is 1/2ᵏ (exact double scaling — multiplying by
    * a power of two never rounds); each term is quantized
    * floor(term·10¹²) and summed as BIGINT, so the sum is exact and
    * order-independent on both engines (the double→DECIMAL cast would
    * round in Spark but truncate in DuckDB). */
  def ewma(s: SparkSession, dir: String): DataFrame = {
    val wDesc = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val recent = EtlOps.events(s, dir)
      .select(col("user_id"), col("event_id"), col("value"), col("ts"))
      .withColumn("rd", row_number().over(wDesc))
      .filter(col("rd") <= EwmaN)
    val n = Window.partitionBy(col("user_id"))
    recent
      .withColumn("nu", count(lit(1)).over(n))
      .withColumn("k",
        when(col("rd") === col("nu"), col("nu") - 1).otherwise(col("rd")))
      .withColumn("term", expr(
        "CAST(floor(value * (1.0 / CAST(shiftleft(CAST(1 AS BIGINT), " +
          "CAST(k AS INT)) AS DOUBLE)) * 1000000000000.0) AS BIGINT)"))
      .groupBy("user_id")
      .agg(max(col("nu")).as("n_used"),
        (sum(col("term")).cast("double") / 1000000000000.0).as("ewma"))
      .orderBy("user_id")
  }

  // --- q98: interval coalescing -----------------------------------------

  /** Activity halo: each event opens a [ts, ts+5min) interval; touching
    * intervals merge into activity islands. */
  val IslandGapS = 300L

  /** q98 — interval union (coalescing) per user: merge each user's
    * overlapping event intervals into maximal islands and report island
    * count and total covered seconds — the "distinct busy time"
    * primitive (billing, utilization, dedup of overlapping spans)
    * that a naive sum of durations double-counts.
    *
    * The classic distributed form: one window pass computes the running
    * max of interval ends over PRECEDING rows; a row opens a new island
    * iff its start exceeds that max. Island ids are a running sum of
    * the open flags; covered time sums (end − start) per island. One
    * shuffle on user_id; everything else is within-partition window
    * math on exact epoch-microsecond integers. */
  def intervalCoalesce(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("st"), col("event_id"))
    val prevMax = byUser.rowsBetween(Window.unboundedPreceding, -1)
    val run = byUser.rowsBetween(Window.unboundedPreceding, 0)
    EtlOps.events(s, dir)
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("st"))
      .withColumn("en", col("st") + IslandGapS * 1000000L)
      .withColumn("pmax", max(col("en")).over(prevMax))
      .withColumn("opens",
        when(col("pmax").isNull || col("st") > col("pmax"), 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("opens")).over(run))
      .groupBy(col("user_id"), col("island"))
      .agg(min(col("st")).as("i_start"), max(col("en")).as("i_end"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_islands"),
        sum(expr("(i_end - i_start) div 1000000")).as("covered_s"))
      .orderBy("user_id")
  }

  // --- q184: freshness gap streaks ----------------------------------------

  /** q184 — per-feed delivery-gap streaks: the reference's freshness
    * monitor (`check_bucket_latest_folders.py:52-62`) answers "what is
    * the LATEST date per feed"; this answers the operator's follow-up —
    * how often does each feed go dark, for how long, and is it dark
    * RIGHT NOW. Day-level presence per event_type over the corpus date
    * range, missing-day islands via the gaps-and-islands rank trick
    * (day − dense_rank is constant within a streak, the q98 idea on a
    * calendar), worst/current gap per feed. A deterministic in-query
    * outage mask (drop days where `(day-of-month + len(type)) % 11 < 2`)
    * plants the gaps the synthetic stream doesn't have.
    *
    * Parity: all date/integer arithmetic.
    *
    * Scale (100 TB): presence collapses the stream to ≤ |feeds|×|days|
    * rows in one map-combinable aggregate; everything after runs on
    * the calendar-sized grid. */
  def freshnessStreaks(s: SparkSession, dir: String): DataFrame = {
    val e = EtlOps.events(s, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .filter((dayofmonth(col("day")) + length(col("event_type"))) % 11
        >= 2) // planted 2-day outages per 11-day cycle
    val present = e.groupBy("event_type", "day")
      .agg(count(lit(1)).as("n"))
    val range = e.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val grid = present.select("event_type").distinct()
      .crossJoin(broadcast(range))
      .select(col("event_type"),
        explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val missing = grid.join(present, Seq("event_type", "day"), "left_anti")
    val w = Window.partitionBy("event_type").orderBy("day")
    val streaks = missing
      .withColumn("grp",
        datediff(col("day"), lit("1970-01-01").cast("date")) -
          row_number().over(w))
      .groupBy("event_type", "grp")
      .agg(count(lit(1)).as("len"), max(col("day")).as("gap_end"))
    val total = grid.groupBy("event_type")
      .agg(count(lit(1)).as("n_days"), max(col("day")).as("last_day"))
    val perFeed = streaks.groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"), sum(col("len")).as("n_missing"),
        max(col("len")).as("longest_gap"))
    val openGap = streaks
      .join(total.select("event_type", "last_day"), "event_type")
      .filter(col("gap_end") === col("last_day"))
      .groupBy("event_type").agg(max(col("len")).as("current_gap"))
    total
      .join(perFeed, Seq("event_type"), "left")
      .join(openGap, Seq("event_type"), "left")
      .select(col("event_type"), col("n_days"),
        coalesce(col("n_gaps"), lit(0L)).as("n_gaps"),
        coalesce(col("n_missing"), lit(0L)).as("n_missing"),
        coalesce(col("longest_gap"), lit(0L)).as("longest_gap"),
        coalesce(col("current_gap"), lit(0L)).as("current_gap"))
      .orderBy("event_type")
  }

  def freshnessStreaksOracle: String =
    s"""WITH e AS (SELECT event_type, CAST(ts AS DATE) AS day FROM events
       |  WHERE (dayofmonth(CAST(ts AS DATE)) + len(event_type)) % 11
       |    >= 2),
       |present AS (SELECT event_type, day, count(*) AS n FROM e
       |  GROUP BY event_type, day),
       |rng AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
       |grid AS (SELECT t.event_type, CAST(g.day AS DATE) AS day
       |  FROM (SELECT DISTINCT event_type FROM present) t, rng,
       |    LATERAL (SELECT unnest(generate_series(rng.d0, rng.d1,
       |      INTERVAL 1 DAY)) AS day) g),
       |miss AS (SELECT g.event_type, g.day FROM grid g
       |  LEFT JOIN present p ON p.event_type = g.event_type
       |    AND p.day = g.day WHERE p.day IS NULL),
       |st AS (SELECT event_type, grp, count(*) AS len,
       |    max(day) AS gap_end
       |  FROM (SELECT *, CAST(day - DATE '1970-01-01' AS BIGINT) -
       |      row_number() OVER (PARTITION BY event_type ORDER BY day)
       |      AS grp FROM miss) x
       |  GROUP BY event_type, grp),
       |tot AS (SELECT event_type, count(*) AS n_days, max(day)
       |    AS last_day FROM grid GROUP BY event_type),
       |agg AS (SELECT event_type, count(*) AS n_gaps,
       |    CAST(sum(len) AS BIGINT) AS n_missing, max(len) AS longest_gap
       |  FROM st GROUP BY event_type),
       |cur AS (SELECT st.event_type, max(st.len) AS current_gap
       |  FROM st JOIN tot ON tot.event_type = st.event_type
       |    AND st.gap_end = tot.last_day GROUP BY st.event_type)
       |SELECT t.event_type, t.n_days,
       |  COALESCE(a.n_gaps, 0) AS n_gaps,
       |  COALESCE(a.n_missing, 0) AS n_missing,
       |  COALESCE(a.longest_gap, 0) AS longest_gap,
       |  COALESCE(cur.current_gap, 0) AS current_gap
       |FROM tot t LEFT JOIN agg a USING (event_type)
       |  LEFT JOIN cur USING (event_type)
       |ORDER BY t.event_type""".stripMargin

  // --- q197: watermark-delay sensitivity audit ---------------------------

  /** Candidate `withWatermark` delays (seconds) swept by the audit. */
  val WmDelaysSec = Seq(0L, 300L, 1800L, 7200L, 21600L)

  /** Bucket width (arrival positions) for the two-phase prefix max. */
  val WmBucket = 512L

  /** q197 — watermark-delay sensitivity: per candidate watermark delay,
    * how many events a `withWatermark(D)` pipeline would DROP, measured
    * from each event's lateness against the running max event time in
    * arrival order — exactly Spark's watermark semantics (event dropped
    * iff ts < max-event-time-seen − D). The fixture stream arrives
    * in order, so a deterministic in-query arrival permutation (the
    * q191 planting pattern) delays every 7th/13th/17th event by
    * 2/10/40 positions (~9 min / 43 min / 2.9 h at the stream's
    * cadence), giving the curve real mass at every delay tier. The
    * measurement that turns "pick 10 minutes?" into an evidence-based
    * completeness-vs-latency trade.
    *
    * Parity: timestamps are exact micros integers; the prefix max, the
    * lateness and every drop count are integer arithmetic; drop_frac is
    * the one division.
    *
    * Scale (100 TB): the running max is two-phase — a per-bucket
    * window (parallel across [[WmBucket]]-wide arrival ranges) plus a
    * bucket-level prefix over |stream|/[[WmBucket]] rows (the q105
    * tiny-frame window); the delay sweep multiplies only the slim
    * (lateness) column stream by |delays|. */
  def watermarkAudit(s: SparkSession, dir: String): DataFrame = {
    val ev = EtlOps.events(s, dir).select(col("event_id"),
      unix_micros(col("ts")).as("ts_us"))
      .withColumn("arr", col("event_id") +
        when(col("event_id") % 17 === 0, 40L)
          .when(col("event_id") % 13 === 0, 10L)
          .when(col("event_id") % 7 === 0, 2L).otherwise(0L))
      .withColumn("bucket", floor(col("arr") / WmBucket).cast("long"))
    val wIn = Window.partitionBy(col("bucket"))
      .orderBy(col("arr"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bmax = ev.groupBy("bucket").agg(max(col("ts_us")).as("bts"))
    val wPrev = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prev = bmax.withColumn("prev_max", max(col("bts")).over(wPrev))
      .select(col("bucket"), col("prev_max"))
    val late = ev.join(broadcast(prev), Seq("bucket"))
      .withColumn("prefix_max",
        greatest(coalesce(max(col("ts_us")).over(wIn), col("ts_us")),
          coalesce(col("prev_max"), col("ts_us"))))
      .select(col("event_id"),
        greatest(lit(0L), col("prefix_max") - col("ts_us"))
          .as("lateness_us"))
    val delays = s.createDataFrame(WmDelaysSec.map(Tuple1(_)))
      .toDF("delay_s")
    late.crossJoin(broadcast(delays))
      .groupBy("delay_s")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("lateness_us") > col("delay_s") * 1000000L, 1L)
          .otherwise(0L)).as("n_dropped"))
      .select(col("delay_s"), col("n_events"), col("n_dropped"),
        round(col("n_dropped").cast("double") /
          col("n_events").cast("double"), 6).as("drop_frac"))
      .orderBy("delay_s")
  }

  def watermarkAuditOracle: String = {
    val delayList = WmDelaysSec.mkString("[", ", ", "]")
    s"""WITH ev AS (SELECT event_id, epoch_us(ts) AS ts_us,
       |    event_id + CASE WHEN event_id % 17 = 0 THEN 40
       |      WHEN event_id % 13 = 0 THEN 10
       |      WHEN event_id % 7 = 0 THEN 2 ELSE 0 END AS arr
       |  FROM events),
       |eb AS (SELECT *, CAST(floor(CAST(arr AS DOUBLE) / $WmBucket)
       |    AS BIGINT) AS bucket FROM ev),
       |bmax AS (SELECT bucket, max(ts_us) AS bts FROM eb GROUP BY bucket),
       |prev AS (SELECT bucket, max(bts) OVER (ORDER BY bucket
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
       |  FROM bmax),
       |late AS (SELECT eb.event_id,
       |    greatest(CAST(0 AS BIGINT),
       |      greatest(
       |        coalesce(max(eb.ts_us) OVER (PARTITION BY eb.bucket
       |          ORDER BY eb.arr, eb.event_id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |          eb.ts_us),
       |        coalesce(prev.prev_max, eb.ts_us)) - eb.ts_us)
       |      AS lateness_us
       |  FROM eb JOIN prev USING (bucket)),
       |delays AS (SELECT unnest(CAST($delayList AS BIGINT[])) AS delay_s)
       |SELECT d.delay_s, count(*) AS n_events,
       |  CAST(sum(CASE WHEN l.lateness_us > d.delay_s * 1000000
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       |  round(CAST(sum(CASE WHEN l.lateness_us > d.delay_s * 1000000
       |    THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
       |    AS drop_frac
       |FROM late l CROSS JOIN delays d
       |GROUP BY d.delay_s ORDER BY d.delay_s""".stripMargin
  }

  // --- q215: temporal train/test leakage audit -----------------------------

  /** q215 — temporal-leakage audit for event-trained models: a model
    * predicting user behavior must not train on events that happened
    * AFTER its test window ("time travel" leakage — the most common
    * silent eval inflation in production ML). The audit prices two
    * split policies on the same events: the naive RANDOM split
    * (event_id ≡ 0 mod 5 → test) and the per-user TEMPORAL split (last
    * 20% of each user's events by time → test), reporting, per policy,
    * how many users have at least one train event strictly after their
    * first test event. The temporal split is leak-free BY CONSTRUCTION
    * (its violation count is the audit's self-check); the random
    * split's leak rate is the number that justifies the re-split.
    *
    * Parity: timestamp comparisons only (never emitted); counts are
    * integers, the rate is one double division. Ties: a train event AT
    * the same timestamp as the test minimum is not a leak (strict >),
    * and the temporal rank orders by (ts, event_id) — deterministic in
    * both engines.
    *
    * Scale (100 TB): both policies ride ONE hash exchange on user_id
    * (the window and the per-user aggregate share it); output is
    * 2 rows. Users with an empty side are excluded from the rate (no
    * train/test boundary to violate). */
  def temporalLeakage(s: SparkSession, dir: String): DataFrame = {
    val ev = EtlOps.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"))
    def audit(flagged: DataFrame, tag: String): DataFrame =
      flagged
        .groupBy("user_id")
        .agg(sum(when(!col("is_test"), 1L).otherwise(0L)).as("n_train"),
          sum(when(col("is_test"), 1L).otherwise(0L)).as("n_test"),
          max(when(!col("is_test"), col("ts"))).as("max_train_ts"),
          min(when(col("is_test"), col("ts"))).as("min_test_ts"))
        .filter(col("n_train") > 0 && col("n_test") > 0)
        .agg(count(lit(1)).as("n_users"),
          sum(when(col("max_train_ts") > col("min_test_ts"), 1L)
            .otherwise(0L)).as("n_leaky"),
          sum(col("n_test")).as("n_test_events"))
        .select(lit(tag).as("split"), col("n_users"), col("n_leaky"),
          round(col("n_leaky").cast("double") /
            col("n_users").cast("double"), 6).as("leak_rate"),
          col("n_test_events"))
    val random = audit(
      ev.withColumn("is_test", col("event_id") % 5 === 0), "random")
    val wu = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val wn = Window.partitionBy("user_id")
    val temporal = audit(
      ev.withColumn("rn", row_number().over(wu))
        .withColumn("n", count(lit(1)).over(wn))
        .withColumn("is_test", col("rn") > expr("(4 * n) div 5")),
      "temporal")
    random.unionAll(temporal).orderBy("split")
  }

  def temporalLeakageOracle: String =
    """WITH e AS (SELECT user_id, event_id, ts FROM events),
      |rnd AS (SELECT user_id, ts, event_id % 5 = 0 AS is_test FROM e),
      |tmp AS (SELECT user_id, ts,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      > (4 * count(*) OVER (PARTITION BY user_id)) // 5 AS is_test
      |  FROM e),
      |u AS (
      |  SELECT 'random' AS split, user_id,
      |    sum(CASE WHEN NOT is_test THEN 1 ELSE 0 END) AS n_train,
      |    sum(CASE WHEN is_test THEN 1 ELSE 0 END) AS n_test,
      |    max(CASE WHEN NOT is_test THEN ts END) AS max_train_ts,
      |    min(CASE WHEN is_test THEN ts END) AS min_test_ts
      |  FROM rnd GROUP BY user_id
      |  UNION ALL
      |  SELECT 'temporal', user_id,
      |    sum(CASE WHEN NOT is_test THEN 1 ELSE 0 END),
      |    sum(CASE WHEN is_test THEN 1 ELSE 0 END),
      |    max(CASE WHEN NOT is_test THEN ts END),
      |    min(CASE WHEN is_test THEN ts END)
      |  FROM tmp GROUP BY user_id)
      |SELECT split, CAST(count(*) AS BIGINT) AS n_users,
      |  CAST(sum(CASE WHEN max_train_ts > min_test_ts THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_leaky,
      |  round(CAST(sum(CASE WHEN max_train_ts > min_test_ts THEN 1 ELSE 0
      |    END) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS leak_rate,
      |  CAST(sum(n_test) AS BIGINT) AS n_test_events
      |FROM u WHERE n_train > 0 AND n_test > 0
      |GROUP BY split ORDER BY split""".stripMargin

  // --- q246: Theil–Sen robust trend vs OLS -------------------------------

  /** Planted ramp: cnt = PlantBase + PlantSlope·d, two outlier spikes. */
  val TsPlantBase = 10L
  val TsPlantSlope = 3L
  val TsPlantSpike = 200L
  val TsPlantSpikeDays = Seq(7L, 21L)

  /** q246 — Theil–Sen robust trend per event type over daily volumes,
    * next to the OLS slope it is robust version of: the Theil–Sen
    * estimator is the MEDIAN of all pairwise slopes
    * (cnt_j − cnt_i)/(d_j − d_i), with a ~29% breakdown point — a
    * couple of outage/backfill spike days that drag OLS leave it
    * untouched. The planted ramp (slope [[TsPlantSlope]], two
    * [[TsPlantSpike]]-high spike days) pins exactly that: its TS slope
    * stays 3, its OLS slope is pulled off by the spikes.
    *
    * Exactness: day indices and counts are integers, so every pairwise
    * slope is ONE double division (exactly rounded, identical both
    * engines); the median picks elements by row_number with a total
    * (slope, d_i, d_j) order; OLS is exact bigint sums into one final
    * division.
    *
    * Scale (100 TB): the corpus collapses map-side to (type, day)
    * cells — the pairwise frame is |days|²-bounded per type (calendar-
    * bounded, NOT data-bounded: 30 days → 435 pairs regardless of sf),
    * so the quadratic stage runs on metadata-sized cells forever. */
  def theilSen(s: SparkSession, dir: String): DataFrame = {
    val daily = EtlOps.t(s, dir, "events")
      .selectExpr("event_type AS et",
        "CAST(datediff(ts, DATE '2024-01-01') AS BIGINT) AS d")
      .groupBy("et", "d").agg(count(lit(1)).as("cnt"))
    val spikes = TsPlantSpikeDays.mkString(", ")
    val plant = s.range(30).selectExpr("'planted_ramp' AS et",
      "CAST(id AS BIGINT) AS d",
      s"CASE WHEN id IN ($spikes) THEN $TsPlantSpike " +
        s"ELSE $TsPlantBase + $TsPlantSlope * id END AS cnt")
    val cells = daily.unionAll(plant).persist()
    val a = cells.select(col("et"), col("d").as("d1"),
      col("cnt").as("c1"))
    val b = cells.select(col("et"), col("d").as("d2"),
      col("cnt").as("c2"))
    val pairs = a.join(b, Seq("et")).filter(col("d1") < col("d2"))
      .withColumn("slope",
        (col("c2") - col("c1")).cast("double") / (col("d2") - col("d1")))
    val w = Window.partitionBy("et").orderBy("slope", "d1", "d2")
    val ranked = pairs.withColumn("rn", row_number().over(w))
    val np = pairs.groupBy("et").agg(count(lit(1)).as("n_pairs"))
    val med = ranked.join(np, "et")
      .filter(expr("rn = (n_pairs + 1) div 2 OR " +
        "rn = (n_pairs + 2) div 2"))
      .groupBy("et").agg((sum(col("slope")) / count(lit(1)))
        .as("ts_slope"), min(col("n_pairs")).as("n_pairs"))
    val ols = cells.groupBy("et").agg(
        count(lit(1)).as("n_days"), sum(col("d")).as("sx"),
        sum(col("cnt")).as("sy"), sum(col("d") * col("d")).as("sxx"),
        sum(col("d") * col("cnt")).as("sxy"))
      .selectExpr("et", "n_days",
        "CAST(n_days * sxy - sx * sy AS DOUBLE) / " +
          "CAST(n_days * sxx - sx * sx AS DOUBLE) AS ols_slope")
    med.join(ols, "et")
      .selectExpr("et AS event_type", "n_days", "n_pairs",
        "round(ts_slope, 6) AS ts_slope",
        "round(ols_slope, 6) AS ols_slope",
        "round(abs(ts_slope - ols_slope), 6) AS robust_gap")
      .orderBy("event_type")
  }

  def theilSenOracle: String = {
    val spikes = TsPlantSpikeDays.mkString(", ")
    s"""WITH daily AS (SELECT event_type AS et,
       |    CAST(date_diff('day', DATE '2024-01-01', ts) AS BIGINT) AS d,
       |    CAST(count(*) AS BIGINT) AS cnt
       |  FROM events GROUP BY 1, 2),
       |plant AS (SELECT 'planted_ramp' AS et, CAST(r AS BIGINT) AS d,
       |    CAST(CASE WHEN r IN ($spikes) THEN $TsPlantSpike
       |      ELSE $TsPlantBase + $TsPlantSlope * r END AS BIGINT) AS cnt
       |  FROM (SELECT unnest(range(0, 30)) AS r)),
       |cells AS (SELECT * FROM daily UNION ALL SELECT * FROM plant),
       |pairs AS (SELECT a.et, a.d AS d1, b.d AS d2,
       |    CAST(b.cnt - a.cnt AS DOUBLE) / (b.d - a.d) AS slope
       |  FROM cells a JOIN cells b ON a.et = b.et AND a.d < b.d),
       |rk AS (SELECT *, row_number() OVER (PARTITION BY et
       |    ORDER BY slope, d1, d2) AS rn FROM pairs),
       |np AS (SELECT et, CAST(count(*) AS BIGINT) AS n_pairs
       |  FROM pairs GROUP BY et),
       |med AS (SELECT rk.et,
       |    sum(slope) / count(*) AS ts_slope, min(n_pairs) AS n_pairs
       |  FROM rk JOIN np ON np.et = rk.et
       |  WHERE rn = (n_pairs + 1) // 2 OR rn = (n_pairs + 2) // 2
       |  GROUP BY rk.et),
       |ols AS (SELECT et, CAST(count(*) AS BIGINT) AS n_days,
       |    CAST(sum(d) AS BIGINT) AS sx, CAST(sum(cnt) AS BIGINT) AS sy,
       |    CAST(sum(d * d) AS BIGINT) AS sxx,
       |    CAST(sum(d * cnt) AS BIGINT) AS sxy
       |  FROM cells GROUP BY et)
       |SELECT med.et AS event_type, n_days, n_pairs,
       |  round(ts_slope, 6) AS ts_slope,
       |  round(CAST(n_days * sxy - sx * sy AS DOUBLE) /
       |    CAST(n_days * sxx - sx * sx AS DOUBLE), 6) AS ols_slope,
       |  round(abs(ts_slope - CAST(n_days * sxy - sx * sy AS DOUBLE) /
       |    CAST(n_days * sxx - sx * sx AS DOUBLE)), 6) AS robust_gap
       |FROM med JOIN ols ON ols.et = med.et
       |ORDER BY event_type""".stripMargin
  }

  // --- q253: CUSUM change-point detection --------------------------------

  /** Baseline window (days) and the ×sum0 threshold multiplier. */
  val CusumBaselineDays = 10
  /** Detection threshold h = 2·μ₀, i.e. h×100 = 20·sum0. */
  val CusumThreshX = 20L
  /** Planted step: the decoy stream doubles its volume after this day. */
  val CusumStepDay = 20

  /** q253 — CUSUM change-point detection over daily volumes: the
    * SEQUENTIAL drift detector next to the distributional tests
    * (q155/q245 compare two fixed windows; CUSUM accumulates evidence
    * day by day and reports WHEN the shift happened). The classical
    * recursion S_t = max(0, S_{t−1} + x_t − μ₀ − k) looks inherently
    * serial, but the prefix-min identity S_t = cum_t − min(0,
    * min_{j≤t} cum_j) turns it into two window passes (running sum +
    * running min) — fully parallel per stream.
    *
    * Exactness: everything runs ×100 in integers — y×100 = 100·x_t −
    * 11·sum0 encodes x_t − μ₀ − k with μ₀ = sum0/10 and slack
    * k = μ₀/10; the threshold is [[CusumThreshX]]·sum0. No doubles
    * anywhere except the readable s_max column.
    *
    * Fixture: a planted 'click_step' stream doubles its daily volume
    * after day [[CusumStepDay]] (union of one extra copy) — CUSUM must
    * fire within a few days of the step; stationary streams must not.
    *
    * Scale (100 TB): one map-combined collapse to (type, day) cells;
    * both window passes run per type over ≤|calendar| cells. */
  def cusumChangepoint(s: SparkSession, dir: String): DataFrame = {
    val ev = EtlOps.t(s, dir, "events")
    val base = ev.selectExpr("event_type AS et",
      "CAST(datediff(ts, DATE '2024-01-01') AS BIGINT) AS d")
    val plantAll = ev.filter(col("event_type") === "click")
      .selectExpr("'click_step' AS et",
        "CAST(datediff(ts, DATE '2024-01-01') AS BIGINT) AS d")
    val plantExtra = plantAll.filter(col("d") >= CusumStepDay)
    val daily = base.unionAll(plantAll).unionAll(plantExtra)
      .groupBy("et", "d").agg(count(lit(1)).as("x"))
    val sum0 = daily.filter(col("d") < CusumBaselineDays)
      .groupBy("et").agg(sum(col("x")).as("sum0"))
    val wCum = Window.partitionBy("et").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = daily.join(sum0, "et")
      .withColumn("y100", lit(100L) * col("x") - lit(11L) * col("sum0"))
      .withColumn("cum", sum(col("y100")).over(wCum))
      .withColumn("s100", col("cum") -
        least(lit(0L), min(col("cum")).over(wCum)))
    cum.groupBy("et").agg(
        max(col("s100")).as("s_max100"),
        min(when(col("s100") > lit(CusumThreshX) * col("sum0"),
          col("d")))
          .as("detect_day"),
        min(col("sum0")).as("sum0"))
      .selectExpr("et AS event_type", "s_max100",
        "round(CAST(s_max100 AS DOUBLE) / 100.0, 2) AS s_max",
        "coalesce(detect_day, -1) AS detect_day",
        s"s_max100 > $CusumThreshX * sum0 AS detected")
      .orderBy("event_type")
  }

  def cusumChangepointOracle: String =
    s"""WITH base AS (SELECT event_type AS et,
       |    CAST(date_diff('day', DATE '2024-01-01', ts) AS BIGINT) AS d
       |  FROM events
       |  UNION ALL
       |  SELECT 'click_step' AS et,
       |    CAST(date_diff('day', DATE '2024-01-01', ts) AS BIGINT) AS d
       |  FROM events WHERE event_type = 'click'
       |  UNION ALL
       |  SELECT 'click_step' AS et,
       |    CAST(date_diff('day', DATE '2024-01-01', ts) AS BIGINT) AS d
       |  FROM events WHERE event_type = 'click'
       |    AND CAST(date_diff('day', DATE '2024-01-01', ts) AS BIGINT)
       |      >= $CusumStepDay),
       |daily AS (SELECT et, d, CAST(count(*) AS BIGINT) AS x
       |  FROM base GROUP BY et, d),
       |s0 AS (SELECT et, CAST(sum(x) AS BIGINT) AS sum0 FROM daily
       |  WHERE d < $CusumBaselineDays GROUP BY et),
       |c AS (SELECT daily.et, d, sum0,
       |    CAST(sum(100 * x - 11 * sum0) OVER (PARTITION BY daily.et
       |      ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT
       |      ROW) AS BIGINT) AS cum
       |  FROM daily JOIN s0 ON s0.et = daily.et),
       |sv AS (SELECT et, d, sum0, cum - least(0, min(cum) OVER (
       |    PARTITION BY et ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
       |    AND CURRENT ROW)) AS s100
       |  FROM c)
       |SELECT et AS event_type,
       |  CAST(max(s100) AS BIGINT) AS s_max100,
       |  round(CAST(max(s100) AS DOUBLE) / 100.0, 2) AS s_max,
       |  coalesce(min(CASE WHEN s100 > $CusumThreshX * sum0 THEN d
       |    END), -1) AS detect_day,
       |  max(s100) > $CusumThreshX * min(sum0) AS detected
       |FROM sv GROUP BY et ORDER BY event_type""".stripMargin

  // --- q254: calendar seasonality decomposition ---------------------------

  /** Planted weekly cycle: base level, amplitude, cycling day-of-week. */
  val SeasBase = 50L
  val SeasAmp = 30L
  val SeasDow = 5L

  /** q254 — additive seasonal decomposition of daily volumes: volume =
    * trend (7-day centered moving average) + day-of-week effect (mean
    * of the detrended series per weekday) + residual. The drift
    * monitors (q155/q245/q253) all assume an exchangeable or stationary
    * stream — a weekly cycle breaks that assumption and this operator
    * is the decomposition that removes it before they run.
    *
    * Exactness: trend is an exact small-rational (7-day sum / count,
    * edges use the available window); the detrended series freezes to
    * ×1e6 bigints before the per-weekday mean (order-free sum); the
    * residual is one fixed double expression.
    *
    * Fixture: a planted 'weekly_cycle' stream (+[[SeasAmp]] every
    * dow [[SeasDow]]) whose recovered weekday effect must isolate the
    * planted amplitude.
    *
    * Scale (100 TB): one (type, day) cell collapse; windows and dow
    * means run on |calendar| cells per stream. */
  def seasonalDecompose(s: SparkSession, dir: String): DataFrame = {
    val daily = EtlOps.t(s, dir, "events")
      .selectExpr("event_type AS et",
        "CAST(datediff(ts, DATE '2024-01-01') AS BIGINT) AS d")
      .groupBy("et", "d").agg(count(lit(1)).as("x"))
    val plant = s.range(30).selectExpr("'weekly_cycle' AS et",
      "CAST(id AS BIGINT) AS d",
      s"$SeasBase + CASE WHEN id % 7 = $SeasDow THEN $SeasAmp ELSE 0 " +
        "END AS x")
    val w = Window.partitionBy("et").orderBy("d").rowsBetween(-3, 3)
    val tr = daily.unionAll(plant)
      .withColumn("trend",
        sum(col("x")).over(w).cast("double") / count(lit(1)).over(w))
      .withColumn("det_fp",
        floor((col("x") - col("trend")) * 1e6).cast("bigint"))
    val dow = tr.withColumn("dow", col("d") % 7)
      .groupBy("et", "dow")
      .agg((sum(col("det_fp")).cast("double") / 1e6 / count(lit(1)))
        .as("dow_eff"))
    tr.withColumn("dow", col("d") % 7)
      .join(dow, Seq("et", "dow"))
      .selectExpr("et AS event_type", "d", "x",
        "round(trend, 4) AS trend", "round(dow_eff, 4) AS dow_eff",
        "round(x - trend - dow_eff, 4) AS resid")
      .orderBy("event_type", "d")
  }

  def seasonalDecomposeOracle: String =
    s"""WITH daily AS (SELECT event_type AS et,
       |    CAST(date_diff('day', DATE '2024-01-01', ts) AS BIGINT) AS d,
       |    CAST(count(*) AS BIGINT) AS x
       |  FROM events GROUP BY 1, 2
       |  UNION ALL
       |  SELECT 'weekly_cycle' AS et, CAST(r AS BIGINT) AS d,
       |    CAST($SeasBase + CASE WHEN r % 7 = $SeasDow THEN $SeasAmp
       |      ELSE 0 END AS BIGINT) AS x
       |  FROM (SELECT unnest(range(0, 30)) AS r)),
       |tr AS (SELECT et, d, x,
       |    CAST(sum(x) OVER w AS DOUBLE) / count(*) OVER w AS trend
       |  FROM daily
       |  WINDOW w AS (PARTITION BY et ORDER BY d ROWS BETWEEN
       |    3 PRECEDING AND 3 FOLLOWING)),
       |dt AS (SELECT *, CAST(floor((x - trend) * 1e6) AS BIGINT)
       |    AS det_fp, d % 7 AS dow FROM tr),
       |dw AS (SELECT et, dow,
       |    CAST(sum(det_fp) AS DOUBLE) / 1e6 / count(*) AS dow_eff
       |  FROM dt GROUP BY et, dow)
       |SELECT dt.et AS event_type, d, x,
       |  round(trend, 4) AS trend, round(dow_eff, 4) AS dow_eff,
       |  round(x - trend - dow_eff, 4) AS resid
       |FROM dt JOIN dw ON dw.et = dt.et AND dw.dow = dt.dow
       |ORDER BY event_type, d""".stripMargin

  // --- q262: burstiness audit (Fano factor + lag-1 autocorrelation) ------

  /** Dispersion threshold: Fano > this flags a bursty stream. */
  val FanoFlag = 3.0

  /** q262 — burstiness audit over daily volumes: the Fano factor
    * (variance/mean of daily counts — exactly 1 for a Poisson arrival
    * process, ≫1 for batch/bursty ingestion) and the lag-1
    * autocorrelation of the daily series, which separates the two
    * over-dispersion shapes: clustered bursts push r1 positive, a
    * periodic batch load (the planted stream) pushes it negative —
    * spike days neighbor normal days. Batch-loaded sources
    * masquerading as streams are the classic trap for every
    * rate-based monitor upstream (freshness, q253's CUSUM k).
    *
    * Fixture: a planted 'bursty' stream (every dow-0 day's events
    * tripled) that must flag on Fano with the periodic (negative) r1
    * signature.
    *
    * Exactness: counts are integers, so nΣx²−(Σx)² and the lag-1
    * deviation products (n·x_t − S)(n·x_{t+1} − S) are exact bigints;
    * each output is one division.
    *
    * Scale (100 TB): one (type, day) collapse; the lag join is a
    * per-type window lead over |calendar| cells. */
  def burstiness(s: SparkSession, dir: String): DataFrame = {
    val ev = EtlOps.t(s, dir, "events")
    val base = ev.selectExpr("event_type AS et",
      "CAST(datediff(ts, DATE '2024-01-01') AS BIGINT) AS d")
    val plant1 = ev.selectExpr("'bursty' AS et",
      "CAST(datediff(ts, DATE '2024-01-01') AS BIGINT) AS d")
    val plantX = plant1.filter(col("d") % 7 === 0)
    val daily = base.unionAll(plant1).unionAll(plantX)
      .unionAll(plantX)
      .groupBy("et", "d").agg(count(lit(1)).as("x"))
    val w = Window.partitionBy("et").orderBy("d")
    val led = daily.withColumn("xn", lead(col("x"), 1).over(w))
    led.groupBy("et").agg(
        count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(expr("x * x")).as("sxx"),
        sum(when(col("xn").isNotNull, 1L).otherwise(0L)).as("m"),
        sum(when(col("xn").isNotNull, expr("x * xn")).otherwise(0L))
          .as("sxy"),
        sum(when(col("xn").isNotNull, col("x")).otherwise(0L))
          .as("sxa"),
        sum(when(col("xn").isNotNull, col("xn")).otherwise(0L))
          .as("sxb"),
        sum(when(col("xn").isNotNull, expr("x * x")).otherwise(0L))
          .as("sa2"),
        sum(when(col("xn").isNotNull, expr("xn * xn")).otherwise(0L))
          .as("sb2"))
      .selectExpr("et AS event_type", "n",
        "round(CAST(sx AS DOUBLE) / n, 4) AS mean_daily",
        "round((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) / " +
          "(CAST(n AS DOUBLE) * sx), 4) AS fano",
        "round((CAST(m AS DOUBLE) * sxy - CAST(sxa AS DOUBLE) * sxb) " +
          "/ sqrt((CAST(m AS DOUBLE) * CAST(sa2 AS DOUBLE) - " +
          "CAST(sxa AS DOUBLE) * sxa) * (CAST(m AS DOUBLE) * " +
          "CAST(sb2 AS DOUBLE) - CAST(sxb AS DOUBLE) * sxb)), 4) " +
          "AS r1",
        s"(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) / " +
          s"(CAST(n AS DOUBLE) * sx) > $FanoFlag AS bursty")
      .orderBy("event_type")
  }

  def burstinessOracle: String =
    s"""WITH base AS (SELECT event_type AS et,
       |    CAST(date_diff('day', DATE '2024-01-01', ts) AS BIGINT) AS d
       |  FROM events
       |  UNION ALL
       |  SELECT 'bursty', CAST(date_diff('day', DATE '2024-01-01', ts)
       |    AS BIGINT) FROM events
       |  UNION ALL
       |  SELECT 'bursty', CAST(date_diff('day', DATE '2024-01-01', ts)
       |    AS BIGINT) FROM events
       |  WHERE CAST(date_diff('day', DATE '2024-01-01', ts) AS BIGINT)
       |    % 7 = 0
       |  UNION ALL
       |  SELECT 'bursty', CAST(date_diff('day', DATE '2024-01-01', ts)
       |    AS BIGINT) FROM events
       |  WHERE CAST(date_diff('day', DATE '2024-01-01', ts) AS BIGINT)
       |    % 7 = 0),
       |daily AS (SELECT et, d, CAST(count(*) AS BIGINT) AS x
       |  FROM base GROUP BY et, d),
       |led AS (SELECT *, lead(x, 1) OVER (PARTITION BY et ORDER BY d)
       |    AS xn FROM daily),
       |ag AS (SELECT et, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(x) AS BIGINT) AS sx,
       |    CAST(sum(x * x) AS BIGINT) AS sxx,
       |    CAST(sum(CASE WHEN xn IS NOT NULL THEN 1 ELSE 0 END)
       |      AS BIGINT) AS m,
       |    CAST(sum(CASE WHEN xn IS NOT NULL THEN x * xn ELSE 0 END)
       |      AS BIGINT) AS sxy,
       |    CAST(sum(CASE WHEN xn IS NOT NULL THEN x ELSE 0 END)
       |      AS BIGINT) AS sxa,
       |    CAST(sum(CASE WHEN xn IS NOT NULL THEN xn ELSE 0 END)
       |      AS BIGINT) AS sxb,
       |    CAST(sum(CASE WHEN xn IS NOT NULL THEN x * x ELSE 0 END)
       |      AS BIGINT) AS sa2,
       |    CAST(sum(CASE WHEN xn IS NOT NULL THEN xn * xn ELSE 0 END)
       |      AS BIGINT) AS sb2
       |  FROM led GROUP BY et)
       |SELECT et AS event_type, n,
       |  round(CAST(sx AS DOUBLE) / n, 4) AS mean_daily,
       |  round((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) /
       |    (CAST(n AS DOUBLE) * sx), 4) AS fano,
       |  round((CAST(m AS DOUBLE) * sxy - CAST(sxa AS DOUBLE) * sxb)
       |    / sqrt((CAST(m AS DOUBLE) * CAST(sa2 AS DOUBLE) -
       |    CAST(sxa AS DOUBLE) * sxa) * (CAST(m AS DOUBLE) *
       |    CAST(sb2 AS DOUBLE) - CAST(sxb AS DOUBLE) * sxb)), 4)
       |    AS r1,
       |  (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) /
       |    (CAST(n AS DOUBLE) * sx) > $FanoFlag AS bursty
       |FROM ag ORDER BY event_type""".stripMargin

  // --- q265: interrupted time-series readout ------------------------------

  /** Level-change flag: |Δlevel at τ| > this fraction of the pre mean. */
  val ItsLevelFrac = 0.25

  /** q265 — interrupted time-series (segmented regression) readout at
    * the known intervention day τ = [[CusumStepDay]]: q253's
    * CUSUM detects THAT and WHEN a stream shifted; ITS quantifies HOW
    * MUCH — separate OLS fits on the pre and post segments give the
    * LEVEL change at τ (ŷ_post(τ) − ŷ_pre(τ)) and the SLOPE change,
    * the two numbers an incident review wants. Uses the same planted
    * 'click_step' stream (volume doubles at day [[CusumStepDay]]),
    * whose level change must recover ≈ the pre-period daily mean.
    *
    * Exactness: both OLS fits are exact bigint sums into fixed double
    * expressions (the q246 discipline); τ is a literal.
    *
    * Scale (100 TB): one (type, day) collapse; both fits are
    * |calendar|-cell aggregates. */
  def itsReadout(s: SparkSession, dir: String): DataFrame = {
    val ev = EtlOps.t(s, dir, "events")
    val base = ev.selectExpr("event_type AS et",
      "CAST(datediff(ts, DATE '2024-01-01') AS BIGINT) AS d")
    val plantAll = ev.filter(col("event_type") === "click")
      .selectExpr("'click_step' AS et",
        "CAST(datediff(ts, DATE '2024-01-01') AS BIGINT) AS d")
    val plantExtra = plantAll.filter(col("d") >= CusumStepDay)
    val daily = base.unionAll(plantAll).unionAll(plantExtra)
      .groupBy("et", "d").agg(count(lit(1)).as("x"))
      .withColumn("seg",
        when(col("d") < CusumStepDay, lit(0)).otherwise(lit(1)))
    val fits = daily.groupBy("et", "seg").agg(
      count(lit(1)).as("n"), sum(col("d")).as("sd"),
      sum(col("x")).as("sx"), sum(expr("d * d")).as("sdd"),
      sum(expr("d * x")).as("sdx"))
    val slope = "(CAST(n AS DOUBLE) * sdx - CAST(sd AS DOUBLE) * sx)" +
      " / (CAST(n AS DOUBLE) * sdd - CAST(sd AS DOUBLE) * sd)"
    val icept = s"(CAST(sx AS DOUBLE) / n - ($slope) * " +
      "(CAST(sd AS DOUBLE) / n))"
    val seg = fits.selectExpr("et", "seg",
      s"$slope AS b", s"$icept AS a", "CAST(sx AS DOUBLE) / n AS mu")
    val pre = seg.filter(col("seg") === 0)
      .select(col("et"), col("b").as("b0"), col("a").as("a0"),
        col("mu").as("mu0"))
    val post = seg.filter(col("seg") === 1)
      .select(col("et"), col("b").as("b1"), col("a").as("a1"))
    pre.join(post, "et")
      .selectExpr("et AS event_type",
        "round(b0, 4) AS pre_slope", "round(b1, 4) AS post_slope",
        s"round((a1 + b1 * $CusumStepDay) - (a0 + b0 * " +
          s"$CusumStepDay), 4) AS level_change",
        "round(b1 - b0, 4) AS slope_change",
        s"abs((a1 + b1 * $CusumStepDay) - (a0 + b0 * " +
          s"$CusumStepDay)) > $ItsLevelFrac * mu0 AS level_shifted")
      .orderBy("event_type")
  }

  def itsReadoutOracle: String = {
    val slope = "(CAST(n AS DOUBLE) * sdx - CAST(sd AS DOUBLE) * sx)" +
      " / (CAST(n AS DOUBLE) * sdd - CAST(sd AS DOUBLE) * sd)"
    val icept = s"(CAST(sx AS DOUBLE) / n - ($slope) * " +
      "(CAST(sd AS DOUBLE) / n))"
    s"""WITH base AS (SELECT event_type AS et,
       |    CAST(date_diff('day', DATE '2024-01-01', ts) AS BIGINT) AS d
       |  FROM events
       |  UNION ALL
       |  SELECT 'click_step', CAST(date_diff('day', DATE '2024-01-01',
       |    ts) AS BIGINT) FROM events WHERE event_type = 'click'
       |  UNION ALL
       |  SELECT 'click_step', CAST(date_diff('day', DATE '2024-01-01',
       |    ts) AS BIGINT) FROM events WHERE event_type = 'click'
       |    AND CAST(date_diff('day', DATE '2024-01-01', ts) AS BIGINT)
       |      >= $CusumStepDay),
       |daily AS (SELECT et, d, CAST(count(*) AS BIGINT) AS x,
       |    CASE WHEN d < $CusumStepDay THEN 0 ELSE 1 END AS seg
       |  FROM base GROUP BY et, d),
       |fits AS (SELECT et, seg, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(d) AS BIGINT) AS sd, CAST(sum(x) AS BIGINT) AS sx,
       |    CAST(sum(d * d) AS BIGINT) AS sdd,
       |    CAST(sum(d * x) AS BIGINT) AS sdx
       |  FROM daily GROUP BY et, seg),
       |sg AS (SELECT et, seg, $slope AS b, $icept AS a,
       |    CAST(sx AS DOUBLE) / n AS mu FROM fits)
       |SELECT p.et AS event_type,
       |  round(p.b, 4) AS pre_slope, round(q.b, 4) AS post_slope,
       |  round((q.a + q.b * $CusumStepDay) - (p.a + p.b *
       |    $CusumStepDay), 4) AS level_change,
       |  round(q.b - p.b, 4) AS slope_change,
       |  abs((q.a + q.b * $CusumStepDay) - (p.a + p.b *
       |    $CusumStepDay)) > $ItsLevelFrac * p.mu AS level_shifted
       |FROM sg p JOIN sg q ON q.et = p.et AND p.seg = 0 AND q.seg = 1
       |ORDER BY event_type""".stripMargin
  }

  // --- q273: exact two-change-point segmentation ---------------------------

  /** Planted double step: extra copies after each of these days. */
  val Seg2Step1 = 10L
  val Seg2Step2 = 20L

  /** q273 — exact two-change-point segmentation per stream: where
    * q253's CUSUM detects ONE shift online and q265 quantifies a KNOWN
    * intervention day, this finds the best (s, t) pair of UNKNOWN
    * breakpoints by exhaustive SSE minimization — optimal, not the
    * greedy binary-segmentation approximation, because the candidate
    * grid is |days|² ≈ 435 cells per stream (calendar-bounded metadata,
    * the q246 pairwise discipline). Segment SSEs come from prefix sums
    * (SSE(a,b) = ΣX² − (ΣX)²/n on the slice), so the whole search is
    * one window pass plus two broadcast joins of 30-row frames.
    *
    * Fixture: a planted 'two_steps' stream with level shifts at days
    * [[Seg2Step1]]/[[Seg2Step2]] (×2 then ×4) that the argmin must
    * recover exactly.
    *
    * Exactness: prefix sums are bigints; per-candidate SSE is a fixed
    * double expression; the argmin tie-breaks on (s, t).
    *
    * Scale (100 TB): one (type, day) collapse; the quadratic grid is
    * calendar-sized forever. */
  def twoChangepoints(s: SparkSession, dir: String): DataFrame = {
    val ev = EtlOps.t(s, dir, "events")
    val base = ev.selectExpr("event_type AS et",
      "CAST(datediff(ts, DATE '2024-01-01') AS BIGINT) AS d",
      "event_id")
    val plant0 = ev.filter(col("event_type") === "click")
      .selectExpr("'two_steps' AS et",
        "CAST(datediff(ts, DATE '2024-01-01') AS BIGINT) AS d",
        "event_id")
    val plant1 = plant0.filter(col("d") >= Seg2Step1)
    val plant2 = plant0.filter(col("d") >= Seg2Step2)
    val daily = base.unionAll(plant0).unionAll(plant1)
      .unionAll(plant2).unionAll(plant2)
      .groupBy("et", "d").agg(count(lit(1)).as("x"))
    val w = Window.partitionBy("et").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, 0)
    val pre = daily
      .withColumn("cs", sum(col("x")).over(w))
      .withColumn("css", sum(expr("x * x")).over(w))
      .withColumn("i", row_number().over(
        Window.partitionBy("et").orderBy("d")))
      .select("et", "i", "d", "cs", "css").persist()
    val tot = pre.groupBy("et").agg(max(col("i")).as("n"),
      max(col("cs")).as("csn"), max(col("css")).as("cssn"))
    // candidate pair grid: boundaries AFTER positions s < t (1-based)
    val sGrid = pre.select(col("et"), col("i").as("si"),
      col("d").as("sd"), col("cs").as("cs1"), col("css").as("css1"))
    val tGrid = pre.select(col("et"), col("i").as("ti"),
      col("d").as("td"), col("cs").as("cs2"), col("css").as("css2"))
    val sse = "CAST(css1 AS DOUBLE) - CAST(cs1 AS DOUBLE) * cs1 / si" +
      " + (CAST(css2 - css1 AS DOUBLE) - CAST(cs2 - cs1 AS DOUBLE) *" +
      " (cs2 - cs1) / (ti - si))" +
      " + (CAST(cssn - css2 AS DOUBLE) - CAST(csn - cs2 AS DOUBLE) *" +
      " (csn - cs2) / (n - ti))"
    val grid = sGrid.join(tGrid, "et")
      .filter(col("si") < col("ti"))
      .join(broadcast(tot), "et")
      .filter(col("ti") < col("n"))
      .withColumn("sse2", expr(sse))
    val best = grid.withColumn("rn", row_number().over(
        Window.partitionBy("et")
          .orderBy(col("sse2"), col("si"), col("ti"))))
      .filter(col("rn") === 1)
    best.selectExpr("et AS event_type", "sd AS split1_after_day",
        "td AS split2_after_day",
        "round(CAST(cs1 AS DOUBLE) / si, 4) AS mean1",
        "round(CAST(cs2 - cs1 AS DOUBLE) / (ti - si), 4) AS mean2",
        "round(CAST(csn - cs2 AS DOUBLE) / (n - ti), 4) AS mean3",
        "round(CAST(cssn AS DOUBLE) - CAST(csn AS DOUBLE) * csn / n" +
          ", 4) AS sse0",
        "round(sse2, 4) AS sse2",
        "round(1.0 - sse2 / (CAST(cssn AS DOUBLE) - CAST(csn " +
          "AS DOUBLE) * csn / n), 4) AS reduction")
      .orderBy("event_type")
  }

  def twoChangepointsOracle: String = {
    val sse = "CAST(css1 AS DOUBLE) - CAST(cs1 AS DOUBLE) * cs1 / si" +
      " + (CAST(css2 - css1 AS DOUBLE) - CAST(cs2 - cs1 AS DOUBLE) *" +
      " (cs2 - cs1) / (ti - si))" +
      " + (CAST(cssn - css2 AS DOUBLE) - CAST(csn - cs2 AS DOUBLE) *" +
      " (csn - cs2) / (n - ti))"
    s"""WITH base AS (SELECT event_type AS et,
       |    CAST(date_diff('day', DATE '2024-01-01', ts) AS BIGINT)
       |      AS d, event_id
       |  FROM events
       |  UNION ALL
       |  SELECT 'two_steps', CAST(date_diff('day', DATE '2024-01-01',
       |    ts) AS BIGINT), event_id FROM events
       |  WHERE event_type = 'click'
       |  UNION ALL
       |  SELECT 'two_steps', CAST(date_diff('day', DATE '2024-01-01',
       |    ts) AS BIGINT), event_id FROM events
       |  WHERE event_type = 'click'
       |    AND CAST(date_diff('day', DATE '2024-01-01', ts) AS BIGINT)
       |      >= $Seg2Step1
       |  UNION ALL
       |  SELECT 'two_steps', CAST(date_diff('day', DATE '2024-01-01',
       |    ts) AS BIGINT), event_id FROM events
       |  WHERE event_type = 'click'
       |    AND CAST(date_diff('day', DATE '2024-01-01', ts) AS BIGINT)
       |      >= $Seg2Step2
       |  UNION ALL
       |  SELECT 'two_steps', CAST(date_diff('day', DATE '2024-01-01',
       |    ts) AS BIGINT), event_id FROM events
       |  WHERE event_type = 'click'
       |    AND CAST(date_diff('day', DATE '2024-01-01', ts) AS BIGINT)
       |      >= $Seg2Step2),
       |daily AS (SELECT et, d, CAST(count(*) AS BIGINT) AS x
       |  FROM base GROUP BY et, d),
       |pre AS (SELECT et, d,
       |    CAST(sum(x) OVER w AS BIGINT) AS cs,
       |    CAST(sum(x * x) OVER w AS BIGINT) AS css,
       |    CAST(row_number() OVER (PARTITION BY et ORDER BY d)
       |      AS BIGINT) AS i
       |  FROM daily
       |  WINDOW w AS (PARTITION BY et ORDER BY d ROWS BETWEEN
       |    UNBOUNDED PRECEDING AND CURRENT ROW)),
       |tot AS (SELECT et, max(i) AS n, max(cs) AS csn,
       |    max(css) AS cssn FROM pre GROUP BY et),
       |grid AS (SELECT a.et, a.i AS si, a.d AS sd, a.cs AS cs1,
       |    a.css AS css1, b.i AS ti, b.d AS td, b.cs AS cs2,
       |    b.css AS css2, tot.n, tot.csn, tot.cssn
       |  FROM pre a JOIN pre b ON b.et = a.et AND a.i < b.i
       |  JOIN tot ON tot.et = a.et
       |  WHERE b.i < tot.n),
       |sc AS (SELECT *, $sse AS sse2 FROM grid),
       |best AS (SELECT *, row_number() OVER (PARTITION BY et
       |    ORDER BY sse2, si, ti) AS rn FROM sc QUALIFY rn = 1)
       |SELECT et AS event_type, sd AS split1_after_day,
       |  td AS split2_after_day,
       |  round(CAST(cs1 AS DOUBLE) / si, 4) AS mean1,
       |  round(CAST(cs2 - cs1 AS DOUBLE) / (ti - si), 4) AS mean2,
       |  round(CAST(csn - cs2 AS DOUBLE) / (n - ti), 4) AS mean3,
       |  round(CAST(cssn AS DOUBLE) - CAST(csn AS DOUBLE) * csn / n,
       |    4) AS sse0,
       |  round(sse2, 4) AS sse2,
       |  round(1.0 - sse2 / (CAST(cssn AS DOUBLE) - CAST(csn
       |    AS DOUBLE) * csn / n), 4) AS reduction
       |FROM best ORDER BY event_type""".stripMargin
  }

  // --- q274/q275: survival analysis (Kaplan–Meier + log-rank) ------------

  /** Planted churn cohort: odd users' activity ends by this day. */
  val SurvChurnCap = 20L
  /** Interim withdrawal: every 4th user's observation stops here. */
  val SurvWithdrawDay = 15L
  /** Observation window end (censoring boundary). */
  val SurvEndDay = 29L

  /** Per-(cohort, day) survival grid: number at risk, churn events,
    * censorings — the shared risk table behind q274's KM curve and
    * q275's log-rank test. Odd users (cohort 1) have their activity
    * truncated at day [[SurvChurnCap]] (the planted early churn);
    * every 4th user is WITHDRAWN at day [[SurvWithdrawDay]] (interim
    * censoring — what makes KM differ from naive survival); users
    * active on the last day are right-censored. */
  private[operators] def survivalGrid(s: SparkSession,
      dir: String): DataFrame = {
    val ud = EtlOps.t(s, dir, "events").selectExpr("user_id",
        "CAST(datediff(ts, DATE '2024-01-01') AS BIGINT) AS d")
      .filter(expr(s"user_id % 2 = 0 OR d <= $SurvChurnCap"))
      .groupBy("user_id").agg(max(col("d")).as("l0"))
      .selectExpr("user_id % 2 AS cohort",
        s"CASE WHEN user_id % 4 = 0 AND l0 >= $SurvWithdrawDay " +
          s"THEN $SurvWithdrawDay ELSE l0 END AS t",
        s"CASE WHEN user_id % 4 = 0 AND l0 >= $SurvWithdrawDay " +
          s"THEN 0 WHEN l0 = $SurvEndDay THEN 0 ELSE 1 END AS e")
    val cells = ud.groupBy("cohort", "t").agg(
      sum(col("e")).as("d"), sum(lit(1L) - col("e")).as("c"))
    val grid = cells.select(col("cohort")).distinct()
      .crossJoin(s.range(SurvEndDay + 1).selectExpr(
        "CAST(id AS BIGINT) AS day"))
      .join(cells.withColumnRenamed("t", "day"),
        Seq("cohort", "day"), "left")
      .selectExpr("cohort", "day", "coalesce(d, 0) AS d",
        "coalesce(c, 0) AS c")
    grid.withColumn("n_risk",
      sum(col("d") + col("c")).over(
        Window.partitionBy("cohort").orderBy("day")
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)))
  }

  /** Shared oracle CTE text producing the same grid (cohort, day,
    * n_risk, d, c). */
  private[operators] val SurvivalGridSql: String =
    s"""ud AS (SELECT user_id % 2 AS cohort,
       |    CASE WHEN user_id % 4 = 0 AND l0 >= $SurvWithdrawDay
       |      THEN $SurvWithdrawDay ELSE l0 END AS t,
       |    CASE WHEN user_id % 4 = 0 AND l0 >= $SurvWithdrawDay
       |      THEN 0 WHEN l0 = $SurvEndDay THEN 0 ELSE 1 END AS e
       |  FROM (SELECT user_id, CAST(max(d) AS BIGINT) AS l0
       |    FROM (SELECT user_id,
       |        CAST(date_diff('day', DATE '2024-01-01', ts) AS BIGINT)
       |          AS d
       |      FROM events)
       |    WHERE user_id % 2 = 0 OR d <= $SurvChurnCap
       |    GROUP BY user_id)),
       |cells AS (SELECT cohort, t, CAST(sum(e) AS BIGINT) AS d,
       |    CAST(sum(1 - e) AS BIGINT) AS c
       |  FROM ud GROUP BY cohort, t),
       |grid AS (SELECT ch.cohort, dy.day,
       |    coalesce(cells.d, 0) AS d, coalesce(cells.c, 0) AS c
       |  FROM (SELECT DISTINCT cohort FROM cells) ch
       |  CROSS JOIN (SELECT CAST(unnest(range(0, ${SurvEndDay + 1}))
       |    AS BIGINT) AS day) dy
       |  LEFT JOIN cells ON cells.cohort = ch.cohort
       |    AND cells.t = dy.day),
       |rg AS (SELECT cohort, day, d, c,
       |    CAST(sum(d + c) OVER (PARTITION BY cohort ORDER BY day
       |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
       |      AS BIGINT) AS n_risk
       |  FROM grid)""".stripMargin

  /** q274 — Kaplan–Meier survival curves per cohort with interim
    * censoring: user churn (last-activity day) under a withdrawal
    * process that REMOVES users from observation mid-window — the
    * setting where naive survival is biased and KM's risk-set
    * renormalization Π(1 − dᵢ/nᵢ) is the fix. The planted early-churn
    * cohort's curve must drop to ~0 by day [[SurvChurnCap]] while the
    * control cohort retains its right-censored tail.
    *
    * Exactness: the KM product runs ENTIRELY in integers — surv_fp ←
    * surv_fp·(n−d) div n at ×1e12 — so the 30-step chain is
    * bit-identical on both engines (Spark iterates driver-side over
    * the 60-cell collected grid, the q272 metadata boundary; the
    * oracle uses a linear recursive CTE).
    *
    * Scale (100 TB): one user_id exchange to last-activity rows; the
    * grid is |cohorts|·|calendar| cells; KM itself is O(days). */
  def kaplanMeier(s: SparkSession, dir: String): DataFrame = {
    val grid = survivalGrid(s, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
      .sortBy(r => (r._1, r._2))
    val out = grid.groupBy(_._1).toSeq.flatMap { case (cohort, rows) =>
      var fp = 1000000000000L
      rows.sortBy(_._2).map { case (_, day, d, c, nRisk) =>
        if (nRisk > 0) fp = fp * (nRisk - d) / nRisk
        (cohort, day, nRisk, d, c, fp)
      }
    }.filter(r => r._4 > 0 || r._5 > 0)
    s.createDataFrame(out).toDF("cohort", "day", "n_risk", "d_churn",
        "c_censored", "surv_fp")
      .selectExpr("cohort", "day", "n_risk", "d_churn", "c_censored",
        "round(CAST(surv_fp AS DOUBLE) / 1e12, 6) AS survival")
      .orderBy("cohort", "day")
  }

  def kaplanMeierOracle: String =
    s"""WITH RECURSIVE $SurvivalGridSql,
       |km AS (
       |  SELECT cohort, CAST(-1 AS BIGINT) AS day,
       |    CAST(1000000000000 AS BIGINT) AS surv_fp
       |  FROM (SELECT DISTINCT cohort FROM rg)
       |  UNION ALL
       |  SELECT km.cohort AS cohort, rg.day AS day,
       |    CASE WHEN rg.n_risk > 0
       |      THEN km.surv_fp * (rg.n_risk - rg.d) // rg.n_risk
       |      ELSE km.surv_fp END AS surv_fp
       |  FROM km JOIN rg ON rg.cohort = km.cohort
       |    AND rg.day = km.day + 1
       |  WHERE km.day < $SurvEndDay)
       |SELECT rg.cohort, rg.day, rg.n_risk, rg.d AS d_churn,
       |  rg.c AS c_censored,
       |  round(CAST(km.surv_fp AS DOUBLE) / 1e12, 6) AS survival
       |FROM rg JOIN km ON km.cohort = rg.cohort AND km.day = rg.day
       |WHERE rg.d > 0 OR rg.c > 0
       |ORDER BY rg.cohort, rg.day""".stripMargin

  /** χ²₁ critical value at α = 0.05 for the log-rank verdict. */
  val LogRankCrit = 3.8415

  /** q275 — log-rank test between the two survival cohorts: the
    * standard significance companion to q274's KM curves (means tests
    * like q245 ignore censoring; the log-rank accumulates per-day
    * hypergeometric observed−expected evidence over the shared risk
    * table). The planted early-churn cohort must reject decisively.
    *
    * Exactness: per-day E and V are fixed double expressions over
    * integer risk counts; the day sums freeze to ×1e9 bigints before
    * the order-free total (the q195 discipline); χ² is one division.
    *
    * Scale (100 TB): shares q274's grid; the test is |calendar|-cell
    * algebra. */
  def logRank(s: SparkSession, dir: String): DataFrame = {
    val g = survivalGrid(s, dir)
    val a = g.filter(col("cohort") === 1).select(col("day"),
      col("n_risk").as("n1"), col("d").as("d1"))
    val b = g.filter(col("cohort") === 0).select(col("day"),
      col("n_risk").as("n0"), col("d").as("d0"))
    a.join(b, "day")
      .filter(expr("n1 + n0 > 1 AND d1 + d0 > 0"))
      .withColumn("e1_fp", expr("CAST(floor(CAST(d1 + d0 AS DOUBLE) " +
        "* n1 / (n1 + n0) * 1e9) AS BIGINT)"))
      .withColumn("v_fp", expr("CAST(floor(CAST(d1 + d0 AS DOUBLE) " +
        "* n1 / (n1 + n0) * n0 / (n1 + n0) * " +
        "(n1 + n0 - d1 - d0) / (n1 + n0 - 1) * 1e9) AS BIGINT)"))
      .agg(sum(col("d1")).as("o1"), sum(col("e1_fp")).as("e1_fp"),
        sum(col("v_fp")).as("v_fp"))
      .selectExpr("o1",
        "round(CAST(e1_fp AS DOUBLE) / 1e9, 4) AS e1",
        "round((CAST(o1 AS DOUBLE) - CAST(e1_fp AS DOUBLE) / 1e9) * " +
          "(CAST(o1 AS DOUBLE) - CAST(e1_fp AS DOUBLE) / 1e9) / " +
          "(CAST(v_fp AS DOUBLE) / 1e9), 4) AS chi2",
        "(CAST(o1 AS DOUBLE) - CAST(e1_fp AS DOUBLE) / 1e9) * " +
          "(CAST(o1 AS DOUBLE) - CAST(e1_fp AS DOUBLE) / 1e9) / " +
          s"(CAST(v_fp AS DOUBLE) / 1e9) > $LogRankCrit " +
          "AS survival_differs")
  }

  def logRankOracle: String =
    s"""WITH $SurvivalGridSql,
       |j AS (SELECT a.day, a.n_risk AS n1, a.d AS d1,
       |    b.n_risk AS n0, b.d AS d0
       |  FROM rg a JOIN rg b ON b.day = a.day
       |    AND a.cohort = 1 AND b.cohort = 0
       |  WHERE a.n_risk + b.n_risk > 1 AND a.d + b.d > 0),
       |f AS (SELECT d1,
       |    CAST(floor(CAST(d1 + d0 AS DOUBLE) * n1 / (n1 + n0)
       |      * 1e9) AS BIGINT) AS e1_fp,
       |    CAST(floor(CAST(d1 + d0 AS DOUBLE) * n1 / (n1 + n0)
       |      * n0 / (n1 + n0) * (n1 + n0 - d1 - d0) / (n1 + n0 - 1)
       |      * 1e9) AS BIGINT) AS v_fp
       |  FROM j),
       |ag AS (SELECT CAST(sum(d1) AS BIGINT) AS o1,
       |    CAST(sum(e1_fp) AS BIGINT) AS e1_fp,
       |    CAST(sum(v_fp) AS BIGINT) AS v_fp FROM f)
       |SELECT o1, round(CAST(e1_fp AS DOUBLE) / 1e9, 4) AS e1,
       |  round((CAST(o1 AS DOUBLE) - CAST(e1_fp AS DOUBLE) / 1e9) *
       |    (CAST(o1 AS DOUBLE) - CAST(e1_fp AS DOUBLE) / 1e9) /
       |    (CAST(v_fp AS DOUBLE) / 1e9), 4) AS chi2,
       |  (CAST(o1 AS DOUBLE) - CAST(e1_fp AS DOUBLE) / 1e9) *
       |    (CAST(o1 AS DOUBLE) - CAST(e1_fp AS DOUBLE) / 1e9) /
       |    (CAST(v_fp AS DOUBLE) / 1e9) > $LogRankCrit
       |    AS survival_differs
       |FROM ag""".stripMargin

  // --- q282: Markov removal-effect attribution -----------------------------

  /** Transient channel states (every event type except the conversion
    * event), in the fixed order both engines iterate over. */
  val MkChannels: Seq[String] = Seq("click", "error", "signup", "view")

  /** Fixed-point scale and Jacobi iteration count of the absorption
    * chain. 40 iterations ≥ geometric convergence far below the ×1e12
    * resolution; the count is part of the operator's definition, so
    * both engines run the identical chain. */
  val MkFp = 1000000000000L
  val MkIters = 40

  /** q282 — Markov removal-effect attribution: q63 credits conversions
    * by a last-touch window join; this is the model-based alternative —
    * user-day event paths become a first-order Markov chain
    * (channels → {conv, drop}), conversion probability is the chain's
    * absorption probability from START, and each channel's credit is
    * its REMOVAL EFFECT (how much absorption drops when paths through
    * the channel are severed — Anderl et al.'s framework). Unlike
    * last-touch, assist channels that never finish a path still earn
    * credit.
    *
    * Exactness: transition probabilities freeze to ×[[MkFp]] integers
    * (floor division by the row sum); the Jacobi iteration runs
    * [[MkIters]] steps ENTIRELY in integers — products in
    * BigInt/HUGEINT, one floor division per step — so the chain is
    * bit-identical cross-engine (Spark iterates driver-side over the
    * collected ≤30-cell count matrix, the q274 metadata boundary; the
    * oracle uses a linear recursive CTE with the matrix PIVOTED to one
    * row so the recursion never aggregates).
    *
    * Scale (100 TB): one (user, day) exchange orders the paths; the
    * chain collapses to |states|² counts via map-side combine; the
    * iteration is O(states²·iters) on metadata. */
  def markovAttribution(s: SparkSession, dir: String): DataFrame = {
    val ev = EtlOps.t(s, dir, "events").selectExpr("user_id",
      "CAST(datediff(ts, DATE '2024-01-01') AS BIGINT) AS day",
      "ts", "event_id", "event_type")
    // ONE (user, day) exchange carries everything: seq + lag share the
    // ordered spec; first-purchase seq and path length are unordered
    // window aggs over the same partitioning (no groupBy+join detour).
    // lag computed BEFORE the truncation filter equals lag after it —
    // only suffix rows (seq > fpseq) are dropped, so every kept row's
    // predecessor is kept.
    val w = Window.partitionBy("user_id", "day")
      .orderBy("ts", "event_id")
    val wp = Window.partitionBy("user_id", "day")
    val tr0 = ev
      .withColumn("m", expr("CASE WHEN event_type = 'purchase' " +
        "THEN 'conv' ELSE event_type END"))
      .withColumn("seq", row_number().over(w))
      .withColumn("prev", lag(col("m"), 1).over(w))
      .withColumn("fpseq", min(when(
        col("event_type") === "purchase", col("seq"))).over(wp))
      .withColumn("mx", max(col("seq")).over(wp))
      .filter(col("fpseq").isNull || col("seq") <= col("fpseq"))
      .withColumn("from_s", coalesce(col("prev"), lit("start")))
    // both the step transition and (for unconverted path tails) the
    // terminal →drop transition emit from ONE pass — a union would
    // recompute the whole window stage twice
    val trans = tr0.selectExpr(
      "explode(CASE WHEN fpseq IS NULL AND seq = mx THEN " +
        "array(struct(from_s AS f, m AS t), " +
        "struct(m AS f, 'drop' AS t)) " +
        "ELSE array(struct(from_s AS f, m AS t)) END) AS tr")
      .selectExpr("tr.f AS from_s", "tr.t AS to_s")
    val cnt = trans.groupBy("from_s", "to_s")
      .agg(count(lit(1L)).as("n")).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val rowSum: Map[String, Long] =
      cnt.groupBy(_._1._1).map { case (f, m) => (f, m.values.sum) }
    def pfp(f: String, t: String): BigInt =
      cnt.get((f, t)) match {
        case Some(n) => BigInt(n) * MkFp / BigInt(rowSum.getOrElse(f, 1L))
        case None    => BigInt(0)
      }
    def absorb(removed: String): BigInt = {
      var v: Map[String, BigInt] =
        MkChannels.map(c => c -> BigInt(0)).toMap
      for (_ <- 1 to MkIters) {
        v = MkChannels.map { c =>
          c -> (if (c == removed) BigInt(0)
                else pfp(c, "conv") +
                  MkChannels.map(c2 => pfp(c, c2) * v(c2)).sum / MkFp)
        }.toMap
      }
      pfp("start", "conv") +
        MkChannels.map(c => pfp("start", c) * v(c)).sum / MkFp
    }
    val vb = absorb("none")
    val rows = ("none", vb.toLong, None: Option[Long]) +:
      MkChannels.map { c =>
        val vc = absorb(c)
        (c, vc.toLong, Some((vb - vc).toLong))
      }
    val den = rows.flatMap(_._3).sum
    import s.implicits._
    rows.map { case (run, v, en) =>
      (run, v, en.getOrElse(-1L), en.isDefined) }
      .toDF("removed_channel", "v_fp", "en", "is_ch")
      .selectExpr("removed_channel",
        "round(CAST(v_fp AS DOUBLE) / 1e12, 6) AS conv_prob",
        s"CASE WHEN is_ch THEN round(CAST(en AS DOUBLE) / $vb.0, 6) " +
          "END AS removal_effect",
        s"CASE WHEN is_ch THEN round(CAST(en AS DOUBLE) / $den.0, 6) " +
          "END AS attribution_share")
      .orderBy("removed_channel")
  }

  def markovAttributionOracle: String = {
    val toStates = MkChannels :+ "conv"
    val fromStates = "start" +: MkChannels
    val pmCols = (for (f <- fromStates; t <- toStates) yield
      s"CAST(max(CASE WHEN from_s = '$f' AND to_s = '$t' THEN p_fp " +
        s"ELSE 0 END) AS BIGINT) AS p_${f}_$t").mkString(",\n  ")
    def step(c: String) =
      s"""CASE WHEN it.run = '$c' THEN CAST(0 AS BIGINT)
         |      ELSE CAST(pm.p_${c}_conv + (""".stripMargin +
        MkChannels.map(c2 =>
          s"CAST(pm.p_${c}_$c2 AS HUGEINT) * it.v_$c2")
          .mkString(" + ") +
        s") // $MkFp AS BIGINT) END AS v_$c"
    val vStart = s"CAST(pm.p_start_conv + (" +
      MkChannels.map(c => s"CAST(pm.p_start_$c AS HUGEINT) * it.v_$c")
        .mkString(" + ") + s") // $MkFp AS BIGINT)"
    s"""WITH RECURSIVE ev AS (SELECT user_id,
       |    CAST(date_diff('day', DATE '2024-01-01', ts) AS BIGINT)
       |      AS day, ts, event_id, event_type
       |  FROM events),
       |sq AS (SELECT *, row_number() OVER (PARTITION BY user_id, day
       |    ORDER BY ts, event_id) AS seq FROM ev),
       |fp AS (SELECT user_id, day, min(seq) AS fpseq FROM sq
       |  WHERE event_type = 'purchase' GROUP BY 1, 2),
       |pth AS (SELECT sq.user_id, sq.day, sq.seq,
       |    CASE WHEN sq.event_type = 'purchase' THEN 'conv'
       |      ELSE sq.event_type END AS m, fp.fpseq
       |  FROM sq LEFT JOIN fp ON fp.user_id = sq.user_id
       |    AND fp.day = sq.day
       |  WHERE fp.fpseq IS NULL OR sq.seq <= fp.fpseq),
       |tr0 AS (SELECT user_id, day, seq, m, fpseq,
       |    coalesce(lag(m) OVER (PARTITION BY user_id, day
       |      ORDER BY seq), 'start') AS from_s,
       |    max(seq) OVER (PARTITION BY user_id, day) AS mx
       |  FROM pth),
       |trans AS (SELECT from_s, m AS to_s FROM tr0
       |  UNION ALL
       |  SELECT m, 'drop' FROM tr0 WHERE fpseq IS NULL AND seq = mx),
       |cnt AS (SELECT from_s, to_s, count(*) AS n FROM trans
       |  GROUP BY 1, 2),
       |rs AS (SELECT from_s, CAST(sum(n) AS BIGINT) AS tot FROM cnt
       |  GROUP BY 1),
       |p AS (SELECT c.from_s, c.to_s,
       |    CAST(CAST(c.n AS HUGEINT) * $MkFp // rs.tot AS BIGINT)
       |      AS p_fp
       |  FROM cnt c JOIN rs ON rs.from_s = c.from_s),
       |pm AS (SELECT
       |  $pmCols
       |  FROM p),
       |it AS (SELECT r.run, 0 AS k,
       |    ${MkChannels.map(c => s"CAST(0 AS BIGINT) AS v_$c")
             .mkString(", ")}
       |  FROM (VALUES ${("none" +: MkChannels)
             .map(r => s"('$r')").mkString(", ")}) r(run)
       |  UNION ALL
       |  SELECT it.run, it.k + 1,
       |    ${MkChannels.map(step).mkString(",\n    ")}
       |  FROM it, pm WHERE it.k < $MkIters),
       |fin AS (SELECT it.run, $vStart AS v_fp
       |  FROM it, pm WHERE it.k = $MkIters),
       |b AS (SELECT v_fp AS vb FROM fin WHERE run = 'none'),
       |eff AS (SELECT f.run, f.v_fp,
       |    CASE WHEN f.run = 'none' THEN NULL
       |      ELSE b.vb - f.v_fp END AS en
       |  FROM fin f, b),
       |t2 AS (SELECT CAST(sum(en) AS BIGINT) AS den FROM eff
       |  WHERE run <> 'none')
       |SELECT eff.run AS removed_channel,
       |  round(CAST(eff.v_fp AS DOUBLE) / 1e12, 6) AS conv_prob,
       |  CASE WHEN eff.run = 'none' THEN NULL
       |    ELSE round(CAST(eff.en AS DOUBLE) / CAST(b.vb AS DOUBLE), 6)
       |    END AS removal_effect,
       |  CASE WHEN eff.run = 'none' THEN NULL
       |    ELSE round(CAST(eff.en AS DOUBLE) / CAST(t2.den AS DOUBLE),
       |      6) END AS attribution_share
       |FROM eff, b, t2 ORDER BY removed_channel""".stripMargin
  }

  // --- q310: ACF + Ljung–Box whiteness audit -------------------------------

  /** Portmanteau depth: ACF lags 1..[[AcfMaxLag]] are tested jointly. */
  val AcfMaxLag = 7

  /** χ²(0.95, df) critical values for df = 1..[[AcfMaxLag]] (standard
    * table constants — Ljung & Box 1978 usage). */
  val Chi2Crit95: Seq[Double] =
    Seq(3.841, 5.991, 7.815, 9.488, 11.070, 12.592, 14.067)

  /** q310 — residual-whiteness audit: the sample autocorrelation
    * function at lags 1..[[AcfMaxLag]] of each stream's daily-count
    * series, with the cumulative Ljung–Box portmanteau statistic
    * Q(K) = n(n+2)·Σ_{k≤K} r_k²/(n−k) tested against χ²(0.95, K).
    * q262's lag-1 r flags the periodic-batch SHAPE; this is the full
    * test every anomaly monitor upstream assumes implicitly — CUSUM
    * (q253), z-scores (q73) and control-band alerting are calibrated
    * for white residuals, and a stream that fails whiteness here will
    * false-alarm there at far above its nominal rate. The planted
    * 'bursty' stream (q262's fixture: dow-0 days tripled) must fail
    * with the period-7 signature (r₇ ≫ 0) while plain daily noise
    * passes.
    *
    * Exactness: with S = Σx and n the day count, each lag's numerator
    * Σ_t (n·x_t − S)(n·x_{t−k} − S) and the shared denominator
    * Σ_t (n·x_t − S)² are exact BIGINTs (the q262 discipline, extended
    * to [[AcfMaxLag]] lags); r_k is ONE double division, and Q
    * accumulates r_k² in fixed lag order on both engines.
    *
    * Scale (100 TB): one (type, day) cell collapse (map-side combined);
    * the [[AcfMaxLag]] lag columns come from ONE per-type window sort
    * over |calendar| cells; everything after is arithmetic on
    * |types|·|lags| rows. */
  def acfWhiteness(s: SparkSession, dir: String): DataFrame = {
    val ev = EtlOps.t(s, dir, "events")
    val base = ev.selectExpr("event_type AS et",
      "CAST(datediff(ts, DATE '2024-01-01') AS BIGINT) AS d")
    val plant1 = ev.selectExpr("'bursty' AS et",
      "CAST(datediff(ts, DATE '2024-01-01') AS BIGINT) AS d")
    val plantX = plant1.filter(col("d") % 7 === 0)
    val daily = base.unionAll(plant1).unionAll(plantX).unionAll(plantX)
      .groupBy("et", "d").agg(count(lit(1)).as("x"))
    val wAll = Window.partitionBy("et")
    val wOrd = Window.partitionBy("et").orderBy("d")
    val lagged = (1 to AcfMaxLag).foldLeft(
      daily.withColumn("n", count(lit(1)).over(wAll))
        .withColumn("sx", sum(col("x")).over(wAll))) { (df, k) =>
      df.withColumn(s"xl$k", lag(col("x"), k).over(wOrd))
    }
    // dev_t = n·x_t − S is an exact BIGINT; num_k/den are exact sums
    val numCols = (1 to AcfMaxLag).flatMap { k =>
      Seq(sum(when(col(s"xl$k").isNotNull,
        expr(s"(n * x - sx) * (n * xl$k - sx)")).otherwise(0L))
        .as(s"num$k"))
    }
    val aggCols = Seq(
      sum(expr("(n * x - sx) * (n * x - sx)")).as("den")) ++ numCols
    val ag = lagged.groupBy("et")
      .agg(max(col("n")).as("n"), aggCols: _*)
    val stackArgs = (1 to AcfMaxLag)
      .map(k => s"${k}L, num$k, ${Chi2Crit95(k - 1)}D").mkString(", ")
    val perLag = ag.select(col("et"), col("n"), col("den"),
      expr(s"stack($AcfMaxLag, $stackArgs) AS (lag, num, chi2_crit)"))
      .withColumn("acf",
        col("num").cast("double") / col("den").cast("double"))
    val wQ = Window.partitionBy("et").orderBy("lag")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perLag
      .withColumn("q_stat",
        col("n").cast("double") * (col("n") + lit(2L)).cast("double") *
          sum(col("acf") * col("acf") /
            (col("n") - col("lag")).cast("double")).over(wQ))
      .selectExpr("et AS event_type", "lag", "n AS n_days",
        "round(acf, 6) AS acf", "round(q_stat, 4) AS q_stat",
        "chi2_crit", "q_stat <= chi2_crit AS is_white_noise")
      .orderBy("event_type", "lag")
  }

  def acfWhitenessOracle: String = {
    val numSel = (1 to AcfMaxLag).map(k =>
      s"""    CAST(sum(CASE WHEN xl$k IS NOT NULL
         |      THEN (n * x - sx) * (n * xl$k - sx) ELSE 0 END)
         |      AS BIGINT) AS num$k""".stripMargin).mkString(",\n")
    val lagSel = (1 to AcfMaxLag).map(k =>
      s"lag(x, $k) OVER (PARTITION BY et ORDER BY d) AS xl$k")
      .mkString(",\n       |    ")
    val unions = (1 to AcfMaxLag).map { k =>
      s"SELECT et, n, den, CAST($k AS BIGINT) AS lag, num$k AS num, " +
        s"CAST(${Chi2Crit95(k - 1)} AS DOUBLE) AS chi2_crit FROM ag"
    }.mkString("\n  UNION ALL ")
    s"""WITH base AS (SELECT event_type AS et,
       |    CAST(date_diff('day', DATE '2024-01-01', ts) AS BIGINT) AS d
       |  FROM events
       |  UNION ALL
       |  SELECT 'bursty', CAST(date_diff('day', DATE '2024-01-01', ts)
       |    AS BIGINT) FROM events
       |  UNION ALL
       |  SELECT 'bursty', CAST(date_diff('day', DATE '2024-01-01', ts)
       |    AS BIGINT) FROM events
       |  WHERE CAST(date_diff('day', DATE '2024-01-01', ts) AS BIGINT)
       |    % 7 = 0
       |  UNION ALL
       |  SELECT 'bursty', CAST(date_diff('day', DATE '2024-01-01', ts)
       |    AS BIGINT) FROM events
       |  WHERE CAST(date_diff('day', DATE '2024-01-01', ts) AS BIGINT)
       |    % 7 = 0),
       |daily AS (SELECT et, d, CAST(count(*) AS BIGINT) AS x
       |  FROM base GROUP BY et, d),
       |lw AS (SELECT *,
       |    CAST(count(*) OVER (PARTITION BY et) AS BIGINT) AS n,
       |    CAST(sum(x) OVER (PARTITION BY et) AS BIGINT) AS sx,
       |    $lagSel
       |  FROM daily),
       |ag AS (SELECT et, max(n) AS n,
       |    CAST(sum((n * x - sx) * (n * x - sx)) AS BIGINT) AS den,
       |$numSel
       |  FROM lw GROUP BY et),
       |st AS (
       |  $unions),
       |r AS (SELECT *, CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS acf
       |  FROM st),
       |q AS (SELECT *,
       |    CAST(n AS DOUBLE) * CAST(n + 2 AS DOUBLE) *
       |      sum(acf * acf / CAST(n - lag AS DOUBLE))
       |        OVER (PARTITION BY et ORDER BY lag
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |      AS q_stat
       |  FROM r)
       |SELECT et AS event_type, lag, n AS n_days,
       |  round(acf, 6) AS acf, round(q_stat, 4) AS q_stat, chi2_crit,
       |  q_stat <= chi2_crit AS is_white_noise
       |FROM q ORDER BY event_type, lag""".stripMargin
  }
}
