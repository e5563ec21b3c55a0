package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{EtlOps, GraphOps, MlPrepOps, ProfileOps, TimeSeriesOps}

/** Property tests for the q80-q87 batch: invariants the DuckDB oracle
  * cannot express (cross-row conservation laws, recurrence equivalence,
  * graph-theoretic bounds). */
class TimeSeriesOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSession.spark
  val dir = TestSession.sfDir("0.001")

  test("cohort retention: offset-0 retention is exactly 1 and cohorts partition users") {
    val r = TimeSeriesOps.cohortRetention(spark, dir).collect()
    val atZero = r.filter(_.getLong(1) == 0L)
    assert(atZero.nonEmpty)
    // every user is active in their own cohort week by construction
    atZero.foreach(row => assert(row.getDouble(3) == 1.0,
      s"cohort ${row.getLong(0)} offset-0 retention ${row.getDouble(3)}"))
    // cohort sizes sum to the distinct-user count
    val users = EtlOps.events(spark, dir)
      .select("user_id").distinct().count()
    val cohortSizes = r.filter(_.getLong(1) == 0L).map(_.getLong(2)).sum
    assert(cohortSizes == users)
    // retention never exceeds 1
    r.foreach(row => assert(row.getDouble(3) <= 1.0))
  }

  test("rolling distinct: u7 bounds — at least dau, at most total users, monotone under window growth") {
    val rows = TimeSeriesOps.rollingDistinctUsers(spark, dir).collect()
    val total = EtlOps.events(spark, dir).select("user_id").distinct().count()
    rows.foreach { r =>
      val (dau, u7) = (r.getLong(1), r.getLong(2))
      assert(u7 >= dau, s"day ${r.get(0)}: u7 $u7 < dau $dau")
      assert(u7 <= total)
    }
  }

  test("gap fill: spine is complete per priority, zero-filled gaps, ffill matches last seen") {
    val rows = TimeSeriesOps.gapFillForwardFill(spark, dir).collect()
    val byPrio = rows.groupBy(_.getString(0))
    val nDays = byPrio.values.map(_.length).toSet
    assert(nDays.size == 1, s"priorities disagree on spine length: $nDays")
    byPrio.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getDate(1).toString)
      var lastRev: Option[Double] = None
      sorted.foreach { r =>
        val isGap = r.getBoolean(4)
        if (isGap) {
          assert(r.getLong(2) == 0L, "gap day with nonzero order count")
          // forward fill carries the last seen value (null before any)
          if (lastRev.isEmpty) assert(r.isNullAt(3))
          else assert(r.getDouble(3) == lastRev.get)
        } else {
          assert(r.getLong(2) > 0L)
          lastRev = Some(r.getDouble(3))
        }
      }
    }
  }

  test("ewma: equals the sequential recurrence applied per user") {
    val got = TimeSeriesOps.ewma(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // recompute the textbook recurrence driver-side (oldest → newest)
    val events = EtlOps.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("value"), col("ts"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getTimestamp(3).getTime))
    events.groupBy(_._1).foreach { case (uid, rows) =>
      val recent = rows.sortBy(r => (-r._4, -r._2)).take(TimeSeriesOps.EwmaN)
        .reverse // oldest first
      var e = recent.head._3
      recent.tail.foreach(r => e = 0.5 * r._3 + 0.5 * e)
      val (nUsed, gotE) = got(uid)
      assert(nUsed == recent.length)
      // fixed-point quantization floors each term at 1e-12: n terms ⇒
      // at most n ulps of slack vs the float recurrence
      assert(math.abs(gotE - e) < 1e-9,
        s"user $uid: ewma $gotE vs recurrence $e")
    }
  }

  test("feature hash: per-doc bucket counts sum to token count; signed bounded by cnt") {
    val rows = MlPrepOps.featureHash(spark, dir).collect()
    rows.foreach { r =>
      val (cnt, signed) = (r.getLong(2), r.getLong(3))
      assert(math.abs(signed) <= cnt)
      assert((cnt - math.abs(signed)) % 2 == 0,
        "cnt and |signed| must have equal parity (sum of ±1)")
      assert(r.getLong(1) >= 0 && r.getLong(1) < MlPrepOps.HashDim)
    }
    val perDoc = rows.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(2)).sum)
    val tokCounts = EtlOps.t(spark, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    perDoc.foreach { case (doc, n) => assert(n == tokCounts(doc)) }
  }

  test("boilerplate: kept ≤ total; segments shared by ≥2 docs are exactly the dropped ones") {
    val rows = MlPrepOps.boilerplateRemoval(spark, dir).collect()
    assert(rows.nonEmpty)
    var dropped = 0L
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      dropped += r.getLong(1) - r.getLong(2)
      // clean_md5 is null iff nothing survived
      assert(r.isNullAt(3) == (r.getLong(2) == 0L))
    }
    assert(dropped > 0, "synthetic corpus repeats trigrams; expected boilerplate")
  }

  test("knn graph: mutual degree ≤ k, triangle handshake, coefficient in [0,1]") {
    val rows = GraphOps.knnGraphStats(spark, dir).collect()
    assert(rows.nonEmpty)
    var triSum = 0L
    rows.foreach { r =>
      val (deg, tri, coef) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(deg >= 1 && deg <= GraphOps.KnnK,
        s"mutual-kNN degree $deg outside [1, ${GraphOps.KnnK}]")
      assert(coef >= 0.0 && coef <= 1.0)
      triSum += tri
    }
    // every triangle contributes to exactly 3 nodes
    assert(triSum % 3 == 0, s"per-node triangle sum $triSum not divisible by 3")
    assert(triSum > 0, "embedding kNN graph should close some triangles")
  }

  test("inverted index: df × head length consistency; postings parse and stay sorted") {
    val rows = MlPrepOps.invertedIndex(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (df, tfTotal, head) = (r.getLong(1), r.getLong(2), r.getString(3))
      val entries = head.split(",").map { e =>
        val Array(d, tf) = e.split(":"); (d.toLong, tf.toLong)
      }
      assert(entries.length == math.min(df, MlPrepOps.PostingsCap.toLong))
      assert(entries.map(_._1).toSeq == entries.map(_._1).sorted.toSeq,
        "posting head not doc-ordered")
      assert(tfTotal >= df, "total tf below document frequency")
      if (df <= MlPrepOps.PostingsCap)
        assert(entries.map(_._2).sum == tfTotal,
          "uncapped posting list must carry the whole tf mass")
    }
  }

  test("winsorized mean: pulled toward the center, clip counts bounded by 5% tails") {
    val rows = graft.operators.AnalyticsOps.winsorizedMean(spark, dir).collect()
    rows.foreach { r =>
      val (n, raw, win) = (r.getLong(1), r.getDouble(2), r.getDouble(3))
      val (lo, hi) = (r.getLong(4), r.getLong(5))
      // clamping keeps the mean inside the observed value range
      val vals = EtlOps.events(spark, dir)
        .filter(col("event_type") === r.getString(0))
        .agg(min(col("value")), max(col("value"))).collect()(0)
      assert(win >= vals.getDouble(0) && win <= vals.getDouble(1))
      assert(!win.isNaN && !raw.isNaN)
      // ceil(0.05·n)-rank bounds clip strictly less than ~5% + 1 per tail
      assert(lo <= n / 20 + 1, s"low clips $lo exceed 5% of $n")
      assert(hi <= n / 20 + 1, s"high clips $hi exceed 5% of $n")
    }
  }

  test("group OLS: slope/intercept reproduce the closed form computed driver-side") {
    val got = graft.operators.AnalyticsOps.groupOls(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val ev = EtlOps.events(spark, dir)
      .selectExpr("event_type", "value",
        s"CAST(datediff(CAST(ts AS DATE), DATE'${TimeSeriesOps.CohortAnchor}') AS DOUBLE) AS x")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    ev.groupBy(_._1).foreach { case (et, rs) =>
      val n = rs.length.toDouble
      val sx = rs.map(_._3).sum; val sy = rs.map(_._2).sum
      val sxy = rs.map(r => r._3 * r._2).sum
      val sxx = rs.map(r => r._3 * r._3).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val intercept = (sy - slope * sx) / n
      val (gn, gs, gi) = got(et)
      assert(gn == rs.length)
      assert(math.abs(gs - slope) < 1e-6, s"$et slope $gs vs $slope")
      assert(math.abs(gi - intercept) < 1e-6, s"$et intercept $gi vs $intercept")
    }
  }

  test("snapshot digest: exactly the drifted buckets mismatch") {
    import graft.operators.ScaleOps
    val rows = ScaleOps.snapshotDigest(spark, dir).collect()
    assert(rows.length == ScaleOps.DigestBuckets)
    // recompute which buckets contain a drifted key
    val driftBuckets = EtlOps.t(spark, dir, "lineitem")
      .filter(col("l_orderkey") % ScaleOps.DriftMod === 0)
      .select((graft.operators.TextOps.md5Fingerprint60(
        concat_ws("|", col("l_orderkey"), col("l_linenumber")))
        % ScaleOps.DigestBuckets).as("b"))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(driftBuckets.nonEmpty)
    rows.foreach { r =>
      val (bucket, matches) = (r.getLong(0), r.getBoolean(3))
      assert(matches == !driftBuckets.contains(bucket),
        s"bucket $bucket: match=$matches but drift=${driftBuckets.contains(bucket)}")
      assert(r.getLong(1) == r.getLong(2), "row counts must agree (drift mutates, not inserts)")
    }
  }

  test("equi-depth histogram: depths within 1, ranges tile without overlap") {
    import graft.operators.ProfileOps
    val rows = ProfileOps.equiDepthHistogram(spark, dir).collect()
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val cnts = rs.map(_.getLong(2))
      assert(cnts.max - cnts.min <= 1, s"depths ${cnts.toList} not balanced")
      val sorted = rs.sortBy(_.getLong(1))
      sorted.sliding(2).foreach {
        case Array(x, y) => assert(x.getDouble(4) <= y.getDouble(3),
          "bucket ranges out of order")
        case _ =>
      }
    }
  }

  test("fuzzy match: pairs share a block, respect the edit bound, and the symmetric closure is complete") {
    import graft.operators.DedupOps
    val rows = DedupOps.fuzzyNameMatch(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(1) < r.getString(2))
      assert(r.getLong(3) >= 1 && r.getLong(3) <= DedupOps.MaxEdit)
      assert(r.getString(1).endsWith(r.getString(0)) &&
        r.getString(2).endsWith(r.getString(0)), "pair outside its block")
    }
    // brute-force closure over the distinct names must agree
    val names = EtlOps.t(spark, dir, "part")
      .select("p_name").distinct().collect().map(_.getString(0))
    val expect = (for {
      x <- names; y <- names
      if x < y && x.split(" ").last == y.split(" ").last
      d = {
        val dp = Array.tabulate(x.length + 1, y.length + 1) { (i, j) =>
          if (i == 0) j else if (j == 0) i else 0 }
        for (i <- 1 to x.length; j <- 1 to y.length)
          dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
            dp(i - 1)(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1))
        dp(x.length)(y.length)
      }
      if d <= DedupOps.MaxEdit
    } yield (x, y)).toSet
    assert(rows.map(r => (r.getString(1), r.getString(2))).toSet == expect)
  }

  test("temporal dim join: state at purchase = last non-purchase event at-or-before ts (no future leak)") {
    val got = graft.operators.JoinOps.temporalDimJoin(spark, dir).collect()
      .map(r => r.getLong(1) -> (if (r.isNullAt(3)) null else r.getString(3)))
      .toMap
    val ev = EtlOps.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3).getTime))
    val byUser = ev.groupBy(_._1)
    val purchases = ev.filter(_._3 == "purchase")
    assert(purchases.nonEmpty && got.size == purchases.length)
    purchases.foreach { case (uid, eid, _, t) =>
      // the dimension interval starts at the run's min ts; a state event
      // at the exact purchase ts with a later event_id still opens its
      // interval at that ts, so include ties by timestamp alone
      val priorByTs = byUser(uid).filter(e => e._3 != "purchase" && e._4 <= t)
      val expected =
        if (priorByTs.isEmpty) null
        else priorByTs.maxBy(e => (e._4, e._2))._3
      assert(got(eid) == expected,
        s"purchase $eid: state ${got(eid)} vs expected $expected")
    }
  }

  test("audience overlap: inclusion-exclusion bounds and symmetric pair coverage") {
    val rows = graft.operators.AnalyticsOps.audienceOverlap(spark, dir).collect()
    val types = EtlOps.events(spark, dir)
      .select("event_type").distinct().count().toInt
    assert(rows.length == types * (types - 1) / 2, "one row per unordered pair")
    rows.foreach { r =>
      val (na, nb, both, j) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(both <= math.min(na, nb), "intersection exceeds a side")
      assert(j >= 0.0 && j <= 1.0)
    }
  }

  test("transition matrix: probabilities row-normalize to 1 and transitions conserve rows") {
    val rows = graft.operators.AnalyticsOps.transitionMatrix(spark, dir).collect()
    val n = EtlOps.events(spark, dir).count()
    val users = EtlOps.events(spark, dir).select("user_id").distinct().count()
    // each user's stream of k events yields k-1 transitions
    assert(rows.map(_.getLong(2)).sum == n - users)
    rows.groupBy(_.getString(0)).foreach { case (from, rs) =>
      val p = rs.map(_.getDouble(3)).sum
      assert(math.abs(p - 1.0) < 1e-9, s"row $from sums to $p")
    }
  }

  test("digest drilldown: finds exactly the drifted rows, touching only mismatched buckets") {
    import graft.operators.ScaleOps
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue)
    val rows = ScaleOps.digestDrilldown(spark, dir).collect()
    val expect = EtlOps.t(spark, dir, "lineitem")
      .filter(col("l_orderkey") % ScaleOps.DriftMod === 0)
      .select(col("l_orderkey"), col("l_linenumber")).collect()
      .map(key).toSet
    assert(rows.map(key).toSet == expect)
    rows.foreach(r => assert(r.getLong(3) == r.getLong(2) + 1,
      "drift is exactly +1 on quantity"))
    // drilldown must touch strictly fewer buckets than exist — the
    // pruning that makes phase 2 cheap
    val badBuckets = rows.map(_.getLong(4)).distinct.length
    assert(badBuckets < ScaleOps.DigestBuckets)
  }

  test("interval coalesce: covered time bounded by [300s·islands, 300s·events] and matches driver merge") {
    val got = TimeSeriesOps.intervalCoalesce(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ev = EtlOps.events(spark, dir)
      .selectExpr("user_id", "unix_micros(ts) AS st").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val gap = TimeSeriesOps.IslandGapS * 1000000L
    ev.groupBy(_._1).foreach { case (uid, rows) =>
      // driver-side sweep merge over sorted starts
      val starts = rows.map(_._2).sorted
      var (nIsl, covered, curS, curE) = (0L, 0L, Long.MinValue, Long.MinValue)
      starts.foreach { s =>
        if (s > curE) {
          if (curE != Long.MinValue) covered += (curE - curS) / 1000000L
          nIsl += 1; curS = s; curE = s + gap
        } else curE = math.max(curE, s + gap)
      }
      covered += (curE - curS) / 1000000L
      val (gn, gc) = got(uid)
      assert(gn == nIsl, s"user $uid islands $gn vs $nIsl")
      assert(gc == covered, s"user $uid covered $gc vs $covered")
    }
  }

  test("entity consolidation: labels reached a fixpoint and partition the name set") {
    import graft.operators.DedupOps
    val rows = DedupOps.entityConsolidate(spark, dir).collect()
    val nNames = EtlOps.t(spark, dir, "part")
      .select("p_name").distinct().count()
    assert(rows.map(_.getLong(1)).sum == nNames, "clusters must partition names")
    val nParts = EtlOps.t(spark, dir, "part").count()
    assert(rows.map(_.getLong(2)).sum == nParts)
    // fixpoint: one more propagation round must not change any label —
    // recompute driver-side over the match graph
    val pairs = DedupOps.fuzzyNameMatch(spark, dir).collect()
      .map(r => (r.getString(1), r.getString(2)))
    val adj = (pairs ++ pairs.map(_.swap)).groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val names = EtlOps.t(spark, dir, "part")
      .select("p_name").distinct().collect().map(_.getString(0))
    var lbl = names.map(n => n -> n).toMap
    def round(m: Map[String, String]) = names.map { n =>
      val cand = adj.getOrElse(n, Set.empty).map(m) + m(n)
      n -> cand.min
    }.toMap
    for (_ <- 1 to DedupOps.ConsolidateRounds) lbl = round(lbl)
    assert(round(lbl) == lbl,
      s"${DedupOps.ConsolidateRounds} rounds did not reach the fixpoint")
    // the operator's clusters are exactly the fixpoint label groups
    val expect = lbl.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(rows.map(r => r.getString(0) -> r.getLong(1)).toMap == expect)
  }

  test("skew advisor: flags the 5-value event_type key, clears uniform surrogate keys") {
    import graft.operators.ProfileOps
    val rows = ProfileOps.skewAdvisor(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(5))).toMap
    assert(rows.size == 5)
    // event_type has ~uniform 5 values over all rows: ratio ≈ 1+ε but
    // max_cnt·n_keys/n_rows small — yet a 5-key shuffle IS the textbook
    // case AQE coalesces, while a near-unique key never salts
    val (nr, nk, mc, _) = rows("events.event_type")
    assert(nk == 5 && mc * nk >= nr, "hottest type must be ≥ average")
    rows.foreach { case (k, (nRows, nKeys, maxCnt, flagged)) =>
      val ratio = maxCnt.toDouble * nKeys / nRows
      assert(flagged == (ratio > ProfileOps.SkewFactor),
        s"$k: flag $flagged inconsistent with ratio $ratio")
    }
  }

  test("histogram: per-type counts conserve rows; bins cover [min,max]") {
    val rows = ProfileOps.valueHistogram(spark, dir).collect()
    val n = EtlOps.events(spark, dir).count()
    assert(rows.map(_.getLong(4)).sum == n)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      rs.foreach { r =>
        assert(r.getLong(1) >= 0 && r.getLong(1) < ProfileOps.HistBins)
        assert(r.getDouble(2) < r.getDouble(3), "empty-width bin")
      }
    }
  }

  test("q190 ir metrics match a driver-side MRR/nDCG/recall reference") {
    import graft.operators.MlPrepOps
    val got = MlPrepOps.irMetrics(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    val run = MlPrepOps.bm25Ranked(spark, dir)
      .filter(col("rank") <= MlPrepOps.IrK)
      .select("term", "rank", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val prefixes = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).split(" ").take(MlPrepOps.IrPrefix).toSet).toMap
    assert(got.keySet == run.map(_._1).toSet)
    run.groupBy(_._1).foreach { case (term, rows) =>
      val rel = rows.sortBy(_._2)
        .map(t => (t._2, prefixes(t._3).contains(term)))
      val nRel = prefixes.values.count(_.contains(term)).toLong
      val hits = rel.count(_._2).toLong
      val first = rel.find(_._2).map(_._1).getOrElse(0L)
      val dcg = rel.filter(_._2)
        .map(t => MlPrepOps.IrDiscFp(t._1.toInt - 1)).sum
      val idcg = MlPrepOps.IrDiscPrefixFp(
        math.min(nRel, MlPrepOps.IrK.toLong).toInt - 1)
      val (gn, gh, gf, gm, gd, gr) = got(term)
      assert(gn == nRel && gh == hits && gf == first, s"counts for $term")
      assert(math.abs(gm - (if (first == 0) 0.0 else 1.0 / first)) <= 6e-7)
      assert(math.abs(gd - dcg.toDouble / idcg) <= 6e-7, s"ndcg $term")
      assert(math.abs(gr - hits.toDouble / nRel) <= 6e-7)
      assert(gd >= 0.0 && gd <= 1.0 && gm >= 0.0 && gm <= 1.0)
    }
    // judgments must disagree with the ranker somewhere, or the audit
    // exercises nothing
    assert(got.values.exists(v => v._2 < math.min(MlPrepOps.IrK.toLong, v._1)),
      "every top-k doc relevant — qrels degenerate")
    assert(got.values.exists(_._2 > 0), "no relevant docs retrieved at all")
  }

  test("q197 watermark audit matches a sequential running-max reference") {
    val got = TimeSeriesOps.watermarkAudit(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(got.keySet == TimeSeriesOps.WmDelaysSec.toSet)
    // sequential reference: same permutation, one running max
    val ev = EtlOps.events(spark, dir)
      .selectExpr("event_id", "unix_micros(ts) AS ts_us").collect()
      .map { r =>
        val id = r.getLong(0)
        val bump = if (id % 17 == 0) 40L else if (id % 13 == 0) 10L
          else if (id % 7 == 0) 2L else 0L
        (id + bump, id, r.getLong(1))
      }.sortBy(t => (t._1, t._2))
    var runMax = Long.MinValue
    val lateness = ev.map { case (_, _, ts) =>
      val l = if (runMax == Long.MinValue) 0L else math.max(0L, runMax - ts)
      runMax = math.max(runMax, ts)
      l
    }
    TimeSeriesOps.WmDelaysSec.foreach { d =>
      val dropped = lateness.count(_ > d * 1000000L).toLong
      val (n, nd, frac) = got(d)
      assert(n == ev.length)
      assert(nd == dropped, s"delay $d: got $nd want $dropped")
      assert(math.abs(frac - dropped.toDouble / n) <= 5e-7)
    }
    // the curve must be a real completeness-vs-latency trade
    val drops = TimeSeriesOps.WmDelaysSec.map(got(_)._2)
    assert(drops.zip(drops.tail).forall { case (a, b) => a >= b },
      "drop counts must be non-increasing in delay")
    assert(drops.head > 0, "no late events planted — audit vacuous")
    // the sweep must trade completeness for latency somewhere (the
    // absolute tail depends on the stream cadence, which scales with sf)
    assert(drops.last < drops.head, "flat curve — sweep exercises nothing")
  }

  test("q192 rrf fusion reconciles with its two input rankings") {
    import graft.operators.MlPrepOps
    val got = MlPrepOps.rrfFusion(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.nonEmpty)
    // per-term: exactly RrfTopK rows, dense fused ranks, scores descend
    got.groupBy(_._1).foreach { case (term, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to MlPrepOps.RrfTopK).toSeq)
      assert(sorted.map(_._6).toSeq == sorted.map(_._6).sortBy(-_).toSeq,
        s"$term: rrf scores not descending")
    }
    // every row's score equals the literal-table sum of its two ranks
    got.foreach { case (term, _, doc, ra, rb, fp) =>
      val want = (if (ra == 0) 0L else MlPrepOps.RrfFp(ra.toInt - 1)) +
        (if (rb == 0) 0L else MlPrepOps.RrfFp(rb.toInt - 1))
      assert(fp == want, s"($term, $doc): rrf $fp != $want")
      assert(ra > 0 || rb > 0, "fused doc in neither ranking")
    }
    // fusion must be exercised from both sides: some fused doc missing
    // from bm25's list, and some missing from the lead list
    assert(got.exists(_._4 == 0L), "lead-only docs never fused")
    assert(got.exists(_._5 == 0L), "bm25-only docs never fused")
    assert(got.exists(r => r._4 > 0L && r._5 > 0L),
      "no doc ranked by both — fusion degenerate")
  }

  test("q147 bm25: dense ranks per query, scores descend, formula reconciles") {
    val rows = MlPrepOps.bm25TopK(spark, dir).collect()
    assert(rows.nonEmpty)
    val byTerm = rows.groupBy(_.getString(0))
    assert(byTerm.size <= MlPrepOps.Bm25Queries)
    byTerm.foreach { case (term, rs) =>
      val ranks = rs.map(_.getLong(1)).sorted
      assert(ranks.toSeq == (1L to rs.length).toSeq,
        s"ranks not dense for $term")
      val scores = rs.sortBy(_.getLong(1)).map(_.getDouble(5))
      assert(scores.length <= MlPrepOps.Bm25TopK)
      scores.sliding(2).foreach { case Array(a, b) => assert(a >= b)
                                  case _ => () }
    }
    // recompute one row's score from raw corpus stats
    val docs = EtlOps.t(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val nDocs = docs.count()
    val avgdl = docs.selectExpr("CAST(sum(size(toks)) AS DOUBLE)")
      .first().getDouble(0) / nDocs
    val r = rows.head
    val (term, docId, tf, df) =
      (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4))
    val dl = docs.filter(col("doc_id") === docId)
      .selectExpr("size(toks)").first().getInt(0).toLong
    val idf = (nDocs - df + 0.5) / (df + 0.5)
    val want = idf * (tf * (MlPrepOps.Bm25K1 + 1.0)) /
      (tf + MlPrepOps.Bm25K1 *
        (1.0 - MlPrepOps.Bm25B + MlPrepOps.Bm25B * dl / avgdl))
    assert(math.abs(r.getDouble(5) - want) < 1e-5,
      s"score mismatch for ($term, $docId): got ${r.getDouble(5)}, want $want")
  }

  test("q186 fk orphans: exactly the masked parents' children, all edges audited") {
    val rows = graft.operators.ProfileOps.fkOrphans(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toMap
    assert(rows.size == 4, "all four star-schema edges must be audited")
    def check(edge: String, child: String, key: String): Unit = {
      val c = spark.read.parquet(s"$dir/$child.parquet")
      val (n, k, orows, okeys, rate) = rows(edge)
      assert(n == c.count())
      assert(k == c.select(key).distinct().count())
      // parents with key ≡ 0 mod 50 were masked; every child key exists
      // in the unmasked parent table, so orphans are exactly those keys
      val want = c.filter(col(key) % 50 === 0)
      assert(orows == want.count(), s"$edge orphan rows")
      assert(okeys == want.select(key).distinct().count(), s"$edge keys")
      assert(okeys > 0, s"$edge: no orphans planted")
      // operator rounds to 6 decimals; allow the half-ulp of that rounding
      assert(math.abs(rate - orows.toDouble / n) <= 6e-7)
    }
    check("lineitem.l_orderkey->orders", "lineitem", "l_orderkey")
    check("lineitem.l_partkey->part", "lineitem", "l_partkey")
    check("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey")
    check("orders.o_custkey->customer", "orders", "o_custkey")
  }

  test("q184 freshness streaks match a driver-side calendar walk") {
    val got = TimeSeriesOps.freshnessStreaks(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got.nonEmpty)
    val days = EtlOps.events(spark, dir)
      .selectExpr("event_type", "to_date(ts) AS day")
      .filter("(dayofmonth(day) + length(event_type)) % 11 >= 2")
      .selectExpr("event_type", "CAST(day AS STRING) AS day")
      .collect().map(r => (r.getString(0), java.time.LocalDate.parse(r.getString(1))))
    val d0 = days.map(_._2).min(Ordering[java.time.LocalDate])
    val d1 = days.map(_._2).max(Ordering[java.time.LocalDate])
    val nDays = java.time.temporal.ChronoUnit.DAYS.between(d0, d1) + 1
    days.groupBy(_._1).foreach { case (t, obs) =>
      val present = obs.map(_._2).toSet
      val cal = Iterator.iterate(d0)(_.plusDays(1)).take(nDays.toInt).toSeq
      val gaps = scala.collection.mutable.ArrayBuffer.empty[Int]
      var run = 0
      cal.foreach { d =>
        if (!present(d)) run += 1
        else if (run > 0) { gaps += run; run = 0 }
      }
      val currentGap = run // still open at the end of the range
      if (run > 0) gaps += run
      val (gn, gm, gl, gc) =
        (gaps.length.toLong, gaps.sum.toLong,
          if (gaps.isEmpty) 0L else gaps.max.toLong, currentGap.toLong)
      assert(got(t) == ((nDays, gn, gm, gl, gc)), s"feed $t")
    }
    // the planted mask must produce real outages, including a live one
    assert(got.values.map(_._4).max >= 2, "no multi-day gap planted")
    assert(got.values.exists(_._5 > 0), "no feed dark at range end")
  }

  test("q172 hard negatives: gold excluded, ranks dense, margins ascend with rank") {
    val rows = MlPrepOps.hardNegatives(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    val nQueries = EtlOps.t(spark, dir, "documents")
      .filter(col("doc_id") % MlPrepOps.HnEvery === 0).count()
    val byQ = rows.groupBy(_._1)
    assert(byQ.size == nQueries, "every sampled query must emit negatives")
    byQ.foreach { case (q, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to rs.length).toSeq,
        s"ranks not dense for query $q")
      assert(rs.length <= MlPrepOps.HnNegK)
      sorted.foreach { r => assert(r._3 != q, "gold leaked into negatives") }
      // score_ppm descends and margin = gold - score ascends with rank
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 >= b._4, s"scores not descending for $q")
          assert(a._5 <= b._5, s"margins not ascending for $q")
        case _ => ()
      }
      // one gold_ppm per query: margin + score is constant
      assert(sorted.map(r => r._4 + r._5).distinct.length == 1)
    }
    // hard negatives exist by construction: a query's own first tokens
    // score other documents too (shared vocabulary)
    assert(rows.length >= byQ.size, "no negatives mined")
  }

  test("q202 context dedup: dominance recomputes exactly from collected shingles") {
    val dir = TestSession.sfDir("0.001")
    val out = MlPrepOps.contextDedup(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(out.nonEmpty)
    out.values.foreach { case (nc, nk, before, after, saved) =>
      assert(nk >= 1 && nk <= nc, "rank-1 is never dominated")
      assert(after <= before && after > 0)
      assert(math.abs(saved - (before - after).toDouble / before) < 1e-6)
    }
    // independent driver-side recompute over the collected candidate set
    val cands = MlPrepOps.bm25Ranked(spark, dir)
      .filter(col("rank") <= MlPrepOps.CtxDepth)
      .select("term", "rank", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val ids = cands.map(_._3).toSet
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
      .filter(kv => ids.contains(kv._1))
    def shingleSet(t: String): Set[String] = {
      val w = t.split(" ", -1)
      if (w.length < 3) Set.empty
      else w.sliding(3).map(_.mkString(" ")).toSet
    }
    val sh = texts.map { case (id, t) => id -> shingleSet(t) }
    val wantKept = cands.groupBy(_._1).map { case (term, cs) =>
      val byRank = cs.sortBy(_._2)
      val kept = byRank.count { case (_, rank, d) =>
        val sd = sh(d)
        !(sd.nonEmpty && byRank.exists { case (_, r2, d2) =>
          r2 < rank && 2 * (sh(d2) & sd).size >= sd.size
        })
      }
      term -> kept.toLong
    }
    assert(out.keySet == wantKept.keySet)
    wantKept.foreach { case (term, k) =>
      assert(out(term)._2 == k, s"$term: kept ${out(term)._2}, want $k")
    }
  }

  test("q212 index staleness: both indexes audited, recall exact-bounded, fresh serves") {
    val rows = graft.operators.SimilarityOps.indexStaleness(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toMap
    assert(rows.keySet == Set("fresh", "stale"))
    rows.foreach { case (tag, (nq, hits, recall, probed)) =>
      assert(nq == 8, s"$tag query count")
      assert(hits >= 0 && hits <= nq * graft.operators.SimilarityOps.StaleTopK)
      assert(math.abs(recall -
        hits.toDouble / (nq * graft.operators.SimilarityOps.StaleTopK)) < 1e-6)
      assert(probed > 0, s"$tag probed nothing")
    }
    // nprobe=1 against a FRESH quantizer must be a usable index here —
    // and the staleness audit must be able to show a gap when the
    // stale quantizer misroutes queries (the reason the audit exists);
    // equality is allowed (no drift ⇒ no decay), superiority is not
    assert(rows("fresh")._3 >= rows("stale")._3,
      s"stale index outperformed fresh: $rows")
    assert(rows("fresh")._3 > 0.5, "fresh index recall degenerate")
  }

  test("q214 rare-term graph: planted triads close into exactly their components") {
    val rows = graft.operators.GraphOps.rareTermGraph(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // sf0.001 ids are 0..499 dense: groups k = 0..5 plant docs
    // {97k, 97k+1, 97k+2}, each pair sharing 2 rare tokens
    val wantComponents = (0 to 5).map(k => 97L * k)
    assert(rows.map(_._1).toSeq == wantComponents,
      s"components ${rows.map(_._1).mkString(",")}")
    rows.foreach { case (_, nDocs, nSources) =>
      assert(nDocs == 3, "planted triad split or merged")
      assert(nSources >= 1 && nSources <= 3)
    }
  }

  test("q215 temporal leakage: temporal split is leak-free, random split leaks") {
    val rows = graft.operators.TimeSeriesOps.temporalLeakage(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toMap
    assert(rows.keySet == Set("random", "temporal"))
    val (tu, tl, tr, tn) = rows("temporal")
    assert(tl == 0 && tr == 0.0,
      "temporal split violated its own construction")
    assert(tn > 0 && tu > 0)
    val (ru, rl, rr, _) = rows("random")
    assert(ru == tu, "user universe differs between split audits")
    // with ~66 events per user, a random 20% almost surely leaves a
    // train event after the first test event for every user
    assert(rr > 0.5, s"random split implausibly clean: $rl/$ru")
  }

  test("q221 context pack: greedy prefix replays exactly from the kept frame") {
    val out = MlPrepOps.contextPack(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(out.nonEmpty)
    val kept = MlPrepOps.contextKept(spark, dir)
      .filter(col("kept")).select("term", "rank", "n_toks").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val budget = MlPrepOps.CtxTokenBudget
    kept.groupBy(_._1).foreach { case (term, rs) =>
      var cum = 0L; var packed = 0L; var used = 0L
      var firstDropped = -1L
      rs.sortBy(_._2).foreach { case (_, rank, toks) =>
        cum += toks
        if (cum <= budget) { packed += 1; used += toks }
        else if (firstDropped < 0) firstDropped = rank
      }
      val (nk, np, tu2, fd, frac) = out(term)
      assert(nk == rs.length && np == packed && tu2 == used &&
        fd == firstDropped, s"$term: got ${out(term)}")
      assert(math.abs(frac - used.toDouble / budget) < 1e-6)
      assert(used <= budget)
    }
    // the budget must actually bind somewhere, or the packer is a no-op
    assert(out.values.exists(_._4 > 0), "budget never binds")
  }
}
