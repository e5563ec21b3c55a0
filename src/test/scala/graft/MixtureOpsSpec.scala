package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MixtureOps

/** Invariant specs for the mixture-construction operators (q129-q132).
  * The DuckDB oracle gate checks exact row parity; these specs recompute
  * each operator with an independent plain-Scala reference over the
  * collected fixture (500 docs) so a Spark-side expression slip cannot
  * hide behind an oracle written with the same mistake.
  */
class MixtureOpsSpec extends AnyFunSuite {

  private val spark = TestSession.spark
  private val dir = TestSession.sfDir("0.001")

  /** Same 60-bit md5 fingerprint the operators use, via MessageDigest —
    * an implementation independent of both Spark and DuckDB. */
  private def p60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  private lazy val docs: Array[(Long, String, String)] =
    spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  test("q129 classifier gate matches a MessageDigest reference scorer") {
    def wgt(w: String): Long = {
      val b = p60("clf" + w) % MixtureOps.ClfBuckets
      p60("wgt" + b.toString) % 2001 - 1000
    }
    // split(text, ' ') in Spark keeps trailing empty strings → limit -1
    val want = docs
      .map { case (_, src, text) => (src, text.split(" ", -1).map(wgt).sum) }
      .groupBy(_._1).toSeq
      .map { case (src, xs) =>
        (src, xs.length.toLong, xs.count(_._2 >= 0L).toLong, xs.map(_._2).sum)
      }
      .sortBy(_._1)
    val got = MixtureOps.classifierGate(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == want)
  }

  test("q130 temperature mix: realized mass equals the integer target exactly") {
    val rows = MixtureOps.temperatureMix(spark, dir).collect()
    assert(rows.nonEmpty)
    var sumTarget = 0L
    var n = 0L
    rows.foreach { r =>
      val (nDocs, wFp, target, base, extra, realized) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))
      assert(wFp == math.floor(math.sqrt(nDocs.toDouble) * 1e9).toLong)
      assert(extra >= 0 && extra < nDocs, s"extra out of range: $r")
      assert(base * nDocs + extra == target, s"base/extra split broken: $r")
      assert(realized == target, s"rank materialization != target: $r")
      sumTarget += target; n += nDocs
    }
    // floor() in each per-source target only ever rounds down
    assert(sumTarget <= n && sumTarget > n - rows.length)
  }

  test("q130 temperature flattens the mixture: share moves tail-ward, head-ward never") {
    val rows = MixtureOps.temperatureMix(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(3))) // (n_docs, target)
    val n = rows.map(_._1).sum.toDouble
    val t = rows.map(_._2).sum.toDouble
    // sqrt-weighting: any source above the mean natural share must lose
    // share, any source below must gain (strictly, up to integer floor)
    rows.foreach { case (nd, tg) =>
      val natural = nd / n
      val mixed = tg / t
      if (natural > 1.05 / rows.length) assert(mixed <= natural + 1e-9)
      if (natural < 0.95 / rows.length) assert(mixed >= natural - 2.0 / t)
    }
  }

  test("q131 DSIR weights match a Math.log reference over hashed buckets") {
    val B = MixtureOps.DsirBuckets
    val toks = docs.flatMap { case (id, src, text) =>
      text.split(" ", -1).map(w => (id, src, p60("dsir" + w) % B))
    }
    val rc = toks.groupBy(_._3).map { case (b, xs) => b -> xs.length.toLong }
    val tgtToks = toks.filter(_._2 == MixtureOps.DsirTarget)
    val tc = tgtToks.groupBy(_._3).map { case (b, xs) => b -> xs.length.toLong }
    val (rtot, ttot) = (toks.length.toLong, tgtToks.length.toLong)
    def lam(b: Long): Long =
      math.floor((math.log((tc.getOrElse(b, 0L) + 1.0) / (ttot + B.toDouble))
        - math.log((rc(b) + 1.0) / (rtot + B.toDouble))) * 1e6).toLong
    // corpus-centered keep rule: mean token LLR above the raw-corpus mean,
    // as the integer cross-multiplication the operator uses
    val wsum = rc.map { case (b, c) => c * lam(b) }.sum
    val rtok = rc.values.sum
    val want = toks.groupBy(t => (t._1, t._2)).toSeq
      .map { case ((_, src), xs) =>
        (src, xs.map(t => lam(t._3)).sum, xs.length.toLong)
      }
      .groupBy(_._1).toSeq
      .map { case (src, xs) =>
        (src, xs.length.toLong,
          xs.count(x => x._2 * rtok > wsum * x._3).toLong,
          xs.map(_._2).sum)
      }
      .sortBy(_._1)
    val got = MixtureOps.dsirWeights(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == want)
    // the target domain must look target-like to its own weights
    val tgtRow = got.find(_._1 == MixtureOps.DsirTarget).get
    assert(tgtRow._3 * 2 > tgtRow._2,
      s"under half the target source scores positive: $tgtRow")
  }

  /** The full five-stage manifest pipeline, plain Scala — reference for
    * q133 (full corpus) and both snapshots of q136. */
  private def manifestRef(
      docs: Seq[(Long, String, String)]): Seq[(Long, String, Long, Long, Long)] = {
    def wgt(w: String): Long = {
      val b = p60("clf" + w) % MixtureOps.ClfBuckets
      p60("wgt" + b.toString) % 2001 - 1000
    }
    def md5hex(s: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    // stage 1+2: gate then first-occurrence content dedup
    val keep = docs
      .filter { case (_, _, text) => text.split(" ", -1).map(wgt).sum >= 0L }
      .groupBy { case (_, _, text) => md5hex(text) }
      .values.map(_.minBy(_._1)).toSeq
    // stage 3: temperature plan over survivors
    val bySrc = keep.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val wFp = bySrc.view
      .mapValues(n => math.floor(math.sqrt(n.toDouble) * 1e9).toLong).toMap
    val (bigS, bigN) = (wFp.values.sum, bySrc.values.sum)
    // stage 4: copies by fingerprint rank
    val copies = keep.groupBy(_._2).toSeq.flatMap { case (src, xs) =>
      val target = bigN * wFp(src) / bigS
      val (base, extra) = (target / bySrc(src), target % bySrc(src))
      xs.map(d => (d._1, src, p60("mtemp" + d._1.toString)))
        .sortBy(t => (t._3, t._1)).zipWithIndex
        .flatMap { case ((id, s0, _), i) =>
          val n = base + (if (i + 1 <= extra) 1L else 0L)
          (1L to n).map(c => (id, s0, c))
        }
    }
    // stage 5: two-level shuffle
    copies
      .map { case (id, src, c) =>
        val ck = s"${id}_$c"
        (p60("mshuf" + ck) % MixtureOps.ShuffleShards, p60("mord" + ck),
          id, src, c)
      }
      .groupBy(_._1).toSeq.flatMap { case (shard, xs) =>
        xs.sortBy(t => (t._2, t._3, t._5)).zipWithIndex.map {
          case ((_, _, id, src, c), i) => (id, src, c, shard, (i + 1).toLong)
        }
      }.sortBy(t => (t._4, t._5))
  }

  test("q133 training manifest matches a full plain-Scala pipeline rerun") {
    val want = manifestRef(docs.toSeq)
    val got = MixtureOps.trainingManifest(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSeq
    assert(got == want)
    // manifest invariants: positions dense per shard, no duplicate copies
    got.groupBy(_._4).foreach { case (_, xs) =>
      assert(xs.map(_._5).sorted == (1L to xs.size).toSeq)
    }
    assert(got.map(t => (t._1, t._3)).distinct.size == got.size)
  }

  test("q136 manifest churn matches a two-snapshot reference diff; shards never move") {
    val m = MixtureOps.ChurnHoldoutMod
    val refA = manifestRef(docs.toSeq.filterNot(_._1 % m == m - 1))
    val refB = manifestRef(docs.toSeq)
    val a = refA.map(t => (t._1, t._3) -> (t._4, t._5)).toMap
    val b = refB.map(t => (t._1, t._3) -> (t._4, t._5)).toMap
    // hashed assignment invariant: a surviving (doc, copy) keeps its shard
    (a.keySet & b.keySet).foreach { k =>
      assert(a(k)._1 == b(k)._1, s"shard moved for $k")
    }
    val want = (a.keySet | b.keySet).toSeq
      .map { k =>
        val shard = b.get(k).orElse(a.get(k)).get._1
        (shard, a.get(k), b.get(k))
      }
      .groupBy(_._1).toSeq.map { case (shard, xs) =>
        val common = xs.filter(x => x._2.isDefined && x._3.isDefined)
        (shard, xs.count(_._2.isDefined).toLong,
          xs.count(_._3.isDefined).toLong, common.size.toLong,
          xs.count(_._2.isEmpty).toLong, xs.count(_._3.isEmpty).toLong,
          common.map(x => math.abs(x._3.get._2 - x._2.get._2)).sum)
      }.sortBy(_._1)
    val got = MixtureOps.manifestChurn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))
      .toSeq
    assert(got.map(t => (t._1, t._2, t._3, t._4, t._5, t._6)) ==
      want.map(t => (t._1, t._2, t._3, t._4, t._5, t._6)))
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g._7 - w._7.toDouble / w._4.toDouble) < 1e-6,
        s"mean shift drifted: $g vs $w")
    }
  }

  test("q132 epoch shuffle matches an independent adjacency recount") {
    val S = MixtureOps.ShuffleShards
    val d = docs.map { case (id, src, _) =>
      (p60("shuf" + id.toString) % S, p60("ord" + id.toString), id, src)
    }
    val want = d.groupBy(_._1).toSeq.map { case (shard, xs) =>
      val ordered = xs.sortBy(t => (t._2, t._3)).map(_._4)
      val same = ordered.zip(ordered.drop(1)).count { case (a, b) => a == b }
      val comp = ordered.groupBy(identity).values.map(_.length.toLong)
      val num = comp.map(c => c * (c - 1)).sum
      (shard, ordered.length.toLong, same.toLong,
        num.toDouble / (ordered.length.toLong * (ordered.length - 1L)))
    }.sortBy(_._1)
    val got = MixtureOps.epochShuffleAudit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
      .toSeq
    assert(got.map(t => (t._1, t._2, t._3)) == want.map(t => (t._1, t._2, t._3)))
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g._5 - w._4) < 1e-6, s"expected_rate drifted: $g vs $w")
      assert(g._4 >= 0.0 && g._4 <= 1.0 && g._5 >= 0.0 && g._5 <= 1.0)
    }
  }

  test("q167 waterfill: exact budget, flat water level, capped prefix, matches brute force") {
    val rows = MixtureOps.waterfillAlloc(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    val b = rows.head._3
    assert(rows.forall(_._3 == b))
    // the operator's whole point: the allocation hits the budget EXACTLY
    assert(rows.map(_._4).sum == b, s"sum(alloc) != budget $b")
    val (capped, un) = rows.partition(_._5)
    assert(capped.nonEmpty, "no source capped — budget fraction too low " +
      "to exercise the operator on this fixture")
    assert(un.nonEmpty)
    capped.foreach { r => assert(r._4 == r._2 && r._6 == 1.0) }
    un.foreach { r => assert(r._4 < r._2) }
    // flat water level: uncapped allocations differ by at most 1 char
    assert(un.map(_._4).max - un.map(_._4).min <= 1, "water level not flat")
    // threshold property: every capped availability is below the level
    assert(capped.map(_._2).max <= un.map(_._4).min)
    // brute-force the water level independently: the largest lam with
    // sum(min(avail, lam)) <= b must reproduce the same allocation mass
    val avails = rows.map(_._2)
    def mass(lam: Long): Long = avails.map(math.min(_, lam)).sum
    var (lo, hi) = (0L, avails.max)
    while (lo < hi) {
      val mid = (lo + hi + 1) / 2
      if (mass(mid) <= b) lo = mid else hi = mid - 1
    }
    assert(un.map(_._4).min == lo,
      s"water level ${un.map(_._4).min} != brute-force $lo")
    assert(b - mass(lo) == un.count(_._4 == lo + 1),
      "remainder chars misallocated")
  }

  test("q195 calibration audit matches a driver-side reliability reference") {
    import org.apache.spark.sql.functions._
    val got = MixtureOps.calibrationAudit(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    val docs = graft.operators.EtlOps.t(spark, dir, "documents").select(
      MixtureOps.logitOf.as("logit"),
      graft.operators.TrainPrepOps.gopherPassOf(col("text")).as("pass"))
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val (lmin, lmax) = (docs.map(_._1).min, docs.map(_._1).max)
    val binned = docs.map { case (lg, p) =>
      (math.min(MixtureOps.CalBins - 1L, math.floor(
        (lg - lmin).toDouble * MixtureOps.CalBins / (lmax - lmin)).toLong),
        lg, p)
    }
    assert(got.values.map(_._1).sum == docs.length,
      "bins must partition the corpus")
    var eceFp = 0L
    val ref = binned.groupBy(_._1).map { case (b, xs) =>
      val n = xs.size.toLong
      val conf = (xs.map(_._2).sum - n * lmin).toDouble / (lmax - lmin) / n
      val acc = xs.count(_._3).toDouble / n
      eceFp += math.floor(math.abs(acc - conf) * 1e9).toLong * n
      b -> (n, xs.count(_._3).toLong, conf, acc)
    }
    assert(got.keySet == ref.keySet)
    ref.foreach { case (b, (n, np, conf, acc)) =>
      val (gn, gnp, gconf, gacc, ggap, _) = got(b)
      assert(gn == n && gnp == np)
      assert(math.abs(gconf - conf) <= 6e-7, s"bin $b conf")
      assert(math.abs(gacc - acc) <= 6e-7)
      assert(math.abs(ggap - math.abs(acc - conf)) <= 6e-7)
    }
    val wantEce = eceFp.toDouble / 1e9 / docs.length
    got.values.foreach(v => assert(math.abs(v._6 - wantEce) <= 6e-7))
    // the diagram must be informative: several populated bins, and the
    // classifier is NOT perfectly calibrated against the rule stack
    assert(got.size >= 5, s"only ${got.size} bins populated")
    assert(wantEce > 0.01, "ECE ~ 0 — calibration audit exercises nothing")
  }

  test("q206 temperature curve: weights normalize, budget conserves, higher tau flattens") {
    val rows = MixtureOps.temperatureCurve(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getDouble(5)))
    val byTau = rows.groupBy(_._1)
    assert(byTau.keySet == Set("0.5", "1", "2", "4"))
    val budget = MixtureOps.TempCurveBudget
    byTau.foreach { case (tau, rs) =>
      val wsum = rs.map(_._4).sum
      assert(math.abs(wsum - 1.0) < 1e-4, s"tau=$tau weights sum $wsum")
      val alloc = rs.map(_._5).sum
      // floor-division residue: at most one token per source
      assert(alloc <= budget && alloc > budget - rs.length,
        s"tau=$tau allocates $alloc of $budget")
    }
    // tau=1 is proportional sampling: weight tracks the token share
    val tk1 = byTau("1")
    val tot = tk1.map(_._3).sum.toDouble
    tk1.foreach(r => assert(math.abs(r._4 - r._3 / tot) < 1e-5,
      s"tau=1 weight not proportional: $r"))
    // flattening: the dominant source's weight is non-increasing in tau
    val maxW = Seq("0.5", "1", "2", "4").map(t => byTau(t).map(_._4).max)
    assert(maxW == maxW.sorted.reverse,
      s"max weight not monotone over the tau grid: $maxW")
    // epochs price the repetition risk: alloc/tk reconciles
    rows.foreach { r =>
      assert(math.abs(r._6 - r._5.toDouble / r._3) < 1e-6, s"epochs: $r")
    }
  }
}
