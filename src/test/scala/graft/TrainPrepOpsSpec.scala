package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TrainPrepOps

/** Invariant specs for the training-set assembly operators (q101-q105).
  * The DuckDB oracle gate checks exact row parity; these specs pin the
  * algorithmic invariants that survive any data change.
  */
class TrainPrepOpsSpec extends AnyFunSuite {

  private val spark = TestSession.spark
  private val dir = TestSession.sfDir("0.001")

  test("q101 sequence packing matches a sequential reference loop") {
    val got = TrainPrepOps.sequencePack(spark, dir)
      .collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getLong(3)))

    // reference: per-source sequential greedy pack over (doc_id, n_chars)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("source", "doc_id", "n_chars")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = docs.groupBy(_._1).toSeq.flatMap { case (src, rows) =>
      var bin = 0L; var fill = 0L
      rows.sortBy(_._2).zipWithIndex.map { case ((_, id, n), i) =>
        if (i == 0) { fill = n }
        else if (fill + n <= TrainPrepOps.PackBudget) { fill += n }
        else { bin += 1; fill = n }
        (src, id, bin, fill)
      }
    }.toSeq.sortBy(t => (t._1, t._2))

    assert(got.toSeq == want)
  }

  test("packing state machine matches the reference loop on a generated adversarial corpus") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val rowGen = for {
      src <- Gen.oneOf("a", "b", "c", "dd", "")
      n <- Gen.frequency(
        8 -> Gen.chooseNum(1L, 900L),
        1 -> Gen.chooseNum(1000L, 1060L), // straddles the budget
        1 -> Gen.chooseNum(1100L, 5000L)) // oversize: own bin
    } yield (src, n)
    val rows = Gen.listOfN(400, rowGen)
      .apply(Gen.Parameters.default, Seed(20260813L)).get
      .zipWithIndex.map { case ((src, n), i) => (src, i.toLong, n) }
    val df = spark.createDataFrame(rows)
      .toDF("source", "doc_id", "n_chars")
    val got = TrainPrepOps.packDocs(df).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    val want = rows.groupBy(_._1).toSeq.flatMap { case (src, rs) =>
      var bin = 0L; var fill = 0L
      rs.sortBy(_._2).zipWithIndex.map { case ((_, id, n), i) =>
        if (i == 0) { fill = n }
        else if (fill + n <= TrainPrepOps.PackBudget) { fill += n }
        else { bin += 1; fill = n }
        (src, id, bin, fill)
      }
    }.sortBy(t => (t._1, t._2))
    assert(got.toSeq == want)
  }

  test("q101 never overfills a window unless the document alone exceeds the budget") {
    val over = TrainPrepOps.sequencePack(spark, dir)
      .join(
        spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "n_chars"),
        "doc_id")
      .filter(col("fill") > TrainPrepOps.PackBudget &&
        col("n_chars") <= TrainPrepOps.PackBudget)
      .count()
    assert(over == 0L)
  }

  test("q102 copy counts are floor(w) or ceil(w) and copies number 1..n contiguously") {
    val rows = TrainPrepOps.mixtureEpochs(spark, dir).collect()
    val bySrc = rows.groupBy(_.getString(1))
    for ((src, rs) <- bySrc) {
      val w1000 = 500 + (src.drop(3).toInt % 4) * 750
      val (lo, hi) = (w1000 / 1000, w1000 / 1000 + (if (w1000 % 1000 > 0) 1 else 0))
      val perDoc = rs.groupBy(_.getLong(0))
      for ((_, copies) <- perDoc) {
        val n = copies.head.getLong(3)
        assert(n >= lo && n <= hi, s"$src: n_copies $n outside [$lo,$hi]")
        assert(copies.map(_.getLong(2)).sorted.toSeq == (1L to n).toSeq)
      }
    }
    // downweighted sources must actually lose documents (w=0.5 → ~half dropped)
    val srcDocs = bySrc.map { case (s, rs) => s -> rs.map(_.getLong(0)).distinct.length }
    val half = srcDocs.filter { case (s, _) => s.drop(3).toInt % 4 == 0 }
    assert(half.nonEmpty && half.values.forall(_ < 25))
  }

  test("q103 survivors are unique by fingerprint and disjoint from the base corpus") {
    val out = TrainPrepOps.incrementalDedup(spark, dir)
    val fps = out.select("fingerprint").collect().map(_.getString(0))
    assert(fps.length == fps.distinct.length)
    val baseFps = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("doc_id") % 5 =!= 0)
      .select(md5(regexp_replace(lower(col("text")), "\\s+", " ")).as("fp"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(fps.forall(!baseFps.contains(_)))
    // every survivor is from the batch slice
    assert(out.filter(col("doc_id") % 5 =!= 0).count() == 0L)
  }

  test("q104 passes is exactly the conjunction of the rule flags") {
    val bad = TrainPrepOps.gopherRules(spark, dir)
      .filter(col("passes") =!=
        (col("flag_words") && col("flag_mwl") && col("flag_symbol") && col("flag_stop")))
      .count()
    assert(bad == 0L)
    // the rule stack must discriminate on this corpus, not rubber-stamp it
    val agg = TrainPrepOps.gopherRules(spark, dir)
      .agg(sum(when(col("passes"), 1).otherwise(0)), count(lit(1)))
      .head()
    assert(agg.getLong(0) > 0 && agg.getLong(0) < agg.getLong(1))
  }

  test("q105 shard plan conserves totals and load ratios average to 1") {
    val plan = TrainPrepOps.shardPlan(spark, dir).collect()
    assert(plan.forall(r => r.getLong(0) >= 0 && r.getLong(0) < TrainPrepOps.NShards))
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    assert(plan.map(_.getLong(1)).sum == docs.count())
    assert(plan.map(_.getLong(2)).sum ==
      docs.agg(sum("n_chars")).head().getLong(0))
    assert(math.abs(plan.map(_.getDouble(3)).sum / plan.length - 1.0) < 0.5)
  }

  test("q108 reports only under-k quasi-id groups, verified by recount") {
    import graft.operators.CurationOps
    val out = CurationOps.kAnonymity(spark, dir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getLong(4) < CurationOps.AnonK))
    // spot-check one reported cell against a direct recount
    val r = out.head
    val recount = graft.operators.EtlOps.events(spark, dir)
      .filter(col("event_type") === r.getString(0) &&
        to_date(col("ts")) === r.getDate(1) &&
        get_json_object(col("props"), "$.k").cast("bigint") === r.getLong(2))
      .agg(countDistinct(col("user_id")))
      .head().getLong(0)
    assert(recount == r.getLong(4))
  }

  test("incremental dedup generalizes to streaming: state-store dropDuplicates across micro-batches") {
    // q103 models one arriving batch against the ingested corpus; under
    // readStream the state store carries the corpus fingerprints across
    // micro-batches, so the same first-doc-wins semantics holds with no
    // explicit anti-join. Two file drops = two micro-batches.
    val root = java.nio.file.Files.createTempDirectory("graft-stream-dedup").toString
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("fingerprint",
        md5(regexp_replace(lower(col("text")), "\\s+", " ")))
      .select("doc_id", "fingerprint")
    docs.filter(col("doc_id") % 5 =!= 0).coalesce(1).write.parquet(s"$root/in")
    val schema = spark.read.parquet(s"$root/in").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$root/in")
      .dropDuplicates("fingerprint")
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("stream_dedup").start()
    try {
      q.processAllAvailable()
      val afterB1 = spark.table("stream_dedup").count()
      docs.filter(col("doc_id") % 5 === 0).coalesce(1)
        .write.mode("append").parquet(s"$root/in")
      q.processAllAvailable()
      val out = spark.table("stream_dedup")
      // batch-2 survivors = exactly the fingerprints q103 reports
      val streamed = out.filter(col("doc_id") % 5 === 0)
        .select("fingerprint").collect().map(_.getString(0)).toSet
      val batch = TrainPrepOps.incrementalDedup(spark, dir)
        .select("fingerprint").collect().map(_.getString(0)).toSet
      assert(streamed == batch)
      // and the stream never emitted a fingerprint twice
      assert(out.count() == out.select("fingerprint").distinct().count())
      assert(out.count() >= afterB1)
    } finally q.stop()
  }

  test("q115 packing audit conserves chars and bounds fill ratios") {
    val eff = TrainPrepOps.packEfficiency(spark, dir).collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy("source")
      .agg(count(lit(1)).as("n"), sum("n_chars").as("chars"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(eff.length == docs.size)
    for (r <- eff) {
      val (n, chars) = docs(r.getString(0))
      assert(r.getLong(2) == n)      // n_docs
      assert(r.getLong(3) == chars)  // packed_chars conserves the corpus
      val ratio = r.getDouble(6)
      assert(ratio > 0.0 && (ratio <= 1.0 || r.getLong(5) > 0),
        s"${r.getString(0)}: ratio $ratio with ${r.getLong(5)} overflows")
    }
  }

  test("q111 schedule is a proportional stride-interleave of the q102 mixture") {
    val sched = TrainPrepOps.epochSchedule(spark, dir).collect()
    val mix = TrainPrepOps.mixtureEpochs(spark, dir).collect()
    // the schedule contains exactly the mixture's copies
    assert(sched.length == mix.length)
    // positions lie in (0,1) and every source's copies spread uniformly:
    // consecutive same-source positions differ by exactly 1/n_total
    for ((src, rs) <- sched.groupBy(_.getString(1))) {
      val ps = rs.sortBy(_.getLong(3)).map(_.getDouble(4))
      assert(ps.forall(p => p > 0.0 && p < 1.0))
      val stride = 1.0 / rs.length
      ps.zip(ps.tail).foreach { case (a, b) =>
        assert(math.abs((b - a) - stride) < 1e-12, s"$src stride broken")
      }
    }
    // global order is by position (the schedule contract)
    val pos = sched.map(_.getDouble(4))
    assert(pos.zip(pos.tail).forall { case (a, b) => a <= b })
  }

  test("q109 datasheet conserves corpus totals and keeps ratios consistent") {
    val rep = TrainPrepOps.corpusReport(spark, dir).collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    assert(rep.map(_.getLong(1)).sum == docs.count())
    assert(rep.map(_.getLong(2)).sum ==
      docs.agg(sum("n_chars")).head().getLong(0))
    for (r <- rep) {
      assert(r.getLong(4) >= 0 && r.getLong(4) < r.getLong(1))      // dups < docs
      assert(r.getLong(5) <= r.getLong(1))                          // passes <= docs
      assert(math.abs(r.getDouble(6) - r.getLong(2).toDouble / r.getLong(1)) < 1e-9)
      assert(math.abs(r.getDouble(7) - r.getLong(5).toDouble / r.getLong(1)) < 1e-9)
    }
  }

  test("q128 token-budget selection matches a driver-side greedy reference") {
    val out = TrainPrepOps.tokenBudgetSelect(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // replicate the selection in plain Scala (same IEEE op order)
    val stopRe = ("\\b(" + graft.operators.TextOps.LangStopwords.head._2 +
      ")\\b").r
    case class D(id: Long, src: String, tokens: Long, bucket: Long)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "source", "text").collect().map { r =>
        val text = r.getString(2)
        val len = text.length.toDouble
        val alpha = text.count(_.isLetter).toDouble
        val toks = text.trim.split("\\s+").length.toDouble
        val stops = stopRe.findAllIn(text).length.toDouble
        val q = (alpha / len) * 0.5 + (stops / toks) * 0.3 +
          (if (len >= 100 && len <= 500) 0.2 else 0.0)
        D(r.getLong(0), r.getString(1), toks.toLong,
          math.floor(q * 1000.0).toLong)
      }
    val budget =
      math.floor(docs.map(_.tokens).sum.toDouble * 0.4).toLong
    val byBucket = docs.groupBy(_.bucket).toSeq.sortBy(-_._1)
    var cum = 0L
    val keptDocs = scala.collection.mutable.Buffer.empty[D]
    byBucket.foreach { case (_, ds) =>
      val bt = ds.map(_.tokens).sum
      if (cum + bt <= budget) { keptDocs ++= ds; cum += bt }
      else if (cum < budget) {
        // running sum over ALL bucket docs in id order; keep the prefix
        // that fits (matches the query's window-sum-then-filter)
        var run = 0L
        ds.sortBy(_.id).foreach { d =>
          run += d.tokens
          if (cum + run <= budget) keptDocs += d
        }
        cum = budget // straddling bucket resolved; lower buckets all drop
      }
    }
    docs.groupBy(_.src).foreach { case (src, ds) =>
      val k = keptDocs.filter(_.src == src)
      val (nDocs, tokSrc, nKept, tokKept) = out(src)
      assert(nDocs == ds.length && tokSrc == ds.map(_.tokens).sum)
      assert(nKept == k.length, s"$src kept ${k.length} vs $nKept")
      assert(tokKept == k.map(_.tokens).sum)
    }
    // global budget adherence: under budget, and maximal for the greedy
    val keptTotal = keptDocs.map(_.tokens).sum
    assert(keptTotal <= budget)
  }

  test("q139 threshold curve: monotone, complete spine, exact endpoints") {
    val rows = TrainPrepOps.thresholdCurve(spark, dir).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.length == TrainPrepOps.CurveSteps)
    // threshold 0 keeps everything
    assert(rows.head._1 == 0.0 && rows.head._4 == 1.0 && rows.head._5 == 1.0)
    val total = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(rows.head._2 == total)
    // raising the threshold never keeps more, and never lowers the
    // survivors' mean quality
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._2 <= a._2 && b._3 <= a._3, s"kept mass grew: $a -> $b")
        assert(b._6 >= a._6 - 1e-9 || b._2 == 0L,
          s"mean quality fell as threshold rose: $a -> $b")
      case _ =>
    }
  }

  test("q137 chunking matches the sequential reference on a generated adversarial corpus") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val b = TrainPrepOps.PackBudget
    val nGen = Gen.frequency(
      6 -> Gen.chooseNum(1L, 900L),
      1 -> Gen.const(b), // exactly one window
      1 -> Gen.chooseNum(b + 1, 5 * b), // spans several windows
      1 -> Gen.chooseNum(2L * b, 20L * b)) // spans many
    val rows = Gen.listOfN(300, nGen)
      .apply(Gen.Parameters.default, Seed(20260813L)).get
      .zipWithIndex.map { case (n, i) => (i.toLong * 7L, n) } // gappy ids
    val df = spark.createDataFrame(rows).toDF("doc_id", "n_chars")
    val got = TrainPrepOps.concatChunkOf(spark, df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    var off = 0L
    val want = rows.sortBy(_._1).flatMap { case (id, n) =>
      val (st, end) = (off, off + n); off = end
      (st / b to (end - 1) / b).map { w =>
        (id, w, math.max(st, w * b) - w * b,
          math.min(end, (w + 1) * b) - math.max(st, w * b))
      }
    }
    assert(got == want)
  }

  test("q137 concat-and-chunk matches a sequential cumsum and tiles every window") {
    val b = TrainPrepOps.PackBudget
    val got = TrainPrepOps.concatChunk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    // reference: one sequential scan over doc_id order
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var off = 0L
    val want = docs.flatMap { case (id, n) =>
      val (st, end) = (off, off + n); off = end
      (st / b to (end - 1) / b).map { w =>
        (id, w, math.max(st, w * b) - w * b,
          math.min(end, (w + 1) * b) - math.max(st, w * b))
      }
    }.toSeq
    assert(got == want)
    // every doc's pieces reassemble exactly; every window except the
    // last is tiled to the full budget with contiguous pieces
    docs.foreach { case (id, n) =>
      assert(got.filter(_._1 == id).map(_._4).sum == n)
    }
    val lastW = got.map(_._2).max
    got.groupBy(_._2).foreach { case (w, ps) =>
      val sorted = ps.sortBy(_._3)
      assert(sorted.head._3 == 0L)
      sorted.sliding(2).foreach {
        case Seq(x, y) => assert(x._3 + x._4 == y._3, s"gap in window $w")
        case _ =>
      }
      if (w != lastW)
        assert(ps.map(_._4).sum == b, s"window $w not full")
    }
  }

  test("q153 chunking: strided tiling covers every doc; dup counts self-consistent") {
    val rows = TrainPrepOps.passageChunks(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getLong(5)))
    val nToks = graft.operators.EtlOps.t(spark, dir, "documents")
      .selectExpr("doc_id", "CAST(size(split(text, ' ')) AS BIGINT) AS n")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.map(_._1).distinct.length == nToks.size,
      "every document must yield at least one chunk")
    rows.groupBy(_._1).foreach { case (docId, ch) =>
      val sorted = ch.sortBy(_._2)
      val n = nToks(docId)
      // dense indices, strided starts, full-size interior chunks, and the
      // last chunk ends exactly at the document's final token
      sorted.zipWithIndex.foreach { case ((_, idx, start, toks, _, _), i) =>
        assert(idx == i && start == i.toLong * TrainPrepOps.ChunkStride)
        if (i < sorted.length - 1)
          assert(toks == TrainPrepOps.ChunkSize, s"interior chunk short: $docId/$i")
      }
      val (_, _, lastStart, lastToks, _, _) = sorted.last
      assert(lastStart + lastToks == n, s"doc $docId tail uncovered")
      assert(lastStart < n, s"doc $docId has an empty chunk")
      // every start before the last leaves >ChunkSize-stride overlap next
      assert(sorted.length ==
        1 + math.max(0, math.ceil(
          (n - TrainPrepOps.ChunkSize).toDouble / TrainPrepOps.ChunkStride))
            .toLong, s"doc $docId chunk count")
    }
    // n_dup_of reconciles with the output's own fingerprint multiplicity
    rows.groupBy(_._5).foreach { case (_, same) =>
      same.foreach { c => assert(c._6 == same.length - 1) }
    }
  }

  test("q181 bloom ingest dedup matches an exact reference split; contracts hold") {
    val rows = graft.operators.DedupOps
      .bloomIngestDedup(spark, TestSession.sfDir("0.001")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getBoolean(5))).toMap
    assert(rows.nonEmpty)
    val off = graft.operators.DedupOps.CopyOffset
    val docs = spark.read
      .parquet(s"${TestSession.sfDir("0.001")}/documents.parquet")
      .selectExpr("doc_id", "source", "md5(text) AS fp").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // rebuild the planted corpus and split in the driver
    val corpus = docs.map(d => (d._1, d._1, d._2, d._3)) ++
      docs.filter(_._1 % 2 == 0).map(d => (d._1 + off, d._1, d._2, d._3))
    val hist = corpus.filter(_._1 % 7 != 0).map(_._4).toSet
    val batch = corpus.filter(_._1 % 7 == 0)
    val want = batch.groupBy(_._3).map { case (src, bs) =>
      val dups = bs.count(b => hist.contains(b._4))
      src -> (bs.length.toLong, dups.toLong, (bs.length - dups).toLong)
    }
    assert(rows.keySet == want.keySet)
    want.foreach { case (src, (n, d, nw)) =>
      val g = rows(src)
      assert((g._1, g._2, g._3) == ((n, d, nw)), s"source $src counts")
      assert(g._4 && g._5, s"source $src bloom contract violated")
    }
    // the planted structure must exercise both classes
    assert(rows.values.map(_._2).sum > 0, "no dups planted")
    assert(rows.values.map(_._3).sum > 0, "no new docs planted")
  }

  test("q171 sft assembly matches a per-thread reference truncation loop") {
    val got = TrainPrepOps.sftAssembly(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getBoolean(7))).toMap

    val ev = graft.operators.EtlOps.events(spark, dir)
      .selectExpr("user_id", "CAST(to_date(ts) AS STRING) AS day",
        "CAST(ts AS STRING) AS ts", "event_id",
        "CAST(length(event_type) + length(props) AS BIGINT) AS cost")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    val want = ev.groupBy(t => (t._1, t._2)).map { case (key, turns) =>
      // newest-first walk: keep while the running total fits the budget;
      // the newest turn is unconditional
      val desc = turns.sortBy(t => (t._3, t._4)).reverse
      var cum = 0L
      val kept = desc.zipWithIndex.takeWhile { case (t, i) =>
        cum += t._5; cum <= TrainPrepOps.SftBudget || i == 0
      }.map(_._1)
      val total = turns.map(_._5).sum
      key -> (turns.length.toLong, total, kept.length.toLong,
        kept.map(_._5).sum, (turns.length - kept.length).toLong,
        turns.length != kept.length)
    }
    assert(got.size == want.size)
    want.foreach { case (k, v) => assert(got(k) == v, s"thread $k") }
    assert(got.values.count(_._6) > 0, "no thread truncates — budget too high")
  }

  test("q185 prefix savings match a driver-side prefix-group reference") {
    val got = TrainPrepOps.prefixSavings(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toMap
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id", "source", "text").collect()
      .map { r =>
        val raw = r.getString(2)
        val text = if (r.getLong(0) % 3 == 0)
          TrainPrepOps.PrefixHeader + " " + raw else raw
        (r.getString(1), text)
      }
    docs.groupBy(_._1).foreach { case (src, ds) =>
      val groups = ds.groupBy(_._2.split(" ").take(TrainPrepOps.PrefixToks)
        .mkString(" ")).map(_._2.length)
      val shared = groups.filter(_ > 1)
      val saved = shared.map(_ - 1).sum.toLong * TrainPrepOps.PrefixToks
      val total = ds.map(_._2.split(" ").length.toLong).sum
      val g = got(src)
      assert(g._1 == ds.length && g._2 == groups.size)
      assert(g._3 == shared.sum.toLong && g._4 == saved && g._5 == total)
      // operator rounds to 6 decimals; allow the half-ulp of that rounding
      assert(math.abs(g._6 - saved.toDouble / total) <= 5e-7)
    }
    // the planted header must actually create sharing
    assert(got.values.exists(_._4 > 0), "no prefix sharing planted")
  }

  test("q188 BT ratings match an independent driver-side MM reference") {
    val got = TrainPrepOps.btRatings(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toMap
    // independent comparison extraction from raw events
    val ev = graft.operators.EtlOps.events(spark, dir)
      .select("user_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1),
        math.round(r.getDouble(2) * 100)))
    val ut = ev.groupBy(t => (t._1, t._2)).map { case ((u, t), xs) =>
      (u, t, xs.map(_._3).sum, xs.size.toLong) }.toSeq
    val wl = scala.collection.mutable.Map.empty[(String, String), Long]
      .withDefaultValue(0L)
    ut.groupBy(_._1).values.foreach { ts =>
      for (aa <- ts; bb <- ts if aa._2 < bb._2) {
        val x = BigInt(aa._3) * bb._4
        val y = BigInt(bb._3) * aa._4
        if (x > y) wl((aa._2, bb._2)) += 1
        else if (y > x) wl((bb._2, aa._2)) += 1
      }
    }
    val players = wl.keys.flatMap(k => Seq(k._1, k._2)).toSeq.distinct.sorted
    def n(i: String, j: String) = wl((i, j)) + wl((j, i))
    val winsOf = players.map(i =>
      i -> players.filter(_ != i).map(j => wl((i, j))).sum).toMap
    var rat = players.map(_ -> 1.0).toMap
    for (_ <- 1 to TrainPrepOps.BtIters) {
      val fr = players.map { i =>
        val d = players.filter(j => j != i && n(i, j) > 0)
          .map(j => BigDecimal(math.floor(
            n(i, j).toDouble * 1e12 / (rat(i) + rat(j))))).sum
        i -> math.floor(
          winsOf(i).toDouble * 1e12 / d.toDouble * 1e9).toLong
      }.toMap
      val ssum = fr.values.sum
      rat = players.map(i => i -> math.floor(
        fr(i).toDouble * players.size.toDouble * 1e9 / ssum.toDouble)
        / 1e9).toMap
    }
    assert(got.keySet == players.toSet)
    players.foreach { i =>
      val (games, wins, wr, rating) = got(i)
      assert(games == players.filter(_ != i).map(j => n(i, j)).sum)
      assert(wins == winsOf(i))
      assert(math.abs(wr - wins.toDouble / games) <= 5e-7)
      assert(math.abs(rating - rat(i)) <= 5e-7, s"rating mismatch for $i")
    }
    // normalization: ratings sum to |players| on the frozen grid
    val sumR = got.values.map(_._4).sum
    assert(math.abs(sumR - players.size) < 1e-3, s"sum(r) = $sumR")
    // the fit must separate players (not all ratings equal)
    assert(got.values.map(_._4).toSet.size > 1, "degenerate flat ratings")
  }

  test("q174 preference pairs match a per-group argmax/argmin reference") {
    val got = TrainPrepOps.prefPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getLong(5))).toMap

    val ev = graft.operators.EtlOps.events(spark, dir)
      .select("user_id", "event_type", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    val want = ev.groupBy(t => (t._1, t._2)).flatMap { case (k, rows) =>
      val chosen = rows.minBy(t => (-t._4, t._3))
      val rejected = rows.minBy(t => (t._4, t._3))
      if (chosen._4 > rejected._4)
        Some(k -> (chosen._3, rejected._3, chosen._4 - rejected._4,
          rows.length.toLong))
      else None
    }.toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (k, (c, rj, m, n)) =>
      val g = got(k)
      assert(g._1 == c && g._2 == rj && g._4 == n, s"pair mismatch for $k")
      assert(math.abs(g._3 - m) < 1e-9, s"margin mismatch for $k")
      assert(g._3 > 0.0, "non-positive margin survived the filter")
    }
  }

  test("q173 length buckets: depths balance, bounds ascend, bucketing beats one bucket") {
    val rows = TrainPrepOps.lengthBuckets(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (lang, bs) =>
      val sorted = bs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (0 until sorted.length).map(_.toLong),
        s"$lang buckets not dense")
      // equi-depth: bucket sizes within one of each other
      val sizes = sorted.map(_._3)
      assert(sizes.max - sizes.min <= 1, s"$lang depths unbalanced: ${sizes.toSeq}")
      // max lengths ascend with bucket index
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sortBy(identity).toSeq)
      sorted.foreach { b =>
        assert(b._6 == b._4 * b._3, "padded != max*count")
        assert(b._7 >= 0.0 && b._7 < 1.0)
      }
      // bucketed padding never exceeds the single-bucket baseline
      val paddedBuckets = sorted.map(_._6).sum
      val paddedSingle = sorted.map(_._4).max * sorted.map(_._3).sum
      assert(paddedBuckets <= paddedSingle,
        s"$lang bucketing worse than one bucket")
    }
  }

  test("q204 FIM transform: conservation holds everywhere, overhead is exactly 3 sentinels") {
    val rows = graft.operators.TrainPrepOps
      .fimTransform(spark, TestSession.sfDir("0.001")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDocs, toks, fimToks, nCons) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nCons == nDocs, s"split corrupted ${nDocs - nCons} docs: $r")
      assert(r.getBoolean(7), s"all_conserved false: $r")
      assert(fimToks == toks + 3 * nDocs, s"sentinel overhead wrong: $r")
      val frac = r.getDouble(5)
      // thirds split: middle fraction is ⌊2n/3⌋-⌊n/3⌋ per doc ≈ 1/3
      assert(frac > 0.30 && frac < 0.37, s"middle fraction $frac")
      assert(r.getString(6).length == 32, "psm fingerprint not an md5")
    }
    // driver-side recompute of the split on a sample of documents:
    // the same thirds arithmetic must reproduce the original stream
    val docs = spark.read
      .parquet(s"${TestSession.sfDir("0.001")}/documents.parquet")
      .selectExpr("text").limit(50).collect().map(_.getString(0))
    docs.foreach { text =>
      val toks = text.split(" ", -1)
      val n = toks.length
      val (p, m) = (n / 3, 2 * n / 3)
      val re = (toks.slice(0, p) ++ toks.slice(p, m) ++
        toks.slice(m, n)).mkString(" ")
      assert(re == toks.mkString(" "), "thirds split loses tokens")
    }
  }

  test("q216 shard conformance: cells cover the corpus, chi2 reconciles, hash shards conform") {
    val rows = graft.operators.TrainPrepOps
      .shardConformance(spark, TestSession.sfDir("0.001")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getBoolean(4)))
    assert(rows.length == graft.operators.TrainPrepOps.ConformShards)
    assert(rows.map(_._2).sum == 500, "shard totals don't cover the corpus")
    val df = rows.head._4
    rows.foreach { r =>
      assert(r._3 >= 0.0)
      assert(r._4 == df)
      // the conformance flag IS the chi2-vs-slack comparison
      val slack = graft.operators.TrainPrepOps.ShardChi2Slack
      assert(r._5 == (r._3 <= slack * df + 1e-9), s"flag inconsistent: $r")
    }
    // an unbiased hash shard key conforms essentially everywhere — a
    // majority of failing shards would mean the audit (or the hash) is
    // broken, not the data
    assert(rows.count(_._5) >= rows.length - 2,
      s"hash sharding failed conformance: $rows")
  }
}
