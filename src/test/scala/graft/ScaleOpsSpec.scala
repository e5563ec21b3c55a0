package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ScaleOps

class ScaleOpsSpec extends AnyFunSuite {

  test("global enumeration is dense, 0-based, and doc_id-ordered without a single-partition window") {
    val spark = TestSession.spark
    val dir = TestSession.sfDir("0.001")
    val out = graft.operators.ScaleOps.globalEnumeration(spark, dir).collect()
    val n = out.length
    assert(out.map(_.getLong(2)).sorted.toSeq == (0L until n).toSeq)
    // id order == doc_id order
    assert(out.sortBy(_.getLong(0)).map(_.getLong(2)).toSeq ==
      (0L until n).toSeq)
    // the offsets plan never collapses the data to one partition: the
    // enumeration itself uses only range + pid-local windows
    val p = graft.operators.ScaleOps.globalEnumeration(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange SinglePartition"),
      s"enumeration collapsed to one partition:\n${p.take(1200)}")
    // offsets reach rows via a broadcast hash join, keeping the plan
    // constant-size in partition count (a when-chain with one branch per
    // partition would break codegen at 100 TB partition counts)
    assert(p.contains("BroadcastHashJoin"),
      s"expected broadcast offset join:\n${p.take(1200)}")
    assert(!p.contains("CASE WHEN (pid"),
      s"per-partition when-chain is back:\n${p.take(1200)}")
  }

  lazy val spark: SparkSession = TestSession.spark
  val dir = TestSession.sfDir("0.001")

  test("salted two-phase aggregation equals the naive aggregate") {
    import org.apache.spark.sql.functions._
    val salted = ScaleOps.saltedTokenCounts(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val naive = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == naive)
  }

  test("streaming sessionization: event-time timeout closes sessions across micro-batches") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-sess").toString
    val evs = graft.operators.EtlOps.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("ts"))
    // micro-batch 1: all real events; micro-batch 2: one far-future
    // synthetic event that advances the watermark past every open
    // session's (last_event + gap) timeout
    evs.write.mode("overwrite").parquet(s"$tmp/in")
    val stream = spark.readStream.schema(evs.schema).parquet(s"$tmp/in")
      .withWatermark("ts", "0 seconds")
      .as[ScaleOps.EvT]
    val q = ScaleOps.sessionizeStreaming(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    try {
      q.processAllAvailable()
      val afterB1 = spark.table("sess_out").count()
      evs.limit(1).select(lit(999999L).as("event_id"),
        lit(999999L).as("user_id"),
        (col("ts") + expr("INTERVAL 100 DAYS")).as("ts"))
        .write.mode("append").parquet(s"$tmp/in")
      q.processAllAvailable()
      val streamed = spark.table("sess_out")
        .filter(col("user_id") =!= 999999L)
        .select("user_id", "session_idx", "n_events").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val batch = ScaleOps.sessionize(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // every session closed by the advanced watermark matches the batch
      // result exactly — sessions spanning micro-batches never split
      assert(streamed == batch,
        s"streamed ${streamed.size} vs batch ${batch.size}; " +
          s"afterB1=$afterB1 (intra-batch closures only)")
      assert(afterB1 < batch.size, "open sessions must wait for the watermark")
    } finally q.stop()
  }

  test("streaming sessionization: numbering continues after a timeout-closed session") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-sess2").toString
    def batch(rows: (Long, Long, String)*): Unit =
      rows.toSeq.toDF("event_id", "user_id", "s")
        .select(col("event_id"), col("user_id"),
          col("s").cast("timestamp").as("ts"))
        .write.mode("append").parquet(s"$tmp/in")
    batch((1L, 1L, "2024-01-01 00:00:00"))
    val schema = spark.read.parquet(s"$tmp/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$tmp/in")
      .withWatermark("ts", "0 seconds")
      .as[ScaleOps.EvT]
    val q = ScaleOps.sessionizeStreaming(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess2_out").start()
    try {
      q.processAllAvailable()
      batch((2L, 999L, "2024-02-01 00:00:00")) // advances wm → closes u1 s1
      q.processAllAvailable()
      batch((3L, 1L, "2024-03-01 00:00:00"))   // u1 opens a NEW session
      q.processAllAvailable()
      batch((4L, 998L, "2024-04-01 00:00:00")) // advances wm → closes u1 s2
      q.processAllAvailable()
      val u1 = spark.table("sess2_out").filter(col("user_id") === 1L)
        .select("session_idx").collect().map(_.getLong(0)).sorted.toSeq
      assert(u1 == Seq(1L, 2L),
        s"expected session indices 1,2 for user 1, got $u1")
    } finally q.stop()
  }

  test("streaming sessionization: marker TTL evicts state and numbering restarts") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-sess3").toString
    def batch(rows: (Long, Long, String)*): Unit =
      rows.toSeq.toDF("event_id", "user_id", "s")
        .select(col("event_id"), col("user_id"),
          col("s").cast("timestamp").as("ts"))
        .write.mode("append").parquet(s"$tmp/in")
    batch((1L, 1L, "2024-01-01 00:00:00"))
    val schema = spark.read.parquet(s"$tmp/in").schema
    val stream = spark.readStream.schema(schema).parquet(s"$tmp/in")
      .withWatermark("ts", "0 seconds")
      .as[ScaleOps.EvT]
    val q = ScaleOps.sessionizeStreaming(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess3_out").start()
    try {
      q.processAllAvailable()
      batch((2L, 999L, "2024-02-01 00:00:00")) // wm past gap → closes u1 s1,
      q.processAllAvailable()                  // marker armed wm + 24h TTL
      batch((3L, 998L, "2024-03-01 00:00:00")) // wm past the TTL → marker
      q.processAllAvailable()                  // evicted (no data for u1)
      batch((4L, 1L, "2024-04-01 00:00:00"))   // u1 returns AFTER eviction
      q.processAllAvailable()
      batch((5L, 997L, "2024-05-01 00:00:00")) // closes u1's new session
      q.processAllAvailable()
      val u1 = spark.table("sess3_out").filter(col("user_id") === 1L)
        .select("session_idx").collect().map(_.getLong(0)).toSeq
      // the documented TTL trade-off: numbering restarted at 1 — the
      // marker was REMOVED, proving state does not grow with all-time
      // user cardinality. (Contrast sess2's within-TTL continuation.)
      assert(u1 == Seq(1L, 1L),
        s"expected restart-at-1 after marker TTL eviction, got $u1")
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization equals the window-function form") {
    val windowed = ScaleOps.sessionize(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val stateful = ScaleOps.sessionizeStateful(spark, dir).collect()
      .map(s => (s.user_id, s.session_idx, s.n_events)).toSet
    assert(stateful == windowed)
    assert(windowed.nonEmpty)
    // sessions actually split: more sessions than users
    val users = windowed.map(_._1).size
    assert(windowed.size > spark.read.parquet(s"$dir/events.parquet")
      .select("user_id").distinct().count())
  }

  test("q179 incremental stats: merged partials equal the full recompute everywhere") {
    val rows = graft.operators.ScaleOps.incrementalStats(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getBoolean(7)))
    assert(rows.nonEmpty)
    // the operator's own audit must hold — partials algebra is exact
    rows.foreach(r => assert(r._8, s"source ${r._1} partials diverged"))
    // cross-check one source against a driver-side recompute
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val bySrc = docs.groupBy(_._1)
    rows.foreach { case (src, n, chars, _, mn, mx, mean, _) =>
      val want = bySrc(src).map(_._2)
      assert(n == want.length && chars == want.sum)
      assert(mn == want.min && mx == want.max)
      assert(math.abs(mean - chars.toDouble / n) < 1e-9)
    }
  }

  test("q347 skipping audit: min/max pruning is sound and z-order dominates the natural layout") {
    val rows = ScaleOps.skippingAudit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.length ==
      ScaleOps.ZSkipXLos.length * ScaleOps.ZSkipYLos.length)
    rows.foreach { case (xl, yl, scanN, matchN, scanZ, matchZ) =>
      // soundness: a min/max pruner may over-scan but never misses a
      // file that contains a matching row
      assert(scanN >= matchN, s"pred ($xl,$yl) natural")
      assert(scanZ >= matchZ, s"pred ($xl,$yl) zorder")
    }
    val totScanN = rows.map(_._3).sum
    val totScanZ = rows.map(_._5).sum
    assert(totScanZ < totScanN,
      s"zorder scanned $totScanZ vs natural $totScanN")
    assert(rows.map(_._4).sum > 0, "no matching rows anywhere — vacuous")
  }

  test("q352 three-way merge census matches the closed-form outcome replay; conserves rows") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    // the edits always change the fingerprint (upper() on letters,
    // ' theirs' append), so outcomes are a closed form of doc_id
    val expected = docs.map { id =>
      val delO = id % 17 == 2
      val delT = id % 19 == 3
      val modO = !delO && id % 5 == 1
      val modT = !delT && id % 7 == 2
      if (delO && delT) "delete_agreed"
      else if ((modO && delT) || (modT && delO)) "conflict_edit_delete"
      else if (modO && modT) "conflict_edit_edit"
      else if (delO || delT) "delete_one_sided"
      else if (modO) "take_ours"
      else if (modT) "take_theirs"
      else "unchanged"
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rows = ScaleOps.threeWayMerge(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.map(_._2).sum == docs.length.toLong)
    assert(rows.map(r => r._1 -> r._2).toMap == expected)
    rows.foreach { case (o, _, c) =>
      assert(c == o.startsWith("conflict"), o) }
  }

  test("q348 IVM delta algebra is consistent with recomputation on every segment") {
    val rows = ScaleOps.ivmJoinView(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(4), r.getBoolean(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (seg, before, ivm, rec, ok) =>
      assert(ok, s"segment $seg inconsistent")
      assert(ivm == rec, seg)
      assert(ivm != before, s"$seg: delta batch was a no-op — vacuous")
    }
  }
}
