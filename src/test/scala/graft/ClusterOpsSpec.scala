package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ClusterOps

/** Invariant specs for the label-centroid diagnostics (q106-q107); the
  * DuckDB oracle gate checks exact row parity.
  */
class ClusterOpsSpec extends AnyFunSuite {

  private val spark = TestSession.spark
  private val dir = TestSession.sfDir("0.001")

  test("q106 reports exactly OutlierK ranked outliers per label, farthest first") {
    val rows = ClusterOps.semanticOutliers(spark, dir).collect()
    val byLabel = rows.groupBy(_.getInt(0))
    for ((label, rs) <- byLabel) {
      assert(rs.length == ClusterOps.OutlierK, s"label $label")
      assert(rs.map(_.getLong(2)).sorted.toSeq == (1L to ClusterOps.OutlierK).toSeq)
      val dists = rs.sortBy(_.getLong(2)).map(_.getDouble(3))
      assert(dists.zip(dists.tail).forall { case (a, b) => a >= b },
        s"label $label outliers not ranked by distance: ${dists.mkString(",")}")
    }
  }

  test("q106 outliers really are their label's max-distance members") {
    // the rank-1 outlier's distance must be >= every reported distance
    val rows = ClusterOps.semanticOutliers(spark, dir).collect()
    for ((_, rs) <- rows.groupBy(_.getInt(0))) {
      val top = rs.filter(_.getLong(2) == 1L).head.getDouble(3)
      assert(rs.forall(_.getDouble(3) <= top))
    }
  }

  test("q107 confusion matrix conserves the corpus and keeps labels in range") {
    val rows = ClusterOps.labelConfusion(spark, dir).collect()
    val total = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(rows.map(_.getLong(2)).sum == total)
    val labels = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("label").distinct().collect().map(_.getInt(0)).toSet
    assert(rows.forall(r => labels.contains(r.getInt(0)) && labels.contains(r.getInt(1))))
    assert(rows.forall(_.getLong(2) > 0))
  }

  test("q107 assignment is a function: each vector contributes to exactly one cell") {
    // conservation per true label: row sums equal the label's member count
    val conf = ClusterOps.labelConfusion(spark, dir)
      .groupBy("label").agg(sum("n").as("assigned"))
    val truth = spark.read.parquet(s"$dir/embeddings.parquet")
      .groupBy("label").agg(count(lit(1)).as("members"))
    val bad = conf.join(truth, "label")
      .filter(col("assigned") =!= col("members")).count()
    assert(bad == 0L)
  }

  test("q135 balanced sample: caps at cell size, flattens density, preserves geometry") {
    val rows = ClusterOps.clusterBalancedSample(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.nonEmpty)
    val n = rows.map(_._2).sum
    rows.foreach { case (_, nPoints, wFp, target, realized, mAll, mSel) =>
      assert(wFp == math.floor(math.sqrt(nPoints.toDouble) * 1e9).toLong)
      // without replacement: the rank pick keeps min(size, target) exactly
      assert(realized == math.min(nPoints, target), s"realized != min: $rows")
      assert(mAll >= 0.0 && mSel >= 0.0)
    }
    assert(rows.map(_._4).sum <= n)
    // sqrt flattening: the keep RATE N/(S·sqrt(c)) is decreasing in cell
    // size; the integer floor of the target jitters it by at most 1/c
    val byRate = rows.sortBy(_._2)
      .map(r => (r._5.toDouble / r._2.toDouble, r._2))
    byRate.toSeq.sliding(2).foreach {
      case Seq((a, _), (b, cb)) =>
        assert(b <= a + 1.0 / cb,
          s"keep rate not decreasing in cell size: ${byRate.toSeq}")
      case _ =>
    }
  }

  test("q144 flags exactly the planted semantic leaks") {
    val rows = graft.operators.ClusterOps.semanticContamination(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, sim, contaminated) =>
      assert(id % 10 == 0, "only val docs appear")
      // contaminated ⟺ a scaled near-copy of this doc went to train
      assert(contaminated == (id % 20 == 0),
        s"vec $id: contaminated=$contaminated sim=$sim")
      if (contaminated) assert(sim > 0.999)
    }
  }

  test("q176 embedding drift matches a driver-side fixed-point reference") {
    val got = graft.operators.ClusterOps.embeddingDrift(spark, dir).collect()
      .map(r => r.get(0).toString -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toMap

    val raw = spark.read.parquet(s"$dir/embeddings.parquet")
      .selectExpr("CAST(label AS STRING) AS label",
        "transform(embedding, x -> CAST(x AS DOUBLE)) AS emb")
      .collect()
      .map(r => (r.getString(0), r.getSeq[Double](1).toArray))
    val dims = raw.head._2.length
    def fxSums(rows: Array[(String, Array[Double])]): Array[Long] = {
      val s = new Array[Long](dims)
      rows.foreach { case (_, e) =>
        var j = 0
        while (j < dims) { s(j) += math.floor(e(j) * 1e9).toLong; j += 1 }
      }
      s
    }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var j = 0
      while (j < dims) { acc += a(j) * b(j); j += 1 } // left-assoc chain
      acc
    }
    val byLab = raw.groupBy(_._1)
    val gSums = fxSums(raw)
    val gn = raw.length
    val gcent = gSums.map(s => (s.toDouble / 1e9) / gn)
    byLab.foreach { case (lab, rows) =>
      val cent = fxSums(rows).map(s => (s.toDouble / 1e9) / rows.length)
      val cos = dot(cent, gcent) / (math.sqrt(dot(cent, cent)) *
        math.sqrt(dot(gcent, gcent)))
      val ratio = math.sqrt(dot(cent, cent)) / math.sqrt(dot(gcent, gcent))
      val (n, gc, gr) = got(lab)
      assert(n == rows.length)
      assert(math.abs(gc - cos) < 1e-6, s"label $lab cos: $gc vs $cos")
      assert(math.abs(gr - ratio) < 1e-6, s"label $lab ratio: $gr vs $ratio")
    }
    // drift exists on the fixture: not every slice sits on the pool mean
    assert(got.values.exists(v => v._2 < 0.999999),
      "all slices identical to the pool — probe is vacuous")
  }
}
