package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph computation on DataFrames: fixed-iteration PageRank
  * over the customer–supplier trade graph.
  *
  * The distributed shape is the classic one: edges are the large
  * key-partitioned table, ranks are the small per-node table, and every
  * iteration is `edges ⋈ ranks → groupBy(dst)` — one shuffle per
  * iteration, partitioned the same way every time, so at 100 TB the
  * edge table's partitioning is reused and only the (tiny) rank table
  * moves. No driver-side graph, no collect; the iteration count is a
  * fixed constant, which also makes the computation expressible as an
  * unrolled CTE chain for the oracle.
  *
  * Parity: per-row contribution rank/out_degree is one IEEE division,
  * then fixed-point quantized as floor(contrib · 10¹²) and summed as
  * BIGINT — exact and order-independent, and (unlike a double→DECIMAL
  * cast, where Spark rounds and DuckDB truncates, a bias that
  * accumulates across thousands of inbound edges) identical on both
  * engines by construction. The damping update 0.15 + 0.85·s is one
  * fixed op order, so ranks are bit-identical at every iteration.
  */
object GraphOps {

  val Damping = 0.85
  val Iterations = 3
  val TopK = 20

  /** The undirected trade graph: distinct (customer, supplier) pairs
    * that ever traded (lineitem ⋈ orders), as directed edges both ways.
    * Node ids are prefixed ('c…'/'s…') so the two key spaces cannot
    * collide. */
  def edges(s: SparkSession, dir: String): DataFrame = {
    val li = EtlOps.t(s, dir, "lineitem").select("l_orderkey", "l_suppkey")
    val o = EtlOps.t(s, dir, "orders").select("o_orderkey", "o_custkey")
    val cs = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("c"),
        concat(lit("s"), col("l_suppkey")).as("sp"))
      .distinct()
    cs.select(col("c").as("src"), col("sp").as("dst"))
      .unionAll(cs.select(col("sp").as("src"), col("c").as("dst")))
  }

  /** q70 — [[Iterations]]-step PageRank, top-[[TopK]] nodes. Every node
    * of the undirected graph has degree ≥ 1, so there is no dangling
    * mass and the per-iteration update is exactly
    * r'(v) = 0.15 + 0.85 · Σ_{u→v} r(u)/deg(u). */
  def pageRank(s: SparkSession, dir: String): DataFrame =
    pageRankRanks(s, dir).orderBy(col("pr").desc, col("node")).limit(TopK)

  /** The full final rank table (one row per node) — q70 takes its
    * top-[[TopK]]; the spec checks rank-mass conservation on ALL rows
    * (Σ pr = node count at every damped iteration, up to fixed-point
    * truncation). */
  def pageRankRanks(s: SparkSession, dir: String): DataFrame = {
    // e feeds both the degree aggregate and the degree-annotated edge
    // table — persist so the scan+join+distinct runs once
    val e = edges(s, dir).persist()
    val deg = e.groupBy("src").agg(count(lit(1)).as("out_deg"))
    // edges with degree attached are consumed once per iteration
    val ew = e.join(deg, "src").persist()
    // Iterative-DataFrame discipline: persist AND materialize each rank
    // generation, then drop its parent. Without the cut, iteration i's
    // plan embeds the full lineage of iterations 1..i-1 — the optimizer
    // re-derives (and re-sorts, via sort-merge joins with unknown size
    // stats) the whole chain, which measured ~30× slower than the
    // truncated form. The materializing count() is 1 row per node —
    // noise next to the edge join it saves. Same role checkpoint() plays
    // in long-running iterative jobs (checkpoint also cuts the RDD DAG
    // for fault-tolerance; at 3 iterations cache-truncation suffices).
    var ranks = deg.select(col("src").as("node"),
      lit(1.0).as("pr")).persist()
    for (_ <- 1 to Iterations) {
      val next = ew.join(ranks, ew("src") === ranks("node"))
        .select(col("dst"),
          floor(col("pr") / col("out_deg") * lit(1e12)).cast("long")
            .as("contrib"))
        .groupBy("dst")
        .agg(sum(col("contrib")).as("sfp"))
        .select(col("dst").as("node"),
          (lit(0.15) + lit(0.85) * (col("sfp").cast("double") / lit(1e12)))
            .as("pr"))
        .persist()
      next.count()
      ranks.unpersist()
      ranks = next
    }
    // e/ew are dead once the final generation is materialized — free
    // them so long-lived sessions (libraries, notebooks) don't pin the
    // edge table in storage; the final ranks cache stays, scoped by the
    // caller (Bench/Verify clearCache per query)
    ew.unpersist()
    e.unpersist()
    ranks
  }

  /** The DuckDB oracle: the identical computation as an unrolled CTE
    * chain (r0 → r1 → … → r[[Iterations]]), generated from the same
    * constants so the two sides cannot drift. */
  def pageRankOracle: String = {
    val iters = (1 to Iterations).map { i =>
      s"""r$i AS (SELECT dst AS node,
         |    0.15 + 0.85 * (CAST(CAST(sum(CAST(floor(pr / out_deg * 1000000000000.0) AS BIGINT)) AS BIGINT) AS DOUBLE) / 1000000000000.0) AS pr
         |  FROM ew JOIN r${i - 1} ON ew.src = r${i - 1}.node GROUP BY dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH cs AS (SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS c,
       |    's' || CAST(l_suppkey AS VARCHAR) AS sp
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |e AS (SELECT c AS src, sp AS dst FROM cs
       |      UNION ALL SELECT sp AS src, c AS dst FROM cs),
       |deg AS (SELECT src, count(*) AS out_deg FROM e GROUP BY src),
       |ew AS (SELECT e.src, e.dst, deg.out_deg FROM e JOIN deg USING (src)),
       |r0 AS (SELECT src AS node, CAST(1.0 AS DOUBLE) AS pr FROM deg),
       |$iters
       |SELECT node, pr FROM r$Iterations
       |ORDER BY pr DESC, node LIMIT $TopK""".stripMargin
  }
}
