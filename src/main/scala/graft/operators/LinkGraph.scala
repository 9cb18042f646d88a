package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Host-level link graph analytics: PageRank (Page et al. 1999) as a quality
  * prior for crawl curation — high-rank hosts seed frontier priority and
  * feed host-trust features into the quality classifier (the role host ranks
  * play in Common-Crawl-style curation).
  *
  * Determinism discipline: ranks are FIXED-POINT Longs (scale = 10¹² per
  * host of initial mass) and every step is integer arithmetic — `rank div
  * deg` truncating division for the out-contribution, `(85 · Σ) div 100`
  * for the damping — so Long-sum commutativity makes each iteration
  * bit-identical under ANY partitioning, and the whole computation is
  * exactly re-expressible in DuckDB HUGEINT arithmetic (the q72 oracle's
  * recursive CTE). Dangling-host mass is dropped, not redistributed (both
  * sides mirror this; documented divergence from the normalized formulation
  * — ranking order is what curation consumes, not the exact stationary
  * distribution).
  *
  * Spark shape per iteration: one hash join on `src` (ranks × out-degrees,
  * both keyed by host), one shuffle for the per-destination sum, and an
  * eager `localCheckpoint` to truncate the growing plan lineage — the
  * standard iterative-DataFrame discipline (same as Dedup.components).
  * At 10⁸ hosts both sides of the join hash-partition on the same key, so
  * AQE coalesces and there is no driver-side state at all.
  */
object LinkGraph {

  val Scale: Long = 1000000000000L // initial rank per host
  val DampNum = 85L // damping 0.85 as a ratio of Longs
  val DampDen = 100L

  /** `(src, dst)` edge list → `(host, rank)` after `iterations` damped
    * power-iteration steps. Self-loops and duplicate edges should be
    * resolved upstream (`distinct`); isolated hosts keep the base rank. */
  def hostRank(edges: DataFrame, iterations: Int = 10): DataFrame = {
    require(iterations >= 0)
    val base = Scale * (DampDen - DampNum) / DampDen // (1-d) · initial mass
    val hosts = edges.select(col("src").as("host"))
      .unionByName(edges.select(col("dst").as("host"))).distinct()
    val outDeg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    var ranks = hosts.withColumn("rank", lit(Scale))
    for (_ <- 1 to iterations) {
      val contribs = edges
        .join(ranks.withColumnRenamed("host", "src"), "src")
        .join(outDeg, "src")
        .select(col("dst").as("host"), expr("rank div deg").as("contrib"))
      val inMass = contribs.groupBy("host").agg(sum("contrib").as("in_mass"))
      ranks = hosts.join(inMass, Seq("host"), "left")
        .select(col("host"),
          (lit(base) + expr(s"($DampNum * coalesce(in_mass, 0L)) div $DampDen"))
            .as("rank"))
        .localCheckpoint()
    }
    ranks
  }
}
