package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph operators for corpus curation — the source-trust
  * ranking family (Common Crawl ranks domains by harmonic/PageRank-style
  * centrality before content filters ever run; REF's per-source metadata
  * filters assume such a verdict exists upstream).
  *
  * Same distributed-loop contract as `Dedup.connectedComponents` and
  * `Cluster.lloyd`: per iteration only scalars cross to the driver (here:
  * nothing — the loop count is fixed), lineage is truncated per round with
  * `localCheckpoint`, and every per-node reduction is order-independent so
  * shuffle nondeterminism cannot reach the result.
  */
object Graph {

  /** Fixed-iteration PageRank over an edge list `(src, dst)`. Returns
    * `(node, rank)` after `iterations` rounds of
    * `rank' = (1-d)/N + d · Σ_in rank/outdeg`, with nodes = src ∪ dst and
    * in-contribution 0 for nodes without in-edges (the dangling-mass
    * redistribution of the full formulation is deliberately omitted — the
    * standard simplification when edges are symmetrized, which leaves no
    * dangling nodes).
    *
    * Cross-engine determinism (the d9/x8 discipline): each iteration's
    * ranks are 12-dp-rounded doubles, so both engines iterate on
    * IDENTICAL values; the in-neighbor sum runs in DECIMAL(25,15) (exact,
    * reduction-order-independent) and every other step is a single IEEE
    * operation on identical operands.
    *
    * Scale shape: per iteration ONE equi-join of the rank table with the
    * edge list (shuffles on the node key — never a cross join, never a
    * window) + one map-side-combined hash aggregate on dst; N rides in a
    * broadcast one-row frame, so no `count()` ever reaches the driver. */
  def pageRank(edges: DataFrame, iterations: Int, damping: Double = 0.85): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    // checkpoint the edge list: every iteration's rank materialization
    // re-executes its lineage, and an edge build is typically the most
    // expensive input in the whole loop (pr1's is a shingle self-join) —
    // without this the build runs once PER ITERATION
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val tot = nodes.agg(count(lit(1)).cast("double").as("n"))
    val base = 1.0 - damping
    var ranks = nodes.crossJoin(broadcast(tot))
      .select(col("node"), (lit(1.0) / col("n")).as("rank"))
    for (_ <- 1 to iterations) {
      val contrib = ranks.join(e, col("node") === col("src"))
        .join(outdeg, "src")
        .select(col("dst").as("node"),
          (col("rank") / col("deg").cast("double")).cast("decimal(25,15)").as("t"))
      val sums = contrib.groupBy("node").agg(sum("t").as("s"))
      ranks = nodes.join(sums, Seq("node"), "left")
        .crossJoin(broadcast(tot))
        .select(col("node"),
          round(lit(base) / col("n")
            + lit(damping) * coalesce(col("s").cast("double"), lit(0.0)), 12).as("rank"))
        .localCheckpoint()
    }
    ranks
  }
}
