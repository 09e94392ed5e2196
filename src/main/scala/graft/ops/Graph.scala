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

  /** Fixed-iteration HITS (Kleinberg 1999) over a directed edge list
    * `(src, dst)`: hub/authority mutual recursion — authorities collect
    * hub mass over in-edges, hubs collect authority mass over out-edges,
    * each side L2-normalized per round. Complements [[pageRank]]: HITS
    * separates pages that LINK WELL from pages that ARE linked well,
    * the directory-vs-content split a crawl scheduler uses.
    *
    * Same cross-engine determinism recipe as pageRank (the d9/x8
    * discipline): mass sums run in DECIMAL(25,15) (exact, reduction-
    * order-free), both scores iterate as 12-dp-rounded doubles, the L2
    * norm squares those exact doubles with 12-dp terms DECIMAL-summed —
    * every step is one IEEE operation on identical operands in both
    * engines. Scale shape per iteration: two equi-joins with the edge
    * list + two map-side-combined aggregates + two one-row norm frames
    * broadcast; lineage truncated per round. Nodes with no in-edges
    * (resp. out-edges) score authority (resp. hub) 0. */
  def hits(edges: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val e = edges.select(col("src"), col("dst")).distinct()
      .filter(col("src") =!= col("dst")).localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint()
    def normalize(raw: DataFrame, valCol: String): DataFrame = {
      val nf = raw.agg(sum(round(col(valCol) * col(valCol), 12).cast("decimal(25,15)"))
        .cast("double").as("n2"))
      nodes.join(raw, Seq("node"), "left").crossJoin(broadcast(nf))
        .select(col("node"),
          when(col("n2") > 0, round(coalesce(col(valCol), lit(0.0)) / sqrt(col("n2")), 12))
            .otherwise(lit(0.0)).as(valCol))
    }
    var hubs = nodes.select(col("node"), lit(1.0).as("h"))
    var auth = nodes.select(col("node"), lit(0.0).as("a"))
    for (_ <- 1 to iterations) {
      val aRaw = hubs.join(e, col("node") === col("src"))
        .groupBy(col("dst").as("node2"))
        .agg(sum(col("h").cast("decimal(25,15)")).cast("double").as("a"))
        .withColumnRenamed("node2", "node")
      auth = normalize(aRaw, "a").localCheckpoint()
      val hRaw = auth.join(e, col("node") === col("dst"))
        .groupBy(col("src").as("node2"))
        .agg(sum(col("a").cast("decimal(25,15)")).cast("double").as("h"))
        .withColumnRenamed("node2", "node")
      hubs = normalize(hRaw, "h").localCheckpoint()
    }
    hubs.join(auth, "node").select(col("node"), col("h").as("hub"), col("a").as("authority"))
  }

  /** Exact triangle count + local clustering coefficient per node over an
    * edge list `(src, dst)` (directed/multi input; loops dropped, edges
    * canonicalized undirected-simple) — the link-graph structure signal
    * that separates organic neighborhoods (high clustering) from link
    * farms and spam rings (star/bipartite patterns, near-zero clustering)
    * before PageRank ever runs.
    *
    * Algorithm: DEGREE-ORDERED edge orientation (Chiba–Nishizeki /
    * node-iterator++): each undirected edge points from its lower to its
    * higher endpoint under the total order (degree, id); wedges are
    * generated only at a node's LOWER-ordered endpoint and closed with one
    * equi-join back to the oriented edges. This is the O(m^{3/2})
    * arboricity bound: a degree-d hub generates wedges only among
    * neighbors of degree ≥ d, so a 100 TB web graph's celebrity nodes
    * (in-degree 10⁸) contribute almost no wedge fan-out — the id-ordered
    * naive orientation would square them. Every step is an equi-join or
    * hash aggregate on node keys; nothing is all-pairs and nothing
    * iterates.
    *
    * Returns `(node, degree, n_triangles, clustering)` for every node,
    * clustering = 2T/(d(d−1)) rounded 6dp (0.0 when d < 2). */
  def triangleStats(edges: DataFrame): DataFrame = {
    val und = edges.select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint() // feeds degree AND both orientation sides
    val deg = und.select(col("u").as("node")).union(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val withDeg = und
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
    val uFirst = col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v"))
    val oriented = withDeg.select(
        when(uFirst, col("u")).otherwise(col("v")).as("lo"),
        when(uFirst, col("v")).otherwise(col("u")).as("hi"),
        when(uFirst, col("dv")).otherwise(col("du")).as("dhi"))
      .localCheckpoint() // feeds both wedge sides and the closing probe
    // wedge pair (hi1, hi2) kept in the SAME (deg, id) order the
    // orientation uses, so the closing edge — if present — is oriented
    // exactly (lo=hi1, hi=hi2) and one equi-join finds it
    val wedges = oriented.as("e1").join(oriented.as("e2"),
        col("e1.lo") === col("e2.lo") &&
          (col("e1.dhi") < col("e2.dhi") ||
            (col("e1.dhi") === col("e2.dhi") && col("e1.hi") < col("e2.hi"))))
      .select(col("e1.lo").as("a"), col("e1.hi").as("b"), col("e2.hi").as("c"))
    val tris = wedges.join(oriented.select(col("lo").as("b"), col("hi").as("c")), Seq("b", "c"))
    val perNode = tris.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("deg").as("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_triangles"),
        round(when(col("deg") >= 2,
            lit(2.0) * coalesce(col("n_tri"), lit(0L)) / (col("deg") * (col("deg") - lit(1.0))))
          .otherwise(lit(0.0)), 6).as("clustering"))
  }
}
