package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.tables.TestTables._

/** Privacy-governance inventory: k-anonymity audit, l-diversity audit,
  * and the generalization-ladder planner that picks the coarsest-needed
  * quasi-identifier bucketing — the release-gate checks a training
  * corpus with user-derived records needs before export (complements the
  * pii1-pii3 detectors: those find identifiers, these measure
  * re-identification risk of the keyed aggregates).
  *
  * All three are single map-side-combined aggregates over the
  * quasi-identifier key (nation, market segment, balance bucket) — the
  * 100 TB shape is one shuffle on the QI key; the ladder variant fans
  * each row into |ladder| keys (bounded ×5) instead of re-scanning. */
object GovernanceQueries extends QuerySet {

  private val K = 5

  /** k-anonymity audit (k=5): every quasi-identifier group with its
    * size and whether it meets the threshold — groups under k are the
    * rows a release would have to suppress. */
  val gov1K = Q("gov1_k_anonymity",
    Some(s"""SELECT c_nationkey, c_mktsegment,
              CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_bucket,
              CAST(count(*) AS BIGINT) AS n,
              CASE WHEN count(*) >= $K THEN 1 ELSE 0 END AS anonymous
            FROM customer
            GROUP BY 1, 2, 3
            ORDER BY c_nationkey, c_mktsegment, bal_bucket"""),
    (s, d) => customer(s, d)
      .groupBy(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000).cast("long").as("bal_bucket"))
      .agg(count(lit(1)).as("n"))
      .select(col("c_nationkey"), col("c_mktsegment"), col("bal_bucket"), col("n"),
        when(col("n") >= K, 1).otherwise(0).as("anonymous"))
      .orderBy("c_nationkey", "c_mktsegment", "bal_bucket"))

  /** l-diversity audit: within each quasi-identifier group, how many
    * DISTINCT sensitive values (order priority) appear — a k-anonymous
    * group with l=1 still leaks the sensitive attribute outright. */
  val gov2L = Q("gov2_l_diversity",
    Some("""SELECT c.c_nationkey, c.c_mktsegment,
              CAST(floor(c.c_acctbal / 1000) AS BIGINT) AS bal_bucket,
              CAST(count(*) AS BIGINT) AS n_orders,
              CAST(count(DISTINCT o.o_orderpriority) AS BIGINT) AS l,
              CASE WHEN count(DISTINCT o.o_orderpriority) >= 3 THEN 1 ELSE 0 END AS diverse
            FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
            GROUP BY 1, 2, 3
            ORDER BY c_nationkey, c_mktsegment, bal_bucket"""),
    (s, d) => customer(s, d)
      .join(orders(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000).cast("long").as("bal_bucket"))
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("o_orderpriority")).as("l"))
      .select(col("c_nationkey"), col("c_mktsegment"), col("bal_bucket"),
        col("n_orders"), col("l"),
        when(col("l") >= 3, 1).otherwise(0).as("diverse"))
      .orderBy("c_nationkey", "c_mktsegment", "bal_bucket"))

  /** Generalization-ladder planner: each level coarsens the
    * quasi-identifier further — finer balance buckets, then dropping
    * the segment, then the nation, down to total suppression (level 5,
    * which always satisfies k, so a chosen level always exists). The
    * planner reports every level's group-size floor and marks the
    * FINEST level whose every group meets k. One pass: each row fans
    * into |ladder| (level, key) pairs (the dom9 threshold-ladder
    * shape) instead of re-scanning per level. */
  // (level, DuckDB key expr, Spark key column) — ONE table drives both
  // engines AND both the planner (gov3) and the release (gov4)
  private def sparkKey(level: Int): org.apache.spark.sql.Column = level match {
      case 0 => concat_ws("|", col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000).cast("long"))
      case 1 => concat_ws("|", col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 5000).cast("long"))
      case 2 => concat_ws("|", col("c_nationkey"), floor(col("c_acctbal") / 5000).cast("long"))
      case 3 => col("c_nationkey").cast("string")
      case 4 => floor(col("c_acctbal") / 10000).cast("long").cast("string")
      case _ => lit("all")
    }
  private def duckKey(level: Int): String = level match {
    case 0 => "c_nationkey || '|' || c_mktsegment || '|' || CAST(floor(c_acctbal / 1000) AS BIGINT)"
    case 1 => "c_nationkey || '|' || c_mktsegment || '|' || CAST(floor(c_acctbal / 5000) AS BIGINT)"
    case 2 => "c_nationkey || '|' || CAST(floor(c_acctbal / 5000) AS BIGINT)"
    case 3 => "CAST(c_nationkey AS VARCHAR)"
    case 4 => "CAST(CAST(floor(c_acctbal / 10000) AS BIGINT) AS VARCHAR)"
    case _ => "'all'"
  }
  private val levels = 0 to 5

  /** Shared CTE text: every customer fanned into (level, key) for all
    * six ladder levels, plus per-level group-size floors. */
  private val ladderSql: String =
    s"""fanned AS (
        ${levels.map(l => s"SELECT $l AS level, ${duckKey(l)} AS k FROM customer")
          .mkString(" UNION ALL ")}),
      grouped AS (SELECT level, k, count(*) AS n FROM fanned GROUP BY 1, 2),
      per_level AS (
        SELECT level, CAST(count(*) AS BIGINT) AS n_groups,
          CAST(min(n) AS BIGINT) AS min_n,
          CASE WHEN min(n) >= $K THEN 1 ELSE 0 END AS ok
        FROM grouped GROUP BY level)"""

  /** Spark twin of [[ladderSql]]'s `fanned`. */
  private def fannedDf(s: org.apache.spark.sql.SparkSession, d: String) =
    customer(s, d)
      .select(explode(array(levels.map(l =>
        struct(lit(l).as("level"), sparkKey(l).as("k"))): _*)).as("e"))
      .select(col("e.level").as("level"), col("e.k").as("k"))

  /** Spark twin of [[ladderSql]]'s `per_level`. */
  private def perLevelDf(s: org.apache.spark.sql.SparkSession, d: String) =
    fannedDf(s, d).groupBy("level", "k").agg(count(lit(1)).as("n"))
      .groupBy("level")
      .agg(count(lit(1)).as("n_groups"), min("n").as("min_n"))
      .select(col("level"), col("n_groups"), col("min_n"),
        when(col("min_n") >= K, 1).otherwise(0).as("ok"))

  val gov3Ladder = {
    Q("gov3_generalization_ladder",
      Some(s"""WITH $ladderSql
              SELECT level, n_groups, min_n, ok,
                CASE WHEN ok = 1 AND level = (SELECT min(level) FROM per_level WHERE ok = 1)
                  THEN 1 ELSE 0 END AS chosen
              FROM per_level ORDER BY level"""),
      (s, d) => {
        val perLevel = perLevelDf(s, d)
        // scalar chosen-level via a one-row aggregate broadcast, not a
        // global window (the catalog bans unpartitioned WindowExec).
        // perLevel feeds two consumers — materialize the 6-row result so
        // the chosen branch does not replay the customer scan
        val perLevelM = perLevel.localCheckpoint()
        val chosen = perLevelM.filter(col("ok") === 1)
          .agg(min(col("level")).as("chosen_level"))
        perLevelM.crossJoin(broadcast(chosen))
          .withColumn("chosen",
            when(col("ok") === 1 && col("level") === col("chosen_level"), 1).otherwise(0))
          .drop("chosen_level")
          .orderBy("level")
      })
  }

  /** The release itself: global recoding at the gov3-chosen level —
    * every record re-keyed at the finest level whose EVERY group meets
    * k, so every released group is ≥ k BY CONSTRUCTION (global
    * recoding's guarantee; the chosen level is computed dynamically, so
    * the query is sound at any SF). Composes the planner: the chosen
    * scalar joins back into the fan-out and keeps only that level's
    * keys. */
  val gov4Release = Q("gov4_k_anonymous_release",
    Some(s"""WITH $ladderSql,
            chosen AS (SELECT min(level) AS lvl FROM per_level WHERE ok = 1)
            SELECT g.level AS level, g.k AS released_key, CAST(g.n AS BIGINT) AS n
            FROM grouped g JOIN chosen c ON g.level = c.lvl
            ORDER BY released_key"""),
    (s, d) => {
      // ONE customer scan: materialize the grouped fan-out once; both the
      // planner rollup and the release read the materialized groups
      val grouped = fannedDf(s, d).groupBy("level", "k")
        .agg(count(lit(1)).as("n")).localCheckpoint()
      val perLevel = grouped.groupBy("level")
        .agg(min("n").as("min_n"))
        .filter(col("min_n") >= K)
      val chosen = perLevel.agg(min(col("level")).as("lvl"))
      grouped.join(broadcast(chosen), col("level") === col("lvl"))
        .select(col("level"), col("k").as("released_key"), col("n"))
        .orderBy("released_key")
    })

  /** t-closeness audit (Li/Li/Venkatasubramanian 2007) — completes the
    * governance trio: a k-anonymous, l-diverse group can still leak by
    * SKEW (all its orders urgent when the corpus is uniform). Per gov1
    * QI group, the Earth Mover's Distance between the group's
    * sensitive-attribute distribution (order priority — naturally
    * ordered, 1-URGENT … 5-LOW) and the GLOBAL distribution, with the
    * ordered-metric EMD = (1/(m-1)) · Σ_{i<m} |cumP_i − cumQ_i|.
    *
    * Exact integer algebra throughout (the ts3 discipline): with group
    * counts c_j (size n) and global counts g_j (size N),
    * |cumP_i − cumQ_i| = |cumC_i·N − cumG_i·n| / (n·N), so
    * emd_numer = Σ_i |cumC_i·N − cumG_i·n| is an exact BIGINT,
    * emd = numer / (4·n·N) is ONE division (bit-exact double), and the
    * t = 0.2 gate is the EXACT integer comparison 5·numer ≤ 4·n·N — no
    * float ever decides the flag. One shuffle on the QI key (priorities
    * pivot into 5 conditional sums, no second aggregate); the global
    * distribution is summed FROM the groups and broadcast. */
  val gov5T = {
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val cSql = prios.zipWithIndex.map { case (p, i) =>
      s"CAST(count(*) FILTER (o.o_orderpriority = '$p') AS BIGINT) AS c${i + 1}"
    }.mkString(", ")
    def cum(pfx: String, i: Int) = (1 to i).map(j => s"$pfx$j").mkString(" + ")
    val numerSql = (1 to 4)
      .map(i => s"abs((${cum("c", i)}) * nn - (${cum("g", i)}) * n)").mkString(" + ")
    Q("gov5_t_closeness",
      Some(s"""WITH grp AS (
                SELECT c.c_nationkey, c.c_mktsegment,
                  CAST(floor(c.c_acctbal / 1000) AS BIGINT) AS bal_bucket,
                  CAST(count(*) AS BIGINT) AS n, $cSql
                FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
                GROUP BY 1, 2, 3),
              gtot AS (
                SELECT CAST(sum(n) AS BIGINT) AS nn,
                  ${(1 to 5).map(i => s"CAST(sum(c$i) AS BIGINT) AS g$i").mkString(", ")}
                FROM grp)
              SELECT c_nationkey, c_mktsegment, bal_bucket, n,
                $numerSql AS emd_numer,
                CAST($numerSql AS DOUBLE) / CAST(4 * n * nn AS DOUBLE) AS emd,
                CASE WHEN 5 * ($numerSql) <= 4 * n * nn THEN 1 ELSE 0 END AS t_close
              FROM grp CROSS JOIN gtot
              ORDER BY c_nationkey, c_mktsegment, bal_bucket"""),
      (s, d) => {
        val cCols = prios.zipWithIndex.map { case (p, i) =>
          sum(when(col("o_orderpriority") === p, 1L).otherwise(0L)).as(s"c${i + 1}")
        }
        // grp feeds its own output rows AND the global rollup - materialize
        // the (small, group-count-sized) frame once
        val grp = customer(s, d)
          .join(orders(s, d), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_nationkey"), col("c_mktsegment"),
            floor(col("c_acctbal") / 1000).cast("long").as("bal_bucket"))
          .agg(count(lit(1)).as("n"), cCols: _*)
          .localCheckpoint()
        val gCols = sum("n").as("nn") +: (1 to 5).map(i => sum(s"c$i").as(s"g$i"))
        val glob = grp.agg(gCols.head, gCols.tail: _*)
        def cumC(i: Int): org.apache.spark.sql.Column =
          (1 to i).map(j => col(s"c$j")).reduce(_ + _)
        def cumG(i: Int): org.apache.spark.sql.Column =
          (1 to i).map(j => col(s"g$j")).reduce(_ + _)
        val numer = (1 to 4).map(i => abs(cumC(i) * col("nn") - cumG(i) * col("n"))).reduce(_ + _)
        grp.crossJoin(broadcast(glob))
          .select(col("c_nationkey"), col("c_mktsegment"), col("bal_bucket"), col("n"),
            numer.as("emd_numer"),
            (numer.cast("double") / (lit(4L) * col("n") * col("nn")).cast("double")).as("emd"),
            when(lit(5L) * numer <= lit(4L) * col("n") * col("nn"), 1).otherwise(0).as("t_close"))
          .orderBy("c_nationkey", "c_mktsegment", "bal_bucket")
      })
  }

  def all: Seq[Q] = Seq(gov1K, gov2L, gov3Ladder, gov4Release, gov5T)
}
