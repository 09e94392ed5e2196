package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.TestTables._

/** Relational operator inventory over the TPC-H-ish tables
  * (SURVEY.md §2.3 J1–J6, §2.4 A2/A4/A8/A10(+rollup), §2.6 T1/T3/T4,
  * §2.7 U-family).
  *
  * Scale notes: J3 broadcasts the small build side explicitly; aggregates
  * are partial-agg friendly (plain hash aggregates on low-cardinality
  * keys); anti joins ship only the key column of the probe side.
  */
object Relational extends QuerySet {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(18,2)")

  /** Money sums go through decimal internally (exact, order-independent)
    * but are EMITTED as integer cents / 1e-4 units (BIGINT): DECIMAL and
    * HUGEINT outputs hash-diverge at the driver (pandas coerces them to
    * float64 — "1.10" becomes 1.1 — while parquet keeps Decimal/int64). */
  val q1Pricing = Q("q1_pricing_summary",
    Some("""SELECT l_returnflag, l_linestatus,
            CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_qty_cents,
            CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_base_price_cents,
            CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(9,2)))) * 10000 AS BIGINT) AS sum_disc_price_e4,
            CAST(CAST(sum(CAST(l_discount AS DECIMAL(9,2))) * 100 AS BIGINT) AS DOUBLE) / 100 / count(*) AS avg_disc,
            count(*) AS n
            FROM lineitem GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus"""),
    (s, d) => lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        (sum(dec(col("l_quantity"))) * 100).cast("long").as("sum_qty_cents"),
        (sum(dec(col("l_extendedprice"))) * 100).cast("long").as("sum_base_price_cents"),
        (sum(dec(col("l_extendedprice")) * (lit(1) - col("l_discount").cast("decimal(9,2)"))) * 10000)
          .cast("long").as("sum_disc_price_e4"),
        ((sum(col("l_discount").cast("decimal(9,2)")) * 100).cast("long").cast("double") / 100 / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus"))

  /** J1: left-anti join — customers with no orders (the Camelot-beats-vision
    * keep-only-missing-keys shape). */
  val j1Anti = Q("j1_anti_join",
    Some("""SELECT c_custkey, c_name FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
            ORDER BY c_custkey"""),
    (s, d) => customer(s, d)
      .join(orders(s, d).select("o_custkey").distinct(),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey"))

  /** J3: broadcast equi-join + backfill (fact enriched from a dim) and a
    * grouped rollup of the joined result. */
  val j3Broadcast = Q("j3_broadcast_join",
    Some("""SELECT o_orderpriority,
            CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(9,2)))) * 10000 AS BIGINT) AS revenue_e4,
            count(*) AS n
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
    (s, d) => lineitem(s, d)
      .join(broadcast(orders(s, d)), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        (sum(dec(col("l_extendedprice")) * (lit(1) - col("l_discount").cast("decimal(9,2)"))) * 10000)
          .cast("long").as("revenue_e4"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority"))

  /** J4: distinct-keys-then-join (retrieval→Q&A shape): distinct event users
    * joined to the customer dim, rolled up by segment. */
  val j4DistinctJoin = Q("j4_distinct_join",
    Some("""SELECT c_mktsegment, count(*) AS n_users
            FROM (SELECT DISTINCT user_id FROM events) u
            JOIN customer ON c_custkey = user_id
            GROUP BY c_mktsegment ORDER BY c_mktsegment"""),
    (s, d) => events(s, d).select("user_id").distinct()
      .join(broadcast(customer(s, d)), col("c_custkey") === col("user_id"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_users"))
      .orderBy("c_mktsegment"))

  /** J5: small-dim chain join + first-match-per-group (row_number=1). */
  val j5FirstMatch = Q("j5_first_match_join",
    Some("""SELECT r_name, s_name, s_acctbal FROM (
              SELECT r.r_name, s.s_name, s.s_acctbal,
                     row_number() OVER (PARTITION BY r.r_name ORDER BY s.s_acctbal DESC, s.s_suppkey) AS rn
              FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
                              JOIN region r ON n.n_regionkey = r.r_regionkey) t
            WHERE rn = 1 ORDER BY r_name"""),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val joined = supplier(s, d)
        .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d)), col("n_regionkey") === col("r_regionkey"))
      val w = Window.partitionBy(col("r_name")).orderBy(col("s_acctbal").desc, col("s_suppkey"))
      joined.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("r_name", "s_name", "s_acctbal")
        .orderBy("r_name")
    })

  /** A4: validation stats — min/max + duplicate-key detection via
    * group-count (hash aggregate). */
  val a4Validation = Q("a4_validation_stats",
    Some("""SELECT o_custkey, count(*) AS n_orders,
            CAST(min(o_orderdate) AS DATE) AS first_order, CAST(max(o_orderdate) AS DATE) AS last_order
            FROM orders GROUP BY o_custkey HAVING count(*) > 12 ORDER BY o_custkey"""),
    (s, d) => orders(s, d).groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        min(col("o_orderdate")).cast("date").as("first_order"),
        max(col("o_orderdate")).cast("date").as("last_order"))
      .filter(col("n_orders") > 12)
      .orderBy("o_custkey"))

  /** A8: grouped average + grade banding (when-chain). */
  val a8Banding = Q("a8_avg_banding",
    Some("""SELECT event_type, round(avg(value), 6) AS avg_value,
            CASE WHEN avg(value) >= 120 THEN 'high' WHEN avg(value) >= 80 THEN 'mid' ELSE 'low' END AS band
            FROM events GROUP BY event_type ORDER BY event_type"""),
    (s, d) => events(s, d).groupBy("event_type")
      .agg(round(avg(col("value")), 6).as("avg_value"),
        when(avg(col("value")) >= 120, "high").when(avg(col("value")) >= 80, "mid")
          .otherwise("low").as("band"))
      .orderBy("event_type"))

  /** A10: distinct-key summaries — countDistinct + sorted collect_set. */
  val a10Distinct = Q("a10_distinct_sets",
    Some("""SELECT user_id, count(DISTINCT event_type) AS n_types,
            (SELECT string_agg(t, ',' ORDER BY t)
             FROM (SELECT DISTINCT event_type AS t FROM events e2 WHERE e2.user_id = e.user_id) x) AS types
            FROM events e GROUP BY user_id ORDER BY user_id"""),
    (s, d) => events(s, d).groupBy("user_id")
      // one aggregate: n_types derives from the collected set — a separate
      // countDistinct would add an Expand + second aggregation pass
      .agg(sort_array(collect_set(col("event_type"))).as("_set"))
      .select(col("user_id"), size(col("_set")).cast("long").as("n_types"),
        concat_ws(",", col("_set")).as("types"))
      .orderBy("user_id"))

  /** Rollup (grouping sets) — declared per SURVEY §2.4 to lock the
    * capability Spark adds over the reference. */
  val a11Rollup = Q("a11_rollup",
    Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
            CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_qty_cents
            FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
            ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""),
    (s, d) => lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), (sum(dec(col("l_quantity"))) * 100).cast("long").as("sum_qty_cents"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first))

  /** CUBE companion to a11: every grouping-set combination in one Expand —
    * the §2.4 multi-dimensional summary the rollup can't express (it skips
    * the (∅, l_linestatus) sets). Same cents-BIGINT money convention. */
  val a14Cube = Q("a14_cube",
    Some("""SELECT l_returnflag, l_linestatus, count(*) AS n,
            CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_qty_cents
            FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
            ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""),
    (s, d) => lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), (sum(dec(col("l_quantity"))) * 100).cast("long").as("sum_qty_cents"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first))

  /** T1: global top-k with deterministic tiebreak
    * (plans as TakeOrderedAndProject — no full sort). */
  val t1TopK = Q("t1_topk",
    Some("""SELECT event_id, user_id, value FROM events
            ORDER BY value DESC, event_id LIMIT 10"""),
    (s, d) => events(s, d).select("event_id", "user_id", "value")
      .orderBy(col("value").desc, col("event_id")).limit(10))

  /** T3/T4: ordered scan + newest-N. */
  val t4LastN = Q("t4_last_n",
    Some("""SELECT event_id, user_id, event_type FROM events
            ORDER BY ts DESC, event_id DESC LIMIT 50"""),
    (s, d) => events(s, d).select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      .orderBy(col("ts").desc, col("event_id").desc).limit(50).drop("ts"))

  /** U2: anti-join-then-union (prefer-primary): high-value lineitems kept
    * wholesale, low-value ones only for orderkeys with no high-value item. */
  val u2UnionAnti = Q("u2_union_after_anti",
    Some("""WITH hi AS (SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem WHERE l_extendedprice >= 5000),
                 lo AS (SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem WHERE l_extendedprice < 5000)
            SELECT * FROM (
              SELECT * FROM hi
              UNION ALL
              SELECT * FROM lo WHERE NOT EXISTS (SELECT 1 FROM hi WHERE hi.l_orderkey = lo.l_orderkey)
            ) t ORDER BY l_orderkey, l_linenumber"""),
    (s, d) => {
      val li = lineitem(s, d).select("l_orderkey", "l_linenumber", "l_extendedprice")
      val hi = li.filter(col("l_extendedprice") >= 5000)
      val lo = li.filter(col("l_extendedprice") < 5000)
      graft.ops.TableOps.preferPrimary(hi, lo, Seq("l_orderkey"))
        .orderBy("l_orderkey", "l_linenumber")
    })

  /** U4: relational EXCEPT — event users that are not customers. */
  val u4Except = Q("u4_except",
    Some("""SELECT id FROM (
              SELECT DISTINCT user_id AS id FROM events
              EXCEPT
              SELECT c_custkey AS id FROM customer) t ORDER BY id"""),
    (s, d) => events(s, d).select(col("user_id").as("id")).distinct()
      .except(customer(s, d).select(col("c_custkey").as("id")))
      .orderBy("id"))

  /** §2.7 set-op completion: INTERSECT (the u4 EXCEPT twin) — users who
    * both emitted events AND exist as customers. Spark plans
    * INTERSECT DISTINCT as a left-semi aggregate join — one shuffle on
    * the id, no data duplication. */
  val u5Intersect = Q("u5_intersect",
    Some("""SELECT id FROM (
              SELECT DISTINCT user_id AS id FROM events
              INTERSECT
              SELECT c_custkey AS id FROM customer) t ORDER BY id"""),
    (s, d) => events(s, d).select(col("user_id").as("id")).distinct()
      .intersect(customer(s, d).select(col("c_custkey").as("id")))
      .orderBy("id"))

  /** S9: projection + order (doc listing). */
  val s9Listing = Q("s9_doc_listing",
    Some("SELECT doc_id, source, lang, n_chars FROM documents ORDER BY doc_id"),
    (s, d) => documents(s, d).select("doc_id", "source", "lang", "n_chars").orderBy("doc_id"))

  /** ONE copy of the synthesized 3-wave SCD2 version history, shared by
    * j8 and j8b (Spark builder + oracle CTE block) — wave 2 changes every
    * 4th key's segment, wave 3 changes every 8th EXCEPT every 16th, which
    * repeats its wave-2 value and must be suppressed by change
    * detection. */
  private def scd2Hist(c: DataFrame): DataFrame =
    c.select(col("c_custkey"), lit(1L).as("ts"), col("c_mktsegment").as("segment"))
      .unionByName(c.filter(col("c_custkey") % 4 === 0)
        .select(col("c_custkey"), lit(2L).as("ts"),
          concat(lit("SEG2_"), (col("c_custkey") % 3).cast("string")).as("segment")))
      .unionByName(c.filter(col("c_custkey") % 8 === 0)
        .select(col("c_custkey"), lit(3L).as("ts"),
          when(col("c_custkey") % 16 === 0,
            concat(lit("SEG2_"), (col("c_custkey") % 3).cast("string")))
            .otherwise(lit("SEG3")).as("segment")))

  private val scd2OracleCtes: String =
    """hist AS (
              SELECT c_custkey, CAST(1 AS BIGINT) AS ts, c_mktsegment AS segment FROM customer
              UNION ALL
              SELECT c_custkey, 2, concat('SEG2_', CAST(c_custkey % 3 AS VARCHAR))
              FROM customer WHERE c_custkey % 4 = 0
              UNION ALL
              SELECT c_custkey, 3,
                CASE WHEN c_custkey % 16 = 0 THEN concat('SEG2_', CAST(c_custkey % 3 AS VARCHAR))
                     ELSE 'SEG3' END
              FROM customer WHERE c_custkey % 8 = 0),
            chg AS (SELECT c_custkey, ts, segment FROM (
                SELECT c_custkey, ts, segment,
                  lag(segment) OVER (PARTITION BY c_custkey ORDER BY ts) AS prev
                FROM hist) t
              WHERE prev IS NULL OR segment <> prev),
            v AS (SELECT c_custkey, segment, ts AS valid_from,
                lead(ts) OVER (PARTITION BY c_custkey ORDER BY ts) AS valid_to
              FROM chg)"""

  /** SCD type-2 merge (the versioned-dimension half of incremental
    * ingestion) over the shared 3-wave history. Both windows partition by
    * the business key (one shuffle, scales with per-key versions).
    * Exercises: change suppression, interval chaining, open-interval
    * `is_current`. */
  val j8Scd2 = Q("j8_scd2_merge",
    Some(s"""WITH $scd2OracleCtes
            SELECT c_custkey, segment, valid_from, valid_to,
              CASE WHEN valid_to IS NULL THEN true ELSE false END AS is_current
            FROM v ORDER BY c_custkey, valid_from"""),
    (s, d) => graft.ops.TableOps.scd2(scd2Hist(customer(s, d)), Seq("c_custkey"), "ts", Seq("segment"))
      .select("c_custkey", "segment", "valid_from", "valid_to", "is_current")
      .orderBy("c_custkey", "valid_from"))

  /** Time-travel (as-of) read over the j8 SCD2 history: the dimension
    * state at ts=2 — every key resolves to exactly one version via the
    * half-open interval `valid_from <= t < valid_to` (open intervals
    * count as current). A map-only filter over the versioned table: the
    * read side of SCD2 costs one predicate, never a window. */
  val j8bScd2AsOf = Q("j8b_scd2_asof",
    Some(s"""WITH $scd2OracleCtes
            SELECT c_custkey, segment AS segment_at_t2
            FROM v WHERE valid_from <= 2 AND (valid_to IS NULL OR valid_to > 2)
            ORDER BY c_custkey"""),
    (s, d) => graft.ops.TableOps.scd2(scd2Hist(customer(s, d)), Seq("c_custkey"), "ts", Seq("segment"))
      .filter(col("valid_from") <= 2 && (col("valid_to").isNull || col("valid_to") > 2))
      .select(col("c_custkey"), col("segment").as("segment_at_t2"))
      .orderBy("c_custkey"))

  def all: Seq[Q] = Seq(q1Pricing, j1Anti, j3Broadcast, j4DistinctJoin, j5FirstMatch,
    a4Validation, a8Banding, a10Distinct, a11Rollup, a14Cube, t1TopK, t4LastN, u2UnionAnti,
    u4Except, u5Intersect, s9Listing, j8Scd2, j8bScd2AsOf)
}
