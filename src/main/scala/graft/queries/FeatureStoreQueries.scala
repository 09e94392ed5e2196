package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.tables.TestTables._

/** Feature-store inventory: point-in-time correctness for training-set
  * assembly — the "no feature may see the future" discipline that keeps
  * a trained model honest.
  *
  *  - fs1: point-in-time dimension lookup (the as-of union-window shape,
  *    `Temporal.asofJoin` — joinless, one key shuffle);
  *  - fs2: leakage-free feature matrix — every feature aggregates
  *    STRICTLY-BEFORE rows of the label's own stream (one window pass);
  *  - fs3: the leakage AUDIT — the same assembly run strictly and
  *    naively (current row included), with the naive variant provably
  *    leaking on every label. The audit is the query a pipeline runs
  *    over any third-party feature matrix before trusting it.
  */
object FeatureStoreQueries extends QuerySet {

  /** Point-in-time lookup: odd orders (label events) read each
    * customer's priority STATE as of their date, where state changes are
    * the even orders (the training-period dimension). Inclusive as-of:
    * a state change on the label's own date is visible. Labels before
    * any state carry 'none'. */
  val fs1Pit = Q("fs1_point_in_time_join",
    Some("""WITH dim AS (
              SELECT o_custkey, o_orderdate AS d,
                max_by(o_orderpriority, o_orderkey) AS state_priority
              FROM orders WHERE o_orderkey % 2 = 0
              GROUP BY o_custkey, o_orderdate),
            lab AS (
              SELECT o_orderkey, o_custkey, o_orderdate AS d FROM orders
              WHERE o_orderkey % 2 = 1)
            SELECT l.o_orderkey, l.o_custkey, epoch_us(l.d) AS ts_us,
              coalesce(dim.state_priority, 'none') AS state_priority
            FROM lab l ASOF LEFT JOIN dim
              ON l.o_custkey = dim.o_custkey AND l.d >= dim.d
            ORDER BY o_orderkey"""),
    (s, d) => {
      val o = orders(s, d)
      val dim = o.filter(col("o_orderkey") % 2 === 0)
        .groupBy(col("o_custkey"), col("o_orderdate").as("dd"))
        .agg(max_by(col("o_orderpriority"), col("o_orderkey")).as("state_priority"))
      val lab = o.filter(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      graft.ops.Temporal.asofJoin(lab, dim, Seq("o_custkey"),
          "o_orderdate", "dd", Seq("state_priority"))
        .select(col("o_orderkey"), col("o_custkey"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("ts_us"),
          coalesce(col("state_priority"), lit("none")).as("state_priority"))
        .orderBy("o_orderkey")
    })

  /** Leakage-free training matrix: for every click label, features from
    * the user's STRICTLY-PRIOR activity — event count, money total,
    * recency, prior views. One window over (user, ts) with a RANGE
    * …-1 frame: strictness is TIME-based (ts_us < current), so a
    * same-instant event never counts as "prior" even under timestamp
    * ties — row-position strictness (ROWS … 1 PRECEDING) would leak a
    * tied event that happens to sort earlier by id (ADVICE r9; the
    * Round10 spec plants exactly that tie). The label rows are then
    * filtered out of the same pass (features for non-label rows cost
    * nothing extra — the window computes once per event). */
  val fs2Matrix = Q("fs2_training_matrix",
    Some("""WITH ev AS (
              SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
                CAST(round(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS cents
              FROM events),
            f AS (
              SELECT user_id, event_id, event_type, ts_us,
                CAST(count(*) OVER w AS BIGINT) AS n_prior,
                CAST(coalesce(sum(cents) OVER w, 0) AS BIGINT) AS cents_prior,
                max(ts_us) OVER w AS last_ts,
                CAST(coalesce(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) OVER w, 0) AS BIGINT) AS n_prior_views
              FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
                RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
            SELECT event_id, user_id, ts_us, n_prior, cents_prior,
              coalesce(ts_us - last_ts, -1) AS us_since_last, n_prior_views
            FROM f WHERE event_type = 'click' ORDER BY event_id"""),
    (s, d) => {
      val ev = events(s, d).select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"),
        round(col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
        .rangeBetween(Window.unboundedPreceding, -1)
      ev.select(col("event_id"), col("user_id"), col("event_type"), col("ts_us"),
          count(lit(1)).over(w).as("n_prior"),
          coalesce(sum(col("cents")).over(w), lit(0L)).as("cents_prior"),
          max(col("ts_us")).over(w).as("last_ts"),
          coalesce(sum(when(col("event_type") === "view", 1L).otherwise(0L)).over(w), lit(0L))
            .as("n_prior_views"))
        .filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts_us"), col("n_prior"),
          col("cents_prior"),
          coalesce(col("ts_us") - col("last_ts"), lit(-1L)).as("us_since_last"),
          col("n_prior_views"))
        .orderBy("event_id")
    })

  /** Leakage audit: run the SAME feature assembly strictly (RANGE frame
    * ending at ts_us − 1, fs2's time-based strictness — a same-instant
    * event is NEVER prior, so zero leaks holds even under timestamp
    * ties, not just on tie-free fixtures) and naively (ROWS frame
    * including the current row) and count labels whose newest
    * contributing timestamp is ≥ the label's own — the naive variant
    * leaks on every label, the strict one never does. This is the audit
    * to run over any externally-supplied feature matrix. */
  val fs3Audit = Q("fs3_leakage_audit",
    Some("""WITH ev AS (
              SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events),
            f AS (
              SELECT event_type, ts_us,
                max(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us
                  RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS strict_ts,
                max(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS naive_ts
              FROM ev),
            labels AS (SELECT * FROM f WHERE event_type = 'click')
            SELECT method, n_labels, n_leaks FROM (
              SELECT 'strict' AS method, CAST(count(*) AS BIGINT) AS n_labels,
                CAST(sum(CASE WHEN strict_ts >= ts_us THEN 1 ELSE 0 END) AS BIGINT) AS n_leaks
              FROM labels
              UNION ALL
              SELECT 'naive', CAST(count(*) AS BIGINT),
                CAST(sum(CASE WHEN naive_ts >= ts_us THEN 1 ELSE 0 END) AS BIGINT)
              FROM labels)
            ORDER BY method"""),
    (s, d) => {
      val ev = events(s, d).select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      val ordTs = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      val ord = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      val labels = ev
        .select(col("event_type"), col("ts_us"),
          max(col("ts_us")).over(ordTs.rangeBetween(Window.unboundedPreceding, -1)).as("strict_ts"),
          max(col("ts_us")).over(ord.rowsBetween(Window.unboundedPreceding, 0)).as("naive_ts"))
        .filter(col("event_type") === "click")
      val strict = labels.agg(count(lit(1)).as("n_labels"),
        sum(when(col("strict_ts") >= col("ts_us"), 1L).otherwise(0L)).as("n_leaks"))
        .select(lit("strict").as("method"), col("n_labels"), col("n_leaks"))
      val naive = labels.agg(count(lit(1)).as("n_labels"),
        sum(when(col("naive_ts") >= col("ts_us"), 1L).otherwise(0L)).as("n_leaks"))
        .select(lit("naive").as("method"), col("n_labels"), col("n_leaks"))
      strict.unionByName(naive).orderBy("method")
    })

  /** Deterministic stratified train/val/test split: each document lands
    * in a split by a salted content-free hash of its id (reproducible
    * forever, no RNG state), 80/10/10 within every source stratum. The
    * gate emits per-(stratum, split) counts and the realized fraction —
    * the drift report a split re-run is checked against. Map-only +
    * one aggregate. */
  /** ONE copy of the salted-hash split assignment (fs4 and fs5 both
    * ride it): yields CTE `tagged(source, n_chars, split)`. */
  private val splitSql: String =
    """tagged AS (
        SELECT source, n_chars,
          CASE WHEN uu < 0.8 THEN 'train' WHEN uu < 0.9 THEN 'val' ELSE 'test' END AS split
        FROM (
          SELECT source, n_chars,
            CAST(list_sum(list_transform(range(1, 13), i ->
              CAST(strpos('0123456789abcdef', substr(md5(concat('split:', CAST(doc_id AS VARCHAR))), CAST(i AS INT), 1)) - 1 AS BIGINT)
                * (1::BIGINT << (4 * (12 - CAST(i AS INT)))))) AS DOUBLE) / 281474976710656.0 AS uu
          FROM documents))"""

  /** Spark twin of [[splitSql]]. */
  private def taggedDf(s: org.apache.spark.sql.SparkSession, d: String) = {
    val uu = conv(substring(md5(concat(lit("split:"),
      col("doc_id").cast("string")).cast("binary")), 1, 12), 16, 10)
      .cast("long").cast("double") / lit(281474976710656.0)
    documents(s, d).select(col("source"), col("n_chars"),
      when(uu < 0.8, "train").when(uu < 0.9, "val").otherwise("test").as("split"))
  }

  val fs4Split = Q("fs4_stratified_split",
    Some(s"""WITH $splitSql,
            counts AS (
              SELECT source, split, CAST(count(*) AS BIGINT) AS n FROM tagged GROUP BY 1, 2)
            SELECT source, split, n,
              CAST(n AS DOUBLE) / CAST(sum(n) OVER (PARTITION BY source) AS DOUBLE) AS frac
            FROM counts ORDER BY source, split"""),
    (s, d) => {
      val counts = taggedDf(s, d).groupBy("source", "split").agg(count(lit(1)).as("n"))
      counts.select(col("source"), col("split"), col("n"),
          (col("n").cast("double") /
            sum(col("n")).over(Window.partitionBy(col("source"))).cast("double")).as("frac"))
        .orderBy("source", "split")
    })

  /** Split-balance drift audit: PSI of the document-length distribution
    * between the train and val splits — a hash split should be balanced
    * on every feature, and this is the audit that proves it (the same
    * smoothed-PSI machinery as x33's temporal drift, pointed at the
    * split boundary; a biased splitter shows fat psi terms here long
    * before a model does). Rides the shared split fragment. */
  val fs5Drift = {
    val B = 11 // 10 width-60 n_chars bands + overflow
    Q("fs5_split_drift",
      Some(s"""WITH $splitSql,
              b AS (SELECT split, least(n_chars // 60, 10) AS bucket
                    FROM tagged WHERE split IN ('train', 'val')),
              cnt AS (SELECT bucket,
                  CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
                  CAST(sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS n_val
                FROM b GROUP BY bucket),
              ${OracleSql.psiSql(B, "n_train", "n_val", "p_train", "p_val")}"""),
      (s, d) => {
        val b = taggedDf(s, d).filter(col("split").isin("train", "val"))
          .select(col("split"), least(expr("n_chars div 60"), lit(10L)).as("bucket"))
        val cnt = b.groupBy("bucket").agg(
          sum(when(col("split") === "train", 1L).otherwise(0L)).as("n_train"),
          sum(when(col("split") === "val", 1L).otherwise(0L)).as("n_val"))
        graft.ops.Drift.psiTerms(cnt, B, "n_train", "n_val", "p_train", "p_val")
      })
  }

  def all: Seq[Q] = Seq(fs1Pit, fs2Matrix, fs3Audit, fs4Split, fs5Drift)
}
