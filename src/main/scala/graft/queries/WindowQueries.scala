package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.tables.TestTables._
import graft.ops.{Layout, Merge, Sections, Chunking}

/** Window / order-dependent operator inventory over `events`
  * (SURVEY.md §2.5 W1–W6, §2.4 A1/A9, §2.8 F17).
  *
  * `events` plays the role of the ordered block stream: `user_id` ↦ doc_id
  * partition, `ts` ↦ reading order, `event_type` ↦ block type. All stages
  * share one `(user_id)` hash partitioning + `(ts, event_id)` sort, so a
  * multi-stage window pipeline incurs a single shuffle.
  */
object WindowQueries extends QuerySet {

  /** W1: reading-order ordinal — coarse bucket + fine key + stable id. */
  val w1Order = Q("w1_reading_order",
    Some("""SELECT event_id, user_id,
            row_number() OVER (PARTITION BY user_id ORDER BY CAST(floor(value/50) AS BIGINT), epoch_us(ts), event_id) AS ord
            FROM events ORDER BY event_id"""),
    (s, d) => Layout.readingOrder(
        events(s, d).withColumn("ts_us", unix_micros(col("ts"))),
        Seq(col("user_id")), floor(col("value") / 50), col("ts_us"), col("event_id"))
      .select("event_id", "user_id", "ord").orderBy("event_id"))

  /** W2: gaps-and-islands sessionization (30-min inactivity gap). */
  val w2Session = Q("w2_sessionize",
    Some("""WITH flagged AS (
              SELECT user_id, event_id, ts, value,
                CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS brk
              FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            sess AS (
              SELECT user_id, event_id, value,
                CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
              FROM flagged)
            SELECT user_id, session_id, count(*) AS n_events,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS session_value_cents
            FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_id"""),
    (s, d) => {
      val withSession = Merge.sessionize(
        events(s, d).withColumn("ts_us", unix_micros(col("ts"))),
        Seq(col("user_id")), col("ts"), col("event_id"), gapSeconds = 1800)
      withSession.groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          (sum(col("value").cast("decimal(18,2)")) * 100).cast("long").as("session_value_cents"))
        .orderBy("user_id", "session_id")
    })

  /** W3: section forward-fill — most recent signup event id per user. */
  val w3Ffill = Q("w3_forward_fill",
    Some("""SELECT event_id, user_id,
            last_value(CASE WHEN event_type = 'signup' THEN event_id END IGNORE NULLS)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup
            FROM events ORDER BY event_id"""),
    (s, d) => Sections.forwardFill(events(s, d), Seq(col("user_id")),
        struct(col("ts"), col("event_id")),
        when(col("event_type") === "signup", col("event_id")), "last_signup")
      .select("event_id", "user_id", "last_signup").orderBy("event_id"))

  /** W4 (windowed form): chunk ids from running char budget + explicit
    * breaks, over the documents stream partitioned by source. */
  val w4Chunk = Q("w4_chunk_boundaries",
    Some("""SELECT doc_id, source, concat(
              CAST(CAST(floor((sum(n_chars) OVER w - 1) / 1200) AS BIGINT) AS VARCHAR), '_',
              CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) OVER w AS VARCHAR)) AS chunk_id
            FROM documents
            WINDOW w AS (PARTITION BY source ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            ORDER BY doc_id"""),
    (s, d) => Chunking.chunkIdApprox(documents(s, d), Seq(col("source")), col("doc_id"),
        col("n_chars"), col("lang") === "en", maxChars = 1200)
      .select("doc_id", "source", "chunk_id").orderBy("doc_id"))

  /** W5: sub-group split — signup events open a new sub-group per user
    * (header-row split shape), rolled up per sub-group. */
  val w5Split = Q("w5_subgroup_split",
    Some("""WITH g AS (
              SELECT user_id, event_id, value,
                CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sub_id
              FROM events)
            SELECT user_id, sub_id, count(*) AS n, min(event_id) AS first_event
            FROM g GROUP BY user_id, sub_id ORDER BY user_id, sub_id"""),
    (s, d) => Merge.islandId(events(s, d), Seq(col("user_id")),
        struct(col("ts"), col("event_id")),
        when(col("event_type") === "signup", 1L).otherwise(0L), "sub_id")
      .groupBy("user_id", "sub_id")
      .agg(count(lit(1)).as("n"), min("event_id").as("first_event"))
      .orderBy("user_id", "sub_id"))

  /** W6/P11: running budget cutoff — keep events while the per-user
    * cumulative value stays within 500. */
  val w6Budget = Q("w6_running_budget",
    Some("""SELECT event_id, user_id FROM (
              SELECT event_id, user_id,
                sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
              FROM events) t WHERE running <= 500 ORDER BY event_id"""),
    (s, d) => {
      // order by (ts, event_id): encode both in one sort key via struct order
      val df = events(s, d)
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      df.withColumn("running", sum(col("value")).over(w))
        .filter(col("running") <= 500)
        .select("event_id", "user_id").orderBy("event_id")
    })

  /** A1: exact per-group median (the page-font-median shape). */
  val a1Median = Q("a1_group_median",
    Some("""SELECT event_type, round(quantile_cont(value, 0.5), 6) AS median_value
            FROM events GROUP BY event_type ORDER BY event_type"""),
    (s, d) => events(s, d).groupBy("event_type")
      .agg(round(percentile(col("value"), lit(0.5)), 6).as("median_value"))
      .orderBy("event_type"))

  /** A9: argmax per group — the best-match row via row_number. */
  val a9Argmax = Q("a9_argmax",
    Some("""SELECT user_id, event_id, value FROM (
              SELECT user_id, event_id, value,
                row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
              FROM events) t WHERE rn = 1 ORDER BY user_id"""),
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("value").desc, col("event_id"))
      events(s, d).withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select("user_id", "event_id", "value").orderBy("user_id")
    })

  /** F17: any-in-partition flag broadcast — users that ever errored. */
  val f17AnyFlag = Q("f17_partition_flag",
    Some("""SELECT event_id, user_id,
            CASE WHEN max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                      OVER (PARTITION BY user_id) = 1 THEN true ELSE false END AS user_has_error
            FROM events ORDER BY event_id"""),
    (s, d) => Sections.anyInPartition(events(s, d), Seq(col("user_id")),
        col("event_type") === "error", "user_has_error")
      .select("event_id", "user_id", "user_has_error").orderBy("event_id"))

  /** W4 (exact): stateful chunk scan — the running char budget resets at
    * each break, matching the reference's loop exactly. Spark side is
    * `groupByKey(source).flatMapGroups` (one doc-stream per group, fully
    * distributed); the oracle replays the same recursion as a recursive CTE. */
  val w4Exact = Q("w4_chunk_exact",
    Some("""WITH RECURSIVE base AS (
              SELECT source, doc_id, n_chars, (lang = 'en') AS brk,
                row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
              FROM documents),
            scan AS (
              SELECT source, rn, doc_id,
                CASE WHEN brk OR n_chars > 1200 THEN 1 ELSE 0 END AS chunk,
                CAST(n_chars AS BIGINT) AS run
              FROM base WHERE rn = 1
              UNION ALL
              SELECT b.source, b.rn, b.doc_id,
                s.chunk + CASE WHEN b.brk OR s.run + b.n_chars > 1200 THEN 1 ELSE 0 END,
                CASE WHEN b.brk OR s.run + b.n_chars > 1200 THEN b.n_chars ELSE s.run + b.n_chars END
              FROM scan s JOIN base b ON b.source = s.source AND b.rn = s.rn + 1)
            SELECT source, doc_id, CAST(chunk AS BIGINT) AS chunk_id
            FROM scan ORDER BY source, doc_id"""),
    (s, d) => Chunking.chunkIdExact(
        documents(s, d).withColumn("brk", col("lang") === "en"),
        "source", "doc_id", "n_chars", "brk", maxChars = 1200)
      .orderBy("source", "doc_id"))

  /** Sequence packing — pre-training batch assembly: documents are packed
    * greedily into fixed token-budget training sequences, within
    * deterministic distributed buckets (doc_id div 50) so the scan
    * parallelizes while every bucket's packing is exact and reproducible.
    * Reuses the W4 exact stateful chunker with tokens as the length. */
  val x7Pack = Q("x7_sequence_pack",
    Some("""WITH RECURSIVE d AS (
              SELECT doc_id, doc_id // 50 AS bucket,
                coalesce(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')), 0) AS ntok
              FROM documents),
            base AS (SELECT bucket, doc_id, ntok,
                row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn FROM d),
            scan AS (
              SELECT bucket, rn, doc_id,
                CASE WHEN ntok > 256 THEN 1 ELSE 0 END AS chunk,
                CAST(ntok AS BIGINT) AS run
              FROM base WHERE rn = 1
              UNION ALL
              SELECT b.bucket, b.rn, b.doc_id,
                s.chunk + CASE WHEN s.run + b.ntok > 256 THEN 1 ELSE 0 END,
                CASE WHEN s.run + b.ntok > 256 THEN b.ntok ELSE s.run + b.ntok END
              FROM scan s JOIN base b ON b.bucket = s.bucket AND b.rn = s.rn + 1)
            SELECT bucket, doc_id, CAST(chunk AS BIGINT) AS seq_id
            FROM scan ORDER BY bucket, doc_id"""),
    (s, d) => Chunking.chunkIdExact(
        documents(s, d)
          .withColumn("bucket", expr("doc_id div 50"))
          // coalesce in BOTH engines: a NULL text would null-poison the
          // DuckDB running sum but CRASH the non-nullable Dataset encoder
          // in chunkIdExact — make the zero-length semantics explicit
          .withColumn("ntok", coalesce(graft.ops.TextAnalysis.tokenCount(col("text")), lit(0)))
          .withColumn("nobrk", lit(false)),
        "bucket", "doc_id", "ntok", "nobrk", maxChars = 256)
      .select(col("bucket").cast("long").as("bucket"), col("doc_id"), col("chunk_id").as("seq_id"))
      .orderBy("bucket", "doc_id"))

  /** As-of join (attribution): each click event joins the latest view of
    * the same user at-or-before its timestamp. Oracle: DuckDB's native
    * ASOF LEFT JOIN — the Spark side must reproduce an actual engine
    * primitive, inclusive-tie semantics included. Views are pre-reduced to
    * one row per (user, ts) so the carried value is order-independent. */
  val j7Asof = Q("j7_asof_join",
    Some("""WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
            r AS (SELECT user_id, ts, max(event_id) AS view_id
                  FROM events WHERE event_type = 'view' GROUP BY user_id, ts)
            SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us, r.view_id
            FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
            ORDER BY event_id"""),
    (s, d) => {
      val ev = events(s, d)
      val clicks = ev.filter(col("event_type") === "click").select("event_id", "user_id", "ts")
      val views = ev.filter(col("event_type") === "view")
        .groupBy("user_id", "ts").agg(max("event_id").as("view_id"))
      graft.ops.Temporal.asofJoin(clicks, views, Seq("user_id"), "ts", "ts", Seq("view_id"))
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"), col("view_id"))
        .orderBy("event_id")
    })

  /** Keyless range join (incident attribution): every error event opens a
    * 5-minute incident window; count the clicks landing in each window.
    * The oracle is a plain inequality join; the Spark side must reach the
    * same pairs through the bucket equi-join (PlanSpec asserts no
    * nested-loop plan). */
  val r1Range = Q("r1_range_join",
    Some("""WITH inc AS (SELECT event_id AS incident_id, epoch_us(ts) AS s
                         FROM events WHERE event_type = 'error'),
            p AS (SELECT epoch_us(ts) AS t FROM events WHERE event_type = 'click')
            SELECT incident_id, CAST(count(*) AS BIGINT) AS n_clicks
            FROM inc JOIN p ON p.t >= inc.s AND p.t < inc.s + 300000000
            GROUP BY incident_id ORDER BY incident_id"""),
    (s, d) => {
      val ev = events(s, d)
      val incidents = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("incident_id"),
          unix_micros(col("ts")).as("s"),
          (unix_micros(col("ts")) + 300000000L).as("e"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(unix_micros(col("ts")).as("t"))
      graft.ops.Temporal.rangeJoin(clicks, incidents, "t", "s", "e", maxLen = 300000000L)
        .groupBy("incident_id").agg(count(lit(1)).as("n_clicks"))
        .orderBy("incident_id")
    })

  /** Keyed interval-OVERLAP join (the r1 point-in-interval generalized to
    * interval×interval — A/V-segment alignment, incident-vs-session
    * forensics): per user, every purchase window [ts, ts+2h) paired with
    * the error windows [ts, ts+1h) it overlaps, with the overlap length.
    * `Temporal.overlapJoin` buckets both sides so the plan is a hash
    * equi-join on (user, bucket) with each pair meeting exactly once in
    * the bucket of greatest(start) — no nested loop, no dedup pass. */
  val r2Overlap = Q("r2_interval_overlap",
    Some("""WITH p AS (SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS ps,
                         epoch_us(ts) + 7200000000 AS pe
                       FROM events WHERE event_type = 'purchase'),
            er AS (SELECT event_id AS error_id, user_id, epoch_us(ts) AS es,
                     epoch_us(ts) + 3600000000 AS ee
                   FROM events WHERE event_type = 'error')
            SELECT p.user_id, purchase_id, error_id,
              least(pe, ee) - greatest(ps, es) AS overlap_us
            FROM p JOIN er ON er.user_id = p.user_id AND p.ps < er.ee AND er.es < p.pe
            ORDER BY purchase_id, error_id"""),
    (s, d) => {
      val ev = events(s, d)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          unix_micros(col("ts")).as("ps"),
          (unix_micros(col("ts")) + 7200000000L).as("pe"))
      val er = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("error_id"), col("user_id"),
          unix_micros(col("ts")).as("es"),
          (unix_micros(col("ts")) + 3600000000L).as("ee"))
      graft.ops.Temporal.overlapJoin(p, er, "user_id", "ps", "pe", "es", "ee",
          maxLen = 7200000000L)
        .select(col("user_id"), col("purchase_id"), col("error_id"),
          (least(col("pe"), col("ee")) - greatest(col("ps"), col("es"))).as("overlap_us"))
        .orderBy("purchase_id", "error_id")
    })

  /** Sliding ROW-frame aggregates (the trailing-window smoothing report):
    * per user, the mean and max of the last 7 events at every event. The
    * frame sum runs in DECIMAL(18,2) on both sides — a sliding double sum
    * is subtract-on-slide in one engine and re-add in the other, so only
    * an exact frame sum divides to the identical double. One exchange on
    * user_id; the frame never leaves a partition. */
  val w7Rolling = Q("w7_rolling_frame",
    Some("""SELECT user_id, event_id,
              CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) / count(*) OVER w AS roll_mean,
              max(value) OVER w AS roll_max
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
            ORDER BY event_id"""),
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-6, 0)
      events(s, d)
        .select(col("user_id"), col("event_id"),
          (sum(col("value").cast("decimal(18,2)")).over(w).cast("double")
            / count(lit(1)).over(w)).as("roll_mean"),
          max(col("value")).over(w).as("roll_max"))
        .orderBy("event_id")
    })

  /** W8: time-weighted linear interpolation of gapped values — the
    * sensor/metrics gap-fill companion to w3's forward fill (w3 copies
    * the last reading; interpolation weights the two surrounding readings
    * by event-time distance, the standard resample-and-align pass).
    * Gaps are planted (every 5th event's value nulled); each gap fills
    * from the nearest non-null neighbors via two IGNORE-NULLS running
    * windows (both key-partitioned — no global window), degrading to
    * ffill/bfill at partition edges. The ratio arithmetic is written in
    * the same operand order in both engines; 6-dp rounding on output. */
  val w8Interpolate = Q("w8_linear_interpolate",
    Some("""WITH g AS (SELECT user_id, event_id, ts,
              CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v
            FROM events),
            n AS (SELECT user_id, event_id, ts, v,
              last_value(CASE WHEN v IS NOT NULL THEN epoch_us(ts) END IGNORE NULLS)
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
              last_value(v IGNORE NULLS)
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vp,
              first_value(CASE WHEN v IS NOT NULL THEN epoch_us(ts) END IGNORE NULLS)
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS tn,
              first_value(v IGNORE NULLS)
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS vn
            FROM g)
            SELECT user_id, event_id, v AS raw_value,
              round(CASE
                WHEN v IS NOT NULL THEN v
                WHEN vp IS NOT NULL AND vn IS NOT NULL AND tn <> tp
                  THEN vp + (vn - vp) * (CAST(epoch_us(ts) - tp AS DOUBLE) / CAST(tn - tp AS DOUBLE))
                WHEN vp IS NOT NULL AND vn IS NOT NULL THEN vp
                ELSE coalesce(vp, vn) END, 6) AS filled
            FROM n ORDER BY event_id"""),
    (s, d) => {
      val v = when(col("event_id") % 5 === 0, lit(null)).otherwise(col("value"))
      val wb = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wf = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val tUs = unix_micros(col("ts"))
      val tp = last(when(col("v").isNotNull, tUs), ignoreNulls = true).over(wb)
      val vp = last(col("v"), ignoreNulls = true).over(wb)
      val tn = first(when(col("v").isNotNull, tUs), ignoreNulls = true).over(wf)
      val vn = first(col("v"), ignoreNulls = true).over(wf)
      events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"), v.as("v"))
        .select(col("user_id"), col("event_id"), col("ts"), col("v"),
          tp.as("tp"), vp.as("vp"), tn.as("tn"), vn.as("vn"))
        .select(col("user_id"), col("event_id"), col("v").as("raw_value"),
          round(when(col("v").isNotNull, col("v"))
            .when(col("vp").isNotNull && col("vn").isNotNull && col("tn") =!= col("tp"),
              col("vp") + (col("vn") - col("vp")) *
                ((unix_micros(col("ts")) - col("tp")).cast("double") /
                  (col("tn") - col("tp")).cast("double")))
            .when(col("vp").isNotNull && col("vn").isNotNull, col("vp"))
            .otherwise(coalesce(col("vp"), col("vn"))), 6).as("filled"))
        .orderBy("event_id")
    })

  /** W9: exponentially-weighted moving average over the trailing 8
    * events — the smoothing a metrics/telemetry pipeline layers on w7's
    * flat rolling mean. α = 0.5 EXACTLY so every weight 0.5^k is a
    * binary-exact double (pow returns it exactly in both engines); the
    * weighted terms then fold IN FRAME ORDER as plain doubles on both
    * sides (the d14 fixed-order-fold lesson: identical sequential IEEE
    * adds match bit-for-bit where per-term DECIMAL casts drift). One
    * exchange on user_id; the frame never leaves a partition. */
  val w9Ewma = Q("w9_ewma",
    Some("""WITH b AS (SELECT user_id, event_id,
              list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS l
            FROM events),
            e AS (SELECT user_id, event_id,
              list_sum(list_transform(range(1, len(l) + 1),
                i -> l[i] * power(0.5, CAST(len(l) - i AS DOUBLE)))) AS num,
              list_sum(list_transform(range(1, len(l) + 1),
                i -> power(0.5, CAST(len(l) - i AS DOUBLE)))) AS den
            FROM b)
            SELECT user_id, event_id, round(num / den, 6) AS ewma
            FROM e ORDER BY event_id"""),
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-7, 0)
      val l = col("l")
      val idx = sequence(lit(1), size(l))
      val num = aggregate(idx, lit(0.0),
        (acc, i) => acc + element_at(l, i) * pow(lit(0.5), (size(l) - i).cast("double")))
      val den = aggregate(idx, lit(0.0),
        (acc, i) => acc + pow(lit(0.5), (size(l) - i).cast("double")))
      events(s, d)
        .select(col("user_id"), col("event_id"), collect_list(col("value")).over(w).as("l"))
        .select(col("user_id"), col("event_id"), round(num / den, 6).as("ewma"))
        .orderBy("event_id")
    })

  /** W10: rolling z-score anomaly flags — the telemetry outlier gate
    * layered on w7's frame: each event scored against the mean/std of
    * its trailing 15-event window. Both moment sums run in
    * DECIMAL(25,6)/(38,12) (exact, order-free); mean, variance, and z
    * derive from the same exact sums with the same expression tree in
    * both engines, so no sliding-sum drift can reach the hash. Windows
    * with fewer than 5 events or ~zero variance emit NULL z (no basis),
    * never a spurious flag. One exchange on user_id. */
  val w10Anomaly = Q("w10_rolling_zscore",
    Some("""WITH b AS (SELECT user_id, event_id, value,
              CAST(count(*) OVER w AS BIGINT) AS n,
              CAST(sum(CAST(value AS DECIMAL(25,6))) OVER w AS DOUBLE) AS s1,
              CAST(sum(CAST(value AS DECIMAL(25,6)) * CAST(value AS DECIMAL(25,6))) OVER w AS DOUBLE) AS s2
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 15 PRECEDING AND 1 PRECEDING)),
            z AS (SELECT user_id, event_id, value, n,
              CASE WHEN n >= 5 AND (s2 / CAST(n AS DOUBLE)
                     - (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE))) > 1e-12
                THEN round((value - s1 / CAST(n AS DOUBLE))
                  / sqrt(s2 / CAST(n AS DOUBLE)
                    - (s1 / CAST(n AS DOUBLE)) * (s1 / CAST(n AS DOUBLE))), 6)
                END AS zscore
            FROM b)
            SELECT user_id, event_id, value, n AS n_window, zscore,
              coalesce(abs(zscore) > 2.5, FALSE) AS is_anomaly
            FROM z ORDER BY event_id"""),
    (s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-15, -1)
      val b = events(s, d).select(col("user_id"), col("event_id"), col("value"),
        count(lit(1)).over(w).as("n"),
        sum(col("value").cast("decimal(25,6)")).over(w).cast("double").as("s1"),
        sum(col("value").cast("decimal(25,6)") * col("value").cast("decimal(25,6)"))
          .over(w).cast("double").as("s2"))
      val nD = col("n").cast("double")
      val mean = col("s1") / nD
      val variance = col("s2") / nD - mean * mean
      val z = when(col("n") >= 5 && variance > 1e-12,
        round((col("value") - mean) / sqrt(variance), 6))
      b.select(col("user_id"), col("event_id"), col("value"),
          col("n").as("n_window"), z.as("zscore"),
          coalesce(abs(z) > 2.5, lit(false)).as("is_anomaly"))
        .orderBy("event_id")
    })

  /** W11: sequential funnel analysis — view → click → purchase, the
    * product-analytics staple: each step matches the EARLIEST event of
    * its type STRICTLY AFTER the previous step's match, ordered by
    * (ts, event_id) so simultaneous events resolve deterministically (a
    * click in the same microsecond as the view counts only if its
    * event_id is higher — the pinned tiebreak), INSIDE a conversion
    * window anchored at funnel entry: clicks count within 24 h of the
    * first view, purchases within 72 h (exact integer microsecond
    * comparisons — no interval arithmetic to drift). The windows are
    * load-bearing on this corpus: they split users across all four
    * `reached` levels where the unwindowed funnel converts everyone.
    * No window FUNCTIONS at all: each step is one min-aggregate + one
    * equi-join on user_id, so the three steps reuse ONE exchange and
    * the funnel scales as three map-side-combined aggregates at any
    * event volume. min(struct(ts, id)) is reduction-order-independent,
    * so shuffle nondeterminism cannot pick a different match. */
  val w11Funnel = Q("w11_funnel",
    Some("""WITH e AS (SELECT user_id, event_id, event_type, ts FROM events),
            s1 AS (SELECT user_id, min(ts) AS t1 FROM e WHERE event_type = 'view' GROUP BY user_id),
            s1b AS (SELECT e.user_id, t1, min(e.event_id) AS id1
                    FROM e JOIN s1 USING (user_id)
                    WHERE event_type = 'view' AND ts = t1 GROUP BY e.user_id, t1),
            s2 AS (SELECT e.user_id, min(ts) AS t2
                   FROM e JOIN s1b USING (user_id)
                   WHERE event_type = 'click' AND (ts > t1 OR (ts = t1 AND event_id > id1))
                     AND epoch_us(ts) <= epoch_us(t1) + 86400000000
                   GROUP BY e.user_id),
            s2b AS (SELECT e.user_id, s1b.t1 AS t1a, t2, min(e.event_id) AS id2
                    FROM e JOIN s2 USING (user_id) JOIN s1b USING (user_id)
                    WHERE event_type = 'click' AND ts = t2
                      AND (ts > s1b.t1 OR (ts = s1b.t1 AND event_id > id1))
                    GROUP BY e.user_id, s1b.t1, t2),
            s3 AS (SELECT e.user_id, min(ts) AS t3
                   FROM e JOIN s2b USING (user_id)
                   WHERE event_type = 'purchase' AND (ts > t2 OR (ts = t2 AND event_id > id2))
                     AND epoch_us(ts) <= epoch_us(t1a) + 259200000000
                   GROUP BY e.user_id),
            u AS (SELECT DISTINCT user_id FROM e)
            SELECT u.user_id,
              epoch_us(t1) AS t_view_us, epoch_us(t2) AS t_click_us, epoch_us(t3) AS t_purchase_us,
              CAST(CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
                        WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS INT) AS reached
            FROM u LEFT JOIN s1b ON s1b.user_id = u.user_id
            LEFT JOIN s2b ON s2b.user_id = u.user_id
            LEFT JOIN s3 ON s3.user_id = u.user_id
            ORDER BY u.user_id"""),
    (s, d) => {
      val e = events(s, d).select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
        .localCheckpoint() // feeds all three step scans and the user dim
      def ordered(t: org.apache.spark.sql.Column, id: org.apache.spark.sql.Column) =
        struct(t.as("ts"), id.as("event_id"))
      val s1 = e.filter(col("event_type") === "view").groupBy("user_id")
        .agg(min(ordered(col("ts"), col("event_id"))).as("m1"))
      val s2 = e.join(s1, "user_id")
        .filter(col("event_type") === "click" &&
          (col("ts") > col("m1.ts") ||
            (col("ts") === col("m1.ts") && col("event_id") > col("m1.event_id"))) &&
          unix_micros(col("ts")) <= unix_micros(col("m1.ts")) + 86400000000L)
        .groupBy("user_id").agg(min(ordered(col("ts"), col("event_id"))).as("m2"),
          min(col("m1.ts")).as("t1")) // constant per user — carried for the s3 anchor
      val s3 = e.join(s2, "user_id")
        .filter(col("event_type") === "purchase" &&
          (col("ts") > col("m2.ts") ||
            (col("ts") === col("m2.ts") && col("event_id") > col("m2.event_id"))) &&
          unix_micros(col("ts")) <= unix_micros(col("t1")) + 259200000000L)
        .groupBy("user_id").agg(min(ordered(col("ts"), col("event_id"))).as("m3"))
      e.select("user_id").distinct()
        .join(s1, Seq("user_id"), "left")
        .join(s2, Seq("user_id"), "left")
        .join(s3, Seq("user_id"), "left")
        .select(col("user_id"),
          unix_micros(col("m1.ts")).as("t_view_us"),
          unix_micros(col("m2.ts")).as("t_click_us"),
          unix_micros(col("m3.ts")).as("t_purchase_us"),
          when(col("m3").isNotNull, 3).when(col("m2").isNotNull, 2)
            .when(col("m1").isNotNull, 1).otherwise(0).cast("int").as("reached"))
        .orderBy("user_id")
    })

  /** W12: cohort retention — the day-offset activity matrix product
    * analytics reads next to w11's funnel: users cohorted by first-event
    * date, retention(cohort, d) = share of the cohort active d days
    * later. Everything is aggregates and equi-joins on (user, date) /
    * (cohort, offset) keys — no windows, map-side combinable; retention
    * divides two exact integer counts with the same tree both engines
    * (every user is active at offset 0 by construction, so the
    * denominator row always exists). */
  val w12Cohort = Q("w12_cohort_retention",
    Some("""WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
            first AS (SELECT user_id, min(day) AS cohort FROM e GROUP BY user_id),
            act AS (SELECT DISTINCT f.cohort, date_diff('day', f.cohort, e.day) AS day_offset, e.user_id
              FROM e JOIN first f USING (user_id)),
            m AS (SELECT cohort, day_offset, CAST(count(*) AS BIGINT) AS n_users
              FROM act GROUP BY cohort, day_offset),
            sz AS (SELECT cohort, n_users AS cohort_size FROM m WHERE day_offset = 0)
            SELECT m.cohort AS cohort_date, CAST(m.day_offset AS INT) AS day_offset,
              m.n_users, sz.cohort_size,
              round(CAST(m.n_users AS DOUBLE) / CAST(sz.cohort_size AS DOUBLE), 6) AS retention
            FROM m JOIN sz ON sz.cohort = m.cohort
            ORDER BY cohort_date, day_offset"""),
    (s, d) => {
      val e = events(s, d).select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val first = e.groupBy("user_id").agg(min(col("day")).as("cohort"))
      val act = e.join(first, "user_id")
        .select(col("cohort"), datediff(col("day"), col("cohort")).as("day_offset"), col("user_id"))
        .distinct()
      val m = act.groupBy("cohort", "day_offset").agg(count(lit(1)).as("n_users"))
      val sz = m.filter(col("day_offset") === 0)
        .select(col("cohort"), col("n_users").as("cohort_size"))
      m.join(sz, "cohort")
        .select(col("cohort").as("cohort_date"), col("day_offset").cast("int").as("day_offset"),
          col("n_users"), col("cohort_size"),
          round(col("n_users").cast("double") / col("cohort_size").cast("double"), 6).as("retention"))
        .orderBy("cohort_date", "day_offset")
    })

  /** W13: OHLC bar aggregation — 6-hour bars per user with open/close
    * picked by an exact integer composite event key ((µs since
    * 2024-01-01) · 10⁵ + event_id — struct-ordered min/max in Spark, the
    * same scalar key in the oracle's min_by/max_by, chosen because a
    * raw epoch-µs × 10⁵ composite would overflow int64). High/low are
    * plain min/max; the mean divides a DECIMAL(25,6)-exact sum once.
    * ONE map-side-combined aggregate on (user, bar) — the telemetry
    * downsampling shape at any event volume; no windows, no sort. */
  val w13Ohlc = Q("w13_ohlc_bars",
    Some("""WITH e AS (SELECT user_id, value,
              epoch_us(ts) // 21600000000 AS bar,
              (epoch_us(ts) - 1704067200000000) * 1000000 + event_id AS k
            FROM events)
            SELECT user_id, CAST(bar * 21600000000 AS BIGINT) AS bar_start_us,
              CAST(count(*) AS BIGINT) AS n_events,
              min_by(value, k) AS open, max(value) AS high,
              min(value) AS low, max_by(value, k) AS close,
              round(CAST(sum(CAST(value AS DECIMAL(25,6))) AS DOUBLE) / count(*), 6) AS mean_value
            FROM e GROUP BY user_id, bar
            ORDER BY user_id, bar_start_us"""),
    (s, d) => {
      val us = unix_micros(col("ts"))
      // stride 10^6: event_id must stay below it for the (ts, event_id)
      // ordering to hold (sf1.0's ids reach ~10^6-1; 10^5 had zero headroom),
      // while 30 days of relative µs × 10^6 stays under int64
      val k = (us - 1704067200000000L) * 1000000L + col("event_id")
      events(s, d)
        .select(col("user_id"), col("value"),
          // integral `div`, not `/` (long / long is DOUBLE division in
          // Spark; floor-of-double is only exact below 2^53 — m4 lesson)
          call_function("div", us, lit(21600000000L)).as("bar"), k.as("k"))
        .groupBy("user_id", "bar")
        .agg(count(lit(1)).as("n_events"),
          min(struct(col("k"), col("value"))).getField("value").as("open"),
          max(col("value")).as("high"), min(col("value")).as("low"),
          max(struct(col("k"), col("value"))).getField("value").as("close"),
          round(sum(col("value").cast("decimal(25,6)")).cast("double") / count(lit(1)), 6)
            .as("mean_value"))
        .select(col("user_id"), (col("bar") * 21600000000L).cast("long").as("bar_start_us"),
          col("n_events"), col("open"), col("high"), col("low"), col("close"), col("mean_value"))
        .orderBy("user_id", "bar_start_us")
    })

  /** W14: first-order Markov transition matrix over per-user event
    * sequences — the sequence-analytics classic beside w11's funnel
    * (what a product or agent-trace pipeline reads to find dominant
    * paths and dead ends): consecutive event pairs per user (ordered by
    * (ts, event_id) — the w13 total-order key), counted into a
    * (from, to) matrix with per-from outgoing totals and transition
    * probability as ONE exact-integer division. One user-partitioned
    * lag window + one bounded (|types|² ≤ 25-row) aggregate. */
  val w14Markov = Q("w14_markov_transitions",
    Some("""WITH e AS (SELECT user_id, event_type,
              lag(event_type) OVER (PARTITION BY user_id
                ORDER BY ts, event_id) AS prev
            FROM events),
            t AS (SELECT prev AS from_type, event_type AS to_type,
                CAST(count(*) AS BIGINT) AS n_trans
              FROM e WHERE prev IS NOT NULL GROUP BY 1, 2),
            f AS (SELECT from_type, CAST(sum(n_trans) AS BIGINT) AS n_from FROM t GROUP BY 1)
            SELECT t.from_type, t.to_type, t.n_trans, f.n_from,
              CAST(t.n_trans AS DOUBLE) / CAST(f.n_from AS DOUBLE) AS prob
            FROM t JOIN f USING (from_type)
            ORDER BY t.from_type, t.to_type"""),
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val t = events(s, d)
        .select(col("user_id"), col("event_type"),
          lag(col("event_type"), 1).over(w).as("prev"))
        .filter(col("prev").isNotNull)
        .groupBy(col("prev").as("from_type"), col("event_type").as("to_type"))
        .agg(count(lit(1)).as("n_trans"))
        .localCheckpoint() // ≤25 rows; feeds the outgoing totals AND the output join
      val f = t.groupBy("from_type").agg(sum("n_trans").as("n_from"))
      t.join(broadcast(f), Seq("from_type"))
        .select(col("from_type"), col("to_type"), col("n_trans"), col("n_from"),
          (col("n_trans").cast("double") / col("n_from").cast("double")).as("prob"))
        .orderBy("from_type", "to_type")
    })

  def all: Seq[Q] = Seq(w1Order, w2Session, w3Ffill, w4Chunk, w4Exact, w5Split,
    w6Budget, a1Median, a9Argmax, f17AnyFlag, j7Asof, r1Range, r2Overlap, x7Pack, w7Rolling,
    w8Interpolate, w9Ewma, w10Anomaly, w11Funnel, w12Cohort, w13Ohlc, w14Markov)
}
