package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.tables.TestTables._

/** Time-series inventory over the events table: calendar gap-fill with
  * LOCF, exact-replay EWMA smoothing, and rolling-window anomaly flags —
  * the feature-engineering ops an activity/telemetry corpus needs before
  * it can train on per-entity sequences.
  *
  * All three are one-shuffle-per-key window/aggregate plans: state is
  * per user (bounded), the spine join is per-user-sized, and nothing
  * collects to the driver — the 100 TB shape is groupBy(user) with AQE
  * handling skewed users.
  *
  * Parity notes: days are integer day-numbers (µs/86400e6) so no date
  * types cross the gate; EWMA folds cents-as-double with the identical
  * (acc+x)/2 sequence in both engines (same IEEE ops, same order → same
  * bits); the anomaly test is exact integer algebra —
  * (n·x − s)² > 9·(n·q − s²) avoids division and sqrt entirely. */
object TimeSeriesQueries extends QuerySet {

  private val usPerDay = 86400000000L

  /** ONE source of truth for the per-user daily series + calendar spine
    * (ts1 and ts4 both ride it — a change to the day derivation, the
    * cents rule, or the 60-day spine cap cannot desync them). Yields
    * CTEs `ev(user_id, day, day_cents, n_events)`, `bounds`, and
    * `spine(user_id, day)`. */
  private val dailySpineSql: String =
    s"""ev AS (
         SELECT user_id, epoch_us(ts) // $usPerDay AS day,
           CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS day_cents,
           CAST(count(*) AS BIGINT) AS n_events
         FROM events GROUP BY 1, 2),
       bounds AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM ev GROUP BY 1),
       spine AS (
         SELECT b.user_id, b.d0 + i.i AS day
         FROM bounds b JOIN (SELECT unnest(range(0, 60)) AS i) i
           ON b.d0 + i.i <= b.d1),
       filled AS (
         SELECT s.user_id, s.day, coalesce(e.day_cents, 0) AS c
         FROM spine s LEFT JOIN ev e ON e.user_id = s.user_id AND e.day = s.day)"""

  /** Spark twin of [[dailySpineSql]]'s `ev`. */
  private def dailyAgg(s: org.apache.spark.sql.SparkSession, d: String) =
    events(s, d)
      .select(col("user_id"), expr(s"unix_micros(ts) div ${usPerDay}L").as("day"),
        col("value").cast("decimal(18,2)").as("v"))
      .groupBy("user_id", "day")
      .agg((sum(col("v")) * 100).cast("long").as("day_cents"),
        count(lit(1)).as("n_events"))

  /** Spark twin of [[dailySpineSql]]'s `spine`. */
  private def daySpine(ev: org.apache.spark.sql.DataFrame) = {
    val bounds = ev.groupBy("user_id").agg(min("day").as("d0"), max("day").as("d1"))
    bounds
      .select(col("user_id"), explode(sequence(lit(0), lit(59))).as("i"),
        col("d0"), col("d1"))
      .filter(col("d0") + col("i") <= col("d1"))
      .select(col("user_id"), (col("d0") + col("i")).as("day"))
  }

  /** Spark twin of [[dailySpineSql]]'s `filled` — the zero-filled
    * daily series (user_id, day, c). */
  private def filledDf(ev: org.apache.spark.sql.DataFrame) =
    daySpine(ev).join(ev, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"), coalesce(col("day_cents"), lit(0L)).as("c"))

  /** Daily activity per user with the calendar gaps restored: missing
    * days appear with n_events = 0 and carry the last seen daily total
    * forward (LOCF). The spine is built from a bounded index range
    * (0..59) filtered to each user's [min_day, max_day] — the
    * fixed-range-then-filter shape that works identically in both
    * engines (and stays a broadcastable generate-explode at scale). */
  val ts1GapFill = Q("ts1_gap_fill_locf",
    Some(s"""WITH $dailySpineSql,
            joined AS (
              SELECT s.user_id, s.day,
                coalesce(e.n_events, 0) AS n_events,
                e.day_cents
              FROM spine s LEFT JOIN ev e ON e.user_id = s.user_id AND e.day = s.day)
            SELECT user_id, day, n_events,
              CAST(coalesce(last_value(day_cents IGNORE NULLS) OVER (
                PARTITION BY user_id ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS BIGINT) AS locf_cents,
              CASE WHEN n_events = 0 THEN 1 ELSE 0 END AS gap
            FROM joined ORDER BY user_id, day"""),
    (s, d) => {
      val ev = dailyAgg(s, d)
      val joined = daySpine(ev).join(ev, Seq("user_id", "day"), "left")
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      joined.select(col("user_id"), col("day"),
          coalesce(col("n_events"), lit(0L)).as("n_events"),
          coalesce(last(col("day_cents"), ignoreNulls = true).over(w), lit(0L))
            .cast("long").as("locf_cents"),
          when(coalesce(col("n_events"), lit(0L)) === 0, 1).otherwise(0).as("gap"))
        .orderBy("user_id", "day")
    })

  /** EWMA (α = 1/2) over each user's value sequence: the fold
    * e ← (e + v)/2 replays the identical IEEE operation sequence in both
    * engines (list_reduce seeds with the first element; Spark seeds
    * aggregate() with arr[0] and folds the tail), so the double is
    * bit-exact without rounding. Per-user state is one sorted array —
    * bounded by per-user activity, built by ONE groupBy. */
  val ts2Ewma = Q("ts2_ewma",
    Some("""WITH ev AS (
              SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                CAST(CAST(value AS DECIMAL(18,2)) * 100 AS DOUBLE) AS cents
              FROM events),
            srt AS (
              SELECT user_id, list(cents ORDER BY ts_us, event_id) AS vs,
                CAST(count(*) AS BIGINT) AS n_events
              FROM ev GROUP BY user_id)
            SELECT user_id, n_events,
              list_reduce(vs, (a, b) -> (a + b) / 2) AS ewma
            FROM srt ORDER BY user_id"""),
    (s, d) => {
      val ev = events(s, d).select(col("user_id"),
        struct(unix_micros(col("ts")).as("ts_us"), col("event_id"),
          (col("value").cast("decimal(18,2)") * 100).cast("double").as("cents")).as("e"))
      ev.groupBy("user_id").agg(sort_array(collect_list(col("e"))).as("es"),
          count(lit(1)).as("n_events"))
        .withColumn("vs", expr("transform(es, x -> x.cents)"))
        .select(col("user_id"), col("n_events"),
          expr("aggregate(slice(vs, 2, size(vs) - 1), vs[0], (a, b) -> (a + b) / 2)").as("ewma"))
        .orderBy("user_id")
    })

  /** Rolling anomaly flags: each event compares against its user's
    * trailing baseline (the 7 events before it) with the exact-integer
    * test (n·x − s)² > 9·(n·q − s²), i.e. |x − μ| > 3σ without ever
    * forming μ or σ. Events with fewer than 4 baseline points are
    * unflagged (cold start). One window pass, no self-join. */
  val ts3Anomaly = Q("ts3_rolling_anomaly",
    Some("""WITH ev AS (
              SELECT user_id, event_id, epoch_us(ts) AS ts_us,
                CAST(round(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS cents
              FROM events),
            base AS (
              SELECT user_id, event_id, ts_us, cents,
                CAST(count(cents) OVER w AS BIGINT) AS n,
                CAST(sum(cents) OVER w AS BIGINT) AS s,
                CAST(sum(cents * cents) OVER w AS BIGINT) AS q
              FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
                ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
            SELECT user_id, event_id, cents,
              CASE WHEN n >= 4 AND (n * cents - s) * (n * cents - s) > 9 * (n * q - s * s)
                   THEN 1 ELSE 0 END AS anomaly
            FROM base ORDER BY user_id, event_id"""),
    (s, d) => {
      val ev = events(s, d).select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        round(col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(-7, -1)
      // one projection → the three frame aggregates share ONE Window node
      ev.select(col("user_id"), col("event_id"), col("cents"),
          count(col("cents")).over(w).as("n"), sum(col("cents")).over(w).as("s"),
          sum(col("cents") * col("cents")).over(w).as("q"))
        .select(col("user_id"), col("event_id"), col("cents"),
          when(col("n") >= 4 &&
            (col("n") * col("cents") - col("s")) * (col("n") * col("cents") - col("s")) >
              lit(9) * (col("n") * col("q") - col("s") * col("s")), 1)
            .otherwise(0).as("anomaly"))
        .orderBy("user_id", "event_id")
    })

  /** Weekly seasonal-naive baseline error: on the gap-filled daily
    * series (so day−7 really is one calendar week back), each day's
    * total compares against the same weekday last week; per user the
    * MAE and worst miss of that baseline. The forecast-error profile a
    * pipeline reads before trusting seasonal extrapolation. Exact: the
    * division is the only double, same expression tree both engines. */
  val ts4Seasonal = Q("ts4_seasonal_baseline",
    Some(s"""WITH $dailySpineSql,
            lagged AS (
              SELECT user_id, c,
                lag(c, 7) OVER (PARTITION BY user_id ORDER BY day) AS base
              FROM filled)
            SELECT user_id, CAST(count(base) AS BIGINT) AS n_compared,
              CAST(sum(abs(c - base)) AS BIGINT) AS sum_abs_err,
              CAST(sum(abs(c - base)) AS DOUBLE) / CAST(count(base) AS DOUBLE) AS mae_cents,
              CAST(max(abs(c - base)) AS BIGINT) AS worst_cents
            FROM lagged WHERE base IS NOT NULL
            GROUP BY user_id ORDER BY user_id"""),
    (s, d) => {
      val filled = filledDf(dailyAgg(s, d))
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      filled.withColumn("base", lag(col("c"), 7).over(w))
        .filter(col("base").isNotNull)
        .withColumn("ae", abs(col("c") - col("base")))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_compared"), sum("ae").as("sum_abs_err"),
          max("ae").as("worst_cents"))
        .select(col("user_id"), col("n_compared"), col("sum_abs_err"),
          (col("sum_abs_err").cast("double") / col("n_compared").cast("double")).as("mae_cents"),
          col("worst_cents"))
        .orderBy("user_id")
    })

  /** Lag-1 autocorrelation of the gap-filled daily series, in exact
    * integer algebra: with S = Σc and n days, r = num/den where
    * num = Σ_{t≥2}(n·c_t − S)(n·c_{t−1} − S) and
    * den = Σ_t(n·c_t − S)² — no mean is ever formed, both sums are
    * exact BIGINTs, and the single double division uses the same
    * expression tree in both engines. The burstiness diagnostic a
    * sampling scheduler reads per entity.
    *
    * int64 headroom: the squared terms are (n·c − S)² summed over
    * n ≤ 60 days, so day totals must stay under ~5e6 cents for
    * Σ ≤ 60·(60·5e6·2)² ≈ 2.2e18 < 2^63. Day totals are WINSORIZED at
    * that bound (x23's lever) with the clamp count reported per user —
    * unbounded inputs would overflow DIFFERENTLY in the two engines
    * (DuckDB raises on the HUGEINT cast, Spark wraps silently). */
  val ts5Autocorr = Q("ts5_autocorrelation",
    Some(s"""WITH $dailySpineSql,
            cl AS (
              SELECT user_id, day, least(c, 5000000) AS c,
                CASE WHEN c > 5000000 THEN 1 ELSE 0 END AS clw
              FROM filled),
            st AS (
              SELECT user_id, CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS sm,
                CAST(sum(clw) AS BIGINT) AS n_clamped
              FROM cl GROUP BY user_id),
            lagged AS (
              SELECT user_id, day, c,
                lag(c) OVER (PARTITION BY user_id ORDER BY day) AS prev
              FROM cl),
            terms AS (
              SELECT l.user_id, t.n,
                CAST(sum(CASE WHEN l.prev IS NOT NULL
                  THEN (t.n * l.c - t.sm) * (t.n * l.prev - t.sm) ELSE 0 END) AS BIGINT) AS num,
                CAST(sum((t.n * l.c - t.sm) * (t.n * l.c - t.sm)) AS BIGINT) AS den
              FROM lagged l JOIN st t ON t.user_id = l.user_id
              GROUP BY l.user_id, t.n)
            SELECT t.user_id, t.n AS n_days, t.num, t.den, s2.n_clamped,
              CASE WHEN t.den = 0 THEN CAST(0 AS DOUBLE)
                   ELSE CAST(t.num AS DOUBLE) / CAST(t.den AS DOUBLE) END AS r1
            FROM terms t JOIN st s2 ON s2.user_id = t.user_id
            ORDER BY t.user_id"""),
    (s, d) => {
      val cl = filledDf(dailyAgg(s, d))
        .select(col("user_id"), col("day"), least(col("c"), lit(5000000L)).as("c"),
          when(col("c") > 5000000L, 1L).otherwise(0L).as("clw"))
      val st = cl.groupBy("user_id")
        .agg(count(lit(1)).as("n"), sum("c").as("sm"), sum("clw").as("n_clamped"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      val lagged = cl.withColumn("prev", lag(col("c"), 1).over(w))
      lagged.join(st, "user_id")
        .groupBy(col("user_id"), col("n"))
        .agg(
          sum(when(col("prev").isNotNull,
            (col("n") * col("c") - col("sm")) * (col("n") * col("prev") - col("sm")))
            .otherwise(0L)).as("num"),
          sum((col("n") * col("c") - col("sm")) * (col("n") * col("c") - col("sm"))).as("den"))
        .join(st.select(col("user_id"), col("n_clamped")), "user_id")
        .select(col("user_id"), col("n").as("n_days"), col("num"), col("den"),
          col("n_clamped"),
          when(col("den") === 0, lit(0.0))
            .otherwise(col("num").cast("double") / col("den").cast("double")).as("r1"))
        .orderBy("user_id")
    })

  /** Holt double-exponential smoothing (level + trend) — the ts family's
    * next rung after ts2's bit-exact EWMA: per user over the
    * (ts, event_id)-ordered value series, the classic Holt recursion
    * with α = β = 1/2 and the textbook init l₁ = x₁, b₁ = x₂ − x₁:
    *   l' = (x + (l + b)) / 2,   b' = ((l' − l) + b) / 2
    * plus the 3-step-ahead forecast l + 3·b. BIT-EXACT cross-engine:
    * the Spark side folds a STRUCT accumulator through `aggregate()`
    * over x₂..xₙ; the oracle replays the SAME fixed-order recursion as
    * a recursive CTE stepping t → t+1 — identical parenthesization, and
    * every α/β application is a divide-by-2 (pure exponent shift, no
    * rounding), so the raw doubles hash-match with no rounding anywhere.
    * Scale shape: one groupBy(user) collect of each user's own series
    * (per-key bounded, the ts2/w4 shape), then a map-only fold. Users
    * with a single event carry no trend and are filtered (n ≥ 2). */
  val ts6Holt = Q("ts6_holt_winters",
    Some("""WITH RECURSIVE ev AS (
              SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                CAST(CAST(value AS DECIMAL(18,2)) * 100 AS DOUBLE) AS cents
              FROM events),
            srt AS (
              SELECT user_id, list(cents ORDER BY ts_us, event_id) AS vs,
                CAST(count(*) AS BIGINT) AS n_events
              FROM ev GROUP BY user_id HAVING count(*) >= 2),
            hw(user_id, t, n_events, vs, l, b) AS (
              SELECT user_id, 1, n_events, vs,
                CAST(vs[1] AS DOUBLE), CAST(vs[2] - vs[1] AS DOUBLE)
              FROM srt
              UNION ALL
              SELECT user_id, t + 1, n_events, vs,
                (vs[t + 1] + (l + b)) / 2,
                (((vs[t + 1] + (l + b)) / 2 - l) + b) / 2
              FROM hw WHERE t < n_events)
            SELECT user_id, n_events, l AS level, b AS trend,
              l + 3 * b AS forecast_3
            FROM hw WHERE t = n_events ORDER BY user_id"""),
    (s, d) => {
      val ev = events(s, d).select(col("user_id"),
        struct(unix_micros(col("ts")).as("ts_us"), col("event_id"),
          (col("value").cast("decimal(18,2)") * 100).cast("double").as("cents")).as("e"))
      ev.groupBy("user_id").agg(sort_array(collect_list(col("e"))).as("es"),
          count(lit(1)).as("n_events"))
        .filter(col("n_events") >= 2)
        .withColumn("vs", expr("transform(es, x -> x.cents)"))
        .withColumn("st", expr(
          """aggregate(slice(vs, 2, size(vs) - 1),
               named_struct('l', CAST(vs[0] AS DOUBLE), 'b', CAST(vs[1] - vs[0] AS DOUBLE)),
               (acc, x) -> named_struct(
                 'l', (x + (acc.l + acc.b)) / 2,
                 'b', (((x + (acc.l + acc.b)) / 2 - acc.l) + acc.b) / 2))"""))
        .select(col("user_id"), col("n_events"),
          col("st.l").as("level"), col("st.b").as("trend"),
          expr("st.l + 3 * st.b").as("forecast_3"))
        .orderBy("user_id")
    })

  /** TS7: Kaplan–Meier survival with right-censoring (the product-limit
    * estimator — churn/retention's principled answer where w12's cohort
    * matrix has no censoring concept): a customer's lifetime is the
    * integer WEEKS between first and last order; customers whose last
    * order falls in the final 90 days of the global window are CENSORED
    * (still active — they leave the risk set without counting as churn;
    * 476 of 1500 at sf0.01, so both branches carry real mass). Per
    * distinct lifetime t: n_risk (customers with lifetime ≥ t), churn
    * events d, censored c, and S(t) = Π_{t'≤t} (1 − d/n_risk) — the
    * coupled (remaining, survival) recursion folds a STRUCT accumulator
    * over the ordered step array in ONE `aggregate()` (the ts6 Holt
    * shape), and the oracle replays the IDENTICAL fixed-order recursion
    * as a recursive CTE, so the survival doubles hash-match unrounded.
    * Step count is bounded by the CALENDAR span in weeks (~350), never
    * by data size, so the one-row fold is O(steps²) on a trivial k —
    * the heavy work (per-customer min/max, per-step counts) is all hash
    * aggregates. */
  val ts7KaplanMeier = Q("ts7_kaplan_meier",
    Some("""WITH RECURSIVE eu AS (
              SELECT o_custkey, min(epoch_us(o_orderdate)) AS first_us,
                max(epoch_us(o_orderdate)) AS last_us
              FROM orders GROUP BY 1),
            g AS (SELECT max(last_us) AS gmax FROM eu),
            u AS (SELECT (last_us - first_us) // 604800000000 AS dur,
                CASE WHEN last_us > g.gmax - 7776000000000 THEN 1 ELSE 0 END AS censored
              FROM eu CROSS JOIN g),
            s AS (SELECT dur, CAST(sum(1 - censored) AS BIGINT) AS d,
                CAST(sum(censored) AS BIGINT) AS c FROM u GROUP BY 1),
            n AS (SELECT CAST(sum(d + c) AS BIGINT) AS total FROM s),
            seq AS (SELECT dur, d, c, row_number() OVER (ORDER BY dur) AS rn FROM s),
            walk AS (
              SELECT rn, dur, d, c, total AS n_risk,
                CAST(1 AS DOUBLE) * (1 - CAST(d AS DOUBLE) / CAST(total AS DOUBLE)) AS surv
              FROM seq CROSS JOIN n WHERE rn = 1
              UNION ALL
              SELECT s2.rn, s2.dur, s2.d, s2.c, w.n_risk - w.d - w.c,
                w.surv * (1 - CAST(s2.d AS DOUBLE) / CAST(w.n_risk - w.d - w.c AS DOUBLE))
              FROM walk w JOIN seq s2 ON s2.rn = w.rn + 1)
            SELECT dur AS t_weeks, n_risk, d AS n_events, c AS n_censored, surv AS survival
            FROM walk ORDER BY t_weeks"""),
    (s, d) => {
      val ts = col("o_orderdate").cast("timestamp")
      val eu = orders(s, d).groupBy("o_custkey")
        .agg(min(unix_micros(ts)).as("first_us"), max(unix_micros(ts)).as("last_us"))
        .localCheckpoint() // feeds the global max AND the per-customer lifetimes
      val gmax = eu.agg(max("last_us").as("gmax"))
      val steps = eu.crossJoin(broadcast(gmax))
        .select(expr("(last_us - first_us) div 604800000000").as("dur"),
          (col("last_us") > col("gmax") - 7776000000000L).cast("int").as("censored"))
        .groupBy("dur")
        .agg(sum(lit(1) - col("censored")).as("d"), sum(col("censored")).as("c"))
      steps
        .agg(array_sort(collect_list(struct(col("dur"), col("d"), col("c")))).as("st"),
          sum(col("d") + col("c")).as("total"))
        .select(expr("""
          aggregate(st,
            named_struct('rem', CAST(total AS BIGINT), 'surv', CAST(1.0 AS DOUBLE),
              'out', CAST(array() AS ARRAY<STRUCT<dur: BIGINT, n_risk: BIGINT,
                d: BIGINT, c: BIGINT, surv: DOUBLE>>)),
            (acc, x) -> named_struct(
              'rem', acc.rem - x.d - x.c,
              'surv', acc.surv * (1.0 - CAST(x.d AS DOUBLE) / CAST(acc.rem AS DOUBLE)),
              'out', concat(acc.out, array(named_struct('dur', x.dur, 'n_risk', acc.rem,
                'd', x.d, 'c', x.c,
                'surv', acc.surv * (1.0 - CAST(x.d AS DOUBLE) / CAST(acc.rem AS DOUBLE)))))),
            acc -> acc.out) AS out"""))
        .select(explode(col("out")).as("st"))
        .select(col("st.dur").as("t_weeks"), col("st.n_risk"), col("st.d").as("n_events"),
          col("st.c").as("n_censored"), col("st.surv").as("survival"))
        .orderBy("t_weeks")
    })

  def all: Seq[Q] = Seq(ts1GapFill, ts2Ewma, ts3Anomaly, ts4Seasonal, ts5Autocorr, ts6Holt,
    ts7KaplanMeier)
}
