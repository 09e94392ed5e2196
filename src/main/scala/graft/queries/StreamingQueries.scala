package graft.queries

import org.apache.spark.sql.functions._
import graft.tables.TestTables._

/** Event-time windowing + streaming-dedup inventory (SURVEY.md §2.10),
  * declared as batch queries over `events` so the DuckDB oracle can check
  * them. `graft.stream.Ingest` runs the same operators under Structured
  * Streaming with watermarks (ScalaTest-verified; identical DataFrame →
  * DataFrame transforms, so batch/streaming parity holds by construction).
  *
  * Window starts are emitted as epoch-microsecond bigints — raw nanosecond
  * timestamps would differ across engines after Spark's µs truncation.
  */
object StreamingQueries extends QuerySet {

  /** Tumbling 10-minute event-time window per event_type. */
  val st1Tumbling = Q("st1_tumbling_window",
    Some("""SELECT (epoch_us(ts) - epoch_us(ts) % 600000000) AS window_start_us, event_type,
              count(*) AS n,
              CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS total_value_cents
            FROM events GROUP BY window_start_us, event_type
            ORDER BY window_start_us, event_type"""),
    (s, d) => events(s, d)
      .groupBy(window(col("ts"), "10 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(col("value").cast("decimal(18,2)")) * 100).cast("long").as("total_value_cents"))
      .select(unix_micros(col("w.start")).as("window_start_us"), col("event_type"), col("n"), col("total_value_cents"))
      .orderBy("window_start_us", "event_type"))

  /** Sliding 10-minute window, 5-minute slide. */
  val st2Sliding = Q("st2_sliding_window",
    Some("""WITH slid AS (
              SELECT unnest([
                  epoch_us(ts) - epoch_us(ts) % 300000000,
                  epoch_us(ts) - epoch_us(ts) % 300000000 - 300000000]) AS window_start_us,
                value, ts FROM events),
            valid AS (
              SELECT window_start_us, value FROM slid
              WHERE epoch_us(ts) >= window_start_us AND epoch_us(ts) < window_start_us + 600000000)
            SELECT window_start_us, count(*) AS n,
              CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS total_value_cents
            FROM valid GROUP BY window_start_us ORDER BY window_start_us"""),
    (s, d) => events(s, d)
      .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"))
      .agg(count(lit(1)).as("n"),
        (sum(col("value").cast("decimal(18,2)")) * 100).cast("long").as("total_value_cents"))
      .select(unix_micros(col("w.start")).as("window_start_us"), col("n"), col("total_value_cents"))
      .orderBy("window_start_us"))

  /** Streaming-dedup analog: first event per (user_id, event_type) in event
    * time (what `dropDuplicates` within watermark computes incrementally). */
  val st3Dedup = Q("st3_stream_dedup",
    Some("""SELECT user_id, event_type, event_id AS first_event FROM (
              SELECT user_id, event_type, event_id,
                row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
              FROM events) t WHERE rn = 1 ORDER BY user_id, event_type"""),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"), col("event_type")).orderBy(col("ts"), col("event_id"))
      events(s, d).withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("user_id"), col("event_type"), col("event_id").as("first_event"))
        .orderBy("user_id", "event_type")
    })

  /** Late-data cutoff (watermark semantics as a batch predicate): events
    * within 30 minutes of the per-user max event time. */
  val st4Watermark = Q("st4_watermark_cutoff",
    Some("""SELECT user_id, count(*) AS n_recent FROM (
              SELECT user_id, ts, max(ts) OVER (PARTITION BY user_id) AS max_ts FROM events) t
            WHERE epoch_us(max_ts) - epoch_us(ts) <= 1800000000
            GROUP BY user_id ORDER BY user_id"""),
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      events(s, d)
        .withColumn("max_ts", max(col("ts")).over(Window.partitionBy(col("user_id"))))
        .filter(unix_micros(col("max_ts")) - unix_micros(col("ts")) <= 1800000000L)
        .groupBy("user_id").agg(count(lit(1)).as("n_recent"))
        .orderBy("user_id")
    })

  /** Native `session_window` sessionization (the operator Structured
    * Streaming runs incrementally with a watermark — unlike w2's
    * gaps-and-islands windows, this survives unbounded streams because
    * state is per open session, not per user history). Session semantics:
    * events chain while the next start lands strictly inside
    * [prev_ts, prev_ts + gap), so the break condition is `diff >= gap` —
    * one tick different from w2's `diff > gap`. Window end is
    * last_ts + gap by definition. The oracle's two window sorts tiebreak
    * on event_id: without it, a same-µs pair straddling a session break
    * could sort differently in the lag pass and the running-sum pass and
    * attach one event to the previous session (tied events always merge
    * under session_window, so the pinned order matches Spark). */
  val st5Session = Q("st5_session_window",
    Some("""WITH flagged AS (
              SELECT user_id, ts, event_id, value,
                CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000 THEN 1 ELSE 0 END AS brk
              FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
            sess AS (
              SELECT user_id, value, epoch_us(ts) AS ts_us,
                sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
              FROM flagged)
            SELECT user_id, min(ts_us) AS session_start_us,
                   max(ts_us) + 1800000000 AS session_end_us,
                   count(*) AS n_events,
                   CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS session_value_cents
            FROM sess GROUP BY user_id, sid
            ORDER BY user_id, session_start_us"""),
    (s, d) => events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"),
        (sum(col("value").cast("decimal(18,2)")) * 100).cast("long").as("session_value_cents"))
      .select(col("user_id"),
        unix_micros(col("w.start")).as("session_start_us"),
        unix_micros(col("w.end")).as("session_end_us"),
        col("n_events"), col("session_value_cents"))
      .orderBy("user_id", "session_start_us"))

  /** Stream-stream interval join, batch form (funnel attribution): each
    * click pairs with the same user's views from the trailing 10 minutes
    * (inclusive both ends — Spark's stream-stream BETWEEN condition),
    * then rolls up per click. The batch pairing is
    * `Temporal.recentPairs` — a BUCKETED equi-join on (user, bucket), so
    * the plan is a hash join with bounded (2×) replication, never a
    * nested loop; `stream.Ingest.streamStreamJoin` runs the identical
    * predicate incrementally under watermarks (StreamingSpec pins the
    * parity). Left join: a view-less click must surface with n_views=0,
    * not vanish (funnel analysis needs the misses). */
  val st6StreamJoin = Q("st6_stream_stream_join",
    Some("""WITH c AS (SELECT event_id, user_id, epoch_us(ts) AS c_us FROM events
                       WHERE event_type = 'click'),
            v AS (SELECT event_id AS view_id, user_id, epoch_us(ts) AS v_us FROM events
                  WHERE event_type = 'view')
            SELECT c.event_id AS click_id, c.user_id, c.c_us AS click_us,
              count(v.view_id) AS n_views,
              max(v.v_us) AS last_view_us
            FROM c LEFT JOIN v ON v.user_id = c.user_id
              AND v.v_us >= c.c_us - 600000000 AND v.v_us <= c.c_us
            GROUP BY c.event_id, c.user_id, c.c_us
            ORDER BY click_id"""),
    (s, d) => {
      val ev = events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), unix_micros(col("ts")).as("c_us"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"), unix_micros(col("ts")).as("v_us"))
      graft.ops.Temporal.recentPairs(clicks, views, "user_id", "c_us", "v_us", 600000000L)
        .groupBy("click_id", "user_id", "c_us")
        .agg(count(col("view_id")).as("n_views"), max(col("v_us")).as("last_view_us"))
        // recentPairs is inner by construction — restore the view-less
        // clicks with an outer join back to the click set
        .join(clicks, Seq("click_id", "user_id", "c_us"), "right")
        .select(col("click_id"), col("user_id"), col("c_us").as("click_us"),
          coalesce(col("n_views"), lit(0L)).as("n_views"), col("last_view_us"))
        .orderBy("click_id")
    })

  def all: Seq[Q] = Seq(st1Tumbling, st2Sliding, st3Dedup, st4Watermark, st5Session,
    st6StreamJoin)
}
