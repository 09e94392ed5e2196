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

  def all: Seq[Q] = Seq(st1Tumbling, st2Sliding, st3Dedup, st4Watermark)
}
