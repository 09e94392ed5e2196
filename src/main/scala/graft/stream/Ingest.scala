package graft.stream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming ingestion (SURVEY.md §2.10, ref upload→ingest loop
  * `backend/main.py:233-332` made Spark-native).
  *
  * Batch/streaming parity by construction: every transform here is a
  * `DataFrame => DataFrame` function that the batch queries also use — the
  * streaming driver just binds them to `readStream`/`writeStream`. The
  * ref's subprocess-per-uploaded-file loop becomes a file-source micro-batch
  * with `foreachBatch` running the identical batch pipeline.
  *
  * Scale: the file source lists incrementally (maxFilesPerTrigger bounds a
  * batch); state stores (dedup, windows) are keyed by (id) / (window) and
  * pruned by watermark, so state size is bounded by the watermark horizon,
  * not the stream length.
  */
object Ingest {

  /** S8: landing-directory file source → the same batch operators via
    * foreachBatch. `process` is the batch pipeline (e.g. clean→chunk→index). */
  def fileIngest(spark: SparkSession, landingDir: String, schema: StructType,
                 process: DataFrame => DataFrame,
                 sink: (DataFrame, Long) => Unit,
                 maxFilesPerTrigger: Int = 16): DataStreamWriter[org.apache.spark.sql.Row] = {
    val src = spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(landingDir)
    src.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: DataFrame, id: Long) => sink(process(batch), id) }
  }

  /** Event-time tumbling/sliding window aggregate with watermark — the
    * streaming form of `StreamingQueries.st1/st2`. */
  def windowedCounts(events: DataFrame, tsCol: String, watermark: String,
                     windowLen: String, slide: Option[String] = None): DataFrame = {
    val w = slide match {
      case Some(s) => window(col(tsCol), windowLen, s)
      case None    => window(col(tsCol), windowLen)
    }
    events
      .withWatermark(tsCol, watermark)
      .groupBy(w.as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)").as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("total_value"))
  }

  /** Streaming dedup within the watermark horizon — the incremental form of
    * `StreamingQueries.st3` (first event per key wins; late duplicates
    * beyond the watermark are dropped by state expiry, which is the
    * documented approximation at scale). */
  def dedupWithinWatermark(events: DataFrame, tsCol: String, watermark: String,
                           keys: Seq[String]): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicates(keys :+ tsCol)

  /** Stateful sessionization with `flatMapGroupsWithState`-style semantics
    * via the built-in session window — the streaming form of
    * `WindowQueries.w2Session`. */
  def sessionWindows(events: DataFrame, tsCol: String, watermark: String,
                     gap: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap).as("s"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(18,2)").as("session_value"))
      .select(col("user_id"), col("s.start").as("session_start"),
        col("s.end").as("session_end"), col("n_events"), col("session_value"))

  /** Streaming exact chunker — `flatMapGroupsWithState` carrying (chunk,
    * runningChars) per document across micro-batches, the incremental form
    * of `Chunking.chunkIdExact` (same reset-on-break/overflow semantics).
    * Blocks must arrive ordered within a document (ingest order); state is
    * two longs per in-flight doc, so memory is bounded by concurrent docs,
    * not stream length. */
  def chunkIdExactStream(blocks: org.apache.spark.sql.Dataset[(String, Long, Long, Boolean)],
                         maxChars: Long): org.apache.spark.sql.Dataset[(String, Long, Long)] = {
    import blocks.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    def advance(key: String, rows: Iterator[(String, Long, Long, Boolean)],
                state: GroupState[(Long, Long)]): Iterator[(String, Long, Long)] = {
      var (chunk, run) = state.getOption.getOrElse((0L, 0L))
      val out = rows.toVector.sortBy(_._2).map { case (_, ord, len, brk) =>
        if (brk || run + len > maxChars) { chunk += 1; run = 0L }
        run += len
        (key, ord, chunk)
      }
      state.update((chunk, run))
      out.iterator
    }
    blocks.groupByKey(_._1).flatMapGroupsWithState(
      OutputMode.Append, GroupStateTimeout.NoTimeout)(advance)
  }

  /** TRUE stateful streaming sessionization — `Merge.sessionize`'s
    * multi-predicate gap-break semantics under a watermark, via
    * `flatMapGroupsWithState` (the built-in `session_window` of
    * [[sessionWindows]] can only aggregate per session; this one assigns
    * each EVENT its batch-identical 1-based session id).
    *
    * Event-time-correct buffering: per key, events are held in state until
    * the watermark passes them (only then can no earlier event still
    * arrive), then emitted in (ts, tie) order with a new session id
    * whenever the gap from the previous emitted event exceeds
    * `gapSeconds`. An event-time timeout armed on the EARLIEST pending
    * event keeps flushing as the watermark advances even through no-data
    * micro-batches; incoming events at or below the watermark are dropped
    * (late-beyond-watermark, the same contract as every watermarked op).
    * State per key is the pending buffer (bounded by the watermark
    * horizon) plus two longs — the (last_ts, session_counter) carried, by
    * default, FOREVER so session numbering stays continuous for however
    * long a key stays live, across micro-batches and restarts alike.
    *
    * `idleExpirySeconds` (state hygiene, round 6): with keys-forever
    * semantics the state store grows with LIFETIME key cardinality — fine
    * for user/session keys, unbounded for crawl-shaped keys (URLs, doc
    * ids) where it becomes its own 100 TB problem. When set, a key whose
    * buffer is empty and whose last event is `idleExpirySeconds` behind
    * the watermark has its state REMOVED (an event-time timeout armed at
    * last + expiry fires through no-data batches too). The documented
    * trade: a key reappearing after expiry restarts session numbering at
    * 1 — exactly the renumbering a batch job over a bounded window would
    * produce; choose expiry ≥ the max meaningful session gap. Default
    * None preserves keys-forever.
    *
    * Output: (key, ts_us, tie, session_id). */
  def sessionizeStream(events: DataFrame, tsCol: String, keyCol: String, tieCol: String,
                       watermark: String, gapSeconds: Long,
                       idleExpirySeconds: Option[Long] = None): DataFrame = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    def advance(key: String, rows: Iterator[(String, java.sql.Timestamp, Long, Long)],
                state: GroupState[(Seq[(Long, Long)], Long, Long)])
        : Iterator[(String, Long, Long, Long)] = {
      val (buf0, last0, sid0) = state.getOption.getOrElse((Seq.empty[(Long, Long)], Long.MinValue, 0L))
      val horizonUs = state.getCurrentWatermarkMs() * 1000L
      val incoming = rows.map(r => (r._3, r._4)).filter(_._1 > horizonUs)
      val (ready, still) = (buf0 ++ incoming).sorted.partition(_._1 <= horizonUs)
      var last = last0
      var sid = sid0
      val out = ready.map { case (ts, tie) =>
        if (last == Long.MinValue || ts - last > gapSeconds * 1000000L) sid += 1
        last = ts
        (key, ts, tie, sid)
      }
      val expired = still.isEmpty && last != Long.MinValue &&
        idleExpirySeconds.exists(e => horizonUs >= last + e * 1000000L)
      if (expired) state.remove()
      else {
        state.update((still, last, sid))
        // re-arm on the earliest pending event: the flush must fire the
        // moment the watermark passes IT, not the newest one
        if (still.nonEmpty) state.setTimeoutTimestamp(still.map(_._1).min / 1000L + 1L)
        // idle key: arm the expiry timeout so removal fires even through
        // no-data micro-batches (+1 ms over the floor-to-ms last so the
        // µs-precision horizon check above is already true when it fires)
        else idleExpirySeconds.foreach { e =>
          if (last != Long.MinValue)
            state.setTimeoutTimestamp(last / 1000L + e * 1000L + 1L)
        }
      }
      out.iterator
    }
    // the watermarked timestamp column must itself reach the grouped
    // Dataset (the event-time-timeout checker looks for its watermark
    // metadata in the child plan) — carried alongside its µs projection
    events
      .withWatermark(tsCol, watermark)
      .select(col(keyCol).cast("string"), col(tsCol),
        unix_micros(col(tsCol)), col(tieCol).cast("long"))
      .as[(String, java.sql.Timestamp, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(advance)
      .toDF(keyCol, "ts_us", tieCol, "session_id")
  }

  /** Stream-stream interval join: pair each left event with the right
    * events of the same key whose event time lies within the trailing
    * `[left.ts - window, left.ts]` interval — the funnel-attribution join
    * (click ⋈ recent views). This is Spark's symmetric hash join: both
    * sides shuffle ON THE KEY (an equi-join — never a nested loop), both
    * buffer rows in state, and the watermark + time-bound condition is
    * what lets state expire (a right row older than any joinable left row
    * is dropped). `Temporal.recentPairs` is the batch form of the same
    * predicate, and at 100 TB the streaming state bound is exactly the
    * bucketed batch join's replication bound: the window length.
    *
    * Inputs must carry distinct column names apart from `key` (rename
    * before calling). Returns the joined pairs with both timestamps.
    *
    * `joinType` "inner" (default) or "left_outer": the outer form emits a
    * left row with NULL right columns once the watermark proves no future
    * right row can still match it — the funnel-miss record (a click that
    * never had a view) surfacing from the stream itself, which is why the
    * time bound + both-side watermarks are mandatory for outer joins. */
  def streamStreamJoin(left: DataFrame, right: DataFrame, key: String,
                       leftTs: String, rightTs: String,
                       watermark: String, window: String,
                       joinType: String = "inner"): DataFrame = {
    require(!(left.columns ++ right.columns).contains("_rk"), "streamStreamJoin reserves _rk")
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark).withColumnRenamed(key, "_rk")
    l.join(r, col(key) === col("_rk") &&
        col(rightTs) >= col(leftTs) - expr(s"INTERVAL $window") &&
        col(rightTs) <= col(leftTs), joinType)
      .drop("_rk")
  }

  /** Stream-static enrichment: join each micro-batch against a static
    * dimension (user tier, doc metadata, domain verdicts). The static side
    * is broadcast per micro-batch — stateless, no watermark, and the
    * stream side never shuffles; the canonical Structured Streaming
    * enrichment shape. Left join so unmatched stream rows survive with
    * NULL dims (an inner join would silently drop late-registered keys). */
  def enrichWithDim(stream: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    stream.join(org.apache.spark.sql.functions.broadcast(dim), keys, "left")

  /** S7: append-mode QA-log sink (JSONL in the ref → parquet append here). */
  def appendLogSink(df: DataFrame, outDir: String, checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .outputMode(OutputMode.Append)
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
}
