package graft

import org.apache.spark.sql.functions._
import graft.stream.Ingest

/** Batch/streaming parity: the streaming operators over the events table
  * (replayed as a file stream) must match their batch counterparts. */
class StreamingSpec extends SparkSpec {

  private def streamEvents = {
    // re-materialize events (µs timestamps) as a parquet dir usable as a file source
    val dir = "/tmp/graft_stream_src"
    val batch = graft.tables.TestTables.events(spark, sf)
    batch.write.mode("overwrite").parquet(dir)
    val schema = batch.schema
    spark.readStream.schema(schema).parquet(dir)
  }

  private def runToMemory(df: org.apache.spark.sql.DataFrame, name: String, mode: String) = {
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    q.processAllAvailable(); q.stop()
    spark.table(name)
  }

  test("streaming windowed counts equal batch window aggregation") {
    // complete mode: append only emits watermark-closed windows, and a single
    // AvailableNow replay never advances the watermark past the tail
    val streamed = runToMemory(
      Ingest.windowedCounts(streamEvents, "ts", "30 minutes", "10 minutes"), "win_out", "complete")
      .select(col("window_start"), col("event_type"), col("n"))
    val batch = graft.tables.TestTables.events(spark, sf)
      .groupBy(window(col("ts"), "10 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("streaming dedup equals batch first-per-key (within watermark)") {
    val streamed = runToMemory(
      Ingest.dedupWithinWatermark(streamEvents, "ts", "2 hours", Seq("user_id", "event_type")),
      "dedup_out", "append")
    val batchCount = graft.tables.TestTables.events(spark, sf)
      .dropDuplicates(Seq("user_id", "event_type", "ts")).count()
    assert(streamed.count() == batchCount)
  }

  test("stream-static enrichment join matches the batch join, dims broadcast per micro-batch") {
    val dim = graft.tables.TestTables.events(spark, sf)
      .select(col("user_id")).distinct()
      .withColumn("tier", when(col("user_id") % 3 === 0, "gold").otherwise("standard"))
      // hold back a third of the dim so the LEFT join semantics (unmatched
      // stream rows survive with NULL tier) are actually exercised
      .filter(col("user_id") % 7 =!= 0)
    val streamed = runToMemory(
      Ingest.enrichWithDim(streamEvents, dim, Seq("user_id"))
        .select(col("event_id"), col("user_id"), col("tier")), "enrich_out", "append")
    val batch = graft.tables.TestTables.events(spark, sf)
      .join(broadcast(dim), Seq("user_id"), "left")
      .select(col("event_id"), col("user_id"), col("tier"))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    assert(streamed.filter(col("tier").isNull).count() > 0,
      "held-back dim keys must appear as NULL-tier rows, not vanish")
  }

  test("checkpointed file ingest restarts exactly-once: no reprocessing, no gaps") {
    val base = java.nio.file.Files.createTempDirectory("graft_restart").toString
    val landing = s"$base/landing"; val outDir = s"$base/out"; val ckpt = s"$base/ckpt"
    val docs = graft.tables.TestTables.documents(spark, sf)
    val schema = docs.schema
    // wave 1 lands, the query drains it and stops
    docs.filter(col("doc_id") < 200).write.mode("overwrite").parquet(landing)
    def start() = Ingest.fileIngest(spark, landing, schema,
        b => b.select(col("doc_id")),
        (b, _) => b.write.mode("append").parquet(outDir))
      .option("checkpointLocation", ckpt).start()
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    val afterWave1 = spark.read.parquet(outDir).count()
    // wave 2 lands while the query is DOWN; the restart must pick up only
    // the new files (offsets come from the checkpoint, not the directory)
    docs.filter(col("doc_id") >= 200 && col("doc_id") < 300)
      .write.mode("append").parquet(landing)
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    val out = spark.read.parquet(outDir)
    assert(afterWave1 == docs.filter(col("doc_id") < 200).count())
    assert(out.count() == docs.filter(col("doc_id") < 300).count(),
      "every landed doc exactly once across the restart")
    assert(out.groupBy("doc_id").count().filter(col("count") > 1).count() == 0,
      "restart must not reprocess wave-1 files")
  }

  test("session windows produce bounded per-user sessions") {
    val streamed = runToMemory(
      Ingest.sessionWindows(streamEvents, "ts", "2 hours", "30 minutes"), "sess_out", "append")
    assert(streamed.count() > 0)
    assert(streamed.filter(col("session_end") < col("session_start")).count() == 0)
  }

  test("fileIngest runs the FULL ingest pipeline per micro-batch (S8 loop, native)") {
    val dir = "/tmp/graft_stream_docs"
    graft.tables.TestTables.documents(spark, sf).write.mode("overwrite").parquet(dir)
    val schema = graft.tables.TestTables.documents(spark, sf).schema
    val chunkCount = new java.util.concurrent.atomic.AtomicLong(0)
    def blocksOf(docs: org.apache.spark.sql.DataFrame) = docs
      .select(col("doc_id"), posexplode(split(col("text"), "(?<=\\w) (?=batch|stream|join|table)"))
        .as(Seq("ord0", "content")))
      .withColumn("page", (col("ord0") / 5).cast("int"))
      .withColumn("font_size", when(col("ord0") % 7 === 0, 18.0).otherwise(10.0))
      .withColumn("y0", (col("ord0") % 5) * 150.0 + 60.0)
      .withColumn("x0", lit(72.0))
    val writer = Ingest.fileIngest(spark, dir, schema,
      process = docs => graft.pipeline.IngestPipeline.run(blocksOf(docs)),
      sink = (chunks, _) => chunkCount.addAndGet(chunks.count()))
    val q = writer.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val batchChunks = graft.pipeline.IngestPipeline.run(
      graft.pipeline.IngestPipeline.blocksFromDocuments(spark, sf)).count()
    assert(chunkCount.get() == batchChunks, "streamed pipeline must equal batch pipeline")
  }

  test("streaming exact chunker (flatMapGroupsWithState) matches batch chunkIdExact") {
    import spark.implicits._
    val rows = Seq(
      ("d1", 1L, 500L, false), ("d1", 2L, 500L, false), ("d1", 3L, 500L, false),
      ("d1", 4L, 100L, true), ("d1", 5L, 1300L, false),
      ("d2", 1L, 1200L, false), ("d2", 2L, 1L, false))
    val dir = "/tmp/graft_stream_blocks"
    rows.toDF("k", "ord", "len", "brk").write.mode("overwrite").parquet(dir)
    val src = spark.readStream
      .schema(spark.read.parquet(dir).schema).parquet(dir)
      .as[(String, Long, Long, Boolean)]
    val q = Ingest.chunkIdExactStream(src, 1200)
      .toDF("k", "ord", "chunk_id")
      .writeStream.format("memory").queryName("chunk_out").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("chunk_out").orderBy("k", "ord")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val batch = graft.ops.Chunking.chunkIdExact(rows.toDF("k", "ord", "len", "brk"),
        "k", "ord", "len", "brk", 1200)
      .orderBy("k", "ord")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(streamed == batch)
  }

  test("sessionizeStream matches batch Merge.sessionize across a restart (event-time)") {
    import spark.implicits._
    val base = 1700000000000000L // µs
    def ev(k: String, s: Long, tie: Long) = (k, base + s * 1000000L, tie)
    // A: events at 0s/30s (session 1) then 200s/230s (gap 170s → session 2)
    // B: 10s (session 1) then 400s (session 2)
    val p1 = Seq(ev("A", 0, 1), ev("A", 30, 2), ev("A", 200, 3), ev("B", 10, 1))
    val p2 = Seq(ev("A", 230, 4), ev("B", 400, 2))
    // far-future flushers: advance the watermark past every real event so
    // the tail emits; they stay buffered themselves and are excluded below
    val sentinels = Seq(ev("A", 100000, 99), ev("B", 100000, 99))
    val dir = "/tmp/graft_stream_sess"; val ckpt = "/tmp/graft_stream_sess_ckpt"
    val outDir = "/tmp/graft_stream_sess_out"
    Seq(dir, ckpt, outDir).foreach(p => org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    def write(rows: Seq[(String, Long, Long)]): Unit =
      rows.toDF("k", "us", "tie")
        .select(col("k"), expr("timestamp_micros(us)").as("ts"), col("tie"))
        .write.mode("append").parquet(dir)
    write(p1)
    val schema = spark.read.parquet(dir).schema
    def start() = Ingest.sessionizeStream(
        spark.readStream.schema(schema).parquet(dir), "ts", "k", "tie",
        watermark = "10 seconds", gapSeconds = 60)
      .writeStream.format("parquet").option("path", outDir).outputMode("append")
      .option("checkpointLocation", ckpt).start()
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    // phase-1 run must already flush everything the watermark passed
    // (190s horizon → A@0, A@30, B@10) but hold A@200
    assert(spark.read.parquet(outDir).count() == 3,
      "expected exactly the 3 watermark-passed rows after run 1")
    write(p2 ++ sentinels)
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    def tup(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val streamed = tup(spark.read.parquet(outDir).collect()).filterNot(_._3 == 99L).sorted
    val batch = graft.ops.Merge.sessionize(
        (p1 ++ p2).toDF("k", "us", "tie")
          .select(col("k"), expr("timestamp_micros(us)").as("ts"), col("tie")),
        Seq(col("k")), col("ts"), col("tie"), gapSeconds = 60)
      .select(col("k"), unix_micros(col("ts")).as("us"), col("tie"), col("session_id"))
      .collect()
    assert(streamed == tup(batch).sorted,
      s"stream/batch session ids diverge:\n stream=$streamed\n batch=${tup(batch).sorted}")
    // the restart carried (last_ts, session_counter) through the
    // checkpoint: A@200 emitted in run 2 must open session 2, not restart at 1
    assert(streamed.collect { case ("A", ts, _, sid) if ts == base + 200000000L => sid } == Seq(2L))
  }

  test("sessionizeStream idle-key expiry shrinks state; live keys keep parity; reappearing key renumbers") {
    import spark.implicits._
    val base = 1700000000000000L // µs
    def ev(k: String, s: Long, tie: Long) = (k, base + s * 1000000L, tie)
    val dir = "/tmp/graft_sess_exp"; val ckpt = "/tmp/graft_sess_exp_ckpt"
    val outDir = "/tmp/graft_sess_exp_out"
    Seq(dir, ckpt, outDir).foreach(p => org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    def write(rows: Seq[(String, Long, Long)]): Unit =
      rows.toDF("k", "us", "tie")
        .select(col("k"), expr("timestamp_micros(us)").as("ts"), col("tie"))
        .write.mode("append").parquet(dir)
    write(Seq(ev("A", 0, 1), ev("A", 30, 2), ev("B", 10, 1)))
    val schema = spark.read.parquet(dir).schema
    // one run per appended file = one micro-batch against the checkpointed
    // watermark; expiry 600 s, so the C-sentinel watermark jumps expire A/B
    def run(): Long = {
      val q = Ingest.sessionizeStream(
          spark.readStream.schema(schema).parquet(dir), "ts", "k", "tie",
          watermark = "10 seconds", gapSeconds = 60, idleExpirySeconds = Some(600L))
        .writeStream.format("parquet").option("path", outDir).outputMode("append")
        .option("checkpointLocation", ckpt).start()
      q.processAllAvailable()
      val rows = Option(q.lastProgress).map(_.stateOperators(0).numRowsTotal).getOrElse(-1L)
      q.stop()
      rows
    }
    val afterBuffer = run()            // run 1: A/B buffered (wm starts at 0)
    assert(afterBuffer == 2, s"expected A,B buffered in state, got $afterBuffer")
    write(Seq(ev("C", 100000, 99)))
    // run 2: the data batch (wm 20s) emits A@0/B@10; the watermark then
    // jumps to 99990s and the engine immediately runs a TIMEOUT batch in
    // which A@30 flushes and both idle keys pass the 600s expiry → removed
    val afterExpiry = run()
    assert(afterExpiry == 1, s"expected only the pending sentinel key after expiry, got $afterExpiry")
    // live-key parity up to expiry: identical to batch sessionize
    def emitted() = spark.read.parquet(outDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .filterNot(_._3 == 99L).toSeq.sorted
    val batchRef = graft.ops.Merge.sessionize(
        Seq(ev("A", 0, 1), ev("A", 30, 2), ev("B", 10, 1)).toDF("k", "us", "tie")
          .select(col("k"), expr("timestamp_micros(us)").as("ts"), col("tie")),
        Seq(col("k")), col("ts"), col("tie"), gapSeconds = 60)
      .select(col("k"), unix_micros(col("ts")).as("us"), col("tie"), col("session_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq.sorted
    assert(emitted() == batchRef, s"pre-expiry parity broke:\n ${emitted()}\n $batchRef")
    // the documented trade: A reappearing AFTER expiry restarts numbering
    write(Seq(ev("A", 100500, 5)))
    run()                              // run 3: new A buffered under fresh state
    write(Seq(ev("C", 300000, 99)))
    val tail = run()                   // run 4: wm → 299990s; timeout batch emits A, re-expires it
    val aLate = emitted().collect { case ("A", ts, _, sid) if ts == base + 100500000000L => sid }
    assert(aLate == Seq(1L), s"expired key must renumber from 1, got $aLate")
    assert(tail == 1, s"reborn A must re-expire after emit, got $tail")
  }

  test("stream-stream interval join matches the batch recentPairs predicate") {
    import spark.implicits._
    val base = 1700000000000000L // µs
    def row(id: Long, u: Long, s: Long) = (id, u, base + s * 1000000L)
    // window 100 s: click c1@200 sees views @100(boundary, kept), @150, @200
    // (equal ts, kept) but NOT @99 (past) or @201 (future); c2 has no views
    val clicks = Seq(row(1L, 7L, 200), row(2L, 8L, 500))
    val views = Seq(row(10L, 7L, 99), row(11L, 7L, 100), row(12L, 7L, 150),
      row(13L, 7L, 200), row(14L, 7L, 201), row(15L, 9L, 150))
    val dir = "/tmp/graft_ssj"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    clicks.toDF("click_id", "user_id", "c_us")
      .select(col("click_id"), col("user_id"), expr("timestamp_micros(c_us)").as("c_ts"))
      .write.parquet(s"$dir/clicks")
    views.toDF("view_id", "user_id", "v_us")
      .select(col("view_id"), col("user_id"), expr("timestamp_micros(v_us)").as("v_ts"))
      .write.parquet(s"$dir/views")
    def src(name: String) = spark.readStream
      .schema(spark.read.parquet(s"$dir/$name").schema).parquet(s"$dir/$name")
    val joined = Ingest.streamStreamJoin(src("clicks"), src("views"),
      "user_id", "c_ts", "v_ts", watermark = "10 seconds", window = "100 seconds")
    val streamed = runToMemory(
        joined.select(col("click_id"), col("view_id")), "ssj_out", "append")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val batch = graft.ops.Temporal.recentPairs(
        clicks.toDF("click_id", "user_id", "c_us"),
        views.toDF("view_id", "user_id", "v_us"),
        "user_id", "c_us", "v_us", 100000000L)
      .select(col("click_id"), col("view_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(batch == Seq((1L, 11L), (1L, 12L), (1L, 13L)),
      s"batch pairing must keep both inclusive bounds and drop the rest: $batch")
    assert(streamed == batch, s"stream=$streamed batch=$batch")
  }

  test("left-outer stream-stream join emits funnel misses after watermark passage") {
    import spark.implicits._
    val base = 1700000000000000L
    val dir = "/tmp/graft_ssj_outer"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    def write(name: String, rows: Seq[(Long, Long, Long)], ts: String): Unit =
      rows.toDF("id", "user_id", "us")
        .select(col("id"), col("user_id"), expr("timestamp_micros(us)").as(ts))
        .write.mode("append").parquet(s"$dir/$name")
    // c1 (user 7) has a view in-window; c2 (user 8) has none → funnel miss
    write("clicks", Seq((1L, 7L, base + 200000000L), (2L, 8L, base + 500000000L)), "c_ts")
    write("views", Seq((10L, 7L, base + 150000000L)), "v_ts")
    def src(name: String) = spark.readStream
      .schema(spark.read.parquet(s"$dir/$name").schema).parquet(s"$dir/$name")
    val joined = Ingest.streamStreamJoin(
      src("clicks").withColumnRenamed("id", "click_id"),
      src("views").withColumnRenamed("id", "view_id"),
      "user_id", "c_ts", "v_ts", watermark = "10 seconds", window = "100 seconds",
      joinType = "left_outer")
    val q = joined.select(col("click_id"), col("view_id"))
      .writeStream.format("memory").queryName("ssj_outer").outputMode("append").start()
    q.processAllAvailable()
    // two sentinel waves on BOTH sides: the query watermark is the min of
    // the two streams', it updates at end-of-batch, and state eviction
    // (which emits the outer rows) runs in the batch AFTER the update
    for (wave <- 1 to 2) {
      write("clicks", Seq((900L + wave, 99L, base + 100000000000L)), "c_ts")
      write("views", Seq((990L + wave, 99L, base + 100000000000L)), "v_ts")
      q.processAllAvailable()
    }
    q.stop()
    val rows = spark.table("ssj_outer").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq
    assert(rows.contains((1L, 10L)), s"matched pair must emit: $rows")
    assert(rows.contains((2L, -1L)),
      s"the view-less click must surface with a NULL view once expired: $rows")
  }

  test("appendLogSink persists the stream as append-mode parquet (S7 QA log)") {
    val out = "/tmp/graft_qalog_out"; val ckpt = "/tmp/graft_qalog_ckpt"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    val q = Ingest.appendLogSink(streamEvents.select("event_id", "ts", "event_type"), out, ckpt).start()
    q.awaitTermination(60000)
    val logged = spark.read.parquet(out)
    assert(logged.count() == graft.tables.TestTables.events(spark, sf).count())
    // T4 last-N read-back over the log
    val lastN = logged.orderBy(col("ts").desc, col("event_id").desc).limit(5).collect()
    assert(lastN.length == 5)
  }

  test("text-analysis + sampling ops run unchanged under structured streaming") {
    // map-only operators (quality score, language id, hash sampling, native
    // signatures) must be streamable as-is: same expressions, same rows
    val dir = "/tmp/graft_stream_docs"
    graft.functions.GraftFunctions.register(spark)
    val docs = graft.tables.TestTables.documents(spark, sf)
    docs.write.mode("overwrite").parquet(dir)
    val streamDocs = spark.readStream.schema(docs.schema).parquet(dir)
    def enrich(df: org.apache.spark.sql.DataFrame) = df
      .filter(graft.ops.TextAnalysis.hashSamplePredicate(col("doc_id"), 0.5))
      .select(col("doc_id"),
        graft.ops.TextAnalysis.qualityScore(col("text"), Seq("the", "a", "of")).as("quality"),
        graft.ops.Dedup.simHash(col("text"), 16).as("sim"),
        graft.ops.Pii.redact(col("text")).as("clean"),
        graft.ops.TextAnalysis.assignSplit(col("doc_id"), Seq("train" -> 0.8, "val" -> 0.9), "test").as("split"),
        size(graft.ops.TextAnalysis.winnowingFingerprints(lower(col("text")), 5, 4)).as("n_fp"),
        // round-5 map-only natives stream as-is too
        expr("size(cdc_boundaries(coalesce(text, ''), 16, 64))").as("n_cdc"))
    val streamed = runToMemory(enrich(streamDocs), "ta_out", "append")
    val batch = enrich(docs)
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("incremental dedup runs in a foreachBatch ingest loop, matching the batch result") {
    // the production loop: each arriving micro-batch is deduped against the
    // standing corpus before admission — same operator, same results
    val docs = graft.tables.TestTables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") % 4 =!= 0)
    val batchDocs = docs.filter(col("doc_id") % 4 === 0)
    val dir = "/tmp/graft_stream_incr"
    batchDocs.coalesce(1).write.mode("overwrite").parquet(dir)
    val admitted = scala.collection.mutable.Set[Long]()
    val q = spark.readStream.schema(docs.schema).parquet(dir)
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.ops.Dedup.dedupAgainstCorpus(b, corpus, "doc_id", "text")
          .select("doc_id").collect().foreach(r => admitted.synchronized { admitted += r.getLong(0) })
        ()
      }.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "streaming incremental dedup did not finish in time")
    val expected = graft.ops.Dedup.dedupAgainstCorpus(batchDocs, corpus, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted.toSet == expected && expected.nonEmpty)
  }

  test("HLL register ledger maintained in a foreachBatch loop equals the batch sketch") {
    // the incremental accounting loop sk2 is for: each micro-batch's
    // registers are MERGED into a standing ledger (register-wise max) —
    // after any number of batches the ledger is register-identical to a
    // one-shot sketch of everything, so estimates never drift from the
    // batch truth
    import graft.ops.Hll
    val docs = graft.tables.TestTables.documents(spark, sf)
      .select(col("source"), col("doc_id"),
        explode(graft.ops.Dedup.wordShingles(col("text"), 4)).as("w"))
    val dir = "/tmp/graft_stream_hll"
    docs.coalesce(4).write.mode("overwrite").parquet(dir) // >1 file → several micro-batches
    var ledger = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      new org.apache.spark.sql.types.StructType()
        .add("source", "string").add("bucket", "int").add("rho", "int"))
    val q = spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(dir)
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        ledger.synchronized {
          ledger = Hll.merge(
            ledger.union(Hll.registers(b, Seq("source"), col("w"))), Seq("source"))
            .localCheckpoint()
        }
        ()
      }.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "streaming HLL ledger did not finish in time")
    val whole = Hll.registers(docs, Seq("source"), col("w"))
    assert(ledger.except(whole).isEmpty && whole.except(ledger).isEmpty,
      "ledger after N micro-batches must be register-identical to the one-shot sketch")
    val est = Hll.estimate(ledger, Seq("source"))
    assert(est.count() > 0 && est.filter(col("est_distinct") <= 0).count() == 0)
  }

  test("KMV bottom-k ledger maintained in a foreachBatch loop equals the batch sketch") {
    // sk3's merge algebra under streaming: each micro-batch's bottom-k
    // rows merge into a standing k-row-per-key ledger; after any number
    // of batches the ledger is SET-identical (pos and hash) to a one-shot
    // sketch of everything — the distinct-sample never drifts
    import graft.ops.Kmv
    val docs = graft.tables.TestTables.documents(spark, sf)
      .select(col("source"), col("doc_id"),
        explode(graft.ops.Dedup.wordShingles(col("text"), 4)).as("w"))
    val dir = "/tmp/graft_stream_kmv"
    docs.coalesce(4).write.mode("overwrite").parquet(dir)
    var ledger = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      new org.apache.spark.sql.types.StructType()
        .add("source", "string").add("h", "string"))
    val q = spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(dir)
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        ledger.synchronized {
          ledger = Kmv.merge(
              ledger.union(Kmv.sketch(b, Seq("source"), col("w")).select("source", "h")),
              Seq("source"))
            .select("source", "h").localCheckpoint()
        }
        ()
      }.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "streaming KMV ledger did not finish in time")
    val whole = Kmv.sketch(docs, Seq("source"), col("w")).select("source", "h")
    assert(ledger.except(whole).isEmpty && whole.except(ledger).isEmpty,
      "ledger after N micro-batches must be set-identical to the one-shot sketch")
  }

  test("WebDataset tar shards stream through foreachBatch, matching the batch assembly") {
    // the 100 TB ingest loop for shard corpora: shards land as binary rows,
    // each micro-batch walks members, decodes images, reassembles samples —
    // the wds1 shape running incrementally with no semantic drift
    import graft.ops.{Jpeg, Tar}
    val shards = (0 until 12).map { s =>
      val members = (0 until 2).flatMap { k =>
        val key = s"${s}_$k"
        val v = (s * 31 + k * 7) % 256
        Seq(s"$key.jpg" -> Jpeg.encodeGray(8, 8, Array.fill(64)(v.toByte)),
          s"$key.cls" -> ((s + k) % 10).toString.getBytes("UTF-8"))
      }
      (s.toLong, Tar.encodeTar(members))
    }
    import spark.implicits._
    val df = shards.toDF("shard_id", "payload")
    val dir = "/tmp/graft_stream_wds"
    df.repartition(3).write.mode("overwrite").parquet(dir) // several micro-batch files
    def assemble(b: org.apache.spark.sql.DataFrame) = {
      val m = Tar.memberStage(b, "payload", "m").filter(col("m").isNotNull)
        .select(col("shard_id"), col("m.sample_key").as("sample_key"),
          col("m.ext").as("ext"), col("m.data").as("data"))
        .withColumn("jpg_data", when(col("ext") === "jpg", col("data")))
      Jpeg.decodeStatsStage(m, "jpg_data", "st")
        .groupBy("shard_id", "sample_key")
        .agg(max(when(col("ext") === "cls", col("data").cast("string").cast("int"))).as("label"),
          max(col("st.pixel_sum")).as("pixel_sum"))
    }
    val acc = scala.collection.mutable.Set[(Long, String, Int, Long)]()
    val q = spark.readStream.schema(df.schema).parquet(dir)
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        assemble(b).collect().foreach(r => acc.synchronized {
          acc += ((r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3)))
        })
        ()
      }.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "streaming shard ingest did not finish in time")
    val expected = assemble(df).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getLong(3))).toSet
    assert(acc.toSet == expected && expected.size == 24)
    // and the planted values really flowed through the JPEG decode
    assert(acc.exists { case (s, _, _, ps) => ps == 64L * ((s * 31) % 256) })
  }

  test("Avro container shards stream through foreachBatch, matching the batch decode") {
    // the data-lake twin of the WebDataset loop: Avro shards land as
    // binary rows, each micro-batch runs the container walk — block
    // quarantine included — with no semantic drift vs one-shot batch
    import graft.ops.Avro
    val fieldsDef = Seq(
      Avro.Field("id", "long", nullable = false),
      Avro.Field("text", "string", nullable = false))
    val shards = (0 until 9).map { s =>
      val recs = (0 until 4).map(k => Seq[Any](s * 10L + k, "x" * (k + 1)))
      (s.toLong, Avro.encode(fieldsDef, recs,
        codec = if (s % 2 == 0) "deflate" else "null", recordsPerBlock = 2,
        syncSeed = s, corruptBlock = if (s % 3 == 0) Some(1) else None))
    }
    import spark.implicits._
    val df = shards.toDF("shard_id", "payload")
    val dir = "/tmp/graft_stream_avro"
    df.repartition(3).write.mode("overwrite").parquet(dir)
    def decode(b: org.apache.spark.sql.DataFrame) =
      Avro.recordStage(b, "payload", "st")
        .select(col("shard_id"), col("st.block_idx").as("bi"),
          col("st.record_idx").as("ri"), col("st.parsed").as("p"), col("st.id").as("id"))
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), if (r.isNullAt(1)) -1 else r.getInt(1),
        if (r.isNullAt(2)) -1 else r.getInt(2), r.getBoolean(3),
        if (r.isNullAt(4)) -1L else r.getLong(4))
    val acc = scala.collection.mutable.Set[(Long, Int, Int, Boolean, Long)]()
    val q = spark.readStream.schema(df.schema).parquet(dir)
      .writeStream.foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        decode(b).collect().foreach(r => acc.synchronized { acc += key(r) })
        ()
      }.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "streaming avro ingest did not finish in time")
    val expected = decode(df).collect().map(key).toSet
    assert(acc.toSet == expected)
    // every third shard really exercised block quarantine mid-stream
    assert(expected.exists { case (s, bi, _, p, _) => s % 3 == 0 && bi == 1 && !p })
    assert(expected.count { case (_, _, _, p, _) => p } == 9 * 4 - 3 * 2)
  }

  test("fileIngest foreachBatch runs the batch pipeline per micro-batch") {
    val dir = "/tmp/graft_stream_src"
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    val schema = graft.tables.TestTables.events(spark, sf).schema
    val writer = Ingest.fileIngest(spark, dir, schema,
      process = df => df.filter(col("event_type") === "purchase"),
      sink = (batch, _) => seen.addAndGet(batch.count()))
    val q = writer.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val expected = graft.tables.TestTables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(seen.get() == expected)
  }
}
