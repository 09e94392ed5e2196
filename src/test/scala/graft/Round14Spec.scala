package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.ops.DeltaLog

/** Round-14 regression fixtures: the four r13 ADVICE items — clone
  * renumbering must keep an add ahead of side actions that ride its
  * exact coordinates, generated-coverage must compare the whole bucket
  * array (not endpoints+size), cloneBreakage must emit one at-risk row
  * per path, and table-property values may contain '='. Hand-built
  * action sets, independent of the query builders.
  */
class Round14Spec extends SparkSpec {

  private def add(v: Int, o: Int, path: String, nRows: Long = 10L,
                  minK: Long = 1L, maxK: Long = 10L): Row =
    Row(v, o, "add", path, Seq(0L), nRows, minK, maxK, 100L, null, null, null, null, null)
  private def rem(v: Int, o: Int, path: String): Row =
    Row(v, o, "remove", path, null, null, null, null, null, null, null, null, null, null)
  private def rids(v: Int, o: Int, path: String, segs: String): Row =
    Row(v, o, "rids", path, null, null, null, null, null, null, segs, null, null, null)
  private def frame(rows: Row*) =
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), DeltaLog.actionSchema)

  // ---- clone renumbering: add-first tie-break on shared coordinates --------

  test("cloneActions orders an add before a rids riding its exact coordinates") {
    // assignRidActions' convention: the rids side action rides its add's
    // EXACT (version, ordinal). Before the tie-break, row_number could
    // renumber the rids row FIRST, and the instance-birth filter
    // (side coords >= add coords) would silently unbind the id map in
    // the clone (r13 ADVICE — the old code passed via union-order luck).
    val acts = frame(add(0, 0, "a"), add(1, 5, "f", 7L))
      .unionByName(frame(rids(1, 5, "f", "0:100:7")))
    val clone = DeltaLog.cloneActions(acts, 1).localCheckpoint()
    val f = clone.filter(col("path") === "f")
      .select("op", "ordinal").collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(f("add") < f("rids"),
      s"clone must renumber the add before its rids side action: $f")
    // and the map must BIND in the clone: tracked reads resolve one
    // segment row for f with the original rid base
    val segs = DeltaLog.ridSegments(clone).filter(col("path") === "f").collect()
    assert(segs.length == 1, s"rid map must bind in the clone: ${segs.toSeq}")
    val seg = segs.head.getSeq[Row](1)
    assert(seg.map(s => (s.getLong(0), s.getLong(1), s.getLong(2))) == Seq((0L, 100L, 7L)),
      s"clone must preserve the segment payload: ${seg.toSeq}")
  }

  // ---- generated coverage: exact sequence compare ---------------------------

  test("enforceGeneratedCoverage rejects a duplicate-entry bucket array") {
    val W = DeltaLog.W
    val acts = frame(add(0, 0, "base"))
      .unionByName(DeltaLog.propsAction(spark, 1, 0, "gen.buckets=key_div_w"))
      .localCheckpoint()
    def txnWith(bks: Seq[Long]) = spark.createDataFrame(java.util.Arrays.asList(
      Row(2, 0, "add", "new", bks, 30L, 0L * W, 2L * W + 10L, 100L,
        null, null, null, null, null)), DeltaLog.actionSchema)
    // [0,0,2] passes the old endpoints+size check (ends 0 and 2, size 3)
    // while bucket 1 is uncovered — the exact coverage lie the gate
    // exists to catch (r13 ADVICE)
    val ex = intercept[Exception] {
      DeltaLog.enforceGeneratedCoverage(acts, txnWith(Seq(0L, 0L, 2L))).collect()
    }
    assert(ex.getMessage.contains("coverage disagrees"), ex.getMessage)
    // the honest contiguous array still commits
    val ok = DeltaLog.enforceGeneratedCoverage(acts, txnWith(Seq(0L, 1L, 2L))).collect()
    assert(ok.count(_.getString(2) == "add") == 1)
  }

  // ---- cloneBreakage: one at-risk row per path ------------------------------

  test("cloneBreakage reports a removed-and-re-added path exactly once") {
    // path p: added v0 with 10 rows, removed v1, re-added v2 with 20
    // rows, removed v3. distinct(path, n_rows) used to yield TWO ever
    // rows for p (r13 ADVICE); latest-instance wins now.
    val src = frame(
      add(0, 0, "p", 10L), add(0, 1, "q", 5L),
      rem(1, 0, "p"), add(2, 0, "p", 20L), rem(3, 0, "p"))
    val clone = DeltaLog.cloneActions(src, 2) // p live in the clone
    val atRisk = DeltaLog.cloneBreakage(src, clone, 3).collect()
    assert(atRisk.length == 1, s"one at-risk row per path: ${atRisk.toSeq}")
    assert(atRisk.head.getString(0) == "p" && atRisk.head.getLong(1) == 20L,
      s"latest instance's n_rows must win: ${atRisk.head}")
  }

  // ---- table properties: values may contain '=' -----------------------------

  test("activeProps round-trips values containing '='") {
    val acts = frame(add(0, 0, "a")).unionByName(
      DeltaLog.propsAction(spark, 1, 0, "tok=abc=def;url=http://h/p?a=1&b==2"))
    val got = DeltaLog.activeProps(acts).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("tok" -> "abc=def", "url" -> "http://h/p?a=1&b==2"), got.toString)
    // still torn: an entry with no '=' at all, or an empty key
    val torn = frame(add(0, 0, "a")).unionByName(
      DeltaLog.propsAction(spark, 1, 0, "novalue;k=v"))
    val ex1 = intercept[Exception] { DeltaLog.activeProps(torn).collect() }
    assert(ex1.getMessage.contains("torn table property"), ex1.getMessage)
    val emptyKey = frame(add(0, 0, "a")).unionByName(
      DeltaLog.propsAction(spark, 1, 0, "=v"))
    val ex2 = intercept[Exception] { DeltaLog.activeProps(emptyKey).collect() }
    assert(ex2.getMessage.contains("torn table property"), ex2.getMessage)
  }

  // ---- dl33: exactly-once streaming sink into the log ----------------------

  test("streaming foreachBatch sink through the log is exactly-once across replay and restart") {
    val base = java.nio.file.Files.createTempDirectory("graft_txnsink").toString
    val landing = s"$base/landing"; val ckpt = s"$base/ckpt"
    val docs = graft.tables.TestTables.documents(spark, "/root/testdata/sf0.001")
    val schema = docs.schema
    @volatile var acts = frame(add(0, 0, "seed")).localCheckpoint()
    @volatile var head = 0
    val outcomes = scala.collection.mutable.Buffer.empty[String]
    val lock = new Object
    def sink(b: org.apache.spark.sql.DataFrame, id: Long): Unit = lock.synchronized {
      val stats = b.agg(count(lit(1)).as("n_rows"), min("doc_id").as("min_key"),
        max("doc_id").as("max_key"), lit(0L).as("cents"))
      val txn = DeltaLog.addAction(stats, 90, 1000, s"batch-$id", array(lit(id)))
      val (a2, out) = DeltaLog.commitEpochIdempotent(acts, txn, "ingest-app", id, head)
      if (out.outcome == "committed") head += 1
      acts = a2; outcomes += s"$id:${out.outcome}"
    }
    docs.filter(col("doc_id") < 200).write.mode("overwrite").parquet(landing)
    def start() = graft.stream.Ingest.fileIngest(spark, landing, schema,
        b => b, (b, id) => sink(b, id))
      .option("checkpointLocation", ckpt).start()
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    val liveAfter1 = DeltaLog.replay(acts).count()
    // the foreachBatch replay contract: after a crash-restart the LAST
    // epoch may be re-delivered; re-deliver it by hand and demand a no-op
    sink(spark.read.parquet(landing), 0L)
    assert(outcomes.last == "0:skipped_duplicate", outcomes.mkString(","))
    assert(DeltaLog.replay(acts).count() == liveAfter1,
      "a replayed epoch must not change the live set")
    // wave 2 lands while the query is down; the restart continues epochs
    docs.filter(col("doc_id") >= 200 && col("doc_id") < 300)
      .write.mode("append").parquet(landing)
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    assert(outcomes.toSeq == Seq("0:committed", "0:skipped_duplicate", "1:committed"),
      outcomes.mkString(","))
    val paths = DeltaLog.replay(acts).select("path").collect().map(_.getString(0)).toSet
    assert(paths == Set("seed", "batch-0", "batch-1"),
      s"exactly one file per epoch: $paths")
    assert(DeltaLog.lastTxnVersion(acts, "ingest-app").head().getLong(0) == 1L)
  }

  test("commitEpochIdempotent race window: slot theft retries; same-app theft skips") {
    val base = frame(add(0, 0, "seed")).localCheckpoint()
    def ep(path: String) = DeltaLog.addAction(
      spark.range(1).select(lit(5L).as("n_rows"), lit(1L).as("min_key"),
        lit(5L).as("max_key"), lit(50L).as("cents")),
      90, 1000, path, array(lit(0L)))
    // an UNRELATED writer steals the slot between probe and write: the
    // epoch loop must go around and land on the next slot
    val other = DeltaLog.addAction(
      spark.range(1).select(lit(2L).as("n_rows"), lit(6L).as("min_key"),
        lit(7L).as("max_key"), lit(20L).as("cents")),
      1, 0, "other", array(lit(1L)))
    val (acts1, out1) = DeltaLog.commitEpochIdempotent(base, ep("e0"), "app", 0L, 0,
      contention = a => if (a == 1) Some(other) else None)
    assert(out1.outcome == "committed" &&
      out1.attempts.map(_.outcome) == Seq("retry_version_taken", "committed") &&
      out1.attempts.last.target == 2, out1.toString)
    assert(DeltaLog.replay(acts1).collect().map(_.getString(0)).toSet ==
      Set("seed", "other", "e0"))
    // ANOTHER INSTANCE OF THE SAME APP commits our epoch in the race
    // window: the retry's fused probe must discover it and SKIP — this is
    // the double-write the txn marker exists to fence
    val twinCommit = ep("e1-twin")
      .unionByName(DeltaLog.txnAction(spark, 0, 100000, "app", 1L))
      .withColumn("version", lit(3))
    val (acts2, out2) = DeltaLog.commitEpochIdempotent(acts1, ep("e1-mine"), "app", 1L, 2,
      contention = a => if (a == 1) Some(twinCommit) else None)
    assert(out2.outcome == "skipped_duplicate", out2.toString)
    val paths = DeltaLog.replay(acts2).collect().map(_.getString(0)).toSet
    assert(paths.contains("e1-twin") && !paths.contains("e1-mine"),
      s"the twin's epoch stands, ours never lands: $paths")
    assert(DeltaLog.lastTxnVersion(acts2, "app").head().getLong(0) == 1L)
  }

  test("txn markers: strict parse, checkpoint retention, clone drops them") {
    val acts = frame(add(0, 0, "a"))
      .unionByName(DeltaLog.txnAction(spark, 1, 0, "app-X", 3L))
      .unionByName(DeltaLog.txnAction(spark, 2, 0, "app-X", 4L))
    // latest marker wins; unseen app is -1
    assert(DeltaLog.lastTxnVersion(acts, "app-X").head().getLong(0) == 4L)
    assert(DeltaLog.lastTxnVersion(acts, "app-Y").head().getLong(0) == -1L)
    // checkpoint retains exactly the LATEST marker per app
    val ck = DeltaLog.checkpointState(acts)
    val txnRows = ck.filter(col("op") === "txn").collect()
    assert(txnRows.length == 1 && txnRows.head.getString(10) == "4", txnRows.toSeq.toString)
    // a clone is a new table: no txn markers carry over
    assert(DeltaLog.cloneActions(acts, 2).filter(col("op") === "txn").isEmpty)
    // torn payload raises instead of silently re-applying an epoch
    val torn = frame(add(0, 0, "a"),
      Row(1, 0, "txn", "_txn:app-Z", null, null, null, null, null, null, "x3", null, null, null))
    val ex = intercept[Exception] { DeltaLog.lastTxnVersion(torn, "app-Z").collect() }
    assert(ex.getMessage.contains("torn txn action"), ex.getMessage)
  }

  // ---- dl34: three-branch MERGE cardinality guard --------------------------

  test("mergeActionsBySource raises on rewrite cardinality mismatch") {
    import spark.implicits._
    val acts = frame(Row(0, 0, "add", "a", Seq(0L), 4L, 1L, 4L, 40L,
      null, null, null, null, null)).localCheckpoint()
    val live = DeltaLog.replay(acts)
    val dvs = DeltaLog.deletionVectors(acts)
    val positioned = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
      .map { case (pos, k) => ("a", pos, k, 10L) }
      .toDF("path", "pos", "o_orderkey", "cents")
    val matched = col("o_orderkey") % 2 === 0      // keys 2, 4
    val nmbs = col("o_orderkey") === 1             // NMBS delete, never rewritten
    def addsOf(n: Long) = DeltaLog.addAction(
      spark.range(1).select(lit(n).as("n_rows"), lit(2L).as("min_key"),
        lit(4L).as("max_key"), lit(n * 10).as("cents")),
      1, 1000, "rw", lit(null).cast(org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType)))
    val nIns0 = spark.range(1).select(lit(0L).as("n_ins"))
    // correct: 2 matched + 0 inserts = rewrite of 2 → commits, mask [0,1,3]
    val ok = DeltaLog.mergeActionsBySource(live, dvs, positioned, matched, nmbs,
      1, addsOf(2), nIns0).localCheckpoint()
    val mask = ok.filter(col("op") === "dv").select(explode(col("dv"))).collect()
      .map(_.getLong(0)).toSet
    assert(mask == Set(0L, 1L, 3L), s"mask must cover matched+nmbs rows: $mask")
    // an NMBS row smuggled into the rewrite (3 rows) must raise
    val ex = intercept[Exception] {
      DeltaLog.mergeActionsBySource(live, dvs, positioned, matched, nmbs,
        1, addsOf(3), nIns0).collect()
    }
    assert(ex.getMessage.contains("merge rewrite cardinality mismatch"), ex.getMessage)
  }

  // ---- dl36: REPLACE WHERE containment guard -------------------------------

  test("replaceWhereActions raises when written data falls outside the predicate region") {
    import spark.implicits._
    val acts = frame(add(0, 0, "a", 10L, 1L, 100L)).localCheckpoint()
    val live = DeltaLog.replay(acts)
    val dvs = DeltaLog.deletionVectors(acts)
    val positioned = (0L until 10L).map(p => ("a", p, p * 10 + 1, 100L))
      .toDF("path", "pos", "o_orderkey", "cents")
    val pred = col("o_orderkey").between(1, 50)
    def addWith(minK: Long, maxK: Long) = DeltaLog.addAction(
      spark.range(1).select(lit(3L).as("n_rows"), lit(minK).as("min_key"),
        lit(maxK).as("max_key"), lit(300L).as("cents")),
      1, 1000, "rw", lit(null).cast(org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.LongType)))
    val guard = col("min_key") >= 1 && col("max_key") <= 50
    // in-region content commits
    val ok = DeltaLog.replaceWhereActions(live, dvs, positioned, pred, 1,
      addWith(5, 45), guard).collect()
    assert(ok.exists(r => r.getString(2) == "add" && r.getString(3) == "rw"))
    // content leaking past the region raises — the Delta replaceWhere
    // containment invariant
    val ex = intercept[Exception] {
      DeltaLog.replaceWhereActions(live, dvs, positioned, pred, 1,
        addWith(5, 77), guard).collect()
    }
    assert(ex.getMessage.contains("outside the declared predicate region"), ex.getMessage)
    // unverifiable (null) stats are not silently admitted
    val nullAdd = addWith(5, 45).withColumn("max_key",
      lit(null).cast(org.apache.spark.sql.types.LongType))
    val ex2 = intercept[Exception] {
      DeltaLog.replaceWhereActions(live, dvs, positioned, pred, 1, nullAdd, guard).collect()
    }
    assert(ex2.getMessage.contains("outside the declared predicate region"), ex2.getMessage)
  }

  // ---- dl37: REORG PURGE guards --------------------------------------------

  test("reorgPurgeActions guards: missing net stats, stray stats, wrong cardinality") {
    import spark.implicits._
    val acts = frame(
      Row(0, 0, "add", "m", Seq(3L), 10L, 1L, 10L, 100L, null, null, null, null, null),
      Row(0, 1, "add", "clean", Seq(4L), 5L, 11L, 20L, 50L, null, null, null, null, null),
      Row(1, 0, "dv", "m", null, null, null, null, null, Seq(2L, 5L), null, null, null, null))
      .localCheckpoint()
    val live = DeltaLog.replay(acts)
    val dvs = DeltaLog.deletionVectors(acts)
    def stats(rows: (String, Long, Long, Long, Long)*) =
      rows.toSeq.toDF("path", "n_rows", "min_key", "max_key", "cents")
    // clean purge: one remove + one purged- add, nothing for 'clean'
    val okRows = DeltaLog.reorgPurgeActions(live, dvs, stats(("m", 8L, 1L, 10L, 80L)), 2)
      .collect()
    assert(okRows.map(r => (r.getString(2), r.getString(3))).toSet ==
      Set(("remove", "m"), ("add", "purged-m")), okRows.toSeq.toString)
    // masked file with no net stats: loud, never a silent skip
    val exMissing = intercept[Exception] {
      DeltaLog.reorgPurgeActions(live, dvs, stats(), 2).collect()
    }
    assert(exMissing.getMessage.contains("without net stats"), exMissing.getMessage)
    // net stats for an unmasked path: caller confusion, refuse
    val exStray = intercept[Exception] {
      DeltaLog.reorgPurgeActions(live, dvs,
        stats(("m", 8L, 1L, 10L, 80L), ("clean", 5L, 11L, 20L, 50L)), 2).collect()
    }
    assert(exStray.getMessage.contains("not masked-live"), exStray.getMessage)
    // a rewrite that dropped a survivor: cardinality must match the mask
    val exCard = intercept[Exception] {
      DeltaLog.reorgPurgeActions(live, dvs, stats(("m", 7L, 1L, 10L, 70L)), 2).collect()
    }
    assert(exCard.getMessage.contains("net cardinality disagrees"), exCard.getMessage)
  }

  // ---- dl35: concurrent identity assignment is a conflict ------------------

  test("rebaseConflicts flags concurrent ident commits only for identity-assigning txns") {
    val base = frame(add(0, 0, "a", 5L)).localCheckpoint()
    val addB = DeltaLog.addAction(
      spark.range(1).select(lit(5L).as("n_rows"), lit(1L).as("min_key"),
        lit(5L).as("max_key"), lit(50L).as("cents")),
      90, 1000, "b", array(lit(0L)))
    val txnWithIdent = addB.unionByName(DeltaLog.assignIdentActions(base, addB))
    // writer A's identity commit lands at v1
    val identA = DeltaLog.assignIdentActions(base,
      DeltaLog.addAction(spark.range(1).select(lit(3L).as("n_rows"), lit(1L).as("min_key"),
        lit(3L).as("max_key"), lit(30L).as("cents")), 1, 1000, "ia", array(lit(0L))))
      .withColumn("version", lit(1))
    val acts1 = base.unionByName(identA)
    val conf = DeltaLog.rebaseConflicts(txnWithIdent, acts1, 0).collect()
    assert(conf.map(_.getString(3)).contains("ident"),
      s"concurrent ident must conflict with an identity-assigning txn: ${conf.toSeq}")
    // a plain append (no ident rows) sails past the same concurrent commit
    assert(DeltaLog.rebaseConflicts(addB, acts1, 0).isEmpty,
      "a non-identity txn must not conflict with concurrent ident actions")
    // sequential assignment is gapless and disjoint: second batch starts
    // at the first batch's high-water mark
    val hwm1 = DeltaLog.identHighWaterMark(acts1).head().getLong(0)
    assert(hwm1 == 3L)
    val seg2 = DeltaLog.assignIdentActions(acts1, addB).select("schema_str").head().getString(0)
    assert(seg2 == "0:3:5", s"second batch must start at the mark: $seg2")
  }
}
