package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.ops.DeltaLog

/** Round-12 regression fixtures: predicate-driven DML through the log
  * (DELETE WHERE / MERGE), commit timestamps (TIMESTAMP AS OF +
  * time-based retention), the protocol reader gate, the optimizeActions
  * cents guard, and the trained-centroid × clustered-fixture ANN
  * composition. Hand-built action sets, independent of the query
  * builders.
  */
class Round12Spec extends SparkSpec {

  private def add(v: Int, o: Int, path: String, nRows: Long = 10L): Row =
    Row(v, o, "add", path, Seq(0L), nRows, 1L, 10L, 100L, null, null, null, null, null)
  private def frame(rows: Row*) =
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), DeltaLog.actionSchema)
  /** 10 physical rows per file: part-0 carries keys 0-9, part-1 keys
    * 10-19, each at position = key % 10 and 10 cents per row. */
  private def positioned = {
    import spark.implicits._
    (0L to 9L).map(p => ("part-0", p, p, 10L))
      .++((0L to 9L).map(p => ("part-1", p, 10L + p, 10L)))
      .toDF("path", "pos", "k", "cents")
  }

  // ---- predicate-driven DELETE --------------------------------------------

  test("deleteActions: partial masks, union with existing, full cover becomes remove") {
    val acts0 = frame(add(0, 0, "part-0"), add(0, 1, "part-1")).localCheckpoint()
    val live0 = DeltaLog.replay(acts0).localCheckpoint()
    def dvMap(a: org.apache.spark.sql.DataFrame) =
      DeltaLog.deletionVectors(a).collect()
        .map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap

    // DELETE 1 (v1): k % 3 = 0 — partial masks on both files
    val d1 = DeltaLog.deleteActions(live0, DeltaLog.deletionVectors(acts0), positioned,
      col("k") % 3 === 0, 1).localCheckpoint()
    assert(d1.collect().forall(_.getString(2) == "dv"), "no file is fully covered yet")
    val acts1 = acts0.unionByName(d1).localCheckpoint()
    assert(dvMap(acts1) == Map("part-0" -> Seq(0L, 3L, 6L, 9L), "part-1" -> Seq(2L, 5L, 8L)))

    // DELETE 2 (v2): 5 <= k < 15 — the committed masks must be the UNION
    val d2 = DeltaLog.deleteActions(DeltaLog.replay(acts1), DeltaLog.deletionVectors(acts1),
      positioned, col("k") >= 5 && col("k") < 15, 2).localCheckpoint()
    val acts2 = acts1.unionByName(d2).localCheckpoint()
    assert(dvMap(acts2) == Map(
      "part-0" -> Seq(0L, 3L, 5L, 6L, 7L, 8L, 9L),
      "part-1" -> Seq(0L, 1L, 2L, 3L, 4L, 5L, 8L)),
      s"union semantics, got ${dvMap(acts2)}")

    // DELETE 3 (v3): k < 5 — covers all of a's surviving rows -> remove;
    // kills NO live row of b (all its k<15 rows are already masked) -> no action
    val d3 = DeltaLog.deleteActions(DeltaLog.replay(acts2), DeltaLog.deletionVectors(acts2),
      positioned, col("k") < 5, 3).localCheckpoint()
    val d3rows = d3.collect().map(r => (r.getString(2), r.getString(3))).toSet
    assert(d3rows == Set(("remove", "part-0")),
      s"full cover must remove, untouched file silent: $d3rows")
    val acts3 = acts2.unionByName(d3).localCheckpoint()
    assert(DeltaLog.replay(acts3).collect().map(_.getString(0)).toSeq == Seq("part-1"))
    // part-0's masks died with its instance (nothing effective on a non-live path)
    assert(dvMap(acts3) == Map("part-1" -> Seq(0L, 1L, 2L, 3L, 4L, 5L, 8L)))

    // CDF composition: per-version live-row counts from positioned minus
    // the effective masks must match the predicate algebra
    def liveRowCount(acts: org.apache.spark.sql.DataFrame): Long = {
      val masks = DeltaLog.deletionVectors(acts)
        .select(col("path"), explode(col("dv")).as("pos")).withColumn("hit", lit(1))
      positioned.join(DeltaLog.replay(acts).select("path"), Seq("path"))
        .join(masks, Seq("path", "pos"), "left").filter(col("hit").isNull).count()
    }
    assert(liveRowCount(acts0) == 20L)
    assert(liveRowCount(acts1) == 13L) // 7 multiples of 3 in 0..19
    assert(liveRowCount(acts2) == 6L)  // k in {1,2,4,16,17,19}
    assert(liveRowCount(acts3) == 3L)  // part-0 removed: {16,17,19}

    // VACUUM composition (retain latest only): part-0 is live in no
    // retained snapshot and frees; its dead masks retire with it (dl15's
    // rule via the same grids)
    val retained = acts3.select(col("version").as("v")).filter(col("v") >= 3).distinct()
    val retainedPaths = DeltaLog.replayGrid(acts3, retained)
      .select("path").distinct().collect().map(_.getString(0)).toSet
    assert(retainedPaths == Set("part-1"))
    val keptMasks = DeltaLog.deletionVectorGrid(acts3, retained)
      .select("path").distinct().collect().map(_.getString(0)).toSet
    assert(keptMasks == Set("part-1"), "part-0's masks must be vacuumable once it is removed")

    // OPTIMIZE composition: a DV-aware compaction AFTER the deletes folds
    // the surviving masks net (no resurrection). v4 adds part-2 so a full
    // bin-0 pair exists: part-1 (delete-masked, 3 net rows) + part-2
    // (clean, 10 rows)
    import spark.implicits._
    val acts4 = acts3.unionByName(frame(add(4, 0, "part-2", 10L))).localCheckpoint()
    val live4 = DeltaLog.replay(acts4).localCheckpoint()
    val dvs4 = DeltaLog.deletionVectors(acts4).localCheckpoint()
    val net = Seq(("part-1", 3L, 1L, 10L, 30L, 70L))
      .toDF("path", "n_rows", "min_key", "max_key", "cents", "masked_cents")
    val opt = DeltaLog.optimizeActions(live4, 5, Some(dvs4), Some(net))
    val optAdd = opt.filter(col("op") === "add").select("n_rows").as[Long].collect()
    assert(optAdd.toSeq == Seq(13L),
      s"compaction after DELETE must carry mask-net rows (3 + 10), got ${optAdd.toSeq}")
  }

  test("deleteActions raises on non-live targets and out-of-range positions") {
    import spark.implicits._
    val acts = frame(add(0, 0, "a")).localCheckpoint()
    val live = DeltaLog.replay(acts)
    val dvs = DeltaLog.deletionVectors(acts)
    // positioned claims a path the live set doesn't have
    val ghost = Seq(("ghost", 0L, 1L, 10L)).toDF("path", "pos", "k", "cents")
    val ex1 = intercept[Exception] {
      DeltaLog.deleteActions(live, dvs, ghost, col("k") === 1, 1).collect()
    }
    assert(ex1.getMessage.contains("non-live path"), ex1.getMessage)
    // positioned claims a position beyond the file's committed n_rows
    val oob = Seq(("a", 99L, 1L, 10L)).toDF("path", "pos", "k", "cents")
    val ex2 = intercept[Exception] {
      DeltaLog.deleteActions(live, dvs, oob, col("k") === 1, 1).collect()
    }
    assert(ex2.getMessage.contains("outside file range"), ex2.getMessage)
    // a live file with NULL committed n_rows would null both branch
    // filters and silently drop the delete — raise instead
    val nullStats = frame(Row(0, 0, "add", "a", Seq(0L), null, 1L, 10L, 100L,
      null, null, null, null, null)).localCheckpoint()
    val ex3 = intercept[Exception] {
      DeltaLog.deleteActions(DeltaLog.replay(nullStats),
        DeltaLog.deletionVectors(nullStats),
        Seq(("a", 0L, 1L, 10L)).toDF("path", "pos", "k", "cents"),
        col("k") === 1, 1).collect()
    }
    assert(ex3.getMessage.contains("null committed n_rows"), ex3.getMessage)
  }

  test("mergeActions enforces the single transaction version on its adds") {
    import spark.implicits._
    val acts = frame(add(0, 0, "part-0")).localCheckpoint()
    val live = DeltaLog.replay(acts).localCheckpoint()
    val dvs = DeltaLog.deletionVectors(acts)
    val stats = Seq((5L, 1L, 5L, 50L)).toDF("n_rows", "min_key", "max_key", "cents")
    val goodAdd = DeltaLog.addAction(stats, 1, 1000, "ins-1", array(lit(0L)))
    val onFile = positioned.filter(col("path") === "part-0")
    val merged = DeltaLog.mergeActions(live, dvs, onFile,
      col("k") % 2 === 0, 1, goodAdd).collect()
    assert(merged.map(_.getString(2)).sorted.toSeq == Seq("add", "dv"))
    val badAdd = DeltaLog.addAction(stats, 2, 1000, "ins-2", array(lit(0L)))
    val ex = intercept[Exception] {
      DeltaLog.mergeActions(live, dvs, onFile, col("k") % 2 === 0, 1, badAdd).collect()
    }
    assert(ex.getMessage.contains("outside transaction version"), ex.getMessage)
  }

  // ---- optimizeActions: the cents reconciliation guard --------------------

  test("optimizeActions raises when net cents + masked cents disagree with committed stats") {
    import spark.implicits._
    val acts = frame(add(0, 0, "part-0", 10L), add(0, 1, "part-1", 10L),
      Row(1, 0, "dv", "part-0", null, null, null, null, null, Seq(2L, 4L), null, null, null, null))
    val live = DeltaLog.replay(acts).localCheckpoint()
    val dvs = DeltaLog.deletionVectors(acts).localCheckpoint()
    // cardinality agrees (8 = 10 - 2) but 85 + 20 != committed 100
    val badCents = Seq(("part-0", 8L, 1L, 10L, 85L, 20L))
      .toDF("path", "n_rows", "min_key", "max_key", "cents", "masked_cents")
    val ex = intercept[Exception] {
      DeltaLog.optimizeActions(live, 2, Some(dvs), Some(badCents)).collect()
    }
    assert(ex.getMessage.contains("net cents disagree"), ex.getMessage)
    // a null masked_cents is just as torn — never silently trusted
    val nullMasked = Seq(("part-0", 8L, 1L, 10L, 80L, Option.empty[Long]))
      .toDF("path", "n_rows", "min_key", "max_key", "cents", "masked_cents")
    val ex2 = intercept[Exception] {
      DeltaLog.optimizeActions(live, 2, Some(dvs), Some(nullMasked)).collect()
    }
    assert(ex2.getMessage.contains("net cents disagree"), ex2.getMessage)
  }

  // ---- commit timestamps ----------------------------------------------------

  test("versionAsOf resolves latest-commit-<=, with monotonic adjustment and edge sentinels") {
    import spark.implicits._
    val acts = DeltaLog.stampTs(
      frame(add(0, 0, "a"), add(1, 0, "b"), add(2, 0, "c"), add(3, 0, "d")),
      // v2's raw ts goes BACKWARDS (90 < v1's 200): adjusted must clamp to 200
      when(col("version") === 0, 100L).when(col("version") === 1, 200L)
        .when(col("version") === 2, 90L).otherwise(400L)).localCheckpoint()
    val commits = DeltaLog.commitTimestamps(acts).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(commits == Map(0 -> 100L, 1 -> 200L, 2 -> 200L, 3 -> 400L),
      s"monotonic adjustment, got $commits")
    val probes = Seq(("before", 99L), ("at0", 100L), ("mid", 150L), ("at_adj2", 200L),
      ("pre400", 399L), ("after", 1000L)).toDF("label", "p_ts")
    val got = DeltaLog.versionAsOf(acts, probes).collect()
      .map(r => r.getString(0) -> r.getInt(2)).toMap
    assert(got == Map("before" -> -1, "at0" -> 0, "mid" -> 0, "at_adj2" -> 2,
      "pre400" -> 2, "after" -> 3), s"got $got")
    // time-based retention: horizon 250 keeps {v2 (boundary), v3}
    val kept = DeltaLog.retainedVersionsAsOf(acts, 250L).collect().map(_.getInt(0)).toSet
    assert(kept == Set(2, 3), s"got $kept")
  }

  test("a torn commit timestamp (two actions of one version disagreeing) raises") {
    val acts = frame(add(0, 0, "a"), add(0, 1, "b"))
      .withColumn("ts", when(col("ordinal") === 0, 100L).otherwise(101L))
    val ex = intercept[Exception] { DeltaLog.commitTimestamps(acts).collect() }
    assert(ex.getMessage.contains("torn commit timestamp"), ex.getMessage)
    // a stamped log with an entirely UNSTAMPED later version is torn too:
    // silently dropping it would hand a time-keyed vacuum a version set
    // missing the newest commit, freeing files that are live RIGHT NOW
    val mixed = DeltaLog.stampTs(frame(add(0, 0, "a")), lit(100L))
      .unionByName(frame(add(1, 0, "b")))
    val ex2 = intercept[Exception] { DeltaLog.commitTimestamps(mixed).collect() }
    assert(ex2.getMessage.contains("unstamped or torn"), ex2.getMessage)
    // while a FULLY unstamped log sees zero commits (sentinel resolution)
    assert(DeltaLog.commitTimestamps(frame(add(0, 0, "a"))).isEmpty)
  }

  test("ts round-trips the JSON log format") {
    val stamped = DeltaLog.stampTs(frame(add(0, 0, "a"), add(1, 0, "b")),
      lit(1000L) + col("version") * 10L)
    val rt = DeltaLog.actions(DeltaLog.toLines(stamped)).collect()
      .map(r => r.getInt(0) -> r.getLong(11)).toMap
    assert(rt == Map(0 -> 1000L, 1 -> 1010L), s"ts must survive serialization, got $rt")
  }

  // ---- protocol gate --------------------------------------------------------

  test("requireReader raises below the active protocol, admits at-or-above, defaults to 1") {
    val acts = frame(add(0, 0, "a"))
      .unionByName(DeltaLog.protocolAction(spark, 1, 0, 2)).localCheckpoint()
    val ex = intercept[Exception] { DeltaLog.requireReader(acts, 1).collect() }
    assert(ex.getMessage.contains("below table protocol"), ex.getMessage)
    assert(DeltaLog.requireReader(acts, 2).collect().head.getInt(0) == 2)
    // no protocol action: every reader admitted at the base protocol
    val bare = frame(add(0, 0, "a"))
    assert(DeltaLog.requireReader(bare, 1).collect().head.getInt(0) == 1)
    // the writer-side twin: a v1 writer must fail BEFORE committing
    val exW = intercept[Exception] {
      DeltaLog.requireWriter(
        frame(add(0, 0, "a")).unionByName(DeltaLog.protocolAction(spark, 1, 0, 1, 2)),
        1).collect()
    }
    assert(exW.getMessage.contains("below table protocol min_writer"), exW.getMessage)
    // a protocol action with a DROPPED payload is torn, not permissive
    val torn = frame(add(0, 0, "a"),
      Row(1, 0, "protocol", "_protocol", null, null, null, null, null, null, null, null, null, null))
    val exTorn = intercept[Exception] { DeltaLog.requireReader(torn, 99).collect() }
    assert(exTorn.getMessage.contains("missing min_reader"), exTorn.getMessage)
    // protocol races latest-wins and never touches file liveness
    val upgraded = acts.unionByName(DeltaLog.protocolAction(spark, 2, 0, 3))
    assert(DeltaLog.activeProtocol(upgraded).collect().head.getInt(0) == 3)
    assert(DeltaLog.replay(upgraded).collect().map(_.getString(0)).toSeq == Seq("a"))
    // and the checkpoint persists it ALONE (no tail)
    assert(DeltaLog.activeProtocol(DeltaLog.checkpointState(upgraded, Some(2)))
      .collect().head.getInt(0) == 3)
  }

  // ---- OCC rebase -------------------------------------------------------------

  test("rebase renumbers a clean transaction and raises on concurrent conflicts") {
    def rem(v: Int, o: Int, path: String): Row =
      Row(v, o, "remove", path, null, null, null, null, null, null, null, null, null, null)
    // prepared at v0; v1 concurrently removed a and added c
    val acts = frame(add(0, 0, "a"), add(0, 1, "b"),
      rem(1, 0, "a"), add(1, 1, "c")).localCheckpoint()
    // remove-set conflict: the txn's input was deleted under it
    val exR = intercept[Exception] {
      DeltaLog.rebase(frame(rem(90, 0, "a")), acts, 0, 2).collect()
    }
    assert(exR.getMessage.contains("rebase conflict"), exR.getMessage)
    // add-collision conflict: the txn's output path was taken under it
    val exA = intercept[Exception] {
      DeltaLog.rebase(frame(add(90, 0, "c")), acts, 0, 2).collect()
    }
    assert(exA.getMessage.contains("rebase conflict"), exA.getMessage)
    // a clean txn renumbers (ordinals preserved) and replays correctly
    val clean = frame(rem(90, 3, "b"), add(90, 1000, "d"))
    val rb = DeltaLog.rebase(clean, acts, 0, 2).collect()
    assert(rb.map(r => (r.getInt(0), r.getInt(1), r.getString(2))).sorted.toSeq ==
      Seq((2, 3, "remove"), (2, 1000, "add")).sorted)
    val live = DeltaLog.replay(acts.unionByName(DeltaLog.rebase(clean, acts, 0, 2)))
      .collect().map(_.getString(0)).sorted.toSeq
    assert(live == Seq("c", "d"),
      s"a died at v1, b removed and d added by the rebased commit — got $live")
  }

  test("rebase treats dv actions as conflict surfaces on both sides") {
    def rem(v: Int, o: Int, path: String): Row =
      Row(v, o, "remove", path, null, null, null, null, null, null, null, null, null, null)
    def dv(v: Int, o: Int, path: String, mask: Seq[Long]): Row =
      Row(v, o, "dv", path, null, null, null, null, null, mask, null, null, null, null)
    // concurrent PARTIAL DELETE (dv-only commit) on a file the prepared
    // compaction removes: rebasing would resurrect the deleted rows
    val acts = frame(add(0, 0, "a"), add(0, 1, "b"), dv(1, 0, "a", Seq(2L))).localCheckpoint()
    val exCompact = intercept[Exception] {
      DeltaLog.rebase(frame(rem(90, 0, "a"), add(90, 1000, "opt-a")), acts, 0, 2).collect()
    }
    assert(exCompact.getMessage.contains("rebase conflict"), exCompact.getMessage)
    // a prepared dv-only DELETE vs a concurrent dv on the same path: the
    // dv race is latest-wins, so committing would REPLACE the concurrent
    // delete's mask and resurrect its rows
    val exDv = intercept[Exception] {
      DeltaLog.rebase(frame(dv(90, 0, "a", Seq(5L))), acts, 0, 2).collect()
    }
    assert(exDv.getMessage.contains("rebase conflict"), exDv.getMessage)
    // and vs a concurrent remove of its target (mask would scope to a
    // dead instance and the delete silently vanish)
    val acts2 = frame(add(0, 0, "c"), rem(1, 0, "c")).localCheckpoint()
    val exDead = intercept[Exception] {
      DeltaLog.rebase(frame(dv(90, 0, "c", Seq(1L))), acts2, 0, 2).collect()
    }
    assert(exDead.getMessage.contains("rebase conflict"), exDead.getMessage)
    // a dv txn on an UNTOUCHED path still rebases cleanly
    val ok = DeltaLog.rebase(frame(dv(90, 0, "b", Seq(1L))), acts, 0, 2).collect()
    assert(ok.length == 1 && ok.head.getInt(0) == 2)
  }

  // ---- RESTORE as a transaction ---------------------------------------------

  test("restoreActions flips files, instances and masks back to the target") {
    def rem(v: Int, o: Int, path: String): Row =
      Row(v, o, "remove", path, null, null, null, null, null, null, null, null, null, null)
    def dv(v: Int, o: Int, path: String, mask: Seq[Long]): Row =
      Row(v, o, "dv", path, null, null, null, null, null, mask, null, null, null, null)
    val acts = frame(
      add(0, 0, "a"), add(0, 1, "b"),
      dv(1, 0, "a", Seq(1L, 2L)),     // a masked at v1
      rem(2, 0, "b"), add(2, 1, "c"), // b removed, c added at v2
      dv(3, 0, "a", Seq(1L))          // a's mask narrowed at v3
    ).localCheckpoint()
    val r = DeltaLog.restoreActions(acts, 1, 4).localCheckpoint()
    val ops = r.collect().map(x => (x.getString(2), x.getString(3))).toSet
    assert(ops == Set(("remove", "c"), ("add", "b"), ("dv", "a")),
      s"restore to v1 must drop c, re-add b, re-widen a's mask — got $ops")
    val acts4 = acts.unionByName(r).localCheckpoint()
    assert(DeltaLog.replay(acts4).collect().map(_.getString(0)).sorted.toSeq == Seq("a", "b"))
    val dvs = DeltaLog.deletionVectors(acts4).collect()
      .map(x => x.getString(0) -> x.getSeq[Long](1).toSeq).toMap
    assert(dvs == Map("a" -> Seq(1L, 2L)), s"target mask re-committed, got $dvs")
    // re-added b keeps its ORIGINAL stats through the re-add
    val b = DeltaLog.replay(acts4).filter(col("path") === "b").collect().head
    assert(b.getLong(2) == 10L && b.getLong(5) == 100L)
    // restore to v0 (pre-mask): a's mask must be CLEARED with an empty dv
    val r0 = DeltaLog.restoreActions(acts, 0, 4)
    val dvRow = r0.filter(col("op") === "dv").collect()
    assert(dvRow.length == 1 && dvRow.head.getSeq[Long](9).isEmpty,
      "restore past the first mask commits an explicit empty mask")
    val cleared = DeltaLog.deletionVectors(acts.unionByName(r0)).collect()
      .map(x => x.getString(0) -> x.getSeq[Long](1).toSeq).toMap
    assert(cleared == Map("a" -> Seq()), s"got $cleared")
    // idempotence: restoring to the CURRENT state emits nothing
    assert(DeltaLog.restoreActions(acts, 3, 4).isEmpty,
      "restore to the current state is a no-op transaction")
    // META is state too: a post-target schema widening is rolled back by
    // re-committing the TARGET's winning meta (real RESTORE restores the
    // target version's metadata; protocol is never downgraded)
    def meta(v: Int, o: Int, sch: String): Row =
      Row(v, o, "meta", "_schema", null, null, null, null, null, null, sch, null, null, null)
    val withMeta = acts.unionByName(frame(meta(0, 5, "s0"), meta(3, 5, "s1"))).localCheckpoint()
    val rM = DeltaLog.restoreActions(withMeta, 1, 4)
    val metaRow = rM.filter(col("op") === "meta").collect()
    assert(metaRow.length == 1 && metaRow.head.getString(10) == "s0",
      s"restore to v1 must re-commit the v0 schema, got ${metaRow.toSeq}")
    assert(DeltaLog.activeSchema(withMeta.unionByName(rM)).collect().head.getString(0) == "s0")
    // unchanged meta (restore to v3, whose winner IS the current one):
    // no meta action rides a same-state restore
    assert(DeltaLog.restoreActions(withMeta, 3, 4).filter(col("op") === "meta").isEmpty)
  }

  // ---- trained centroids on the clustered fixture ---------------------------

  test("v13b: TRAINED centroids keep the clustered pruning benefit") {
    val rows = graft.queries.VectorQueries.v13bTrainedClustered.fn(spark, sf)
      .collect().map(r => (r.getInt(0), r.getDouble(2), r.getDouble(3))).sortBy(_._1)
    val byProbe = rows.map(r => r._1 -> r).toMap
    // the round-11 verdict's composition ask: v12's training loop must
    // achieve v13's benefit thresholds on the clustered fixture
    assert(byProbe(1)._2 >= 0.9, s"recall@nprobe=1 must be >= 0.9, got ${byProbe(1)._2}")
    assert(byProbe(2)._2 >= 0.9, s"recall@nprobe=2 must be >= 0.9, got ${byProbe(2)._2}")
    assert(byProbe(2)._3 <= 0.35, s"nprobe=2 must scan <= 35% of rows, got ${byProbe(2)._3}")
    assert(rows.map(_._2).sliding(2).forall(p => p(0) <= p(1)), "recall monotone in nprobe")
    assert(rows.map(_._3).sliding(2).forall(p => p(0) < p(1)), "scan fraction grows with nprobe")
    assert(byProbe(8)._2 == 1.0, "nprobe = #cells is brute force: recall exactly 1.0")
    // independent reconstruction (pure Scala, no Spark): Lloyd-2 from the
    // Forgy init converges to the PURE planted clustering — the training
    // contract whose regression the curve above would surface
    def vec(v: Long): Array[Double] = Array.tabulate(64)(i =>
      (if (i / 8 == v % 8) 2.0 else 0.0) + ((v * 31 + i * 17) % 11 - 5) / 10.0)
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val n = 500 // the sf0.001/sf0.01 corpus size
    val vs = Array.tabulate(n)(v => vec(v.toLong))
    var cents = Array.tabulate(8)(k => vs(k).clone())
    for (_ <- 1 to 2) {
      val asn = vs.map(e => (0 until 8).minBy(c => (d2(e, cents(c)), c)))
      cents = Array.tabulate(8) { c =>
        val mem = vs.indices.filter(asn(_) == c)
        Array.tabulate(64)(i => BigDecimal(mem.map(v => vs(v)(i)).sum / mem.size)
          .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
    val finalAsn = vs.indices.map(v => (0 until 8).minBy(c => (d2(vs(v), cents(c)), c)))
    assert(vs.indices.forall(v => finalAsn(v) == finalAsn(v % 8)),
      "every vector must land in its own planted cluster's trained cell")
    assert(finalAsn.take(8).toSet.size == 8, "the 8 trained cells stay distinct")
  }
}
