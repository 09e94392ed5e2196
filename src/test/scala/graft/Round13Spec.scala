package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.ops.DeltaLog

/** Round-13 regression fixtures: the OCC conflict rules for table-level
  * state (protocol/meta), guard rows that survive filter elision, column
  * mapping through the log, writer invariants, and the multi-writer
  * retry loop. Hand-built action sets, independent of the query
  * builders.
  */
class Round13Spec extends SparkSpec {

  private def add(v: Int, o: Int, path: String, nRows: Long = 10L): Row =
    Row(v, o, "add", path, Seq(0L), nRows, 1L, 10L, 100L, null, null, null, null, null)
  private def rem(v: Int, o: Int, path: String): Row =
    Row(v, o, "remove", path, null, null, null, null, null, null, null, null, null, null)
  private def frame(rows: Row*) =
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), DeltaLog.actionSchema)

  // ---- OCC: table-level state is an unconditional conflict surface ---------

  test("rebaseConflicts flags concurrent protocol and meta commits unconditionally") {
    // txn prepared at readVersion 0 touches ONLY path 'b' — no file overlap
    // with anything concurrent
    val txn = frame(rem(90, 0, "b"))
    // concurrent protocol upgrade at v1: a writer admitted at its read
    // version must NOT rebase past an upgrade that now locks it out
    // (Delta's ProtocolChangedException) — path overlap is irrelevant
    val actsP = frame(add(0, 0, "a"), add(0, 1, "b"))
      .unionByName(DeltaLog.protocolAction(spark, 1, 0, 2, 2))
    val confP = DeltaLog.rebaseConflicts(txn, actsP, 0).collect()
    assert(confP.map(_.getString(3)).toSet == Set("protocol"),
      s"a concurrent protocol commit must conflict: ${confP.toSeq}")
    val exP = intercept[Exception] {
      DeltaLog.rebase(txn, actsP, 0, 2).collect()
    }
    assert(exP.getMessage.contains("rebase conflict"), exP.getMessage)

    // concurrent schema change at v1 (MetadataChangedException): same rule
    val actsM = frame(add(0, 0, "a"), add(0, 1, "b"))
      .unionByName(DeltaLog.metaAction(spark, 1, 0, "k:long,c:long"))
    val confM = DeltaLog.rebaseConflicts(txn, actsM, 0).collect()
    assert(confM.map(_.getString(3)).toSet == Set("meta"),
      s"a concurrent meta commit must conflict: ${confM.toSeq}")

    // concurrent constraint change: a txn validated under the OLD
    // constraints must not land under tightened ones
    val actsC = frame(add(0, 0, "a"), add(0, 1, "b"))
      .unionByName(DeltaLog.constraintAction(spark, 1, 0, "c1:cents:min:100"))
    val confC = DeltaLog.rebaseConflicts(txn, actsC, 0).collect()
    assert(confC.map(_.getString(3)).toSet == Set("constraint"),
      s"a concurrent constraint commit must conflict: ${confC.toSeq}")

    // a protocol/meta action AT OR BELOW the read version is NOT concurrent
    val actsOld = frame(add(0, 0, "a"), add(0, 1, "b"), add(1, 0, "c"))
      .unionByName(DeltaLog.protocolAction(spark, 0, -1, 2, 2))
      .unionByName(DeltaLog.metaAction(spark, 1, -1, "k:long"))
    assert(DeltaLog.rebaseConflicts(txn, actsOld, 1).isEmpty,
      "protocol/meta at or below the read version must not conflict")
  }

  // ---- guard rows must survive op/path-filtering consumers -----------------

  test("deleteActions ghost guard detonates even under an op filter") {
    import spark.implicits._
    val acts = frame(add(0, 0, "a")).localCheckpoint()
    val live = DeltaLog.replay(acts)
    val dvs = DeltaLog.deletionVectors(acts)
    val ghost = Seq(("ghost", 0L, 1L, 10L)).toDF("path", "pos", "k", "cents")
    val del = DeltaLog.deleteActions(live, dvs, ghost, col("k") === 1, 1)
    // the round-12 guard rode only `version` under LITERAL op='dv'/path —
    // a consumer filtering by op dropped the guard row before the raise
    // column was touched (the same Catalyst-elision class as the
    // outer-join fold the ghost test caught). The raise now rides
    // op/path/version, so ANY classifying/partitioning consumer detonates.
    val exOp = intercept[Exception] { del.filter(col("op") === "add").collect() }
    assert(exOp.getMessage.contains("non-live path"), exOp.getMessage)
    val exPath = intercept[Exception] { del.filter(col("path") =!= "zzz").collect() }
    assert(exPath.getMessage.contains("non-live path"), exPath.getMessage)
  }

  test("rebase conflict guard detonates even under an op filter") {
    val txn = frame(rem(90, 0, "a"))
    val acts = frame(add(0, 0, "a"), rem(1, 0, "a")).localCheckpoint()
    val rb = DeltaLog.rebase(txn, acts, 0, 2)
    val ex = intercept[Exception] { rb.filter(col("op") === "add").collect() }
    assert(ex.getMessage.contains("rebase conflict"), ex.getMessage)
  }

  // ---- multi-writer retry loop (dl24) ---------------------------------------

  test("commitWithRetry terminates: bounded attempts raise loudly under permanent contention") {
    val acts = frame(add(0, 0, "a"), add(0, 1, "b")).localCheckpoint()
    val txn = frame(rem(90, 0, "b"))
    // a contender lands on our slot on EVERY attempt (touching only its
    // own fresh path, so no semantic conflict ever develops — pure
    // livelock)
    val ex = intercept[IllegalStateException] {
      DeltaLog.commitWithRetry(acts, txn, 0, maxAttempts = 3,
        contention = a => Some(frame(add(100 + a, 0, s"contender-$a"))))
    }
    assert(ex.getMessage.contains("no commit after 3 attempts"), ex.getMessage)
  }

  test("commitWithRetry: retry then abort when the contending commit creates a genuine conflict") {
    val acts = frame(add(0, 0, "a"), add(0, 1, "b")).localCheckpoint()
    val txn = frame(rem(90, 0, "b")) // our txn removes b
    // attempt 1: slot taken by a commit that ALSO removes b; attempt 2:
    // the re-check against it must abort, not blindly rebase (the dl14
    // resurrection class)
    val (actsOut, dec) = DeltaLog.commitWithRetry(acts, txn, 0, maxAttempts = 5,
      contention = a => if (a == 1) Some(frame(rem(1, 0, "b"))) else None)
    assert(dec.map(_.outcome) == Seq("retry_version_taken", "abort_conflict"),
      dec.mkString(","))
    assert(dec.last.nConflicts == 1L)
    // the aborted txn must NOT be in the log
    assert(actsOut.filter(col("version") === 2).isEmpty,
      "an aborted transaction must not land")

    // and the clean-interleave twin: disjoint contender, lands on retry
    val (actsOk, decOk) = DeltaLog.commitWithRetry(acts, txn, 0, maxAttempts = 5,
      contention = a => if (a == 1) Some(frame(add(1, 0, "c"))) else None)
    assert(decOk.map(_.outcome) == Seq("retry_version_taken", "committed"), decOk.mkString(","))
    assert(decOk.last.target == 2)
    val live = DeltaLog.replay(actsOk).collect().map(_.getString(0)).toSet
    assert(live == Set("a", "c"), s"b removed by the rebased commit, c added by the contender: $live")
  }

  // ---- nprobe auto-planning (v14) --------------------------------------------

  test("v14 plan: minimal nprobe meets the recall target; clustered stays cheap") {
    val rows = graft.queries.VectorQueries.v14NprobePlan.fn(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) ->
        ((r.getInt(1), r.getInt(2), r.getDouble(3), r.getDouble(4)))).toMap
    // every chosen operating point meets the target
    val chosen = rows.filter(_._1.endsWith(":chosen"))
    assert(chosen.keySet == Set("isotropic:chosen", "clustered:chosen"), rows.keySet.toString)
    chosen.values.foreach { case (_, hits, recall, _) =>
      assert(hits >= 90 && recall >= 0.9, s"chosen point misses the target: $rows")
    }
    // the clustered regime keeps the v13 contract: tiny probe, tiny scan
    val (cNp, _, _, cScan) = rows("clustered:chosen")
    assert(cNp <= 2 && cScan <= 0.35,
      s"clustered plan must stay cheap (nprobe<=2, scan<=35%): $rows")
    // minimality: any runner_up sits strictly below its chosen nprobe AND
    // misses the target — the witness that no cheaper setting sufficed
    rows.filter(_._1.endsWith(":runner_up")).foreach { case (item, (np, hits, _, _)) =>
      val fixture = item.stripSuffix(":runner_up")
      assert(np < rows(s"$fixture:chosen")._1 && hits < 90,
        s"runner_up must be the failing next-cheaper setting: $rows")
    }
    // isotropic is the honest hard case: it must pay MORE probes than
    // clustered (if equal, the fixture stopped being isotropic)
    assert(rows("isotropic:chosen")._1 > cNp, rows.toString)
  }

  // ---- UPDATE WHERE (dl25) --------------------------------------------------

  test("updateActions enforces the row-count invariant and skips already-deleted rows") {
    import org.apache.spark.sql.types.{ArrayType, LongType}
    import spark.implicits._
    // part-0: keys 0-9; an earlier delete masked pos 2 and 4
    val acts = frame(add(0, 0, "part-0"))
      .unionByName(DeltaLog.dvAction(
        DeltaLog.replay(frame(add(0, 0, "part-0"))), "part-0", 1, 0,
        array(lit(2L), lit(4L))))
      .localCheckpoint()
    val live = DeltaLog.replay(acts).localCheckpoint()
    val dvs = DeltaLog.deletionVectors(acts).localCheckpoint()
    val positioned = (0L to 9L).map(p => ("part-0", p, p, 10L)).toDF("path", "pos", "k", "cents")
    // UPDATE k % 2 = 0: matches pos 0,2,4,6,8 but 2 and 4 are ALREADY
    // DELETED — only 3 live rows update
    val pred = col("k") % 2 === 0
    def statsOf(n: Long) = Seq((n, 0L, 8L, n * 11L))
      .toDF("n_rows", "min_key", "max_key", "cents")
    val goodAdds = DeltaLog.addAction(statsOf(3L), 2, 1000, "upd",
      lit(null).cast(ArrayType(LongType)))
    val upd = DeltaLog.updateActions(live, dvs, positioned, pred, 2, goodAdds)
      .localCheckpoint()
    // the committed mask is the union {0,2,4,6,8}; the rewrite carries 3
    val gotMask = DeltaLog.deletionVectors(acts.unionByName(upd)).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(gotMask == Map("part-0" -> Seq(0L, 2L, 4L, 6L, 8L)), gotMask.toString)
    assert(upd.filter(col("op") === "add").select("n_rows").as[Long].collect().toSeq == Seq(3L))

    // a rewrite claiming 5 rows (the naive pred count, ignoring the
    // existing masks) is a cardinality corruption — raise
    val ex = intercept[Exception] {
      DeltaLog.updateActions(live, dvs, positioned, pred, 2,
        DeltaLog.addAction(statsOf(5L), 2, 1000, "upd",
          lit(null).cast(ArrayType(LongType)))).collect()
    }
    assert(ex.getMessage.contains("cardinality mismatch"), ex.getMessage)
    // ... and so is an UPDATE with NO rewrite at all while rows matched
    val ex2 = intercept[Exception] {
      DeltaLog.updateActions(live, dvs, positioned, pred, 2,
        goodAdds.filter(col("path") === "nope")).collect()
    }
    assert(ex2.getMessage.contains("cardinality mismatch"), ex2.getMessage)
  }

  // ---- column mapping (dl22) ------------------------------------------------

  private def mappedActs = frame(add(0, 0, "part-0"))
    .unionByName(DeltaLog.protocolAction(spark, 1, -1, 2, 5))
    .unionByName(DeltaLog.metaAction(spark, 1, 0, DeltaLog.mappingSchemaStr(
      Seq(("k", "p_key", "BIGINT"), ("cents", "p_cents", "BIGINT")))))
    .localCheckpoint()

  test("renameColumn / dropColumn round-trip through the log and guard misuse") {
    def mapOf(acts: org.apache.spark.sql.DataFrame) =
      DeltaLog.columnMapping(acts).collect()
        .map(r => r.getAs[String]("logical_name") -> r.getAs[String]("physical_name")).toMap

    assert(mapOf(mappedActs) == Map("k" -> "p_key", "cents" -> "p_cents"))
    // RENAME round-trips the JSON log format and keeps the physical name
    val acts2 = DeltaLog.actions(DeltaLog.toLines(mappedActs).unionByName(
      DeltaLog.toLines(DeltaLog.renameColumn(mappedActs, "cents", "price", 2, 0))))
      .localCheckpoint()
    assert(mapOf(acts2) == Map("k" -> "p_key", "price" -> "p_cents"))
    // DROP removes the entry; file actions are untouched
    val acts3 = acts2.unionByName(DeltaLog.dropColumn(acts2, "k", 3, 0)).localCheckpoint()
    assert(mapOf(acts3) == Map("price" -> "p_cents"))
    assert(DeltaLog.replay(acts3).count() == 1, "mapping commits must be log-only")

    // renaming a column the mapping doesn't have must raise, not no-op
    val exMiss = intercept[Exception] {
      DeltaLog.renameColumn(mappedActs, "ghost", "g2", 2, 0).collect()
    }
    assert(exMiss.getMessage.contains("not in mapping"), exMiss.getMessage)
    // renaming ONTO an existing logical name must raise
    val exCollide = intercept[Exception] {
      DeltaLog.renameColumn(mappedActs, "cents", "k", 2, 0).collect()
    }
    assert(exCollide.getMessage.contains("already mapped"), exCollide.getMessage)
    // dropping a missing column, and dropping the last column, must raise
    val exDropMiss = intercept[Exception] {
      DeltaLog.dropColumn(mappedActs, "ghost", 2, 0).collect()
    }
    assert(exDropMiss.getMessage.contains("not in mapping"), exDropMiss.getMessage)
    val exLast = intercept[Exception] {
      DeltaLog.dropColumn(acts3, "price", 4, 0).collect()
    }
    assert(exLast.getMessage.contains("would become empty"), exLast.getMessage)
  }

  // ---- writer invariants (dl23) ---------------------------------------------

  test("enforceInvariants raises on a violating add and a violating MERGE rewrite") {
    import org.apache.spark.sql.types.{ArrayType, LongType}
    import spark.implicits._
    val spec = "positive_rows:n_rows:min:1;cents_present:cents:notnull:;key_ceiling:max_key:max:100"
    val acts = frame(add(0, 0, "part-0"))
      .unionByName(DeltaLog.constraintAction(spark, 1, 0, spec))
      .localCheckpoint()
    def addStats(n: java.lang.Long, mn: java.lang.Long, mx: java.lang.Long,
                 c: java.lang.Long) =
      Seq((n, mn, mx, c)).toDF("n_rows", "min_key", "max_key", "cents")

    // a conforming add passes untouched (and the commit path stays clean)
    val ok = DeltaLog.enforceInvariants(acts,
      DeltaLog.addAction(addStats(5L, 1L, 50L, 500L), 2, 0, "good", array(lit(1L))))
    assert(DeltaLog.toLines(ok).count() == 1)

    // n_rows = 0 violates positive_rows — the raise must survive the
    // COMMIT path (toLines reads every column)
    val badRows = DeltaLog.enforceInvariants(acts,
      DeltaLog.addAction(addStats(0L, 1L, 50L, 500L), 2, 0, "empty", array(lit(1L))))
    val ex1 = intercept[Exception] { DeltaLog.toLines(badRows).collect() }
    assert(ex1.getMessage.contains("positive_rows"), ex1.getMessage)

    // null cents violates cents_present
    val ex2 = intercept[Exception] {
      DeltaLog.enforceInvariants(acts,
        DeltaLog.addAction(addStats(5L, 1L, 50L, null), 2, 0, "nullc", array(lit(1L)))).collect()
    }
    assert(ex2.getMessage.contains("cents_present"), ex2.getMessage)

    // a violating MERGE rewrite: the dvs ride through untouched, the add
    // (max_key 999 > 100) raises
    val live = DeltaLog.replay(acts).localCheckpoint()
    val dvs = DeltaLog.deletionVectors(acts)
    val positioned = (0L to 9L).map(p => ("part-0", p, p, 10L)).toDF("path", "pos", "k", "cents")
    val rewrite = DeltaLog.addAction(addStats(5L, 1L, 999L, 500L), 2, 1000, "upd", array(lit(1L)))
    val merged = DeltaLog.mergeActions(live, dvs, positioned, col("k") < 3, 2, rewrite)
    val ex3 = intercept[Exception] {
      DeltaLog.enforceInvariants(acts, merged).collect()
    }
    assert(ex3.getMessage.contains("key_ceiling"), ex3.getMessage)

    // non-add actions bind no constraints: a remove with all-null stats
    // passes (constraints gate DATA commits)
    assert(DeltaLog.enforceInvariants(acts,
      DeltaLog.removeAction(spark, 2, 0, "part-0")).count() == 1)
  }

  test("activeConstraints raises on torn entries, unknown kinds, bad bounds") {
    def consOf(spec: String) = DeltaLog.activeConstraints(
      frame(add(0, 0, "a")).unionByName(DeltaLog.constraintAction(spark, 1, 0, spec)))
    val exTorn = intercept[Exception] { consOf("n_rows:min:1").collect() }
    assert(exTorn.getMessage.contains("torn constraint entry"), exTorn.getMessage)
    val exKind = intercept[Exception] { consOf("c1:n_rows:between:1").collect() }
    assert(exKind.getMessage.contains("unknown constraint kind"), exKind.getMessage)
    val exBound = intercept[Exception] { consOf("c1:n_rows:min:abc").collect() }
    assert(exBound.getMessage.contains("unparseable constraint bound"), exBound.getMessage)

    // the enforcement-defeating elision: a torn or misspelled entry must
    // raise THROUGH invariantChecks' join (field is the join key — the
    // raise must ride it, or the entry silently never binds and a
    // violating add commits cleanly)
    def checksOf(spec: String) = DeltaLog.invariantChecks(
      frame(add(0, 0, "a")).unionByName(DeltaLog.constraintAction(spark, 1, 0, spec)),
      frame(add(1, 0, "new-file")))
    val exJoinTorn = intercept[Exception] { checksOf("cents:notnull").collect() }
    assert(exJoinTorn.getMessage.contains("torn constraint entry"), exJoinTorn.getMessage)
    val exJoinField = intercept[Exception] { checksOf("c1:nrow:min:1").collect() }
    assert(exJoinField.getMessage.contains("unknown constraint field"), exJoinField.getMessage)
    // the latest constraint action WINS (the singleton race)
    val acts = frame(add(0, 0, "a"))
      .unionByName(DeltaLog.constraintAction(spark, 1, 0, "c1:n_rows:min:1"))
      .unionByName(DeltaLog.constraintAction(spark, 2, 0, "c2:cents:min:5"))
    val got = DeltaLog.activeConstraints(acts).collect()
    assert(got.length == 1 && got.head.getString(0) == "c2", got.mkString(","))
  }

  test("addColumn guards against physical-name reuse — even of a DROPPED column") {
    def mapOf(acts: org.apache.spark.sql.DataFrame) =
      DeltaLog.columnMapping(acts).collect()
        .map(r => r.getAs[String]("logical_name") -> r.getAs[String]("physical_name")).toMap
    // a fresh physical name lands, round-tripping the JSON format
    val acts2 = DeltaLog.actions(DeltaLog.toLines(mappedActs).unionByName(DeltaLog.toLines(
      DeltaLog.addColumn(mappedActs, "region", "p_region", "VARCHAR", 2, 0))))
      .localCheckpoint()
    assert(mapOf(acts2) == Map("k" -> "p_key", "cents" -> "p_cents", "region" -> "p_region"))
    // reusing a LIVE physical name raises
    val exLive = intercept[Exception] {
      DeltaLog.addColumn(mappedActs, "fresh", "p_cents", "BIGINT", 2, 0).collect()
    }
    assert(exLive.getMessage.contains("already mapped (ghost data"), exLive.getMessage)
    // the sharp edge: DROP cents, then reuse p_cents — the active mapping
    // no longer has it, but every pre-drop file still carries its data;
    // a reuse would read ghost values out of them
    val dropped = acts2.unionByName(DeltaLog.dropColumn(acts2, "cents", 3, 0)).localCheckpoint()
    assert(mapOf(dropped) == Map("k" -> "p_key", "region" -> "p_region"))
    val exGhost = intercept[Exception] {
      DeltaLog.addColumn(dropped, "price", "p_cents", "BIGINT", 4, 0).collect()
    }
    assert(exGhost.getMessage.contains("ghost data"), exGhost.getMessage)
    // a logical collision raises; a table with no mapping gets a fresh one
    val exLog = intercept[Exception] {
      DeltaLog.addColumn(mappedActs, "k", "p_k2", "BIGINT", 2, 0).collect()
    }
    assert(exLog.getMessage.contains("logical column already mapped"), exLog.getMessage)
    val fresh = frame(add(0, 0, "part-0"))
      .unionByName(DeltaLog.addColumn(frame(add(0, 0, "part-0")), "k", "p_key", "BIGINT", 1, 0))
    assert(mapOf(fresh) == Map("k" -> "p_key"))
  }

  // ---- restore × vacuum horizon ----------------------------------------------

  test("restoreActions raises when a re-add targets a vacuumed file") {
    import spark.implicits._
    val acts = frame(add(0, 0, "a"), add(0, 1, "b"), rem(1, 0, "a")).localCheckpoint()
    // restore to v0 re-adds a; a vacuum that freed it makes that a
    // committed pointer to deleted data — raise
    val freed = Seq("a").toDF("path")
    val ex = intercept[Exception] {
      DeltaLog.restoreActions(acts, 0, 2, Some(freed)).collect()
    }
    assert(ex.getMessage.contains("re-adds a vacuumed file"), ex.getMessage)
    // a vacuum that freed something ELSE leaves the restore intact
    val ok = DeltaLog.restoreActions(acts, 0, 2, Some(Seq("zzz").toDF("path")))
    val live = DeltaLog.replay(acts.unionByName(ok)).collect().map(_.getString(0)).toSet
    assert(live == Set("a", "b"), live.toString)
  }

  // ---- retry loop × protocol upgrade ------------------------------------------

  test("commitWithRetry aborts when the contending commit is a protocol upgrade") {
    val acts = frame(add(0, 0, "a"), add(0, 1, "b")).localCheckpoint()
    val txn = frame(rem(90, 0, "b"))
    // a concurrent protocol upgrade lands in the race window: the retry's
    // re-check must ABORT (the upgrade may lock this writer out), never
    // blindly rebase past it — the round-13 conflict rule composing with
    // the loop
    val (actsOut, dec) = DeltaLog.commitWithRetry(acts, txn, 0, maxAttempts = 5,
      contention = a => if (a == 1) Some(DeltaLog.protocolAction(spark, 1, 0, 2, 2)) else None)
    assert(dec.map(_.outcome) == Seq("retry_version_taken", "abort_conflict"), dec.mkString(","))
    assert(actsOut.filter(col("version") === 2).isEmpty, "the locked-out txn must not land")
  }

  test("a pre-mapping reader raises through requireReader; torn mapping entries raise") {
    // the mapping feature was committed with protocol(min_reader=2) — a
    // version-1 reader must fail loudly, not misread physical names
    val ex = intercept[Exception] { DeltaLog.requireReader(mappedActs, 1).collect() }
    assert(ex.getMessage.contains("below table protocol"), ex.getMessage)
    // a mapping entry without logical:physical:TYPE is torn
    val torn = frame(add(0, 0, "part-0"))
      .unionByName(DeltaLog.metaAction(spark, 1, 0, "k:p_key:BIGINT,cents_missing_parts"))
    val exTorn = intercept[Exception] { DeltaLog.columnMapping(torn).collect() }
    assert(exTorn.getMessage.contains("torn column-mapping entry"), exTorn.getMessage)
    // ... and it must raise THROUGH resolvePhysical's join too (the raise
    // rides physical_name, the join key — a torn entry must not silently
    // drop its column from every read)
    import spark.implicits._
    val melted = Seq(("p_key", 1L)).toDF("physical_name", "value")
    val exJoin = intercept[Exception] {
      DeltaLog.resolvePhysical(melted, DeltaLog.columnMapping(torn)).collect()
    }
    assert(exJoin.getMessage.contains("torn column-mapping entry"), exJoin.getMessage)
  }

  test("addColumn bootstraps a mapping over a plain-schema table; mixed metas are torn") {
    // dl11-style table: the active meta is a PLAIN schema — the first
    // mapping-enabling addColumn is the migration command and must work
    val plain = frame(add(0, 0, "part-0"))
      .unionByName(DeltaLog.metaAction(spark, 1, 0, "k BIGINT, cents BIGINT"))
    val acts2 = plain.unionByName(
      DeltaLog.addColumn(plain, "region", "p_region", "VARCHAR", 2, 0)).localCheckpoint()
    val got = DeltaLog.columnMapping(acts2).collect()
      .map(r => r.getAs[String]("logical_name") -> r.getAs[String]("physical_name")).toMap
    assert(got == Map("region" -> "p_region"),
      s"plain schema bootstraps to a fresh single-entry mapping: $got")
    // an active meta MIXING mapping and plain entries is torn — raise,
    // never silently drop the unparseable part
    val mixed = frame(add(0, 0, "part-0"))
      .unionByName(DeltaLog.metaAction(spark, 1, 0, "k:p_key:BIGINT,cents BIGINT"))
    val exMixed = intercept[Exception] {
      DeltaLog.addColumn(mixed, "region", "p_region", "VARCHAR", 2, 0).collect()
    }
    assert(exMixed.getMessage.contains("mixes mapping and plain"), exMixed.getMessage)
  }

  // ---- shallow clone (dl26) -------------------------------------------------

  private def dvRow(v: Int, o: Int, path: String, mask: Seq[Long]): Row =
    Row(v, o, "dv", path, null, null, null, null, null, mask, null, null, null, null)

  test("cloneActions renumbers per path so a cloned dv still outranks its add") {
    // source: add at v0, REPLACING add at v2 (remove+re-add), dv on the
    // new instance at v3 — the clone's v0 must keep (winning add, dv) in
    // that order per path, and drop the dead first instance entirely
    val src = frame(add(0, 0, "a", 10L), add(0, 1, "b", 10L), rem(2, 0, "a"),
      add(2, 1, "a", 8L), dvRow(3, 0, "a", Seq(1L, 3L)))
    val clone = DeltaLog.cloneActions(src, 3).collect()
    assert(clone.forall(_.getInt(0) == 0), s"all clone actions sit at version 0: ${clone.toSeq}")
    val aRows = clone.filter(_.getString(3) == "a").sortBy(_.getInt(1))
    assert(aRows.map(_.getString(2)).toSeq == Seq("add", "dv"),
      s"winning add then its dv, in ordinal order: ${aRows.toSeq}")
    assert(aRows(0).getInt(1) < aRows(1).getInt(1), "dv ordinal must outrank the add's")
    assert(aRows(0).getLong(5) == 8L, "the clone carries the WINNING instance's stats")
    // the clone replays to the source's state and the mask survives
    val masks = DeltaLog.deletionVectors(frame(clone.toIndexedSeq: _*)).collect()
    assert(masks.length == 1 && masks(0).getSeq[Long](1) == Seq(1L, 3L),
      s"cloned mask must still bind to the cloned add: ${masks.toSeq}")
  }

  test("clone and source logs are independent after the split") {
    val src = frame(add(0, 0, "a", 10L), add(0, 1, "b", 10L))
    val clone0 = DeltaLog.cloneActions(src, 0)
    val cloneAfter = clone0.unionByName(frame(rem(1, 0, "a")))
    val srcAfter = src.unionByName(frame(rem(1, 0, "b")))
    assert(DeltaLog.replay(cloneAfter).collect().map(_.getString(0)).toSet == Set("b"))
    assert(DeltaLog.replay(srcAfter).collect().map(_.getString(0)).toSet == Set("a"),
      "a remove on the clone must not leak into the source")
  }

  test("cloneBreakage lists exactly the source-vacuumable files the clone references") {
    val src = frame(add(0, 0, "a", 10L), add(0, 1, "b", 10L), rem(2, 0, "a"))
    val clone = DeltaLog.cloneActions(src, 0) // references a AND b
    // retention v2..: only the v2 snapshot retained -> 'a' vacuumable, clone breaks on it
    val broken = DeltaLog.cloneBreakage(src, clone, 2).collect()
    assert(broken.map(_.getString(0)).toSeq == Seq("a"), s"got: ${broken.toSeq}")
    // retention from v0 keeps every snapshot -> nothing vacuumable, no breakage
    assert(DeltaLog.cloneBreakage(src, clone, 0).isEmpty)
  }

  // ---- table properties / append-only (dl28) -------------------------------

  test("enforceAppendOnly raises on remove and dv while active, passes adds and lifts on unset") {
    val base = frame(add(0, 0, "a", 10L), add(0, 1, "b", 10L))
    val acts = base.unionByName(DeltaLog.setPropAction(base, "appendOnly", "true", 1, 0))
    val exR = intercept[Exception] {
      DeltaLog.enforceAppendOnly(acts, frame(rem(2, 0, "a"))).collect()
    }
    assert(exR.getMessage.contains("append-only table"), exR.getMessage)
    val exD = intercept[Exception] {
      DeltaLog.enforceAppendOnly(acts, frame(dvRow(2, 0, "a", Seq(1L)))).collect()
    }
    assert(exD.getMessage.contains("append-only table"), exD.getMessage)
    // adds pass through unchanged
    assert(DeltaLog.enforceAppendOnly(acts, frame(add(2, 0, "c", 5L))).count() == 1)
    // ...and an op-filtering consumer cannot elide the guard (ADVICE r12)
    val exF = intercept[Exception] {
      DeltaLog.enforceAppendOnly(acts, frame(rem(2, 0, "a")))
        .filter(col("op") === "remove").collect()
    }
    assert(exF.getMessage.contains("append-only table"), exF.getMessage)
    // unset lifts the restriction
    val acts2 = acts.unionByName(DeltaLog.unsetPropAction(acts, "appendOnly", 2, 0))
    assert(DeltaLog.enforceAppendOnly(acts2, frame(rem(3, 0, "a"))).count() == 1)
  }

  test("activeProps parses strictly and SET replaces an existing key") {
    val base = frame(add(0, 0, "a", 10L))
    val a1 = base.unionByName(DeltaLog.setPropAction(base, "owner", "x", 1, 0))
    val a2 = a1.unionByName(DeltaLog.setPropAction(a1, "owner", "y", 2, 0))
    val props = DeltaLog.activeProps(a2).collect()
    assert(props.length == 1 && props(0).getString(0) == "owner" &&
      props(0).getString(1) == "y", s"SET must replace, not duplicate: ${props.toSeq}")
    // torn entry raises, riding the key column
    val torn = base.unionByName(DeltaLog.propsAction(spark, 1, 0, "owner=x;garbage"))
    val ex = intercept[Exception] { DeltaLog.activeProps(torn).collect() }
    assert(ex.getMessage.contains("torn table property"), ex.getMessage)
    // empty map parses to zero entries (no raise)
    val empty = base.unionByName(DeltaLog.propsAction(spark, 1, 0, ""))
    assert(DeltaLog.activeProps(empty).isEmpty)
  }

  test("props survive checkpointState and a concurrent props commit conflicts a rebase") {
    val base = frame(add(0, 0, "a", 10L), add(0, 1, "b", 10L))
    val acts = base.unionByName(DeltaLog.setPropAction(base, "appendOnly", "true", 1, 0))
    // a reader resuming from the checkpoint still sees (and enforces) the map
    val cp = DeltaLog.checkpointState(acts)
    val ex = intercept[Exception] {
      DeltaLog.enforceAppendOnly(cp, frame(rem(2, 0, "a"))).collect()
    }
    assert(ex.getMessage.contains("append-only table"), ex.getMessage)
    // a txn prepared at v0 must not rebase past a concurrent appendOnly
    // flip (its remove was legal when prepared, illegal now)
    val conf = DeltaLog.rebaseConflicts(frame(rem(90, 0, "b")), acts, 0).collect()
    assert(conf.map(_.getString(3)).toSet == Set("props"),
      s"a concurrent props commit must conflict: ${conf.toSeq}")
  }

  // ---- row tracking (dl27) --------------------------------------------------

  private def ridsRow(v: Int, o: Int, path: String, segs: String): Row =
    Row(v, o, "rids", path, null, null, null, null, null, null, segs, null, null, null)
  private def positioned(rows: (String, Long, Long)*) = {
    import spark.implicits._
    rows.toDF("path", "pos", "o_orderkey")
  }

  test("rowIds resolves segments, raises on untracked files and out-of-range positions") {
    val acts = frame(add(0, 0, "a", 4L), add(0, 1, "b", 3L),
      ridsRow(0, 0, "a", "0:100:2;2:500:2"))
    val ids = DeltaLog.rowIds(acts, positioned(("a", 0L, 1L), ("a", 1L, 2L),
        ("a", 2L, 3L), ("a", 3L, 4L)))
      .collect().map(r => r.getAs[Long]("pos") -> r.getAs[Long]("row_id")).toMap
    assert(ids == Map(0L -> 100L, 1L -> 101L, 2L -> 500L, 3L -> 501L), ids.toString)
    // file 'b' has no map: a tracked read must raise, not invent ids
    val exU = intercept[Exception] {
      DeltaLog.rowIds(acts, positioned(("b", 0L, 9L))).collect()
    }
    assert(exU.getMessage.contains("without a row-id map"), exU.getMessage)
    // position past the last segment's extent: map disagrees with data
    val exO = intercept[Exception] {
      DeltaLog.rowIds(acts, positioned(("a", 4L, 5L))).collect()
    }
    assert(exO.getMessage.contains("outside row-id segments"), exO.getMessage)
  }

  test("rid maps are instance-scoped: a re-add sheds its predecessor's ids") {
    val acts = frame(add(0, 0, "a", 2L), ridsRow(0, 0, "a", "0:0:2"),
      rem(1, 0, "a"), add(2, 0, "a", 2L))
    // the v0 map belonged to the removed instance; the v2 instance is
    // untracked — reading it with ids must raise, never reuse stale ids
    val ex = intercept[Exception] {
      DeltaLog.rowIds(acts, positioned(("a", 0L, 1L))).collect()
    }
    assert(ex.getMessage.contains("without a row-id map"), ex.getMessage)
    // ...but the mark still counts the dead instance: ids are never reused
    val hwm = DeltaLog.ridHighWaterMark(acts).collect()(0).getLong(0)
    assert(hwm == 2L, s"hwm must cover removed files' ids: $hwm")
  }

  test("assignRidActions numbers a batch above the mark in ordinal order") {
    val acts = frame(add(0, 0, "a", 5L), ridsRow(0, 0, "a", "0:0:5"))
    val batch = frame(add(1, 3, "c", 4L), add(1, 7, "d", 2L))
    val rids = DeltaLog.assignRidActions(acts, batch).collect()
      .map(r => r.getString(3) -> r.getAs[String]("schema_str")).toMap
    assert(rids == Map("c" -> "0:5:4", "d" -> "0:9:2"), rids.toString)
  }

  test("compactRidActions refuses masked inputs; torn segments raise in the hwm scan") {
    val acts = frame(
      Row(0, 0, "add", "part-0", Seq(0L), 3L, 1L, 10L, 100L, null, null, null, null, null),
      Row(0, 1, "add", "part-1", Seq(1L), 2L, 11L, 20L, 100L, null, null, null, null, null),
      ridsRow(0, 0, "part-0", "0:0:3"), ridsRow(0, 1, "part-1", "0:3:2"))
    val live = DeltaLog.replay(acts)
    val segs = DeltaLog.ridSegments(acts)
    // the clean path concatenates shifted maps
    val ok = DeltaLog.compactRidActions(live, segs, 1).collect()
    assert(ok.length == 1 && ok(0).getAs[String]("schema_str") == "0:0:3;3:3:2",
      ok.toSeq.toString)
    // a dv on an input means survivor positions renumber — refuse loudly
    val ex = intercept[Exception] {
      DeltaLog.compactRidActions(live, segs, 1,
        dvs = Some(positioned(("part-0", 0L, 0L)).select(col("path")))).collect()
    }
    assert(ex.getMessage.contains("needs materialization"), ex.getMessage)
    // torn segment payloads raise rather than shrinking the mark
    val torn = acts.unionByName(frame(ridsRow(1, 0, "part-0", "0:99")))
    val exT = intercept[Exception] { DeltaLog.ridHighWaterMark(torn).collect() }
    assert(exT.getMessage.contains("rid segment"), exT.getMessage)
  }

  test("rids survive checkpointState and gate the writer version") {
    val acts = frame(add(0, 0, "a", 2L), ridsRow(0, 0, "a", "0:7:2"))
      .unionByName(DeltaLog.protocolAction(spark, 0, 1, 3, 7))
    val cp = DeltaLog.checkpointState(acts)
    val ids = DeltaLog.rowIds(cp, positioned(("a", 0L, 1L), ("a", 1L, 2L)))
      .collect().map(_.getAs[Long]("row_id")).sorted.toSeq
    assert(ids == Seq(7L, 8L), s"checkpoint readers must keep stable ids: $ids")
    // an old writer must fail before committing to a row-tracked table
    val ex = intercept[Exception] { DeltaLog.requireWriter(acts, 6).collect() }
    assert(ex.getMessage.contains("below table protocol"), ex.getMessage)
  }

  test("optimizeActionsTracked equals optimizeActions plus compactRidActions") {
    val acts = frame(
      Row(0, 0, "add", "part-0", Seq(0L), 3L, 1L, 10L, 100L, null, null, null, null, null),
      Row(0, 1, "add", "part-1", Seq(1L), 2L, 11L, 20L, 60L, null, null, null, null, null),
      Row(0, 2, "add", "part-2", Seq(2L), 4L, 21L, 30L, 80L, null, null, null, null, null),
      ridsRow(0, 0, "part-0", "0:0:3"), ridsRow(0, 1, "part-1", "0:3:2"),
      ridsRow(0, 2, "part-2", "0:5:4"))
    val live = DeltaLog.replay(acts).localCheckpoint()
    val segs = DeltaLog.ridSegments(acts).localCheckpoint()
    def key(r: Row) = (r.getInt(0), r.getInt(1), r.getString(2), r.getString(3),
      r.getAs[String]("schema_str"), Option(r.getAs[Seq[Long]]("buckets")),
      Option(r.getAs[Any]("n_rows")), Option(r.getAs[Any]("cents")))
    val fused = DeltaLog.optimizeActionsTracked(live, segs, 1).collect().map(key).toSet
    val composed = (DeltaLog.optimizeActions(live, 1).collect() ++
      DeltaLog.compactRidActions(live, segs, 1).collect()).map(key).toSet
    assert(fused == composed, s"fused:\n$fused\ncomposed:\n$composed")
    // only the full pair compacts; part-2's lone bin is left alone
    assert(!fused.exists(_._4 == "part-2"), "a lone file must not be touched")
    // masked input refusal carries over to the fused path
    val ex = intercept[Exception] {
      DeltaLog.optimizeActionsTracked(live, segs, 1,
        dvs = Some(positioned(("part-0", 0L, 0L)).select(col("path")))).collect()
    }
    assert(ex.getMessage.contains("needs materialization"), ex.getMessage)
  }

  // ---- ADD CONSTRAINT validates existing data (dl29) ------------------------

  test("addConstraintValidated refuses a constraint existing data violates") {
    // files with n_rows 10 (helper default): a min:100 bound is already false
    val acts = frame(add(0, 0, "a", 10L), add(0, 1, "b", 10L))
    val ex = intercept[Exception] {
      DeltaLog.addConstraintValidated(acts, "c1:n_rows:min:100", 1, 0).collect()
    }
    assert(ex.getMessage.contains("writer invariant violated"), ex.getMessage)
    // a conforming constraint commits, and the SECOND add derives the
    // combined payload — re-validating the standing entry too
    val acts1 = acts.unionByName(
      DeltaLog.addConstraintValidated(acts, "c1:n_rows:min:1", 1, 0))
    val a2 = DeltaLog.addConstraintValidated(acts1, "c2:cents:max:1000", 2, 0).collect()
    assert(a2.length == 1 && a2(0).getAs[String]("schema_str") ==
      "c1:n_rows:min:1;c2:cents:max:1000", a2.toSeq.toString)
    // the combined spec refuses when the NEW entry is the violator
    val ex2 = intercept[Exception] {
      DeltaLog.addConstraintValidated(acts1, "c3:cents:max:10", 2, 0).collect()
    }
    assert(ex2.getMessage.contains("c3"), ex2.getMessage)
  }

  // ---- COW delete with id materialization (dl30) ----------------------------

  test("deleteActionsTracked splits segments at deleted runs, across original segment joints") {
    import spark.implicits._
    // ONE file whose map already has two segments (a prior compaction):
    // positions 0-2 carry ids 100-102, positions 3-4 carry ids 500-501
    val acts = frame(
      Row(0, 0, "add", "a", Seq(0L), 5L, 1L, 5L, 50L, null, null, null, null, null),
      ridsRow(0, 0, "a", "0:100:3;3:500:2"))
    val live = DeltaLog.replay(acts)
    val segs = DeltaLog.ridSegments(acts)
    val positioned = Seq(("a", 0L, 1L, 10L), ("a", 1L, 2L, 10L), ("a", 2L, 3L, 10L),
      ("a", 3L, 4L, 10L), ("a", 4L, 5L, 10L)).toDF("path", "pos", "o_orderkey", "cents")
    // delete position 1 (inside segment 1): survivors 0,2,3,4 renumber to
    // 0,1,2,3 — ids 100,102,500,501 → three islands: [0:100:1][1:102:1][2:500:2]
    val txn = DeltaLog.deleteActionsTracked(live, segs, positioned,
      col("o_orderkey") === 2, 1).collect()
    val byOp = txn.groupBy(_.getString(2)).view.mapValues(_.toSeq).toMap
    assert(byOp("remove").map(_.getString(3)) == Seq("a"))
    val add = byOp("add").head
    assert(add.getString(3) == "cow-a" && add.getLong(5) == 4L && add.getLong(8) == 40L,
      add.toString)
    assert(byOp("rids").head.getAs[String]("schema_str") == "0:100:1;1:102:1;2:500:2",
      byOp("rids").head.toString)
    // the committed map resolves the survivors' ORIGINAL ids — through a
    // full JSON round trip of the transaction
    val acts1 = DeltaLog.actions(DeltaLog.toLines(
      acts.unionByName(frame(txn.toIndexedSeq: _*))))
    val survPos = Seq(("cow-a", 0L, 1L, 10L), ("cow-a", 1L, 3L, 10L),
      ("cow-a", 2L, 4L, 10L), ("cow-a", 3L, 5L, 10L)).toDF("path", "pos", "o_orderkey", "cents")
    val ids = DeltaLog.rowIds(acts1, survPos).collect()
      .map(r => r.getAs[Long]("pos") -> r.getAs[Long]("row_id")).toMap
    assert(ids == Map(0L -> 100L, 1L -> 102L, 2L -> 500L, 3L -> 501L), ids.toString)
  }

  test("deleteActionsTracked: full cover is a bare remove; ghost match raises") {
    import spark.implicits._
    val acts = frame(add(0, 0, "a", 2L), ridsRow(0, 0, "a", "0:0:2"))
    val live = DeltaLog.replay(acts)
    val segs = DeltaLog.ridSegments(acts)
    val positioned = Seq(("a", 0L, 1L, 10L), ("a", 1L, 2L, 10L))
      .toDF("path", "pos", "o_orderkey", "cents")
    val txn = DeltaLog.deleteActionsTracked(live, segs, positioned, lit(true), 1).collect()
    assert(txn.map(_.getString(2)).toSeq == Seq("remove"),
      s"a fully-matched file is a bare remove: ${txn.toSeq}")
    // a predicate match on a non-live path must raise, never drop silently
    val ghost = positioned.unionByName(
      Seq(("zombie", 0L, 99L, 1L)).toDF("path", "pos", "o_orderkey", "cents"))
    val ex = intercept[Exception] {
      DeltaLog.deleteActionsTracked(live, segs, ghost, col("o_orderkey") === 99, 1).collect()
    }
    assert(ex.getMessage.contains("non-live path"), ex.getMessage)
  }

  // ---- type widening (dl31) -------------------------------------------------

  test("widenColumn walks the lattice up only; narrowing and family jumps raise") {
    val base = frame(add(0, 0, "part-0"))
      .unionByName(DeltaLog.metaAction(spark, 1, 0,
        "a:p_a:TINYINT,b:p_b:BIGINT,c:p_c:FLOAT,d:p_d:VARCHAR"))
    // legal chain: TINYINT -> SMALLINT -> BIGINT (skipping a rank is fine)
    val w1 = DeltaLog.widenColumn(base, "a", "SMALLINT", 2, 0).localCheckpoint()
    val w2 = DeltaLog.widenColumn(base.unionByName(w1), "a", "BIGINT", 3, 0)
    val types = DeltaLog.columnMapping(base.unionByName(w1).unionByName(w2)).collect()
      .map(r => r.getAs[String]("logical_name") -> r.getAs[String]("col_type")).toMap
    assert(types("a") == "BIGINT" && types("b") == "BIGINT", types.toString)
    // narrowing truncates old files' values — raise
    val exN = intercept[Exception] {
      DeltaLog.widenColumn(base, "b", "INT", 2, 0).collect()
    }
    assert(exN.getMessage.contains("illegal type change"), exN.getMessage)
    // cross-family changes arithmetic semantics — raise (both directions)
    val exF = intercept[Exception] {
      DeltaLog.widenColumn(base, "a", "DOUBLE", 2, 0).collect()
    }
    assert(exF.getMessage.contains("illegal type change"), exF.getMessage)
    // FLOAT -> DOUBLE is the float family's one legal widening
    assert(DeltaLog.widenColumn(base, "c", "DOUBLE", 2, 0).count() == 1)
    // unwidenable family (VARCHAR) and unknown targets raise
    val exV = intercept[Exception] {
      DeltaLog.widenColumn(base, "d", "BIGINT", 2, 0).collect()
    }
    assert(exV.getMessage.contains("illegal type change"), exV.getMessage)
    // a column the mapping doesn't have raises the existence guard
    val exM = intercept[Exception] {
      DeltaLog.widenColumn(base, "zz", "BIGINT", 2, 0).collect()
    }
    assert(exM.getMessage.contains("not in mapping"), exM.getMessage)
  }

  // ---- generated coverage (dl32) --------------------------------------------

  test("enforceGeneratedCoverage raises on coverage lies, passes clean adds, off when undeclared") {
    def addCov(v: Int, path: String, bks: Seq[Long], minK: Long, maxK: Long): Row =
      Row(v, 0, "add", path, bks, 10L, minK, maxK, 100L, null, null, null, null, null)
    // W = 250: keys 1..4 live in bucket 0, 251.. in bucket 1, 501.. in 2
    val base = frame(addCov(0, "part-0", Seq(0L), 1L, 4L))
    val acts = base.unionByName(
      DeltaLog.setPropAction(base, "gen.buckets", "key_div_w", 1, 0))
    // clean single-bucket and clean contiguous multi-bucket adds pass
    assert(DeltaLog.enforceGeneratedCoverage(acts,
      frame(addCov(2, "x", Seq(1L), 251L, 253L))).count() == 1)
    assert(DeltaLog.enforceGeneratedCoverage(acts,
      frame(addCov(2, "y", Seq(0L, 1L), 1L, 253L))).count() == 1)
    // endpoint lie: declared bucket 1, keys live in bucket 2
    val exE = intercept[Exception] {
      DeltaLog.enforceGeneratedCoverage(acts,
        frame(addCov(2, "z", Seq(1L), 501L, 502L))).collect()
    }
    assert(exE.getMessage.contains("coverage disagrees"), exE.getMessage)
    // contiguity lie: endpoints right, a bucket missing in the middle
    val exC = intercept[Exception] {
      DeltaLog.enforceGeneratedCoverage(acts,
        frame(addCov(2, "w", Seq(0L, 2L), 1L, 502L))).collect()
    }
    assert(exC.getMessage.contains("coverage disagrees"), exC.getMessage)
    // stats the check can't verify are not silently admitted
    val exS = intercept[Exception] {
      DeltaLog.enforceGeneratedCoverage(acts, frame(
        Row(2, 0, "add", "q", Seq(0L), 10L, null, null, 100L,
          null, null, null, null, null))).collect()
    }
    assert(exS.getMessage.contains("coverage disagrees"), exS.getMessage)
    // without the declaration the gate is inert (legacy tables unchanged)
    assert(DeltaLog.enforceGeneratedCoverage(base,
      frame(addCov(2, "z", Seq(1L), 501L, 502L))).count() == 1)
  }}

/** Streaming change-data-feed source (the round-12 verdict's #5): the
  * dl12b fixture's versions arrive as a file stream; the consumer folds
  * each version wave into its checkpoint state and emits the per-
  * transition delta via `DeltaLog.cdfBetween` — the accumulated feed,
  * across a checkpointed restart mid-feed, must equal the one-shot
  * batch grid (`dl12b_change feed` semantics: dv-only transitions report
  * row deltas with zero file churn). */
class CdfStreamSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  import graft.ops.DeltaLog

  test("stream-accumulated per-version CDF equals the batch change feed, across a restart") {
    val dir = "/root/testdata/sf0.001"
    val ord = graft.tables.TestTables.orders(spark, dir)
    val logBase = DeltaLog.logLines(ord)
    val live0 = DeltaLog.snapshot(logBase).localCheckpoint()
    // the dl12b fixture exactly: v4 masks part-5 (pos%7=3) and
    // compact-0-1 (first 10); v5 REPLACES compact-0-1's mask (first 4)
    val log = logBase.unionByName(DeltaLog.toLines(
      DeltaLog.dvAction(live0, "part-5", 4, 0,
          filter(sequence(lit(0L), col("n_rows") - 1), p => p % 7 === 3))
        .unionByName(DeltaLog.dvAction(live0, "compact-0-1", 4, 1, sequence(lit(0L), lit(9L))))
        .unionByName(DeltaLog.dvAction(live0, "compact-0-1", 5, 0, sequence(lit(0L), lit(3L))))))
    val acts = DeltaLog.actions(log).localCheckpoint()

    // the batch truth: the dl12b grid computation over the same fixture
    val want = graft.queries.LakehouseQueries.dl12bCdfDv.fn(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toSeq

    // positioned rows over every path the fixture ever adds (the one
    // data-sized input cdfBetween reads)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("path")).orderBy(col("key"))
    val rws = acts.filter(col("op") === "add")
      .select(col("path"), explode(col("buckets")).as("bucket")).distinct()
      .join(ord.select(floor(col("o_orderkey") / DeltaLog.W).as("bucket"),
        col("o_orderkey").as("key")), Seq("bucket"))
      .select(col("path"), col("key"), (row_number().over(w) - 1).cast("long").as("pos"))
      .localCheckpoint()

    val base = java.nio.file.Files.createTempDirectory("graft_cdfstream").toString
    val landing = s"$base/landing"; val ckpt = s"$base/ckpt"
    val stateDir = s"$base/state"; val stateVPath = java.nio.file.Paths.get(s"$base/stateV")
    def wave(v: Int) = acts.filter(col("version") === v)
      .select(to_json(struct(acts.columns.map(col): _*)).as("line"))
      .coalesce(1)

    @volatile var state = spark.emptyDataFrame
    @volatile var stateV = -1
    val cdfRows = scala.collection.mutable.Buffer.empty[(Int, Int, Long, Long, Long, Long)]
    val lineSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("line", org.apache.spark.sql.types.StringType)))
    def start() = graft.stream.Ingest.fileIngest(spark, landing, lineSchema,
        b => b,
        (b, _) => if (!b.isEmpty) synchronized {
          val batchActs = DeltaLog.actions(b).localCheckpoint()
          // a micro-batch may pack several version waves — the feed is
          // per-version, so fold and emit one transition at a time
          val versions = batchActs.select("version").distinct()
            .collect().map(_.getInt(0)).sorted
          versions.foreach { v =>
            val wv = batchActs.filter(col("version") === v)
            val newState =
              if (stateV < 0) DeltaLog.checkpointState(wv).localCheckpoint()
              else DeltaLog.foldState(state, wv, stateV)
            if (stateV >= 0) {
              val r = DeltaLog.cdfBetween(state, newState, rws).head()
              cdfRows += ((stateV, v, r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
            }
            state = newState; stateV = v
          }
          // durable state, batch granularity (the source checkpoint also
          // advances per batch, so a clean stop between batches recovers
          // exactly; mid-batch crash idempotence would need batchId
          // gating — out of scope here)
          state.write.mode("overwrite").parquet(stateDir)
          java.nio.file.Files.write(stateVPath, stateV.toString.getBytes)
        })
      .option("checkpointLocation", ckpt).start()

    wave(0).write.mode("overwrite").parquet(landing)
    wave(1).write.mode("append").parquet(landing)
    wave(2).write.mode("append").parquet(landing)
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    // v3 and both dv waves land while the consumer is DOWN — and the
    // consumer itself DIES: in-memory state is wiped and must recover
    // from the durable store, the part of a restart JVM-local vars would
    // otherwise mask
    state = spark.emptyDataFrame; stateV = -1
    state = spark.read.parquet(stateDir).localCheckpoint()
    stateV = new String(java.nio.file.Files.readAllBytes(stateVPath)).trim.toInt
    assert(stateV == 2, "recovered state must sit exactly at the last folded version")
    wave(3).write.mode("append").parquet(landing)
    wave(4).write.mode("append").parquet(landing)
    wave(5).write.mode("append").parquet(landing)
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    assert(stateV == 5)

    assert(cdfRows.toSeq == want,
      s"stream-accumulated CDF must equal the batch feed\n got: ${cdfRows.toSeq}\nwant: $want")
    // the dv-only transitions are the load-bearing part: v3→v4 removes
    // rows with zero file churn, v4→v5 restores some of them
    val dvT = cdfRows.toSeq.filter(t => t._1 >= 3)
    assert(dvT.forall(t => t._3 == 0 && t._4 == 0), s"dv transitions must move no files: $dvT")
    assert(dvT.head._6 > 0 && dvT.last._5 > 0,
      s"v3->v4 must remove rows and v4->v5 must restore rows: $dvT")
  }
}
