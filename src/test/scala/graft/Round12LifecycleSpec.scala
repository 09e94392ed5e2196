package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.ops.DeltaLog

/** ONE log, every round-12 DML verb, composed in sequence: write →
  * protocol upgrade → predicate DELETE → MERGE → DV-aware OPTIMIZE →
  * checkpoint equivalence → RESTORE → commit timestamps driving
  * TIMESTAMP AS OF and time-keyed vacuum. The per-cut row multisets are
  * asserted against plain-Scala expectations, so a cross-feature
  * interaction bug (a mask surviving a rewrite, a restore missing a
  * file, a timestamp dropping a version) fails HERE even if each
  * feature's own gate stays green.
  *
  * Chronicle: v0 adds part-0 (keys 0-9) and part-1 (keys 10-19), meta
  * s0, protocol (1,1), ts 1000. v1 DELETE WHERE k%4=0 + protocol
  * upgrade (2,2), ts 1010. v2 MERGE (matched k%10=1 deleted, ins-2 with
  * keys 20-24 inserted), ts 1020. v3 DV-aware OPTIMIZE compacts
  * part-0+part-1 net of their masks into opt-0-1, ts 1030. v4 RESTORE
  * to v1, ts 1040.
  */
class Round12LifecycleSpec extends SparkSpec {

  private def frame(rows: Row*) =
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), DeltaLog.actionSchema)
  private def add(v: Int, o: Int, path: String, bucket: Long, keys: Range): Row =
    Row(v, o, "add", path, Seq(bucket), keys.size.toLong, keys.min.toLong,
      keys.max.toLong, keys.size.toLong * 10L, null, null, null, null, null)
  /** Physical rows: part-0 keys 0-9 (pos = k), part-1 keys 10-19
    * (pos = k - 10), 10 cents each. */
  private def pos01 = {
    import spark.implicits._
    ((0L to 9L).map(k => ("part-0", k, k, 10L)) ++
      (10L to 19L).map(k => ("part-1", k - 10L, k, 10L)))
      .toDF("path", "pos", "k", "cents")
  }
  private def stamp(acts: DataFrame): DataFrame =
    DeltaLog.stampTs(acts, lit(1000L) + col("version").cast("long") * 10L)
  /** The live row KEY multiset at a cut: positioned content of the live
    * files minus the effective masks (file content defined per path). */
  private def liveKeys(acts: DataFrame): Set[Long] = {
    val content = pos01.unionByName {
      import spark.implicits._
      // ins-2: keys 20-24 at pos 0-4; opt-0-1: the 13 net survivors of
      // the v3 rewrite, in key order
      val ins = (20L to 24L).map(k => ("ins-2", k - 20L, k, 10L))
      val opt = Seq(2L, 3L, 5L, 6L, 7L, 9L, 10L, 13L, 14L, 15L, 17L, 18L, 19L)
        .zipWithIndex.map { case (k, p) => ("opt-0-1", p.toLong, k, 10L) }
      (ins ++ opt).toDF("path", "pos", "k", "cents")
    }
    val masks = DeltaLog.deletionVectors(acts)
      .select(col("path"), explode(col("dv")).as("pos")).withColumn("hit", lit(1))
    content.join(DeltaLog.replay(acts).select("path"), Seq("path"))
      .join(masks, Seq("path", "pos"), "left").filter(col("hit").isNull)
      .select("k").collect().map(_.getLong(0)).toSet
  }

  test("the full DML lifecycle composes on one stamped log") {
    import spark.implicits._
    // ---- v0: initial write + meta + base protocol -------------------------
    val v0 = stamp(frame(
      add(0, 0, "part-0", 0L, 0 to 9), add(0, 1, "part-1", 1L, 10 to 19))
      .unionByName(DeltaLog.metaAction(spark, 0, 5, "s0"))
      .unionByName(DeltaLog.protocolAction(spark, 0, 6, 1, 1)))
    val acts0 = DeltaLog.actions(DeltaLog.toLines(v0)).localCheckpoint()
    assert(liveKeys(acts0) == (0L to 19L).toSet)

    // ---- v1: DELETE WHERE k % 4 = 0, plus the DV protocol upgrade ----------
    val del1 = DeltaLog.deleteActions(DeltaLog.replay(acts0),
      DeltaLog.deletionVectors(acts0), pos01, col("k") % 4 === 0, 1)
      .unionByName(DeltaLog.protocolAction(spark, 1, 50, 2, 2))
    val acts1 = acts0.unionByName(
      DeltaLog.actions(DeltaLog.toLines(stamp(del1)))).localCheckpoint()
    assert(liveKeys(acts1) == (0L to 19L).filter(_ % 4 != 0).toSet)
    // the upgrade locks a v1 reader out from v1 on, but time travel to v0
    // still admits it (protocol races by version like everything else)
    intercept[Exception] { DeltaLog.requireReader(acts1, 1).collect() }
    assert(DeltaLog.requireReader(acts1, 1, asOf = Some(0)).collect().head.getInt(0) == 1)
    assert(DeltaLog.requireWriter(acts1, 2).collect().head.getInt(0) == 2)

    // ---- v2: MERGE — matched k % 10 = 1 deleted, keys 20-24 inserted -------
    val insStats = Seq((5L, 20L, 24L, 50L)).toDF("n_rows", "min_key", "max_key", "cents")
    val merge2 = DeltaLog.mergeActions(DeltaLog.replay(acts1),
      DeltaLog.deletionVectors(acts1), pos01, col("k") % 10 === 1, 2,
      DeltaLog.addAction(insStats, 2, 1000, "ins-2", array(lit(2L))))
    val acts2 = acts1.unionByName(
      DeltaLog.actions(DeltaLog.toLines(stamp(merge2)))).localCheckpoint()
    val expect2 = ((0L to 19L).filter(k => k % 4 != 0 && k % 10 != 1) ++ (20L to 24L)).toSet
    assert(liveKeys(acts2) == expect2, s"post-merge, got ${liveKeys(acts2)}")

    // ---- v3: DV-aware OPTIMIZE of the masked pair --------------------------
    val net = Seq(
      ("part-0", 6L, 2L, 9L, 60L, 40L),   // mask {0,1,4,8} retired
      ("part-1", 7L, 10L, 19L, 70L, 30L)) // mask {1,2,6} retired
      .toDF("path", "n_rows", "min_key", "max_key", "cents", "masked_cents")
    val opt3 = DeltaLog.optimizeActions(DeltaLog.replay(acts2), 3,
      Some(DeltaLog.deletionVectors(acts2)), Some(net))
    val acts3 = acts2.unionByName(
      DeltaLog.actions(DeltaLog.toLines(stamp(opt3)))).localCheckpoint()
    // same rows, new files; every pre-optimize mask retired with its file
    assert(liveKeys(acts3) == expect2, "OPTIMIZE must not change the row multiset")
    assert(DeltaLog.replay(acts3).collect().map(_.getString(0)).sorted.toSeq ==
      Seq("ins-2", "opt-0-1"))
    assert(DeltaLog.deletionVectors(acts3).isEmpty,
      "masks must retire with the compacted inputs")

    // ---- checkpoint equivalence at EVERY cut so far ------------------------
    for (v0cut <- 0 to 3) {
      val cp = DeltaLog.checkpointedActions(acts3, v0cut).localCheckpoint()
      assert(liveKeys(cp) == liveKeys(acts3), s"checkpoint at $v0cut diverges")
      assert(DeltaLog.activeProtocol(cp).collect().head.getInt(0) == 2,
        s"protocol lost through checkpoint at $v0cut")
      assert(DeltaLog.activeSchema(cp).collect().head.getString(0) == "s0")
    }

    // ---- v4: RESTORE to v1 -------------------------------------------------
    val restore4 = DeltaLog.restoreActions(acts3, 1, 4)
    val acts4 = acts3.unionByName(
      DeltaLog.actions(DeltaLog.toLines(stamp(restore4)))).localCheckpoint()
    assert(liveKeys(acts4) == (0L to 19L).filter(_ % 4 != 0).toSet,
      "restore must reproduce the v1 row multiset exactly")
    assert(DeltaLog.replay(acts4).collect().map(_.getString(0)).sorted.toSeq ==
      Seq("part-0", "part-1"))
    val dvs4 = DeltaLog.deletionVectors(acts4).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(dvs4 == Map("part-0" -> Seq(0L, 4L, 8L), "part-1" -> Seq(2L, 6L)),
      s"restore re-commits the v1 masks, got $dvs4")
    // protocol is never downgraded by a restore
    assert(DeltaLog.activeProtocol(acts4).collect().head.getInt(0) == 2)

    // ---- timestamps drive time travel and retention across the story ------
    val probes = Seq(("before", 999L), ("at_v0", 1000L), ("mid_v1_v2", 1015L),
      ("at_v3", 1030L), ("after", 9999L)).toDF("label", "p_ts")
    val resolved = DeltaLog.versionAsOf(acts4, probes).collect()
      .map(r => r.getString(0) -> r.getInt(2)).toMap
    assert(resolved == Map("before" -> -1, "at_v0" -> 0, "mid_v1_v2" -> 1,
      "at_v3" -> 3, "after" -> 4), s"got $resolved")
    // horizon between v3 and v4 keeps {v3 (boundary), v4}: every PATH is
    // live in one of them (part-0/1 re-added by the restore), so no file
    // vacuums — but the superseded v1/v2 masks retire, only v4's survive
    val retained = DeltaLog.retainedVersionsAsOf(acts4, 1035L)
    assert(retained.collect().map(_.getInt(0)).toSet == Set(3, 4))
    val keptMasks = DeltaLog.deletionVectorGrid(acts4, retained.select(col("v")))
      .select("version").distinct().collect().map(_.getInt(0)).toSet
    assert(keptMasks == Set(4), s"only the restore's masks are effective, got $keptMasks")
  }
}
