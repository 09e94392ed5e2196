package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.ops.DeltaLog

/** Round-13 integration: every verb added this round composed into ONE
  * table lifecycle — row tracking from birth, append-only governance,
  * validated ADD CONSTRAINT, a COW delete committed through the STACKED
  * enforcement wrappers, a shallow clone diverging independently, an
  * OCC abort on a concurrent table-level commit, a type widening, and a
  * checkpoint that preserves every state family the round added. The
  * point is composition: each gate proves its verb alone; this proves
  * the verbs agree on one log. */
class Round13LifecycleSpec extends SparkSpec {
  import spark.implicits._

  private def add(v: Int, o: Int, path: String, bucket: Long, nRows: Long,
                  minK: Long, maxK: Long, cents: Long): Row =
    Row(v, o, "add", path, Seq(bucket), nRows, minK, maxK, cents,
      null, null, null, null, null)
  private def frame(rows: Row*) =
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), DeltaLog.actionSchema)

  test("the round-13 verbs compose on one log") {
    // ---- v0: tracked table birth — files, id maps, protocol, mapping ----
    val adds0 = frame(
      add(0, 0, "a", 0L, 4L, 1L, 4L, 40L),
      add(0, 1, "b", 1L, 3L, 251L, 253L, 30L))
    val acts0 = adds0
      .unionByName(DeltaLog.assignRidActions(adds0, adds0))
      .unionByName(DeltaLog.protocolAction(spark, 0, 100, 3, 7))
      .unionByName(DeltaLog.metaAction(spark, 0, 99, "k:p_k:INT"))
      .localCheckpoint()
    // ids: a = 0..3, b = 4..6
    // ---- v1: appendOnly=true ----
    val acts1 = acts0.unionByName(DeltaLog.setPropAction(acts0, "appendOnly", "true", 1, 0))
    // ---- v2: an append is still legal; it gets fresh ids above the mark ----
    val addC = frame(add(2, 0, "c", 2L, 2L, 501L, 502L, 20L))
    val acts2 = acts1
      .unionByName(DeltaLog.enforceAppendOnly(acts1, addC))
      .unionByName(DeltaLog.assignRidActions(acts1, addC))
      .localCheckpoint()
    val cSegs = DeltaLog.ridSegments(acts2).collect()
      .map(r => r.getString(0) -> r.getAs[scala.collection.Seq[Row]]("segs")).toMap
    assert(cSegs("c").map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) == Seq((0L, 7L, 2L)),
      s"fresh ids start at the mark (7): ${cSegs("c")}")
    // ...but a remove is NOT legal while the property holds
    val exAo = intercept[Exception] {
      DeltaLog.enforceAppendOnly(acts2, frame(
        Row(3, 0, "remove", "a", null, null, null, null, null,
          null, null, null, null, null))).collect()
    }
    assert(exAo.getMessage.contains("append-only table"), exAo.getMessage)
    // ---- v3: lift it; v4: ADD CONSTRAINT validated against live stats ----
    val acts3 = acts2.unionByName(DeltaLog.unsetPropAction(acts2, "appendOnly", 3, 0))
    val acts4 = acts3.unionByName(
      DeltaLog.addConstraintValidated(acts3, "c1:n_rows:min:1", 4, 0)).localCheckpoint()
    // ---- v5: COW delete (keys 2,3 in file a) through BOTH enforcement
    // wrappers stacked — invariants validate the cow add's stats, the
    // (now lifted) append-only gate passes the remove ----
    val positioned = Seq(
      ("a", 0L, 1L, 10L), ("a", 1L, 2L, 10L), ("a", 2L, 3L, 10L), ("a", 3L, 4L, 10L),
      ("b", 0L, 251L, 10L), ("b", 1L, 252L, 10L), ("b", 2L, 253L, 10L),
      ("c", 0L, 501L, 10L), ("c", 1L, 502L, 10L))
      .toDF("path", "pos", "o_orderkey", "cents")
    val del5 = DeltaLog.deleteActionsTracked(DeltaLog.replay(acts4),
      DeltaLog.ridSegments(acts4), positioned,
      col("o_orderkey").isin(2L, 3L), 5)
    val acts5 = acts4.unionByName(
      DeltaLog.enforceAppendOnly(acts4, DeltaLog.enforceInvariants(acts4, del5)))
      .localCheckpoint()
    val segs5 = DeltaLog.ridSegments(acts5).collect()
      .map(r => r.getString(0) -> r.getAs[scala.collection.Seq[Row]]("segs").map(x =>
        (x.getLong(0), x.getLong(1), x.getLong(2)))).toMap
    assert(segs5("cow-a") == Seq((0L, 0L, 1L), (1L, 3L, 1L)),
      s"survivor ids 0 and 3 materialize into split segments: ${segs5("cow-a")}")
    assert(DeltaLog.replay(acts5).collect().map(_.getString(0)).toSet ==
      Set("cow-a", "b", "c"))
    // ---- v6(clone): shallow clone at v5 diverges independently ----
    val clone0 = DeltaLog.cloneActions(acts5, 5)
    val cloneAfter = clone0.unionByName(frame(
      Row(1, 0, "remove", "b", null, null, null, null, null,
        null, null, null, null, null)))
    assert(DeltaLog.replay(cloneAfter).collect().map(_.getString(0)).toSet ==
      Set("cow-a", "c"), "the clone's remove stays in the clone")
    // the clone carries the id maps: reads resolve the SAME stable ids
    val cloneIds = DeltaLog.rowIds(cloneAfter,
      Seq(("cow-a", 0L, 1L, 10L), ("cow-a", 1L, 4L, 10L), ("c", 0L, 501L, 10L))
        .toDF("path", "pos", "o_orderkey", "cents"))
      .collect().map(_.getAs[Long]("row_id")).sorted.toSeq
    assert(cloneIds == Seq(0L, 3L, 7L), s"clone readers see the source's ids: $cloneIds")
    // ---- v6(source): a concurrent props commit lands; our prepared
    // remove must ABORT, not rebase past table-level state ----
    val acts6 = acts5.unionByName(DeltaLog.setPropAction(acts5, "owner", "graft", 6, 0))
      .localCheckpoint()
    val (_, decisions) = DeltaLog.commitWithRetry(acts6,
      frame(Row(90, 0, "remove", "c", null, null, null, null, null,
        null, null, null, null, null)),
      readVersion = 5, maxAttempts = 3, contention = _ => None)
    assert(decisions.map(_.outcome) == Seq("abort_conflict"), decisions.mkString(","))
    // ---- v7: widen the mapped column; the chain is log-only ----
    val acts7 = acts6.unionByName(DeltaLog.widenColumn(acts6, "k", "BIGINT", 7, 0))
      .localCheckpoint()
    // ---- checkpoint: EVERY round-13 state family survives compaction ----
    val cp = DeltaLog.checkpointState(acts7)
    assert(DeltaLog.replay(cp).collect().map(_.getString(0)).toSet ==
      Set("cow-a", "b", "c"))
    val cpProps = DeltaLog.activeProps(cp).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(cpProps == Map("owner" -> "graft"), cpProps.toString)
    assert(DeltaLog.activeConstraints(cp).collect().map(_.getString(0)).toSeq == Seq("c1"))
    val cpTypes = DeltaLog.columnMapping(cp).collect()
      .map(r => r.getAs[String]("logical_name") -> r.getAs[String]("col_type")).toMap
    assert(cpTypes == Map("k" -> "BIGINT"), cpTypes.toString)
    val cpPositioned = Seq(
      ("cow-a", 0L, 1L, 10L), ("cow-a", 1L, 4L, 10L),
      ("b", 0L, 251L, 10L), ("b", 1L, 252L, 10L), ("b", 2L, 253L, 10L),
      ("c", 0L, 501L, 10L), ("c", 1L, 502L, 10L))
      .toDF("path", "pos", "o_orderkey", "cents")
    val cpIds = DeltaLog.rowIds(cp, cpPositioned)
      .collect().map(_.getAs[Long]("row_id")).sorted.toSeq
    assert(cpIds == Seq(0L, 3L, 4L, 5L, 6L, 7L, 8L),
      s"checkpoint readers resolve the same stable ids: $cpIds")
    assert(cpIds.distinct.size == cpIds.size)
    // the mark survives too: retired ids (1, 2) never recycle
    val hwm = DeltaLog.ridHighWaterMark(cp).collect()(0).getLong(0)
    assert(hwm == 9L, s"hwm covers every id ever issued: $hwm")
    // ---- fold: checkpoint(v5) + waves 6..7 ≡ the full-log state ----
    val folded = DeltaLog.foldState(DeltaLog.checkpointState(acts5, Some(5)),
      acts7.filter(col("version") > 5), 5)
    val foldedProps = DeltaLog.activeProps(folded).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(foldedProps == Map("owner" -> "graft"), foldedProps.toString)
    val foldedTypes = DeltaLog.columnMapping(folded).collect()
      .map(r => r.getAs[String]("logical_name") -> r.getAs[String]("col_type")).toMap
    assert(foldedTypes == Map("k" -> "BIGINT"), foldedTypes.toString)
    assert(DeltaLog.replay(folded).collect().map(_.getString(0)).toSet ==
      Set("cow-a", "b", "c"))
  }
}
