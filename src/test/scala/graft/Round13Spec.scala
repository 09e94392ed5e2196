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
}
