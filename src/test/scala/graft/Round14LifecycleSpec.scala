package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.ops.DeltaLog

/** Round-14 integration: every verb added this round composed into ONE
  * table lifecycle — identity columns assigned at birth and through an
  * exactly-once streaming epoch, a duplicate epoch replayed mid-stream,
  * racing identity writers landing disjoint ranges, a three-branch
  * MERGE, a REPLACE WHERE region swap, a REORG PURGE retiring the
  * merge's masks, a clone dropping the txn markers, and a checkpoint
  * that preserves the identity high-water mark even though the purge
  * removed every instance whose side actions the mark was scanned from.
  * Each gate proves its verb alone; this proves the verbs agree on one
  * log. */
class Round14LifecycleSpec extends SparkSpec {
  import spark.implicits._

  private def add(v: Int, o: Int, path: String, bucket: Long, nRows: Long,
                  minK: Long, maxK: Long, cents: Long): Row =
    Row(v, o, "add", path, Seq(bucket), nRows, minK, maxK, cents,
      null, null, null, null, null)
  private def frame(rows: Row*) =
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), DeltaLog.actionSchema)

  test("the round-14 verbs compose on one log") {
    // ---- v0: birth — two files with identity keys assigned at commit ----
    val adds0 = frame(
      add(0, 0, "a", 0L, 4L, 1L, 4L, 40L),
      add(0, 1, "b", 1L, 3L, 251L, 253L, 30L))
    val acts0 = adds0.unionByName(DeltaLog.assignIdentActions(adds0, adds0))
      .localCheckpoint()
    // identity keys: a = 0..3, b = 4..6

    // ---- v1: streaming epoch 0 commits file c WITH its identity range
    // in the same atomic transaction ----
    val addC = frame(add(90, 1000, "c", 2L, 2L, 501L, 502L, 20L))
    val txnC = addC.unionByName(DeltaLog.assignIdentActions(acts0, addC))
    val (acts1, out1) = DeltaLog.commitEpochIdempotent(acts0, txnC, "ingest", 0L, 0)
    assert(out1.outcome == "committed" && out1.attempts.last.target == 1)
    val cSeg = DeltaLog.identSegments(acts1).filter(col("path") === "c")
      .select("segs").head().getSeq[Row](0)
    assert(cSeg.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) == Seq((0L, 7L, 2L)),
      s"the epoch's identity range starts at the mark: $cSeg")
    // the replayed epoch (checkpoint-restart re-delivery) is a no-op
    val (acts1b, out1b) = DeltaLog.commitEpochIdempotent(acts1, txnC, "ingest", 0L, 1)
    assert(out1b.outcome == "skipped_duplicate")
    assert(acts1b.count() == acts1.count(), "a replayed epoch must not extend the log")

    // ---- v2: a second identity writer prepared on the STALE v0 mark
    // must abort (concurrent ident), then land disjoint on re-prepare ----
    val addX = frame(add(91, 1000, "x", 3L, 2L, 751L, 752L, 20L))
    val staleTxn = addX.unionByName(DeltaLog.assignIdentActions(acts0, addX))
    val (_, staleDec) = DeltaLog.commitWithRetry(acts1, staleTxn, 0)
    assert(staleDec.map(_.outcome) == Seq("abort_conflict"), staleDec.mkString(","))
    val freshTxn = addX.unionByName(DeltaLog.assignIdentActions(acts1, addX))
    val (acts2, freshDec) = DeltaLog.commitWithRetry(acts1, freshTxn, 1)
    assert(freshDec.map(_.outcome) == Seq("committed"))
    val xSeg = DeltaLog.identSegments(acts2).filter(col("path") === "x")
      .select("segs").head().getSeq[Row](0)
    assert(xSeg.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))) == Seq((0L, 9L, 2L)),
      s"the retry re-reads the mark — ranges stay disjoint: $xSeg")

    // ---- v3: three-branch MERGE — update key 2 (in a), insert key 900,
    // NMBS-delete key 251 (in b) ----
    val positioned = Seq(
      ("a", 0L, 1L, 10L), ("a", 1L, 2L, 10L), ("a", 2L, 3L, 10L), ("a", 3L, 4L, 10L),
      ("b", 0L, 251L, 10L), ("b", 1L, 252L, 10L), ("b", 2L, 253L, 10L),
      ("c", 0L, 501L, 10L), ("c", 1L, 502L, 10L),
      ("x", 0L, 751L, 10L), ("x", 1L, 752L, 10L))
      .toDF("path", "pos", "o_orderkey", "cents")
    val live2 = DeltaLog.replay(acts2)
    val dvs2 = DeltaLog.deletionVectors(acts2)
    val mrgAdds = DeltaLog.addAction(
        spark.range(1).select(lit(1L).as("n_rows"), lit(2L).as("min_key"),
          lit(2L).as("max_key"), lit(15L).as("cents")), 3, 1000, "mrg-u",
        lit(null).cast(org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)))
      .unionByName(DeltaLog.addAction(
        spark.range(1).select(lit(1L).as("n_rows"), lit(900L).as("min_key"),
          lit(900L).as("max_key"), lit(20L).as("cents")), 3, 1001, "mrg-i",
        lit(null).cast(org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType))))
    val mrg = DeltaLog.mergeActionsBySource(live2, dvs2, positioned,
      col("o_orderkey") === 2L, col("o_orderkey") === 251L, 3, mrgAdds,
      spark.range(1).select(lit(1L).as("n_ins")))
    val acts3 = acts2.unionByName(mrg).localCheckpoint()
    val masks3 = DeltaLog.deletionVectors(acts3).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(masks3 == Map("a" -> Seq(1L), "b" -> Seq(0L)), masks3.toString)

    // ---- v4: REPLACE WHERE keys in [500, 1000] — c, x, mrg-i leave
    // whole; fresh region content arrives ----
    val positioned3 = positioned
      .unionByName(Seq(("mrg-u", 0L, 2L, 15L), ("mrg-i", 0L, 900L, 20L))
        .toDF("path", "pos", "o_orderkey", "cents"))
    val rwAdd = DeltaLog.addAction(
      spark.range(1).select(lit(2L).as("n_rows"), lit(510L).as("min_key"),
        lit(910L).as("max_key"), lit(30L).as("cents")), 4, 1000, "rw",
      lit(null).cast(org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)))
    val rw = DeltaLog.replaceWhereActions(DeltaLog.replay(acts3),
      DeltaLog.deletionVectors(acts3), positioned3,
      col("o_orderkey").between(500L, 1000L), 4, rwAdd,
      col("min_key") >= 500L && col("max_key") <= 1000L)
    val acts4 = acts3.unionByName(rw).localCheckpoint()
    assert(DeltaLog.replay(acts4).collect().map(_.getString(0)).toSet ==
      Set("a", "b", "mrg-u", "rw"), "the region swapped atomically")

    // ---- v5: REORG PURGE retires the merge's masks ----
    val net = Seq(("a", 3L, 1L, 4L, 30L), ("b", 2L, 252L, 253L, 20L))
      .toDF("path", "n_rows", "min_key", "max_key", "cents")
    val purge = DeltaLog.reorgPurgeActions(DeltaLog.replay(acts4),
      DeltaLog.deletionVectors(acts4), net, 5)
    val acts5 = acts4.unionByName(purge).localCheckpoint()
    assert(DeltaLog.deletionVectors(acts5).isEmpty, "purge retires every mask")
    assert(DeltaLog.replay(acts5).collect().map(_.getString(0)).toSet ==
      Set("purged-a", "purged-b", "mrg-u", "rw"))

    // ---- clone: a NEW table — identical read, NO txn markers, and the
    // identity mark carried so the clone never re-issues source ids ----
    val clone = DeltaLog.cloneActions(acts5, 5).localCheckpoint()
    assert(clone.filter(col("op") === "txn").isEmpty,
      "stream fencing must not carry into a clone")
    assert(DeltaLog.lastTxnVersion(clone, "ingest").head().getLong(0) == -1L)
    assert(DeltaLog.replay(clone).collect().map(_.getString(0)).toSet ==
      DeltaLog.replay(acts5).collect().map(_.getString(0)).toSet)
    assert(DeltaLog.identHighWaterMark(clone).head().getLong(0) == 11L,
      "the clone must not re-issue ids the source ever assigned")
    // a fresh app epoch into the clone commits — per-table fencing
    val cloneAdd = frame(add(92, 1000, "cl", 4L, 1L, 1001L, 1001L, 10L))
    val (_, cloneOut) = DeltaLog.commitEpochIdempotent(clone, cloneAdd, "ingest", 0L, 0)
    assert(cloneOut.outcome == "committed", cloneOut.toString)

    // ---- checkpoint: the mark survives even though the PURGE removed
    // every instance whose ident actions the mark was scanned from ----
    val cp = DeltaLog.checkpointState(acts5)
    assert(DeltaLog.identHighWaterMark(cp).head().getLong(0) == 11L,
      "a checkpoint+tail writer with a regressed mark would re-issue ids")
    // the txn marker survives the checkpoint too (real Delta checkpoints
    // retain txn actions): the restarting writer still sees epoch 0
    assert(DeltaLog.lastTxnVersion(cp, "ingest").head().getLong(0) == 0L)
    // and a next epoch assigned off the CHECKPOINT starts above the mark
    val addN = frame(add(93, 1000, "n", 5L, 1L, 1251L, 1251L, 10L))
    val nSeg = DeltaLog.assignIdentActions(cp, addN)
      .select("schema_str").head().getString(0)
    assert(nSeg == "0:11:1", s"post-checkpoint assignment starts at the mark: $nSeg")
  }
}
