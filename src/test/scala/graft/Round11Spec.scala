package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.ops.DeltaLog

/** Round-11 regression fixtures: lakehouse state COMPOSITION — full-state
  * checkpoints, DV-aware OPTIMIZE, instance-scoped masks — plus the
  * round-10 ADVICE guards. Hand-built action sets, independent of the
  * query builders.
  */
class Round11Spec extends SparkSpec {

  private def add(v: Int, o: Int, path: String, nRows: Long = 10L): Row =
    Row(v, o, "add", path, Seq(0L), nRows, 1L, 10L, 100L, null, null, null, null, null)
  private def rem(v: Int, o: Int, path: String): Row =
    Row(v, o, "remove", path, null, null, null, null, null, null, null, null, null, null)
  private def dv(v: Int, o: Int, path: String, mask: Seq[Long]): Row =
    Row(v, o, "dv", path, null, null, null, null, null, mask, null, null, null, null)
  private def meta(v: Int, o: Int, schema: String): Row =
    Row(v, o, "meta", "_schema", null, null, null, null, null, null, schema, null, null, null)
  private def frame(rows: Row*) =
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), DeltaLog.actionSchema)

  // ---- checkpoint completeness ------------------------------------------

  test("checkpointState + tail reproduces replay, dv AND meta state at every cut point") {
    // history exercising all three families across versions: schema at
    // v0/v5, masks landing, being replaced, and dying with a rewrite
    val acts = frame(
      add(0, 0, "a"), add(0, 1, "b"), meta(0, 2, "s0"),
      dv(1, 0, "a", Seq(1L)),
      rem(2, 0, "b"), add(2, 1, "c"),
      dv(3, 0, "a", Seq(1L, 2L)), dv(3, 1, "c", Seq(0L)),
      rem(4, 0, "a"), add(4, 1, "a"), // rewrite: a's masks die with the old instance
      meta(5, 0, "s1"), dv(5, 1, "c", Seq(0L, 5L))).localCheckpoint()
    def liveSet(a: org.apache.spark.sql.DataFrame) =
      DeltaLog.replay(a).collect().map(r => (r.getString(0), r.getLong(2))).toSet
    def dvMap(a: org.apache.spark.sql.DataFrame) =
      DeltaLog.deletionVectors(a).collect()
        .map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    def schemaOf(a: org.apache.spark.sql.DataFrame) =
      DeltaLog.activeSchema(a).collect().map(_.toSeq).toSet
    for (v0 <- 0 to 5) {
      val cp = DeltaLog.checkpointedActions(acts, v0).localCheckpoint()
      assert(liveSet(cp) == liveSet(acts), s"live set differs through checkpoint at v0=$v0")
      assert(dvMap(cp) == dvMap(acts), s"dv state differs through checkpoint at v0=$v0")
      assert(schemaOf(cp) == schemaOf(acts), s"meta state differs through checkpoint at v0=$v0")
    }
    // ground truth of the final state, independently stated
    assert(dvMap(acts) == Map("c" -> Seq(0L, 5L)), "a's mask must die with its rewritten instance")
    assert(schemaOf(acts).head.head == "s1")
  }

  test("checkpointState persists the winning rows ONLY, with original coordinates") {
    val acts = frame(
      add(0, 0, "a"), add(0, 1, "b"), meta(0, 2, "s0"),
      dv(1, 0, "a", Seq(1L)), dv(2, 0, "a", Seq(2L)), rem(2, 1, "b"))
    val cp = DeltaLog.checkpointState(acts, Some(2)).collect()
    assert(cp.length == 3, s"one live add + one effective dv + one meta, got ${cp.toSeq}")
    val byOp = cp.map(r => r.getString(2) -> (r.getInt(0), r.getInt(1))).toMap
    assert(byOp("add") == ((0, 0)), "live add keeps its ORIGINAL coordinates")
    assert(byOp("dv") == ((2, 0)), "only the latest mask survives, original coordinates")
    assert(byOp("meta") == ((0, 2)))
    // the removed path is gone entirely — checkpoints carry state, not history
    assert(!cp.exists(_.getString(3) == "b"))
  }

  test("checkpoint state round-trips the JSON log format losslessly") {
    // a real checkpoint is PERSISTED — serialize the full state through
    // toLines, re-read through the strict parse, and the reads must not
    // notice (catches any actionSchema field dropped for dv/meta rows)
    val acts = frame(
      add(0, 0, "a"), add(0, 1, "b"), meta(0, 2, "s0"),
      dv(1, 0, "a", Seq(1L, 4L)), rem(2, 0, "b"), meta(2, 1, "s1"))
    val cp = DeltaLog.checkpointState(acts, Some(2))
    val rt = DeltaLog.actions(DeltaLog.toLines(cp)).localCheckpoint()
    assert(DeltaLog.replay(rt).collect().map(_.getString(0)).toSeq == Seq("a"))
    val dvs = DeltaLog.deletionVectors(rt).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(dvs == Map("a" -> Seq(1L, 4L)), s"mask must survive serialization, got $dvs")
    assert(DeltaLog.activeSchema(rt).collect().head.getString(0) == "s1")
  }

  // ---- per-version grids ≡ looped single-version reads --------------------

  test("replayGrid / deletionVectorGrid equal the single-as-of reads at every version") {
    val acts = frame(
      add(0, 0, "a"), add(0, 1, "b"),
      dv(1, 0, "a", Seq(1L)),
      rem(2, 0, "b"), add(2, 1, "c"),
      dv(3, 0, "c", Seq(0L)),
      rem(4, 0, "a"), add(4, 1, "a"),
      dv(5, 0, "c", Seq(0L, 5L))).localCheckpoint()
    val versions = spark.range(0, 6).select(col("id").cast("int").as("v"))
    val gridLive = DeltaLog.replayGrid(acts, versions).collect()
      .map(r => (r.getInt(0), r.getString(4), r.getInt(1), r.getInt(2))).toSet
    val loopLive = (0 to 5).flatMap(v => DeltaLog.replayWithBirth(acts, Some(v)).collect()
      .map(r => (v, r.getString(2), r.getInt(0), r.getInt(1)))).toSet
    assert(gridLive == loopLive, "one grid pass must equal the per-version replays")
    val gridDv = DeltaLog.deletionVectorGrid(acts, versions).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getSeq[Long](10).toSeq)).toSet
    val loopDv = (0 to 5).flatMap(v => DeltaLog.deletionVectors(acts, Some(v)).collect()
      .map(r => (v, r.getString(0), r.getSeq[Long](1).toSeq))).toSet
    assert(gridDv == loopDv, "one dv grid pass must equal the per-version mask reads")
    // and the fixture is non-trivial: masks change, die with a rewrite
    assert(loopDv.nonEmpty && loopDv.exists(_._3 == Seq(0L, 5L)))
    assert(!loopDv.exists { case (v, p, _) => v >= 4 && p == "a" },
      "a's mask must be dead from v4 (instance rewritten)")
  }

  // ---- dv instance scoping: lexicographic (version, ordinal) -------------

  test("a dv ordered BEFORE a same-version re-add belongs to the dead instance") {
    // v1: dv(ordinal 0) lands, then the path is removed and re-added
    // (ordinals 1, 2) in the SAME version — the mask predates the new
    // instance and must not apply
    val before = frame(add(0, 0, "f"),
      dv(1, 0, "f", Seq(3L)), rem(1, 1, "f"), add(1, 2, "f"))
    assert(DeltaLog.deletionVectors(before).isEmpty,
      "mask ordered before the same-version re-add must be dropped")
    // same shape but the dv lands AFTER the re-add — now it scopes to the
    // new instance and applies
    val after = frame(add(0, 0, "f"),
      rem(1, 0, "f"), add(1, 1, "f"), dv(1, 2, "f", Seq(3L)))
    val got = DeltaLog.deletionVectors(after).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(got == Map("f" -> Seq(3L)))
  }

  // ---- loud failure guards ------------------------------------------------

  test("dvAction raises on a non-live target path instead of dropping the delete") {
    val live = DeltaLog.replay(frame(add(0, 0, "f")))
    val ex = intercept[Exception] {
      DeltaLog.dvAction(live, "typo-path", 1, 0, array(lit(0L))).collect()
    }
    assert(ex.getMessage.contains("non-live path"), ex.getMessage)
    // and the happy path still emits exactly one schema-complete action row
    val ok = DeltaLog.dvAction(live, "f", 1, 0, array(lit(0L), lit(2L))).collect()
    assert(ok.length == 1 && ok.head.getSeq[Long](9) == Seq(0L, 2L))
  }

  test("optimizeActions raises when a masked input lacks net stats or they disagree") {
    import spark.implicits._
    val acts = frame(add(0, 0, "part-0", 10L), add(0, 1, "part-1", 10L),
      dv(1, 0, "part-0", Seq(2L, 4L)))
    val live = DeltaLog.replay(acts).localCheckpoint()
    val dvs = DeltaLog.deletionVectors(acts).localCheckpoint()
    val missing = intercept[Exception] {
      DeltaLog.optimizeActions(live, 2, Some(dvs),
        Some(Seq.empty[(String, Long, Long, Long, Long, Long)]
          .toDF("path", "n_rows", "min_key", "max_key", "cents", "masked_cents"))).collect()
    }
    assert(missing.getMessage.contains("lacks net stats"), missing.getMessage)
    val disagree = intercept[Exception] {
      DeltaLog.optimizeActions(live, 2, Some(dvs),
        Some(Seq(("part-0", 9L, 1L, 10L, 90L, 10L))
          .toDF("path", "n_rows", "min_key", "max_key", "cents", "masked_cents"))).collect()
    }
    assert(disagree.getMessage.contains("disagree with mask cardinality"), disagree.getMessage)
  }

  test("DV-aware OPTIMIZE compacts net of the mask; the stats-only path would resurrect") {
    import spark.implicits._
    val acts = frame(add(0, 0, "part-0", 10L), add(0, 1, "part-1", 10L),
      dv(1, 0, "part-0", Seq(2L, 4L)))
    val live = DeltaLog.replay(acts).localCheckpoint()
    val dvs = DeltaLog.deletionVectors(acts).localCheckpoint()
    val net = Seq(("part-0", 8L, 1L, 10L, 80L, 20L))
      .toDF("path", "n_rows", "min_key", "max_key", "cents", "masked_cents")
    val good = DeltaLog.optimizeActions(live, 2, Some(dvs), Some(net))
      .filter(col("op") === "add").select("n_rows").as[Long].collect()
    assert(good.toSeq == Seq(18L), "compacted add must carry mask-net rows (8 + 10)")
    // the round-10 latent bug, preserved as a negative: raw stats resurrect
    val raw = DeltaLog.optimizeActions(live, 2)
      .filter(col("op") === "add").select("n_rows").as[Long].collect()
    assert(raw.toSeq == Seq(20L),
      "stats-only compaction counts the masked rows back in — the bug dl14 gates against")
  }

  // ---- clustered ANN: the pruning BENEFIT, not just the mechanism ---------

  test("v13 clustered fixture: high recall at small nprobe with a small scan fraction") {
    val rows = graft.queries.VectorQueries.v13ClusteredNprobe.fn(spark, sf)
      .collect().map(r => (r.getInt(0), r.getDouble(2), r.getDouble(3))).sortBy(_._1)
    val byProbe = rows.map(r => r._1 -> r).toMap
    // the claim v10b's isotropic fixture cannot make: pruning WINS here
    assert(byProbe(1)._2 >= 0.9, s"recall@nprobe=1 must be >= 0.9, got ${byProbe(1)._2}")
    assert(byProbe(2)._2 >= 0.9, s"recall@nprobe=2 must be >= 0.9, got ${byProbe(2)._2}")
    assert(byProbe(2)._3 <= 0.35, s"nprobe=2 must scan <= 35% of rows, got ${byProbe(2)._3}")
    // kept from the v10b gate family: monotone curve, brute-force anchor
    assert(rows.map(_._2).sliding(2).forall(p => p(0) <= p(1)), "recall must be monotone in nprobe")
    assert(rows.map(_._3).sliding(2).forall(p => p(0) < p(1)), "scan fraction must grow with nprobe")
    assert(byProbe(8)._2 == 1.0, "nprobe = #cells is brute force: recall exactly 1.0")
    // independent reconstruction: the fixture is genuinely clustered —
    // every vector's nearest planted center is its own cluster's (a
    // centroid-training regression would break this first)
    def vec(v: Long): Array[Double] = Array.tabulate(64)(i =>
      (if (i / 8 == v % 8) 2.0 else 0.0) + ((v * 31 + i * 17) % 11 - 5) / 10.0)
    def center(k: Int): Array[Double] = Array.tabulate(64)(i => if (i / 8 == k) 2.0 else 0.0)
    for (v <- 0L until 64L) {
      val d2 = (0 until 8).map(k =>
        k -> vec(v).zip(center(k)).map { case (a, b) => (a - b) * (a - b) }.sum)
      assert(d2.minBy(_._2)._1 == (v % 8).toInt, s"vector $v must assign to its own cluster")
    }
  }

  // ---- exact AUC: hand-computed pins incl. ties ---------------------------

  test("aucExact matches hand-computed Mann-Whitney values, ties included") {
    import spark.implicits._
    def auc(rows: Seq[(Double, Double)]): (Long, Double) = {
      val r = graft.ops.Classifier.aucExact(rows.toDF("s", "y"), col("s"), col("y"))
        .collect().head
      (r.getLong(2), r.getDouble(3))
    }
    // perfect separation: every positive above every negative -> AUC 1
    assert(auc(Seq((0.9, 1.0), (0.8, 1.0), (0.2, 0.0), (0.1, 0.0))) == ((8L, 1.0)))
    // perfect inversion -> AUC 0
    assert(auc(Seq((0.1, 1.0), (0.9, 0.0))) == ((0L, 0.0)))
    // all scores tied -> AUC exactly 0.5 regardless of labels
    assert(auc(Seq((0.5, 1.0), (0.5, 1.0), (0.5, 0.0), (0.5, 0.0))) == ((4L, 0.5)))
    // mixed with one tie: pos {0.8, 0.5}, neg {0.5, 0.2}
    // U = [0.8>0.5] + [0.8>0.2] + 0.5*[0.5=0.5] + [0.5>0.2] = 3.5 -> 2U=7, AUC=7/8
    assert(auc(Seq((0.8, 1.0), (0.5, 1.0), (0.5, 0.0), (0.2, 0.0))) == ((7L, 0.875)))
    // scores straddling bucket boundaries exercise the two-phase prefix
    val many = (0 until 64).map(i => (i / 64.0, if (i % 2 == 0) 1.0 else 0.0))
    // evens are positives at even positions: for each pos at 2k, negs below = k
    // U = sum k for k=0..31 = 496; 2U = 992; AUC = 496/1024
    assert(auc(many) == ((992L, 496.0 / 1024.0)))
  }

  // ---- advice: analysis-time type check -----------------------------------

  test("levenshtein_bytes rejects non-string arguments at analysis time") {
    graft.functions.GraftFunctions.register(spark)
    val df = spark.range(3).select(col("id"), col("id").cast("string").as("s"))
    val ex = intercept[Exception] {
      df.select(call_function("levenshtein_bytes", col("id"), col("s"))).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("type"), ex.getMessage)
    val ok = df.select(call_function("levenshtein_bytes", col("s"), col("s")).as("d"))
      .collect().map(_.getLong(0))
    assert(ok.forall(_ == 0L))
  }
}
