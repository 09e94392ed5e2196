package graft

import org.apache.spark.sql.functions._

/** Round-10 gates: the multi-probe IVF recall curve (the round-9 verdict's
  * top ask — v10's measured recall@5 = 0.48 at nprobe = 1 needed a tunable
  * repair path), plus regressions for this round's additions.
  */
class Round10Spec extends SparkSpec {

  test("v10b: multi-probe IVF recall curve is monotone, exact at full probe, >=0.9 before it") {
    val rows = graft.queries.VectorQueries.all.find(_.name == "v10b_ivf_nprobe_curve").get
      .fn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getDouble(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1, 2, 4, 6, 7, 8))

    // recall climbs with nprobe (a flat curve would mean probing is a no-op)
    rows.sliding(2).foreach { case Array((pa, ra, sa), (pb, rb, sb)) =>
      assert(rb >= ra, s"recall must be nondecreasing: nprobe $pa -> $pb went $ra -> $rb")
      assert(sb > sa, s"scanned fraction must grow with nprobe: $pa -> $pb went $sa -> $sb")
    }
    // nprobe = 8 of 8 degrades to brute force: recall is EXACTLY 1.0 (the
    // machinery's sanity anchor, not a float-tolerance check)
    val (_, rFull, _) = rows.last
    assert(rFull == 1.0, s"full-probe recall must be exactly 1.0, got $rFull")
    // the repair the verdict asked for: some nprobe < #cells reaches 0.9
    val repaired = rows.init.filter(_._2 >= 0.9)
    assert(repaired.nonEmpty,
      s"no sub-full nprobe reached recall 0.9: ${rows.mkString(", ")}")
    // and it genuinely prunes: that probe level scans < 95% of the corpus
    assert(repaired.head._3 < 0.95,
      s"the 0.9-recall probe level must still prune, scanned ${repaired.head._3}")
    // single-probe is the honest baseline the curve repairs (isotropic
    // fixture: ~1/8 of the corpus scanned, recall far below 0.9)
    assert(rows.head._2 < 0.9 && rows.head._3 < 0.2)
  }

  test("dl9: optimize preserves the row set, vacuum frees exactly the replaced+dead files, OCC fires") {
    val rows = graft.queries.LakehouseQueries.all.find(_.name == "dl9_optimize_cycle").get
      .fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    def sec(s: String) = rows.filter(_._1 == s)

    // (1) row-set preservation: the in-engine equality flag AND the raw signatures
    val Some(eq) = sec("check").find(_._2 == "rowset_equal")
    assert(eq._5 == 1L, "optimize must not change the replayed row set")
    val pre = sec("check").find(_._2 == "rowset_pre").get
    val post = sec("check").find(_._2 == "rowset_post").get
    assert((pre._3, pre._4, pre._5) == (post._3, post._4, post._5))
    assert(pre._3 > 0, "empty row set would make the equality vacuous")

    // (2) vacuum = exactly {optimize inputs (replaced)} + {part-0/1/2 (dead history)}
    val replaced = sec("vacuum").filter(_._5 == 1L).map(_._2).toSet
    val optInputs = sec("txn").filter(_._2.startsWith("remove:")).map(_._2.stripPrefix("remove:")).toSet
    assert(replaced == optInputs, s"replaced $replaced != optimize inputs $optInputs")
    val historical = sec("vacuum").filter(_._5 == 0L).map(_._2).toSet
    assert(historical == Set("part-0", "part-1", "part-2"))

    // (3) the compacted adds conserve the removed rows/cents exactly
    val addRows = sec("txn").filter(_._2.startsWith("add:")).map(_._3).sum
    val remRows = sec("txn").filter(_._2.startsWith("remove:")).map(_._3).sum
    assert(addRows == remRows && addRows > 0)

    // (4) OCC: overlapping recluster conflicts, blind append does not
    assert(sec("occ").find(_._2 == "optimize_vs_recluster").get._5 == 1L)
    assert(sec("occ").find(_._2 == "optimize_vs_blind_append").get._5 == 0L)
  }

  test("gov5: t-closeness EMD is in [0,1], both flag outcomes occur, flag is the exact-integer gate") {
    val rows = graft.queries.GovernanceQueries.all.find(_.name == "gov5_t_closeness").get
      .fn(spark, sf).collect()
      .map(r => (r.getLong(3), r.getLong(4), r.getDouble(5), r.getInt(6))) // n, numer, emd, t_close
    assert(rows.nonEmpty)
    rows.foreach { case (n, numer, emd, _) =>
      assert(emd >= 0.0 && emd <= 1.0, s"ordered-metric EMD must be in [0,1], got $emd")
      assert(n > 0 && numer >= 0)
    }
    // the flag never disagrees with the raw numerator (exact integer gate,
    // re-derived here from numer and the reconstructed denominator)
    val totalN = rows.map(_._1).sum
    rows.foreach { case (n, numer, emd, f) =>
      val denom = 4L * n * totalN
      assert((5L * numer <= denom) == (f == 1), s"flag/integer-gate mismatch at n=$n")
      assert(math.abs(emd - numer.toDouble / denom) == 0.0, "emd must be the one exact division")
    }
    assert(rows.exists(_._4 == 0) && rows.exists(_._4 == 1),
      "fixture must exercise both t-closeness outcomes")
  }

  test("er5b: released map never corrects a real pool name; raw map does (the documented over-merge)") {
    import graft.ops.EntityResolution.{firsts, lasts}
    val pool = (firsts ++ lasts).toSet
    val rows = graft.queries.EntityQueries.all.find(_.name == "er5b_guarded_map").get
      .fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getInt(4), r.getInt(5), r.getString(6)))
    assert(rows.nonEmpty)
    // the er5 caveat is VISIBLE in the raw column: closure chains at least
    // one genuine pool name into another cluster
    val rawPoolVictims = rows.filter(r => pool(r._1) && r._5 == 1)
    assert(rawPoolVictims.nonEmpty, "fixture must exhibit the raw over-merge or er5b is vacuous")
    // ...and ABSENT from the released map: no real name is ever "corrected"
    rawPoolVictims.foreach { r =>
      assert(r._6 == 0 && r._7 == r._1,
        s"real name ${r._1} must survive the guards (raw canonical ${r._2})")
    }
    // every released correction satisfies both guards
    val byTok = rows.map(r => r._1 -> r._3).toMap
    rows.filter(_._6 == 1).foreach { r =>
      assert(r._4 <= 1, s"released correction ${r._1} sits ${r._4} edits from ${r._2}")
      assert(byTok(r._2) >= 4 * r._3, s"released correction ${r._1} lacks 4x dominance")
      assert(r._7 == r._2)
    }
    // the guards keep the map useful: most raw corrections survive
    val raw = rows.count(_._5 == 1)
    val released = rows.count(_._6 == 1)
    assert(released * 2 > raw, s"guards too strict: $released of $raw corrections survive")
  }

  test("ts6: the HOF fold is bit-identical to a plain-Scala Holt recursion") {
    val got = graft.queries.TimeSeriesQueries.all.find(_.name == "ts6_holt_winters").get
      .fn(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    // independent series reconstruction straight from the events table
    val series = graft.tables.TestTables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"),
        (col("value").cast("decimal(18,2)") * 100).cast("double").as("cents"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)), r.getDouble(3)))
      .groupBy(_._1).map { case (u, rows) => u -> rows.sortBy(_._2).map(_._3).toSeq }
    assert(series.exists(_._2.size >= 3), "need a multi-event user for a non-trivial fold")
    series.filter(_._2.size >= 2).foreach { case (u, vs) =>
      var l = vs(0)
      var b = vs(1) - vs(0)
      vs.drop(1).foreach { x =>
        val l2 = (x + (l + b)) / 2
        b = ((l2 - l) + b) / 2
        l = l2
      }
      val (n, gl, gb, gf) = got(u)
      assert(n == vs.size)
      assert(gl == l && gb == b, s"user $u: ($gl,$gb) != ($l,$b) bit-exactly")
      assert(gf == l + 3 * b)
    }
    // single-event users are filtered, not emitted with a fabricated trend
    series.filter(_._2.size < 2).keys.foreach(u => assert(!got.contains(u)))
  }

  test("fs2/fs3 strictness is time-based: a same-instant event is never 'prior' (ADVICE r9)") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.expressions.Window
    // planted timestamp tie: events e1 (view) and e2 (click) share ts=100
    val ev = Seq((1L, 0L, "view", 50L, 10L), (1L, 1L, "view", 100L, 20L),
      (1L, 2L, "click", 100L, 30L)).toDF("user_id", "event_id", "event_type", "ts_us", "cents")
    val strict = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val rowsStrict = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val got = ev.select(col("event_id"), col("event_type"),
        count(lit(1)).over(strict).as("n_prior_range"),
        max(col("ts_us")).over(strict).as("last_ts_range"),
        count(lit(1)).over(rowsStrict).as("n_prior_rows"))
      .filter(col("event_type") === "click").collect().head
    // RANGE (the fs2/fs3 definition): only the ts=50 event is prior
    assert(got.getLong(2) == 1L && got.getLong(3) == 50L)
    // the row-based frame WOULD have leaked the tied same-instant view
    assert(got.getLong(4) == 2L,
      "tie no longer distinguishes the frames - plant a real tie or the test is vacuous")
  }

  test("zip: hostile negative compSize/uncompSize quarantines, never a negative-span copy (ADVICE r9)") {
    import graft.ops.Zip
    val bytes = Array.fill[Byte](4096)(0)
    val e = Zip.Entry("evil", method = 0, flags = 0, crc = 0L,
      compSize = -100, uncompSize = -100, localOff = 0)
    assert(Zip.extract(bytes, e).isEmpty)
    assert(Zip.extract(bytes, e.copy(compSize = 10)).isEmpty, "negative uncompSize alone")
    assert(Zip.extract(bytes, e.copy(uncompSize = 10)).isEmpty, "negative compSize alone")
  }

  test("pq1: footer meta spans multiple row groups and conserves rows/values/nulls") {
    val rows = graft.queries.MiscQueries.all.find(_.name == "pq1_footer_meta").get
      .fn(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4)))
    val rgs = rows.map(_._1).distinct
    assert(rgs.length > 1, "fixture must span multiple row groups or the gate is single-group-trivial")
    // per row group: every column chunk carries the group's row count as its value count
    rows.foreach { case (_, n, _, values, _) => assert(values == n) }
    // conservation: groups partition the 2000 fixture rows; nulls = the id%5 fifth
    val perGroup = rows.groupBy(_._1).view.mapValues(_.head._2)
    assert(perGroup.values.sum == 2000L)
    assert(rows.filter(_._3 == "maybe").map(_._5).sum == 400L)
    assert(rows.filter(_._3 != "maybe").forall(_._5 == 0L))
  }

  test("cv family: render/validate/pack invariants hold and both validation branches fire") {
    def run(n: String) = graft.queries.ConversationQueries.all.find(_.name == n).get.fn(spark, sf)
    val rendered = run("cv1_chat_render").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3))).toSeq
    rendered.foreach { case (_, nTurns, text) =>
      assert(text.sliding(7).count(_ == "<|end|>") == nTurns,
        "rendered template must carry exactly one end marker per turn")
      assert(text.startsWith("<|"))
    }
    val validated = run("cv2_role_validation").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(4)))
    assert(validated.exists(_._4 == 1) && validated.exists(_._4 == 0),
      "both validation outcomes must occur")
    validated.filter(_._1 % 7 == 0).foreach { case (c, _, v, wf) =>
      assert(v == 0 && wf == 1, s"planted alternating conversation $c must validate")
    }
    val packed = run("cv3_context_pack").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    packed.foreach { case (n, kept, keptTok, dropped) =>
      assert(kept + dropped == n, "packing must partition the turns")
      assert(keptTok <= 64, "kept tokens must fit the budget")
    }
    assert(packed.exists(_._4 > 0), "someone must actually be truncated")
    assert(packed.exists(_._2 > 0), "someone must actually keep turns")
  }

  test("dv semantics: masks never affect liveness on ANY replay path, scope to the file instance, round-trip toLines") {
    import graft.ops.DeltaLog
    import org.apache.spark.sql.Row
    def add(v: Int, o: Int, path: String) =
      Row(v, o, "add", path, Seq(0L), 10L, 1L, 10L, 100L, null, null, null, null, null)
    def rem(v: Int, o: Int, path: String) =
      Row(v, o, "remove", path, null, null, null, null, null, null, null, null, null, null)
    def dv(v: Int, o: Int, path: String, mask: Seq[Long]) =
      Row(v, o, "dv", path, null, null, null, null, null, mask, null, null, null, null)
    // f stays live through a v4 dv; g is dv'd at v4, removed at v5, re-added at v6
    val acts = spark.createDataFrame(
      java.util.Arrays.asList(add(0, 0, "f"), add(0, 1, "g"), dv(4, 0, "f", Seq(1L, 3L)),
        dv(4, 1, "g", Seq(2L)), rem(5, 0, "g"), add(6, 0, "g")),
      DeltaLog.actionSchema)

    // (1) liveness on every replay path: the dv action never drops its file
    assert(DeltaLog.replay(acts).select("path").collect().map(_.getString(0)).sorted
      === Array("f", "g"))
    val cp = DeltaLog.checkpointedSnapshot(
      DeltaLog.toLines(acts), v0 = 0)
    assert(cp.select("path").collect().map(_.getString(0)).sorted === Array("f", "g"),
      "a dv action in the checkpoint tail must not erase its file")
    val folded = DeltaLog.foldSnapshot(
      DeltaLog.replay(acts, Some(0)), acts.filter(col("version") > 0), stateVersion = 0)
    assert(folded.select("path").collect().map(_.getString(0)).sorted === Array("f", "g"),
      "a dv action in a micro-batch must not erase its file from the fold")

    // (2) instance scoping: f's mask (dv at v4 >= add at v0) applies;
    // g's v4 mask belonged to the REMOVED instance (re-added v6) and must not
    val dvs = DeltaLog.deletionVectors(acts).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(dvs == Map("f" -> Seq(1L, 3L)), s"got $dvs")

    // (3) toLines round-trips the mask losslessly through the strict parse
    val rt = DeltaLog.actions(DeltaLog.toLines(acts))
    val rtDv = rt.filter(col("op") === "dv" && col("path") === "f")
      .select("dv").collect().head.getSeq[Long](0).toSeq
    assert(rtDv == Seq(1L, 3L), "dv must survive the JSON round trip")
  }

  // --- byte-wise Levenshtein: pinned to DuckDB 1.0 -------------------------
  test("levenshtein_bytes: hand pins incl. multi-byte cases") {
    import graft.functions.LevenshteinBytes.dist
    def u(s: String) = org.apache.spark.unsafe.types.UTF8String.fromString(s)
    val pins = Seq(
      ("", "", 0L), ("", "abc", 3L), ("abc", "", 3L),
      ("kitten", "sitting", 3L), ("flaw", "lawn", 2L),
      ("abc", "abc", 0L),
      // DuckDB-verified multi-byte pins: byte-unit, not char-unit
      ("café", "cafe", 2L), // é = 2 bytes: 1 sub + 1 del
      ("สมชาย ใจดี",
        "สมชย ใจดี", 3L), // Thai single-char deletion = 3
      ("กข", "ขก", 2L), // Thai adjacent swap: shared lead bytes -> 2
      ("漢", "漣", 1L)) // CJK same-block substitution: last byte only
    for ((a, b, e) <- pins)
      assert(dist(u(a), u(b)) == e, s"levenshtein_bytes($a, $b)")
  }

  test("differential: levenshtein_bytes vs live DuckDB over random multi-byte strings") {
    import scala.sys.process._
    val py = Seq("/root/.pyenv/shims/python3", "/root/miniconda/bin/python3", "/usr/bin/python3")
      .find(p => new java.io.File(p).exists && scala.sys.process.Process(Seq(p, "-c", "import duckdb")).! == 0)
    assume(py.nonEmpty, "no python3 with duckdb")
    val rnd = new scala.util.Random(101)
    // 1/2/3-byte code points incl. Thai (the er7 domain)
    val alpha = Seq("a", "b", "x", "é", "ñ", "漢", "ก", "า", "ี", " ")
    val cases = (1 to 300).map { _ =>
      def s() = (0 until rnd.nextInt(12)).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      (s(), s())
    }
    val f = java.io.File.createTempFile("levcases", ".txt")
    java.nio.file.Files.writeString(f.toPath, cases.map { case (a, b) => s"$a\t$b" }.mkString("\n"))
    val script =
      s"""import duckdb
         |con = duckdb.connect()
         |for line in open('${f.getAbsolutePath}', encoding='utf-8'):
         |    a, b = line.rstrip('\\n').split('\\t')
         |    d, = con.sql("SELECT levenshtein(?, ?)", params=[a, b]).fetchone()
         |    print(d)
         |""".stripMargin
    val out = Seq(py.get, "-c", script).!!.trim.split("\n")
    def u(s: String) = org.apache.spark.unsafe.types.UTF8String.fromString(s)
    cases.zip(out).foreach { case ((a, b), line) =>
      assert(graft.functions.LevenshteinBytes.dist(u(a), u(b)) == line.trim.toLong,
        s"levenshtein_bytes($a, $b)")
    }
    f.delete()
  }

  test("er7 fixture: Spark-native char levenshtein DIVERGES from the byte distance on Thai") {
    // the reason LevenshteinBytes exists: on the er7 domain the two units
    // disagree on every multi-byte edit
    val recs = graft.ops.EntityResolution.thaiRecords(
      graft.tables.TestTables.documents(spark, sf))
    graft.functions.GraftFunctions.register(spark)
    val diverging = recs.filter(pmod(col("doc_id"), lit(4)) === 1) // deletion class
      .select(levenshtein(col("rec"), col("fullname")).cast("long").as("chars"),
        graft.ops.EntityResolution.levBytes(col("rec"), col("fullname")).as("bytes"))
      .collect()
    assert(diverging.nonEmpty)
    diverging.foreach { r =>
      val (c, b) = (r.getLong(0), r.getLong(1))
      // a deleted char is 1 char-edit; 3 byte-edits when Thai, 1 when the
      // planted position hit the ASCII space
      assert(c == 1, s"char distance of a single deletion must be 1, got $c")
      assert(b == 1 || b == 3, s"byte distance must be 1 (space) or 3 (Thai), got $b")
    }
    assert(diverging.exists(r => r.getLong(1) == 3L),
      "at least one deletion must hit a Thai char (bytes=3) or the gate is vacuous")
  }
}
