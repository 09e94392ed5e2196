package graft

import graft.ops.{AudioMeta, Bzip2, Zip}
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 regressions for the four ADVICE_r8 decoder-robustness items:
  * 7z short-read torn-buffer acceptance, ZIP local-header Int overflow,
  * MP3 ID3v1/APE trailer quarantine, bzip2 trailing-garbage acceptance. */
class Round9Spec extends AnyFunSuite {

  // --- ADVICE item 2: Zip.extract dataOff overflow --------------------------
  test("zip: hostile local-header offset near Int.MaxValue quarantines, not AIOOBE") {
    val bytes = Array.fill[Byte](4096)(0)
    // entry whose central-directory record claims a local header far past the
    // payload; extract must return None through the Long-safe bounds guard
    val e = Zip.Entry("evil", method = 8, flags = 0, crc = 0L,
      compSize = 100, uncompSize = 100, localOff = Int.MaxValue - 10)
    assert(Zip.extract(bytes, e).isEmpty)
    val e2 = e.copy(localOff = bytes.length - 31) // header straddles the end
    assert(Zip.extract(bytes, e2).isEmpty)
  }

  // --- ADVICE item 3: MP3 end-of-stream tags --------------------------------
  test("mp3: ID3v1 'TAG' 128-byte trailer after the last frame is tolerated") {
    val clean = AudioMeta.encodeMp3(5, brIdx = 9, srIdx = 0)
    val base = AudioMeta.decodeMp3(clean).get
    val tag = new Array[Byte](128)
    tag(0) = 'T'; tag(1) = 'A'; tag(2) = 'G'
    val got = AudioMeta.decodeMp3(clean ++ tag)
    assert(got.nonEmpty, "TAG trailer must not quarantine a valid stream")
    assert(got.get.frames == base.frames && got.get.sampleRate == base.sampleRate)
  }

  test("mp3: APEv2 header block trailer (optionally followed by ID3v1) is tolerated") {
    val clean = AudioMeta.encodeMp3(3, brIdx = 9, srIdx = 0)
    val base = AudioMeta.decodeMp3(clean).get
    // minimal APEv2: 32-byte header, zero items => size field counts footer only (32)
    def ape(size: Int): Array[Byte] = {
      val a = new Array[Byte](32 + size)
      "APETAGEX".getBytes.copyToArray(a)
      a(12) = (size & 0xff).toByte; a(13) = ((size >> 8) & 0xff).toByte
      "APETAGEX".getBytes.copyToArray(a, size) // footer magic at the tail
      a
    }
    val withApe = AudioMeta.decodeMp3(clean ++ ape(32))
    assert(withApe.nonEmpty && withApe.get.frames == base.frames)
    val tag = new Array[Byte](128); tag(0) = 'T'; tag(1) = 'A'; tag(2) = 'G'
    val withBoth = AudioMeta.decodeMp3(clean ++ ape(32) ++ tag)
    assert(withBoth.nonEmpty && withBoth.get.frames == base.frames)
  }

  test("mp3: unrecognized trailing bytes still quarantine the whole payload") {
    val clean = AudioMeta.encodeMp3(4, brIdx = 9, srIdx = 0)
    assert(AudioMeta.decodeMp3(clean ++ Array[Byte]('J', 'U', 'N', 'K', 0, 0)).isEmpty)
    // a 'TAG' trailer that is NOT exactly 128 bytes is not ID3v1
    val short = new Array[Byte](64); short(0) = 'T'; short(1) = 'A'; short(2) = 'G'
    assert(AudioMeta.decodeMp3(clean ++ short).isEmpty)
  }

  // --- Jaro-Winkler: pinned to DuckDB 1.0 bit-exactly -----------------------
  test("jaro/jaro-winkler match DuckDB-produced reference values exactly") {
    import graft.functions.JaroWinkler.{jaro, jaroWinkler}
    def u(s: String) = org.apache.spark.unsafe.types.UTF8String.fromString(s)
    // values produced by DuckDB 1.0 jaro_similarity / jaro_winkler_similarity
    val pins = Seq(
      ("martha", "marhta", 0.9444444444444445, 0.9611111111111111),
      ("dixon", "dicksonx", 0.7666666666666666, 0.8133333333333332),
      ("jellyfish", "smellyfish", 0.8962962962962964, 0.8962962962962964),
      ("abcdef", "abdcef", 0.9444444444444445, 0.9555555555555556),
      ("ab", "ba", 0.0, 0.0),
      ("a", "", 0.0, 0.0),
      ("", "", 0.0, 0.0), // DuckDB: both-empty is 0, NOT the classic 1
      ("abc", "abc", 1.0, 1.0),
      ("abcdvwxyz", "abcdefghi", 0.6296296296296297, 0.6296296296296297), // no boost at jaro<=0.7
      ("aaaaa", "aaaaab", 0.9444444444444445, 0.9666666666666667), // prefix capped at 4
      ("ab", "abcdefghijkl", 0.7222222222222223, 0.7777777777777779),
      ("CRATE", "TRACE", 0.7333333333333334, 0.7333333333333334),
      ("abcxxx", "bcaxxx", 0.9444444444444445, 0.9444444444444445), // odd mismatches: t = 3/2 = 1 (int div)
      ("arnab", "aranb", 0.9333333333333332, 0.9466666666666665))
    for ((a, b, ej, ejw) <- pins) {
      assert(jaro(u(a), u(b)) == ej, s"jaro($a,$b)")
      assert(jaroWinkler(u(a), u(b)) == ejw, s"jw($a,$b)")
    }
  }

  test("differential: jaro-winkler vs live DuckDB over random strings") {
    import scala.sys.process._
    val py = Seq("/root/.pyenv/shims/python3", "/root/miniconda/bin/python3", "/usr/bin/python3")
      .find(p => new java.io.File(p).exists && scala.sys.process.Process(Seq(p, "-c", "import duckdb")).! == 0)
    assume(py.nonEmpty, "no python3")
    val hasDuck = Seq(py.get, "-c", "import duckdb").! == 0
    assume(hasDuck, "python duckdb not importable")
    val rnd = new scala.util.Random(99)
    // mixed 1/2/3-byte code points: DuckDB walks UTF-8 BYTES, so the
    // differential must cover multi-byte characters too
    val alpha = Seq("a", "b", "c", "d", "x", "\u00e9", "\u00f1", "\u6f22", "\u00df")
    val cases = (1 to 300).map { _ =>
      def s() = (0 until rnd.nextInt(10)).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      (s(), s())
    }
    val caseLines = cases.map { case (a, b) => s"$a,$b" }.mkString("\n")
    val f = java.io.File.createTempFile("jwcases", ".txt")
    java.nio.file.Files.writeString(f.toPath, caseLines)
    val script =
      s"""import duckdb
         |con = duckdb.connect()
         |for line in open('${f.getAbsolutePath}'):
         |    a, b = line.rstrip('\\n').split(',')
         |    j, w = con.sql("SELECT jaro_similarity(?, ?), jaro_winkler_similarity(?, ?)", params=[a,b,a,b]).fetchone()
         |    print(repr(j), repr(w))
         |""".stripMargin
    val out = Seq(py.get, "-c", script).!!.trim.split("\n")
    def u(s: String) = org.apache.spark.unsafe.types.UTF8String.fromString(s)
    cases.zip(out).foreach { case ((a, b), line) =>
      val Array(ej, ejw) = line.split(" ")
      assert(graft.functions.JaroWinkler.jaro(u(a), u(b)) == ej.toDouble, s"jaro($a,$b)")
      assert(graft.functions.JaroWinkler.jaroWinkler(u(a), u(b)) == ejw.toDouble, s"jw($a,$b)")
    }
    f.delete()
  }

  // --- ADVICE item 4: bzip2 whole-payload strictness ------------------------
  test("bzip2: trailing garbage after the final stream quarantines; zero padding ok") {
    val enc = Bzip2.encode("strict tail contract".getBytes("UTF-8"))
    assert(Bzip2.decode(enc).nonEmpty)
    assert(Bzip2.decode(enc ++ Array[Byte](0, 0, 0)).nonEmpty, "zero padding tolerated")
    assert(Bzip2.decode(enc ++ "garbage".getBytes).isEmpty, "non-zero tail must fail")
    assert(Bzip2.decode(enc ++ Array[Byte]('B', 'Z')).isEmpty, "torn next stream must fail")
  }
}

/** Round-9 Spark-side specs: SymSpell blocking losslessness and the
  * record-linkage fixture's planted-class recovery. */
class Round9SparkSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def brute(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = dp(0); dp(0) = j
      for (i <- 1 to a.length) {
        val cur = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    dp(a.length)
  }

  test("symspellPairs(k) equals the brute-force lev<=k cross product") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(5)
    val alpha = "abcde"
    val vocab = ((1 to 120).map(_ => (0 until (3 + rnd.nextInt(6)))
      .map(_ => alpha(rnd.nextInt(alpha.length))).mkString) :+ "abc" :+ "abcd" :+ "acbd").distinct
    val vdf = vocab.toDF("tok")
    for (k <- Seq(1, 2)) {
      val got = graft.ops.EntityResolution.symspellPairs(vdf, maxEdit = k)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      val want = (for {
        a <- vocab; b <- vocab if a < b
        d = brute(a, b) if d <= k
      } yield (a, b, d.toLong)).toSet
      assert(got == want, s"k=$k: got ${got.size}, want ${want.size}")
    }
  }

  test("er2 fixture: deletion/swap/substitution classes all recover their true master; reversed class never links") {
    val docs = graft.tables.TestTables.documents(spark, "/root/testdata/sf0.001")
    val recs = graft.ops.EntityResolution.records(docs)
    val linked = graft.queries.EntityQueries.er2Linkage.fn(spark, "/root/testdata/sf0.001")
      .select("doc_id", "master").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val truth = recs.select("doc_id", "fullname").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    truth.foreach { case (id, full) =>
      if (id % 5 == 4) assert(!linked.contains(id), s"reversed record $id must not link")
      else assert(linked.get(id).contains(full), s"record $id (class ${id % 5}) must link to its master")
    }
    assert(truth.keys.count(_ % 5 == 4) > 0, "fixture must contain reversed records")
  }
}

/** Delta-log round trip through a real filesystem _delta_log plus
  * snapshot-semantics invariants. */
class DeltaLogSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("log survives a real _delta_log write/read round trip; snapshots match in-memory replay") {
    val o = graft.tables.TestTables.orders(spark, "/root/testdata/sf0.001")
    val log = graft.ops.DeltaLog.logLines(o)
    val dir = java.nio.file.Files.createTempDirectory("graft_delta").toFile
    val logDir = new java.io.File(dir, "_delta_log"); logDir.mkdirs()
    // one file per version, Delta-style zero-padded names; the log is
    // small by design (actions scale with files, not rows)
    val lines = log.collect().map(_.getString(0))
    val parsed = lines.map(l => (ujsonVersion(l), l))
    parsed.groupBy(_._1).foreach { case (v, ls) =>
      java.nio.file.Files.writeString(
        new java.io.File(logDir, f"$v%020d.json").toPath, ls.map(_._2).mkString("\n"))
    }
    val readBack = spark.read.text(logDir.getAbsolutePath + "/*.json")
      .withColumnRenamed("value", "line")
    val a = graft.ops.DeltaLog.snapshot(readBack).drop("buckets")
      .orderBy("path").collect().toSeq
    val b = graft.ops.DeltaLog.snapshot(log).drop("buckets")
      .orderBy("path").collect().toSeq
    assert(a == b && a.nonEmpty)
    org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  private def ujsonVersion(line: String): Int = {
    val m = """"version":(\d+)""".r.findFirstMatchIn(line)
    m.get.group(1).toInt
  }

  test("time-travel invariants: compaction is row-neutral, remove drops rows, append adds them") {
    val o = graft.tables.TestTables.orders(spark, "/root/testdata/sf0.001")
    val log = graft.ops.DeltaLog.logLines(o)
    def tot(v: Int): (Long, Long) = {
      val s = graft.ops.DeltaLog.snapshot(log, Some(v))
        .agg(count(lit(1)), sum("n_rows")).collect()(0)
      (s.getLong(0), s.getLong(1))
    }
    val (f0, r0) = tot(0); val (f1, r1) = tot(1); val (f2, r2) = tot(2); val (f3, r3) = tot(3)
    assert(f1 == f0 - 1 && r1 == r0, "compaction merges two files, keeps rows")
    assert(f2 == f1 - 1 && r2 < r1, "remove drops a file and its rows")
    assert(f3 == f2 + 1 && r3 == r2 + (r1 - r2), "append restores bucket-3-sized rows")
    // stats pruning soundness on the real data: for every live file, the
    // true key span is inside the logged [min_key, max_key]
    val live = graft.ops.DeltaLog.snapshot(log)
      .select(col("path"), explode(col("buckets")).as("bucket"),
        col("min_key"), col("max_key"))
    val spans = o.groupBy(floor(col("o_orderkey") / graft.ops.DeltaLog.W).as("bucket"))
      .agg(min("o_orderkey").as("lo"), max("o_orderkey").as("hi"))
    val bad = live.join(spans, "bucket")
      .filter(col("lo") < col("min_key") || col("hi") > col("max_key")).count()
    assert(bad == 0, "logged stats must bound the real data")
  }
}

/** Time-series family invariants, hand-computed references independent of
  * the query builders. */
class TimeSeriesSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  private val dir = "/root/testdata/sf0.001"

  test("ts1: spine is contiguous per user; gap rows carry forward the last day's cents") {
    val rows = graft.queries.TimeSeriesQueries.ts1GapFill.fn(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    val byUser = rows.groupBy(_._1)
    byUser.foreach { case (u, rs) =>
      val days = rs.map(_._2).sorted
      assert(days.zip(days.tail).forall { case (a, b) => b == a + 1 }, s"user $u spine not contiguous")
      var lastCents = -1L
      rs.sortBy(_._2).foreach { case (_, _, n, locf, gap) =>
        if (gap == 1) { assert(n == 0); assert(locf == lastCents, s"user $u locf") }
        else lastCents = locf
      }
    }
    assert(rows.exists(_._5 == 1), "fixture must contain gap days")
  }

  test("ts2: ewma equals a scala fold over the same ordered values") {
    val ev = graft.tables.TestTables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
        (col("value").cast("decimal(18,2)") * 100).cast("double").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val want = ev.groupBy(_._1).map { case (u, rs) =>
      val vs = rs.sortBy(r => (r._2, r._3)).map(_._4)
      u -> vs.tail.foldLeft(vs.head)((a, b) => (a + b) / 2)
    }
    val got = graft.queries.TimeSeriesQueries.ts2Ewma.fn(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    want.foreach { case (u, w) =>
      assert(got(u) == w, s"user $u: ${got(u)} != $w (must be bit-exact)")
    }
  }

  test("ts3: anomaly flag equals the brute-force 3-sigma test on the trailing 7") {
    val ev = graft.tables.TestTables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
        round(col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = scala.collection.mutable.Map[Long, Int]()
    ev.groupBy(_._1).foreach { case (_, rs) =>
      val srt = rs.sortBy(r => (r._2, r._3))
      srt.zipWithIndex.foreach { case ((_, _, eid, x), i) =>
        val base = srt.slice(math.max(0, i - 7), i).map(_._4)
        val n = base.length.toLong
        val flag = if (n >= 4) {
          val s = base.sum; val q = base.map(v => v * v).sum
          val lhs = (n * x - s) * (n * x - s)
          if (lhs > 9 * (n * q - s * s)) 1 else 0
        } else 0
        want(eid) = flag
      }
    }
    val got = graft.queries.TimeSeriesQueries.ts3Anomaly.fn(spark, dir)
      .collect().map(r => r.getLong(1) -> r.getInt(3)).toMap
    assert(got == want.toMap)
    assert(got.values.sum > 0, "fixture must contain anomalies")
  }
}

/** Streaming CDC: micro-batched Cdc.applyBatch over a file stream of
  * change waves converges to the one-shot fold, across a restart and
  * under at-least-once replay (stale-seq guard). */
class CdcStreamSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def changesFrom(dir: String) =
    graft.tables.TestTables.orders(spark, dir)
      .select(col("o_custkey").as("k"), col("o_orderkey").as("seq"),
        when(col("o_orderkey") % 7 === 0, "D").otherwise("U").as("op"),
        round(col("o_totalprice") * 100).cast("long").as("new_cents"))

  private def initSnap(dir: String) =
    graft.tables.TestTables.customer(spark, dir)
      .select(col("c_custkey").as("k"),
        round(col("c_acctbal") * 100).cast("long").as("cents"),
        lit(null).cast("long").as("last_seq"))

  test("streamed wave-by-wave CDC apply == one-shot apply; replayed wave is a no-op") {
    val dir = "/root/testdata/sf0.001"
    val all = changesFrom(dir).localCheckpoint()
    val snap0 = initSnap(dir).localCheckpoint()
    def toSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) Long.MinValue else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    val oneShot = toSet(graft.ops.Cdc.publish(graft.ops.Cdc.applyBatch(snap0, all)))

    val base = java.nio.file.Files.createTempDirectory("graft_cdc").toString
    val landing = s"$base/landing"; val ckpt = s"$base/ckpt"
    val waves = Seq(all.filter(col("seq") % 3 === 0), all.filter(col("seq") % 3 === 1),
      all.filter(col("seq") % 3 === 2))
    @volatile var snap = snap0
    def start() = graft.stream.Ingest.fileIngest(spark, landing, all.schema,
        b => b,
        (b, _) => if (!b.isEmpty) synchronized {
          snap = graft.ops.Cdc.applyBatch(snap, b).localCheckpoint()
        })
      .option("checkpointLocation", ckpt).start()
    waves(0).write.mode("overwrite").parquet(landing)
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    // wave 2 lands while the stream is DOWN; restart picks it up from offsets
    waves(1).write.mode("append").parquet(landing)
    waves(2).write.mode("append").parquet(landing)
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    val streamed = toSet(graft.ops.Cdc.publish(snap))
    assert(streamed == oneShot, "incremental micro-batch apply must equal the one-shot fold")

    // at-least-once: re-applying an already-absorbed wave changes nothing
    // (full-state compare, tombstones included)
    val replayed = toSet(graft.ops.Cdc.applyBatch(snap, waves(1)))
    assert(replayed == toSet(snap), "stale-seq guard must make replay a no-op")

    // deletes actually dropped, inserts actually landed
    assert(streamed.size < initSnap(dir).count() + all.select("k").distinct().count())
    assert(streamed.nonEmpty)
  }
}

/** The transaction log's strict-parse contract: a torn action fails the
  * read instead of silently replaying to a wrong snapshot. */
class DeltaLogStrictSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("a torn log line fails the snapshot read; the intact log still replays") {
    val o = graft.tables.TestTables.orders(spark, "/root/testdata/sf0.001")
    val good = graft.ops.DeltaLog.logLines(o)
    assert(graft.ops.DeltaLog.snapshot(good).count() > 0)
    val torn = good.unionByName(
      spark.range(1).select(lit("{\"version\":9,\"ordinal\":").as("line")))
    val ex = intercept[Exception] {
      graft.ops.DeltaLog.snapshot(torn).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("unparseable log action")),
      s"expected the strict-parse error, got: ${messages(ex).mkString(" | ")}")
    // a structurally-valid JSON object that is missing op/path is also torn
    val missing = good.unionByName(
      spark.range(1).select(lit("{\"version\":9}").as("line")))
    val ex2 = intercept[Exception] { graft.ops.DeltaLog.snapshot(missing).count() }
    assert(messages(ex2).exists(_.contains("unparseable log action")))
    // a version-less remove would sort LAST in the replay window and never
    // win — the guard must treat a lost ordering field as torn, not let it
    // silently resurrect the removed file
    val versionless = good.unionByName(
      spark.range(1).select(lit("{\"op\":\"remove\",\"path\":\"part-2\"}").as("line")))
    val ex3 = intercept[Exception] { graft.ops.DeltaLog.snapshot(versionless).count() }
    assert(messages(ex3).exists(_.contains("unparseable log action")))
  }
}

/** The symspell df-cap skew lever: a hub variant shared by many tokens
  * is dropped from blocking; pairs that meet elsewhere survive. */
class SymspellSkewSpec extends SparkSpec {
  test("maxVariantDf bounds hub-variant fan-out; only hub-only pairs are lost") {
    val sp = spark
    import sp.implicits._
    // adversarial vocab: 40 tokens of the form 'hubX' — every pair shares
    // the deletion variant 'hub' (df 40); plus a benign pair apart from it
    val hubs = (0 until 40).map(i => "hub" + ('a' + i % 26).toChar.toString + i / 26)
    val vocab = (hubs :+ "benign" :+ "benignx").distinct.toDF("tok")
    val exact = graft.ops.EntityResolution.symspellPairs(vocab, maxEdit = 1)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val capped = graft.ops.EntityResolution.symspellPairs(vocab, maxEdit = 1, maxVariantDf = 10)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(capped.subsetOf(exact), "cap must only REMOVE pairs, never invent them")
    assert(capped.contains(("benign", "benignx")), "pairs blocked on cool variants survive")
    // hub pairs: hubs differing only in their 4th char meet ONLY at 'hub*'-df variants
    assert(exact.size > capped.size, "the cap must actually drop hub-concentrated pairs")
  }
}

/** Invariants for the late round-9 additions. */
class Round9LateSpec extends SparkSpec {
  import org.apache.spark.sql.functions._
  private val dir = "/root/testdata/sf0.001"

  test("dl7: vacuum never touches a file live in any retained snapshot; freed rows match") {
    val log = graft.ops.DeltaLog.logLines(graft.tables.TestTables.orders(spark, dir))
      .localCheckpoint()
    val plan = graft.queries.LakehouseQueries.dl7Vacuum.fn(spark, dir).collect()
    val vac = plan.filter(_.getString(1) == "vacuum").map(_.getString(0)).toSet
    for (v <- Seq(2, 3)) {
      val live = graft.ops.DeltaLog.snapshot(log, Some(v))
        .select("path").collect().map(_.getString(0)).toSet
      assert(vac.intersect(live).isEmpty, s"vacuum set intersects live@$v")
    }
    assert(vac == Set("part-0", "part-1", "part-2"))
    assert(plan.filter(_.getString(1) == "vacuum").map(_.getLong(2)).sum > 0)
  }

  test("er5: every canonical is its cluster's max-frequency member; corrections are cluster-mates") {
    val rows = graft.queries.EntityQueries.er5Canon.fn(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
    val occ = rows.map(r => r._1 -> r._3).toMap
    // group by canonical (= the cluster's elected rep)
    rows.groupBy(_._2).foreach { case (canonical, members) =>
      val best = members.map(m => (occ(m._1), m._1)).max(
        Ordering.Tuple2(Ordering.Long, Ordering.String.reverse))
      assert(best._2 == canonical,
        s"canonical $canonical is not the (max freq, lex-min tiebreak) member: $best")
    }
    assert(rows.exists(_._4 == 1) && rows.exists(_._4 == 0))
  }

  test("ts5: r1 matches a scala replica and stays in a sane band") {
    val got = graft.queries.TimeSeriesQueries.ts5Autocorr.fn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(5)))
    got.foreach { case (_, n, num, den, r1) =>
      if (den != 0) assert(r1 == num.toDouble / den.toDouble)
      assert(math.abs(r1) <= 1.2, s"implausible lag-1 autocorrelation $r1")
      assert(n >= 1)
    }
    assert(got.map(_._5).distinct.length > 10, "fixture must produce varied r1")
  }
}

/** Streaming log consumption: versions arrive as a file stream; the
  * maintained live set (incremental foldSnapshot per micro-batch,
  * across a checkpointed restart) equals the one-shot full replay. */
class DeltaStreamSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("streamed version waves fold to the same snapshot as a full replay, across a restart") {
    val o = graft.tables.TestTables.orders(spark, "/root/testdata/sf0.001")
    val log = graft.ops.DeltaLog.logLines(o).localCheckpoint()
    val want = graft.ops.DeltaLog.snapshot(log).drop("buckets")
      .collect().map(_.toSeq).toSet

    val base = java.nio.file.Files.createTempDirectory("graft_dlstream").toString
    val landing = s"$base/landing"; val ckpt = s"$base/ckpt"
    val acts = graft.ops.DeltaLog.actions(log).localCheckpoint()
    // ONE file per wave (ADVICE r9): fileIngest caps maxFilesPerTrigger at
    // 16, so a multi-part wave could split across micro-batches — the first
    // batch would advance stateV to the wave's max version and the wave's
    // remainder would then trip foldSnapshot's stale-action guard. A
    // version's commit is atomic in a real log; coalesce(1) models that.
    def wave(v: Int) = acts.filter(col("version") === v)
      .select(to_json(struct(acts.columns.map(col): _*)).as("line"))
      .coalesce(1)

    @volatile var state = spark.emptyDataFrame
    @volatile var stateV = -1
    val lineSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("line", org.apache.spark.sql.types.StringType)))
    def start() = graft.stream.Ingest.fileIngest(spark, landing, lineSchema,
        b => b,
        (b, _) => if (!b.isEmpty) synchronized {
          val batchActs = graft.ops.DeltaLog.actions(b).localCheckpoint()
          val maxV = batchActs.agg(max("version")).collect()(0).getInt(0)
          state =
            if (stateV < 0) graft.ops.DeltaLog.snapshot(b).localCheckpoint()
            else graft.ops.DeltaLog.foldSnapshot(state, batchActs, stateV).localCheckpoint()
          stateV = maxV
        })
      .option("checkpointLocation", ckpt).start()

    wave(0).write.mode("overwrite").parquet(landing)
    wave(1).write.mode("append").parquet(landing)
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    // versions 2 and 3 land while the consumer is DOWN
    wave(2).write.mode("append").parquet(landing)
    wave(3).write.mode("append").parquet(landing)
    val q2 = start(); q2.processAllAvailable(); q2.stop()

    val got = state.drop("buckets").collect().map(_.toSeq).toSet
    assert(got == want, "incremental fold must equal the one-shot replay")
    assert(stateV == 3)
  }

  test("full-state fold carries dv + meta arriving in LATER micro-batches than their files' adds") {
    import graft.ops.DeltaLog
    val o = graft.tables.TestTables.orders(spark, "/root/testdata/sf0.001")
    val logBase = DeltaLog.logLines(o).localCheckpoint()
    val live0 = DeltaLog.snapshot(logBase).localCheckpoint()
    // metas at v0/v3; dv masks land at v4 and are REPLACED at v5 — every
    // dv arrives micro-batches after its file's add (v0/v1), and v4/v5
    // arrive after a consumer restart
    val log = logBase.unionByName(DeltaLog.toLines(
      DeltaLog.metaAction(spark, 0, -1, "k BIGINT")
        .unionByName(DeltaLog.metaAction(spark, 3, -1, "k BIGINT, region VARCHAR"))
        .unionByName(DeltaLog.dvAction(live0, "part-5", 4, 0, sequence(lit(0L), lit(6L))))
        .unionByName(DeltaLog.dvAction(live0, "compact-0-1", 4, 1, sequence(lit(0L), lit(9L))))
        .unionByName(DeltaLog.dvAction(live0, "compact-0-1", 5, 0, sequence(lit(0L), lit(4L))))))
    val acts = DeltaLog.actions(log).localCheckpoint()
    // the one-shot truths the fold must reproduce
    val wantLive = DeltaLog.replay(acts).drop("buckets").collect().map(_.toSeq).toSet
    val wantDvs = DeltaLog.deletionVectors(acts).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    val wantSchema = DeltaLog.activeSchema(acts).collect().map(_.toSeq).toSet

    val base = java.nio.file.Files.createTempDirectory("graft_dlfold").toString
    val landing = s"$base/landing"; val ckpt = s"$base/ckpt"
    def wave(v: Int) = acts.filter(col("version") === v)
      .select(to_json(struct(acts.columns.map(col): _*)).as("line"))
      .coalesce(1)

    @volatile var state = spark.emptyDataFrame
    @volatile var stateV = -1
    val lineSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("line", org.apache.spark.sql.types.StringType)))
    def start() = graft.stream.Ingest.fileIngest(spark, landing, lineSchema,
        b => b,
        (b, _) => if (!b.isEmpty) synchronized {
          val batchActs = DeltaLog.actions(b).localCheckpoint()
          val maxV = batchActs.agg(max("version")).collect()(0).getInt(0)
          state =
            if (stateV < 0) DeltaLog.checkpointState(batchActs).localCheckpoint()
            else DeltaLog.foldState(state, batchActs, stateV) // materialized inside foldState
          stateV = maxV
        })
      .option("checkpointLocation", ckpt).start()

    wave(0).write.mode("overwrite").parquet(landing)
    wave(1).write.mode("append").parquet(landing)
    wave(2).write.mode("append").parquet(landing)
    val q1 = start(); q1.processAllAvailable(); q1.stop()
    // v3 (meta) and v4/v5 (dv waves) land while the consumer is DOWN
    wave(3).write.mode("append").parquet(landing)
    wave(4).write.mode("append").parquet(landing)
    wave(5).write.mode("append").parquet(landing)
    val q2 = start(); q2.processAllAvailable(); q2.stop()
    assert(stateV == 5)

    // the folded STATE is a replayable action set: all three state
    // families must equal the one-shot full-log reads
    val gotLive = DeltaLog.replay(state).drop("buckets").collect().map(_.toSeq).toSet
    assert(gotLive == wantLive, "folded live set must equal the one-shot replay")
    val gotDvs = DeltaLog.deletionVectors(state).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(gotDvs == wantDvs,
      s"folded dv state must equal the one-shot masks (got $gotDvs want $wantDvs)")
    assert(gotDvs("compact-0-1") == Seq(0L, 1L, 2L, 3L, 4L), "the v5 replacement mask must win")
    val gotSchema = DeltaLog.activeSchema(state).collect().map(_.toSeq).toSet
    assert(gotSchema == wantSchema, "folded meta state must equal the one-shot active schema")
    assert(gotSchema.head.head == "k BIGINT, region VARCHAR")
  }
}
