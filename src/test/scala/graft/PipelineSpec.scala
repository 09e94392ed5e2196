package graft

import org.apache.spark.sql.functions._
import graft.ops.Multimodal
import graft.udf.{EchoStage, ModelStage}

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("ModelStage.applyStage batches per partition and applies fallback on empty") {
    object UpperOrEmpty extends ModelStage {
      def transformBatch(in: Iterator[String]): Iterator[String] =
        in.map(s => if (s.startsWith("skip")) "" else s.toUpperCase)
    }
    val df = Seq("hello", "skip me", "world").toDF("t")
    val out = ModelStage.applyStage(df, "t", "label", UpperOrEmpty, lit("FALLBACK"))
      .orderBy("t").collect().map(_.getString(1)).toSeq
    assert(out == Seq("HELLO", "FALLBACK", "WORLD"))
    // null inputs bypass the stage and take the fallback (never the string "null")
    val withNull = Seq(Some("ok"), None).toDF("t")
    val out2 = ModelStage.applyStage(withNull, "t", "label", UpperOrEmpty, lit("FALLBACK"))
      .collect().map(_.getString(1)).toSet
    assert(out2 == Set("OK", "FALLBACK"))
  }

  test("Multimodal: binary payload + metadata + stubbed feature extraction") {
    val docs = graft.tables.TestTables.documents(spark, sf).limit(20)
    val media = Multimodal.asMediaColumn(docs, "text", "image/fake")
    val feats = Multimodal.extractFeatures(media, Multimodal.StubExtractor)
    val row = feats.select(col("media_meta.n_bytes"), col("features")).collect()(0)
    assert(row.getLong(0) > 0)
    val f = row.getSeq[Float](1)
    assert(f.length == 4 && f(0) == row.getLong(0).toFloat)
  }

  test("Multimodal.resizeMeta fits dimensions inside the target box, preserving aspect") {
    val docs = graft.tables.TestTables.documents(spark, sf).limit(50)
    val media = Multimodal.asMediaColumn(docs, "text", "image/fake")
    val resized = Multimodal.resizeMeta(media, 64, 48)
    val rows = resized.select(col("media_meta.width"), col("media_meta.height"), col("resize_scale")).collect()
    assert(rows.forall(r => r.getInt(0) <= 64 && r.getInt(1) <= 48))
    assert(rows.forall(r => r.getDouble(2) <= 1.0 && r.getDouble(2) > 0.0))
  }

  test("Multimodal.sampleFrames explodes k evenly spaced offsets") {
    val docs = graft.tables.TestTables.documents(spark, sf).limit(3)
    val media = Multimodal.asMediaColumn(docs, "text", "video/fake")
    val frames = Multimodal.sampleFrames(media, 4)
    assert(frames.count() == 12)
    assert(frames.filter(col("frame_idx") >= col("media_meta.n_bytes")).count() == 0)
  }

  test("imageDims parses real PNG/GIF/BMP headers from raw bytes") {
    def be4(v: Int) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def le(v: Int, n: Int) = (0 until n).map(i => ((v >> (8 * i)) & 0xff).toByte).toArray
    val png = Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte, 0x0D.toByte, 0x0A.toByte,
      0x1A.toByte, 0x0A.toByte) ++ be4(13) ++ "IHDR".getBytes ++ be4(640) ++ be4(480) ++ Array(8.toByte)
    val gif = "GIF89a".getBytes ++ le(320, 2) ++ le(200, 2) ++ Array(0.toByte)
    // BITMAPINFOHEADER: 12 file-header bytes after "BM", DIB size = 40
    val bmp = "BM".getBytes ++ Array.fill(12)(0.toByte) ++ le(40, 4) ++ le(1024, 4) ++ le(768, 4)
    // OS/2 BITMAPCOREHEADER: DIB size = 12, UNSIGNED 16-bit dims
    val bmpCore = "BM".getBytes ++ Array.fill(12)(0.toByte) ++ le(12, 4) ++ le(320, 2) ++ le(240, 2)
    // "BM" magic but an unknown DIB header size — must be null, not garbage
    val bmpBad = "BM".getBytes ++ Array.fill(12)(0.toByte) ++ le(64, 4) ++ le(1024, 4) ++ le(768, 4)
    val junk = "not an image at all".getBytes
    val rows = Seq(("png", png), ("gif", gif), ("bmp", bmp), ("bmpCore", bmpCore),
      ("bmpBad", bmpBad), ("junk", junk)).toDF("name", "payload")
      .select(col("name"), Multimodal.imageDims(col("payload")).as("d"))
      .select("name", "d.format", "d.width", "d.height")
      .collect().map(r => r.getString(0) -> (r.getString(1), if (r.isNullAt(2)) -1 else r.getInt(2),
        if (r.isNullAt(3)) -1 else r.getInt(3))).toMap
    assert(rows("png") == (("png", 640, 480)))
    assert(rows("gif") == (("gif", 320, 200)))
    assert(rows("bmp") == (("bmp", 1024, 768)))
    assert(rows("bmpCore") == (("bmp", 320, 240)))
    assert(rows("bmpBad")._1 == null)
    assert(rows("junk")._1 == null)
  }

  test("Validator passes clean testdata and counts planted violations") {
    val report = graft.eval.Validator.validateAll(spark, sf)
    val errs = report.filter(col("severity") === "error" && col("n_violations") > 0).count()
    assert(errs == 0, "testdata should be referentially clean")
    assert(report.count() >= 15, "the suite must emit the full issue-code set")
    // planted violation check
    val dirty = Seq((1L, ""), (1L, "x")).toDF("doc_id", "text")
    val dup = graft.eval.Validator.duplicateIdFrame(dirty, Seq("doc_id"), "D")
      .collect()(0).getAs[Long]("n_violations")
    assert(dup == 1)
    val missing = graft.eval.Validator.checkFrame(dirty, Seq(
      graft.eval.Validator.Check("M", "error", col("text").isNull || col("text") === "")))
      .collect()(0).getAs[Long]("n_violations")
    assert(missing == 1)
  }

  test("Eval deterministic judge scores containment > partial > miss, rolls up by level") {
    val qs = Seq(
      ("easy", "q1", "the answer is forty two", "forty two"),
      ("easy", "q2", "partial overlap of some tokens", "overlap tokens only half"),
      ("hard", "q3", "nothing relevant here", "completely absent words")
    ).toDF("level", "q", "answer", "truth")
    val (judged, summary) = graft.eval.Eval.run(qs, identity)
    val scores = judged.orderBy("q").collect().map(_.getAs[Int]("score")).toSeq
    assert(scores == Seq(5, 3, 1))
    val grades = summary.collect().map(r => r.getAs[String]("level") -> r.getAs[String]("grade")).toMap
    assert(grades("easy") == "Excellent" && grades("hard") == "Poor")
  }

  test("query catalog: every oracle key has a query; entry returns rows") {
    val qk = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qk))
    assert(qk.size >= 80)
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
