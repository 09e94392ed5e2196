package graft

import graft.ops.Avro
import org.scalatest.funsuite.AnyFunSuite

/** Avro object-container walk, differentially tested BOTH directions
  * against the INDEPENDENT Apache Avro reference implementation on the
  * Spark classpath (the JpegSpec/ImageIO discipline): my encoder's
  * shards must read back identically through `DataFileReader`, and
  * `DataFileWriter`'s own output (null and deflate codecs, multi-block)
  * must decode identically through my walk. */
class AvroSpec extends AnyFunSuite {

  private val fields = Seq(
    Avro.Field("id", "long", nullable = false),
    Avro.Field("label", "int", nullable = false),
    Avro.Field("text", "string", nullable = false),
    Avro.Field("score", "double", nullable = false),
    Avro.Field("flag", "boolean", nullable = false),
    Avro.Field("payload", "bytes", nullable = true))

  private def mkRecords(n: Int): Seq[Seq[Any]] =
    (0 until n).map { k =>
      Seq(1000L + k, k % 7, "t" * (k % 13), (k % 40) / 8.0, k % 2 == 0,
        if (k % 3 == 1) null else Array.tabulate(k % 5 + 1)(j => (j * 31 + k).toByte))
    }

  private def libRead(bytes: Array[Byte]): Seq[Seq[Any]] = {
    import org.apache.avro.file.{DataFileReader, SeekableByteArrayInput}
    import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
    val r = new DataFileReader[GenericRecord](
      new SeekableByteArrayInput(bytes), new GenericDatumReader[GenericRecord]())
    val out = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
    while (r.hasNext) {
      val rec = r.next()
      out += Seq(rec.get("id"), rec.get("label"),
        Option(rec.get("text")).map(_.toString).orNull, rec.get("score"), rec.get("flag"),
        Option(rec.get("payload")).map { b =>
          val bb = b.asInstanceOf[java.nio.ByteBuffer]
          val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
        }.orNull)
    }
    r.close()
    out.toSeq
  }

  private def sameRecord(mine: IndexedSeq[Any], lib: Seq[Any]): Unit = {
    assert(mine(0) == lib(0) && mine(1) == lib(1))
    assert(mine(2) == lib(2))
    assert(mine(3) == lib(3) && mine(4) == lib(4))
    (mine(5), lib(5)) match {
      case (null, null) => ()
      case (a: Array[Byte], b: Array[Byte]) => assert(java.util.Arrays.equals(a, b))
      case other => fail(other.toString)
    }
  }

  test("my encoder's shards read back exactly through the Avro reference reader") {
    val recs = mkRecords(23)
    for (codec <- Seq("null", "deflate")) {
      val shard = Avro.encode(fields, recs, codec, recordsPerBlock = 7, syncSeed = 5)
      val lib = libRead(shard)
      assert(lib.length == 23, codec)
      val mine = Avro.decode(shard).get.blocks.flatMap(_.records)
      assert(mine.length == 23)
      mine.zip(lib).foreach { case (m, l) => sameRecord(m, l) }
    }
  }

  test("the Avro reference writer's multi-block output decodes exactly through my walk") {
    import org.apache.avro.Schema
    import org.apache.avro.file.{CodecFactory, DataFileWriter}
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val schema = new Schema.Parser().parse(Avro.schemaJson(fields))
    for (codec <- Seq("null", "deflate")) {
      val out = new java.io.ByteArrayOutputStream()
      val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
      if (codec == "deflate") w.setCodec(CodecFactory.deflateCodec(6))
      w.create(schema, out)
      val recs = mkRecords(10)
      recs.zipWithIndex.foreach { case (r, i) =>
        val g = new GenericData.Record(schema)
        g.put("id", r(0)); g.put("label", r(1)); g.put("text", r(2))
        g.put("score", r(3)); g.put("flag", r(4))
        g.put("payload",
          Option(r(5)).map(b => java.nio.ByteBuffer.wrap(b.asInstanceOf[Array[Byte]])).orNull)
        w.append(g)
        if (i == 3 || i == 6) w.sync() // force real multi-block layout
      }
      w.close()
      val f = Avro.decode(out.toByteArray).get
      assert(f.codec == codec)
      assert(f.blocks.length >= 3, s"$codec blocks ${f.blocks.length}")
      assert(f.blocks.forall(_.ok))
      val mine = f.blocks.flatMap(_.records)
      assert(mine.length == 10)
      mine.zip(mkRecords(10)).foreach { case (m, l) => sameRecord(m, l) }
    }
  }

  test("value-first unions ([long,\"null\"]) decode correctly — branch order follows the schema") {
    import org.apache.avro.Schema
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    // the Avro spec allows either union order; only null-first is
    // conventional — a decoder that hard-codes null=branch-0 misreads this
    val schema = new Schema.Parser().parse(
      """{"type":"record","name":"R","fields":[
        |{"name":"id","type":"long"},
        |{"name":"opt","type":["long","null"]}]}""".stripMargin)
    val out = new java.io.ByteArrayOutputStream()
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, out)
    for (k <- 0 until 6) {
      val g = new GenericData.Record(schema)
      g.put("id", k.toLong)
      g.put("opt", if (k % 2 == 0) java.lang.Long.valueOf(k * 100L) else null)
      w.append(g)
    }
    w.close()
    val f = Avro.decode(out.toByteArray).get
    assert(f.fields.find(_.name == "opt").exists(fl => fl.nullable && !fl.nullFirst))
    val recs = f.blocks.flatMap(_.records)
    assert(recs.length == 6 && recs.forall(_.length == 2))
    for (k <- 0 until 6) {
      assert(recs(k)(0) == k.toLong)
      if (k % 2 == 0) assert(recs(k)(1) == k * 100L) else assert(recs(k)(1) == null)
    }
    // and my encoder round-trips the value-first order through the
    // reference reader too
    val vf = Seq(Avro.Field("x", "string", nullable = true, nullFirst = false))
    val mine = Avro.encode(vf, Seq(Seq("hello"), Seq(null)), "null", 2, syncSeed = 3)
    val lib = {
      import org.apache.avro.file.{DataFileReader, SeekableByteArrayInput}
      import org.apache.avro.generic.GenericDatumReader
      val r = new DataFileReader[GenericRecord](
        new SeekableByteArrayInput(mine), new GenericDatumReader[GenericRecord]())
      val vs = scala.collection.mutable.ArrayBuffer.empty[Any]
      while (r.hasNext) vs += Option(r.next().get("x")).map(_.toString).orNull
      r.close(); vs.toSeq
    }
    assert(lib == Seq("hello", null))
  }

  test("sync corruption quarantines the shard; block corruption only its block") {
    val recs = mkRecords(21)
    val badSync = Avro.encode(fields, recs, "deflate", 7, syncSeed = 9, corruptSync = true)
    assert(Avro.decode(badSync).isEmpty, "lost framing must fail the shard")
    val badBlock = Avro.encode(fields, recs, "deflate", 7, syncSeed = 9, corruptBlock = Some(1))
    val f = Avro.decode(badBlock).get
    assert(f.blocks.map(_.ok) == Seq(true, false, true))
    assert(f.blocks(0).records.length == 7 && f.blocks(2).records.length == 7)
    // the reference reader also fails on the corrupt block
    intercept[Exception] { libRead(badBlock) }
  }

  test("unsupported codecs and schemas fail closed; truncation fails the shard") {
    import org.apache.avro.Schema
    import org.apache.avro.file.{CodecFactory, DataFileWriter}
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    // snappy codec via the reference writer → my walk must refuse, not misread
    val schema = new Schema.Parser().parse(Avro.schemaJson(fields.take(2)))
    val out = new java.io.ByteArrayOutputStream()
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.setCodec(CodecFactory.snappyCodec()).create(schema, out)
    val g = new GenericData.Record(schema)
    g.put("id", 1L); g.put("label", 2)
    w.append(g); w.close()
    assert(Avro.decode(out.toByteArray).isEmpty)
    // an array-typed field is outside the supported subset
    val arrSchema = new Schema.Parser().parse(
      """{"type":"record","name":"R","fields":[{"name":"xs","type":{"type":"array","items":"long"}}]}""")
    val out2 = new java.io.ByteArrayOutputStream()
    val w2 = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](arrSchema))
    w2.create(arrSchema, out2)
    val g2 = new GenericData.Record(arrSchema)
    g2.put("xs", java.util.Arrays.asList(java.lang.Long.valueOf(1L)))
    w2.append(g2); w2.close()
    assert(Avro.decode(out2.toByteArray).isEmpty)
    // torn tails at several depths
    val shard = Avro.encode(fields, mkRecords(9), "null", 3, syncSeed = 2)
    for (cut <- Seq(shard.length - 3, shard.length / 2, 10, 3))
      assert(Avro.decode(java.util.Arrays.copyOf(shard, cut)).isEmpty, s"cut $cut")
    assert(Avro.decode(null).isEmpty)
    // a valid zero-record shard is Some with no blocks
    val empty = Avro.encode(fields, Seq.empty, "null", 3, syncSeed = 2)
    assert(Avro.decode(empty).exists(_.blocks.isEmpty))
  }
}
