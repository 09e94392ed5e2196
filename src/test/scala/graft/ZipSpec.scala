package graft

import graft.ops.Zip
import org.scalatest.funsuite.AnyFunSuite

/** ZIP walk differentials against java.util.zip (independent
  * implementation, both directions), member/container quarantines, and
  * the DOCX text pull. */
class ZipSpec extends AnyFunSuite {

  private val members = Seq(
    ("[Content_Types].xml", "<Types/>".getBytes("UTF-8"), false),
    ("word/document.xml",
      "<w:document><w:p><w:t>Hello &amp; goodbye</w:t></w:p></w:document>".getBytes("UTF-8"), true),
    ("word/media/blob.bin", Array.tabulate(700)(i => (i * 31 % 251).toByte), true))

  test("round trip: names, methods, and member bytes are exact") {
    val zip = Zip.encodeZip(members)
    val es = Zip.listEntries(zip).get
    assert(es.map(_.name) == members.map(_._1))
    assert(es.map(_.method) == Seq(0, 8, 8))
    for ((e, (_, data, _)) <- es.zip(members))
      assert(java.util.Arrays.equals(Zip.extract(zip, e).get, data))
  }

  test("differential: java.util.zip reads my archives") {
    val zip = Zip.encodeZip(members)
    val zin = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(zip))
    for ((name, data, _) <- members) {
      val entry = zin.getNextEntry
      assert(entry.getName == name)
      assert(java.util.Arrays.equals(zin.readAllBytes(), data))
    }
    assert(zin.getNextEntry == null)
  }

  test("differential: I read java.util.zip's archives") {
    val out = new java.io.ByteArrayOutputStream()
    val zout = new java.util.zip.ZipOutputStream(out)
    for ((name, data, _) <- members) {
      zout.putNextEntry(new java.util.zip.ZipEntry(name))
      zout.write(data)
      zout.closeEntry()
    }
    zout.close()
    val zip = out.toByteArray
    val es = Zip.listEntries(zip).get
    assert(es.map(_.name) == members.map(_._1))
    for ((e, (_, data, _)) <- es.zip(members))
      assert(java.util.Arrays.equals(Zip.extract(zip, e).get, data))
  }

  test("quarantines: container-level None, member-level null") {
    val zip = Zip.encodeZip(members)
    // EOCD signature corrupt → container None
    val badEocd = zip.clone()
    val eocd = zip.length - 22
    badEocd(eocd + 2) = 0x77
    assert(Zip.listEntries(badEocd).isEmpty)
    assert(Zip.listEntries(java.util.Arrays.copyOf(zip, 20)).isEmpty)
    assert(Zip.listEntries(null).isEmpty)
    // one flipped compressed byte → that member fails CRC/inflate, others fine
    val es = Zip.listEntries(zip).get
    val bad = zip.clone()
    // member 1's deflate stream starts at localOff + 30 + nameLen(17)
    bad(es(1).localOff + 47 + 5) = (bad(es(1).localOff + 47 + 5) ^ 0x20).toByte
    val es2 = Zip.listEntries(bad).get
    assert(Zip.extract(bad, es2(1)).isEmpty)
    assert(Zip.extract(bad, es2(2)).nonEmpty)
    // encrypted flag → member quarantine
    assert(Zip.extract(zip, es(0).copy(flags = 1)).isEmpty)
  }

  test("docxText: runs join within paragraphs, newline between, entities unescape") {
    val xml = """<w:document><w:body>
      <w:p><w:pPr/><w:r><w:t>One </w:t></w:r><w:r><w:t xml:space="preserve">&lt;two&gt;</w:t></w:r></w:p>
      <w:p><w:r><w:t>Fish &amp; chips &quot;x&apos;</w:t></w:r></w:p>
      <w:p/></w:body></w:document>"""
    assert(Zip.docxText(xml) == "One <two>\nFish & chips \"x'")
  }
}
