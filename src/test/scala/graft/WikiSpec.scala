package graft

import graft.ops.Wiki
import org.scalatest.funsuite.AnyFunSuite

/** MediaWiki dump page walk: entity titles, redirect detection, the
  * page-id-vs-revision-id trap, and truncated-dump prefix semantics. */
class WikiSpec extends AnyFunSuite {

  private val pages = Seq(
    Wiki.PageFixture("Fish & Chips", 0, 101, None, "some wikitext <b>here</b>"),
    Wiki.PageFixture("Old Name", 0, 102, Some("New & Improved"), ""),
    Wiki.PageFixture("Template:X", 10, 103, None, "w" * 500))

  test("round trip: titles unescape, ids bind to the page not the revision") {
    val ps = Wiki.parsePages(Wiki.encodeDump(pages))
    assert(ps.map(_.title) == Seq("Fish & Chips", "Old Name", "Template:X"))
    assert(ps.map(_.pageId) == Seq(101L, 102L, 103L)) // never 101*7+1
    assert(ps.map(_.ns) == Seq(0, 0, 10))
    assert(ps.map(_.redirect) == Seq(null, "New & Improved", null))
    assert(ps.map(_.textLen) == Seq("some wikitext <b>here</b>".length, 0, 500))
  }

  test("a truncated dump keeps the complete page prefix") {
    val xml = Wiki.encodeDump(pages)
    val cut = xml.substring(0, xml.indexOf("<title>Template"))
    val ps = Wiki.parsePages(cut)
    assert(ps.map(_.pageId) == Seq(101L, 102L))
  }
}
