package graft

import graft.adapters.HtmlExtractor
import graft.core.Span
import org.scalatest.funsuite.AnyFunSuite

/** Hand-written markup for the table grid semantics: rowspan fills,
  * colspan+rowspan interaction, nested-table linearization, and the
  * whole-table link-density aggregate (VERDICT r1 #9). The fixture
  * generator exercises the same shapes statistically (ExtractorGoldenSpec);
  * these cases pin the exact grids. */
class HtmlTableSpec extends AnyFunSuite {

  private def spans(html: String): Vector[Span] =
    HtmlExtractor.extract(Span("html", html, "", 0)).toOption.get

  private def texts(html: String): Vector[String] =
    spans(html).collect { case s if s.kind == "text" => s.text }

  test("noscript content is boilerplate: text and media inside it are dropped") {
    // the documented boilerplate-ancestor rule includes noscript (tracking
    // pixels / JS-disabled fallbacks, not content); before the opcode
    // dispatch rewrite the tag silently fell through as transparent inline
    val html =
      """<p>Real paragraph content long enough to pass the minimum length gate.</p>
        |<noscript><p>Please enable JavaScript to view this page properly now.</p>
        |<img src="media://tracker-pixel"></noscript>
        |<p>Second real paragraph also long enough to pass the length gate.</p>""".stripMargin
    val got = spans(html)
    assert(got.map(_.text) == Vector(
      "Real paragraph content long enough to pass the minimum length gate.",
      "Second real paragraph also long enough to pass the length gate."))
    assert(!got.exists(_.media_ref.contains("tracker-pixel")),
      "media refs under noscript are boilerplate too")
  }

  test("rowspan fills spanned columns with empty cells in following rows") {
    val html =
      """<table>
        |<tr><th>a</th><th>b</th><th>c</th></tr>
        |<tr><td rowspan="3">tall</td><td>r1b</td><td>r1c</td></tr>
        |<tr><td>r2b</td><td>r2c</td></tr>
        |<tr><td>r3b</td><td>r3c</td></tr>
        |<tr><td>r4a</td><td>r4b</td><td>r4c</td></tr>
        |</table>""".stripMargin
    assert(texts(html) == Vector(
      "| a | b | c |",
      "| --- | --- | --- |",
      "| tall | r1b | r1c |",
      "|  | r2b | r2c |",
      "|  | r3b | r3c |",
      "| r4a | r4b | r4c |"))
  }

  test("rowspan in a middle column, and trailing rowspan fill") {
    val html =
      """<table>
        |<tr><td>a1</td><td rowspan="2">mid</td><td rowspan="2">end</td></tr>
        |<tr><td>a2</td></tr>
        |</table>""".stripMargin
    assert(texts(html) == Vector(
      "| a1 | mid | end |",
      "| a2 |  |  |"))
  }

  test("rowspan combined with colspan occupies the full rectangle") {
    val html =
      """<table>
        |<tr><td rowspan="2" colspan="2">big</td><td>c1</td></tr>
        |<tr><td>c2</td></tr>
        |<tr><td>x</td><td>y</td><td>z</td></tr>
        |</table>""".stripMargin
    assert(texts(html) == Vector(
      "| big |  | c1 |",
      "|  |  | c2 |",
      "| x | y | z |"))
  }

  test("nested table linearizes before its containing row; cell keeps both text sides") {
    val html =
      """<table>
        |<tr><th>h1</th><th>h2</th></tr>
        |<tr><td>left</td><td>before <table><tr><td>in1</td><td>in2</td></tr></table> after</td></tr>
        |</table>""".stripMargin
    assert(texts(html) == Vector(
      "| h1 | h2 |",
      "| --- | --- |",
      "| in1 | in2 |",
      "| left | before after |"))
  }

  test("link-farm table dies wholesale even when one row is pure content") {
    val html =
      """<table>
        |<tr><td>real data</td><td>more data</td></tr>
        |<tr><td><a href="/h">Home</a></td><td><a href="/a">About</a></td></tr>
        |<tr><td><a href="/p">Products</a></td><td><a href="/c">Contact</a></td></tr>
        |<tr><td><a href="/x">Careers</a></td><td><a href="/l">Login</a></td></tr>
        |</table>""".stripMargin
    assert(texts(html).isEmpty,
      s"whole-table density must kill every row, got ${texts(html)}")
  }

  test("media refs survive a table-level density kill") {
    val html =
      """<table>
        |<tr><td><img src="media://pic1"></td><td><a href="/h">Home</a></td></tr>
        |<tr><td><a href="/p">Products</a></td><td><a href="/c">Contact</a></td></tr>
        |</table>""".stripMargin
    val out = spans(html)
    assert(out.collect { case s if s.kind == "image" => s.media_ref } == Vector("media://pic1"))
    assert(!out.exists(_.kind == "text"))
  }

  test("a single link row inside a content table dies alone, not the table") {
    val html =
      """<table>
        |<tr><th>name</th><th>description</th></tr>
        |<tr><td>alpha</td><td>a long plain description of the first row entry</td></tr>
        |<tr><td><a href="/m">More</a></td><td><a href="/e">Edit</a></td></tr>
        |<tr><td>beta</td><td>another long plain description of a data row</td></tr>
        |</table>""".stripMargin
    assert(texts(html) == Vector(
      "| name | description |",
      "| --- | --- |",
      "| alpha | a long plain description of the first row entry |",
      "| beta | another long plain description of a data row |"))
  }

  test("content table nested in a link-heavy layout wrapper survives the wrapper kill") {
    // the old-web layout pattern: an outer table used purely for page
    // layout, one cell full of nav links, another holding real content
    val html =
      """<table>
        |<tr><td><a href="/h">Home</a> <a href="/a">About</a> <a href="/p">Products</a></td>
        |<td><table><tr><th>name</th><th>value</th></tr>
        |<tr><td>alpha</td><td>a long plain description of this entry</td></tr></table></td></tr>
        |</table>""".stripMargin
    assert(texts(html) == Vector(
      "| name | value |",
      "| --- | --- |",
      "| alpha | a long plain description of this entry |"))
  }

  test("a dense inner table still dies inside a content outer table") {
    val html =
      """<table>
        |<tr><th>section</th><th>links</th></tr>
        |<tr><td>a long plain description of the section contents here</td>
        |<td><table><tr><td><a href="/h">Home</a></td><td><a href="/a">About</a></td></tr></table></td></tr>
        |</table>""".stripMargin
    assert(texts(html) == Vector(
      "| section | links |",
      "| --- | --- |",
      "| a long plain description of the section contents here |  |"))
  }

  test("an empty <tr></tr> consumes a grid row: rowspan occupancy decrements") {
    val html =
      """<table>
        |<tr><td rowspan="2">a</td><td>b</td></tr>
        |<tr></tr>
        |<tr><td>p</td><td>q</td></tr>
        |</table>""".stripMargin
    // the empty row is fully covered by the rowspan (renders nothing),
    // but it consumes the spanned row — row 3 must NOT get a fill cell
    assert(texts(html) == Vector("| a | b |", "| p | q |"))
  }

  test("block tags inside a cell accumulate into ONE cell, never split it") {
    val html =
      """<table>
        |<tr><td><p>para one</p> tail</td><td>plain</td></tr>
        |<tr><td><ul><li>item a</li><li>item b</li></ul></td><td>x</td></tr>
        |</table>""".stripMargin
    assert(texts(html) == Vector(
      "| para one tail | plain |",
      "| item a item b | x |"))
  }

  test("cell text past the MaxCols padding cap is still captured") {
    val wide = (1 to 5).map(i => s"""<td colspan="1000">w$i</td>""").mkString
    val html = s"""<table><tr>$wide<td>IMPORTANT-TEXT</td></tr></table>"""
    val out = texts(html)
    assert(out.size == 1 && out.head.contains("IMPORTANT-TEXT"))
    assert(out.head.length < 100000) // padding stayed capped
  }

  test("span attributes parse leading digits with trailing garbage, consistently") {
    val html =
      """<table>
        |<tr><td colspan="2abc">a</td><td>b</td></tr>
        |<tr><td>x</td><td>y</td><td>z</td></tr>
        |</table>""".stripMargin
    // "2abc" parses as 2 (HTML non-negative-integer rules), so row 1 pads
    // one empty cell after 'a'
    assert(texts(html) == Vector("| a |  | b |", "| x | y | z |"))
  }

  test("unclosed table at EOF still emits its buffered rows") {
    val html = "<table><tr><td>only</td><td>row"
    assert(texts(html) == Vector("| only | row |"))
  }

  test("caption is counted in, and killed by, the table aggregate") {
    val html =
      """<table><caption>Nav</caption>
        |<tr><td><a href="/h">Home</a></td><td><a href="/a">About</a></td></tr>
        |</table>""".stripMargin
    assert(texts(html).isEmpty)
  }
}
