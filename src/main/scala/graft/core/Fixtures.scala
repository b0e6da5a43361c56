package graft.core

/** Deterministic splitmix/LCG generator — NO wall-clock, NO java.util.Random
  * (FIXTURES.md: seeded; reproducible per (seed, docIndex) so the corpus can
  * be generated in parallel on executors without coordination). */
final class Lcg(seed0: Long) {
  private var s: Long = seed0
  def nextLong(): Long = {
    s += 0x9e3779b97f4a7c15L
    var z = s
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  def nextInt(bound: Int): Int = (((nextLong() >>> 33) % bound).toInt)
  def range(lo: Int, hi: Int): Int = lo + nextInt(hi - lo + 1) // inclusive
  def chance(pct: Int): Boolean = nextInt(100) < pct
  def pick[T](xs: IndexedSeq[T]): T = xs(nextInt(xs.length))
  def hex(n: Int): String = {
    val sb = new StringBuilder(n)
    while (sb.length < n) sb.append(java.lang.Long.toHexString(nextLong() >>> 36).takeRight(1))
    sb.toString
  }
}

// ---- structured document plans --------------------------------------
// The generator emits a PLAN; `Fixtures.render*` turns the plan into the
// raw input payload (HTML markup / PDF position runs), and the test-side
// golden oracle (separately coded, src/test/.../GoldenOracle.scala) turns
// the same plan into expected output spans. Extractor(render(plan)) must
// equal oracle(plan) under strict (kind, text, media_ref, order) equality.

sealed trait HtmlPart
final case class Heading(level: Int, text: String) extends HtmlPart
final case class Para(text: String) extends HtmlPart
final case class Img(ref: String) extends HtmlPart
final case class Bullets(items: Seq[String]) extends HtmlPart
final case class Numbered(items: Seq[String]) extends HtmlPart
final case class Quote(text: String) extends HtmlPart
final case class CodeBlock(lines: Seq[String]) extends HtmlPart
final case class TablePart(headers: Seq[String], rows: Seq[Seq[String]]) extends HtmlPart
/** Table whose data cells may span columns: cell = (text, colspan ≥ 1).
  * The extractor pads colspan-1 empty markdown cells to keep columns
  * aligned (markdown has no colspan). */
final case class SpanTable(headers: Seq[String], rows: Seq[Seq[(String, Int)]]) extends HtmlPart
/** Layout table used as navigation (a grid of links, td-only): every row
  * is pure link text, so the per-row link-density rule must drop it all. */
final case class LinkGridTable(links: Seq[Seq[String]]) extends HtmlPart
/** Table with a `<caption>`: the caption emits as a plain text span before
  * the rows (short captions are content, exempt from the paragraph gate). */
final case class CaptionedTable(caption: String, headers: Seq[String],
    rows: Seq[Seq[String]]) extends HtmlPart
/** Table whose first data cell spans `rows.length` rows: the extractor
  * pads an empty leading cell in every row below the first (markdown has
  * no rowspan). `rows` are the per-row remaining 2 cells. */
final case class RowSpanTable(headers: Seq[String], spanCell: String,
    rows: Seq[Seq[String]]) extends HtmlPart
/** Two-column table whose second data cell contains a nested table plus
  * text on both sides of it: the inner table linearizes (its rows emit
  * just before the containing row) and the cell keeps `before after`. */
final case class NestedTablePart(headers: Seq[String], leftCell: String,
    before: String, innerRows: Seq[Seq[String]], after: String) extends HtmlPart
/** Navigation table disguised with one plain-text row: the per-row rule
  * keeps the content row, but the WHOLE-TABLE link-density aggregate must
  * kill the table wholesale — nothing survives. */
final case class LinkFarmTable(contentRow: Seq[String],
    linkRows: Seq[Seq[String]]) extends HtmlPart
final case class NavBlock(links: Seq[String]) extends HtmlPart
final case class AsideBlock(text: String, links: Seq[String]) extends HtmlPart
final case class FooterBlock(text: String) extends HtmlPart
/** Link farm in a PLAIN div (no semantic ancestor): only the link-density
  * rule can kill it — the jusText discriminator proper. */
final case class RelatedLinks(links: Seq[String]) extends HtmlPart
/** Cookie-banner-ish short div: killed by the length threshold. */
final case class ShortNotice(text: String) extends HtmlPart

final case class PdfBlock(lines: Seq[String])
final case class PdfPage(columns: Seq[Seq[PdfBlock]]) // 1 or 2 columns

sealed trait DocPlan { def docId: String }
final case class HtmlDocPlan(docId: String, parts: Seq[HtmlPart]) extends DocPlan
final case class PdfDocPlan(docId: String, pages: Seq[PdfPage]) extends DocPlan
final case class MediaDocPlan(docId: String, refs: Seq[String]) extends DocPlan
final case class MixedDocPlan(docId: String, items: Seq[Either[String, String]]) extends DocPlan // Left=text, Right=media ref
final case class MockDocPlan(docId: String, mime: String, sizeBytes: Long) extends DocPlan
final case class UnsupportedDocPlan(docId: String, kind: String) extends DocPlan
final case class CorruptImageDocPlan(docId: String) extends DocPlan

/** Deterministic corpus generator for the interleaved text+media document
  * table (FIXTURES.md §2). Class mix mirrors the reference's supported
  * format matrix: html 40% / pdf 30% / media 18% / mixed 10% / 1%
  * media-heavy skew docs (north-rule skew clause) / ~1% failure docs
  * (unsupported office kinds + corrupt image, per
  * reference tests/integration/test_pipeline.py:140-215,283-296). */
object Fixtures {

  val DefaultSeed = 42L

  private val words: IndexedSeq[String] = Vector(
    "lorem", "ipsum", "dolor", "sit", "amet", "consectetur", "adipiscing",
    "elit", "sed", "eiusmod", "tempor", "incididunt", "labore", "dolore",
    "magna", "aliqua", "enim", "minim", "veniam", "quis", "nostrud",
    "exercitation", "ullamco", "laboris", "nisi", "aliquip", "commodo",
    "consequat", "duis", "aute", "irure", "reprehenderit", "voluptate",
    "velit", "esse", "cillum", "fugiat", "nulla", "pariatur", "excepteur",
    "sint", "occaecat", "cupidatat", "proident", "sunt", "culpa", "officia",
    "deserunt", "mollit", "anim", "laborum", "data", "span", "merge",
    "vector", "stream", "batch", "table", "query", "window")

  private val navWords: IndexedSeq[String] = Vector(
    "Home", "About", "Contact", "Login", "Products", "Blog", "Careers",
    "Support", "Pricing", "Docs", "Terms", "Privacy")

  private def docId(idx: Long): String = f"doc-$idx%012d"

  private def mix(seed: Long, idx: Long): Long = {
    var z = seed ^ (idx * 0x9e3779b97f4a7c15L)
    z = (z ^ (z >>> 33)) * 0xff51afd7ed558ccdL
    (z ^ (z >>> 33)) * 0xc4ceb9fe1a85ec53L
  }

  private def sentence(r: Lcg, minWords: Int, maxWords: Int): String = {
    val n = r.range(minWords, maxWords)
    val ws = (0 until n).map(_ => r.pick(words))
    val s = ws.mkString(" ")
    s.substring(0, 1).toUpperCase(java.util.Locale.ROOT) + s.substring(1) + "."
  }

  /** Content paragraph; occasionally carries entity-requiring characters
    * (&, <, >) so the HTML escape/decode round trip is exercised. */
  private def paragraph(r: Lcg): String = {
    val sents = (0 until r.range(2, 4)).map(_ => sentence(r, 8, 16))
    val base = sents.mkString(" ")
    if (r.chance(15)) base + " Terms & conditions apply where x < y."
    else base
  }

  private def mediaRef(r: Lcg): String = "media://" + r.hex(16)

  // ---- plan generation ------------------------------------------------

  def plan(idx: Long, seed: Long = DefaultSeed): DocPlan = {
    val r = new Lcg(mix(seed, idx))
    val id = docId(idx)
    val cls = r.nextInt(1000)
    if (cls < 400) htmlPlan(id, r)
    else if (cls < 700) pdfPlan(id, r)
    else if (cls < 830) MediaDocPlan(id, (0 until r.range(1, 4)).map(_ => mediaRef(r)))
    else if (cls < 880) MockDocPlan(id,
      r.pick(Vector("image/png", "image/jpeg", "application/pdf",
        "application/msword-docx", "application/pptx-deck")),
      1024L + r.nextInt(500000))
    else if (cls < 980) mixedPlan(id, r)
    else if (cls < 990) MediaDocPlan(id, (0 until r.range(50, 200)).map(_ => mediaRef(r))) // skew docs
    else if (cls < 996) UnsupportedDocPlan(id, r.pick(Vector("docx", "pptx", "xlsx")))
    else CorruptImageDocPlan(id)
  }

  private def htmlPlan(id: String, r: Lcg): HtmlDocPlan = {
    val parts = Seq.newBuilder[HtmlPart]
    parts += NavBlock((0 until r.range(4, 6)).map(_ => r.pick(navWords)))
    parts += Heading(1, sentence(r, 2, 4).dropRight(1)) // title, no period
    val sections = r.range(2, 6)
    var imgs = 0
    (0 until sections).foreach { _ =>
      if (r.chance(40)) parts += Heading(2, sentence(r, 2, 3).dropRight(1))
      parts += Para(paragraph(r))
      if (r.chance(30))
        parts += Bullets((0 until r.range(2, 4)).map(_ => sentence(r, 2, 4).dropRight(1)))
      if (r.chance(15))
        parts += Numbered((0 until r.range(2, 4)).map(_ => sentence(r, 2, 4).dropRight(1)))
      if (r.chance(20)) parts += Quote(sentence(r, 8, 12))
      if (r.chance(15)) {
        val nCols = r.range(2, 3)
        val headers = (0 until nCols).map(_ => r.pick(words))
        val rows = (0 until r.range(2, 3)).map(_ =>
          (0 until nCols).map(_ => (0 until r.range(1, 3)).map(_ => r.pick(words)).mkString(" ")))
        parts += TablePart(headers, rows)
      }
      if (r.chance(6)) {
        val caption = sentence(r, 2, 4).dropRight(1)
        val headers = (0 until 2).map(_ => r.pick(words))
        val rows = (0 until r.range(1, 2)).map(_ =>
          (0 until 2).map(_ => r.pick(words)))
        parts += CaptionedTable(caption, headers, rows)
      }
      if (r.chance(8)) {
        // colspan table: 3 columns, each row has one cell spanning 2
        val headers = (0 until 3).map(_ => r.pick(words))
        val rows = (0 until r.range(1, 3)).map { _ =>
          val wide = r.nextInt(2) // which of the two cells is the wide one
          (0 until 2).map { c =>
            val text = (0 until r.range(1, 2)).map(_ => r.pick(words)).mkString(" ")
            (text, if (c == wide) 2 else 1)
          }
        }
        parts += SpanTable(headers, rows)
      }
      if (r.chance(6)) {
        // rowspan table: first cell of the first data row spans all rows
        val headers = (0 until 3).map(_ => r.pick(words))
        val rows = (0 until r.range(2, 3)).map(_ => (0 until 2).map(_ => r.pick(words)))
        parts += RowSpanTable(headers, r.pick(words), rows)
      }
      if (r.chance(5)) {
        // nested table inside a cell, with text on both sides of it
        val innerRows = (0 until r.range(1, 2)).map(_ => (0 until 2).map(_ => r.pick(words)))
        parts += NestedTablePart((0 until 2).map(_ => r.pick(words)),
          r.pick(words), sentence(r, 2, 3).dropRight(1), innerRows,
          sentence(r, 2, 3).dropRight(1))
      }
      if (r.chance(15)) {
        val lines = (0 until r.range(2, 4)).map(i => s"val x$i = ${r.nextInt(100)} + ${r.pick(words)}")
        parts += CodeBlock(if (r.chance(40)) lines :+ "if (a < b && c > d) { a += 1 }" else lines)
      }
      if (imgs < 3 && r.chance(30)) { parts += Img(mediaRef(r)); imgs += 1 }
    }
    if (r.chance(20)) // nav-as-layout-table: rows of pure links
      parts += LinkGridTable((0 until r.range(2, 3)).map(_ =>
        (0 until r.range(2, 4)).map(_ => r.pick(navWords))))
    if (r.chance(15)) // link farm with one decoy content row: whole-table kill
      parts += LinkFarmTable((0 until 2).map(_ => r.pick(words)),
        (0 until r.range(3, 4)).map(_ =>
          (0 until r.range(2, 4)).map(_ => r.pick(navWords))))
    if (r.chance(40))
      parts += RelatedLinks((0 until r.range(3, 6)).map(_ => sentence(r, 2, 3).dropRight(1)))
    if (r.chance(40)) parts += ShortNotice("We use cookies.") // + " OK" link = 18 chars < MinTextLen
    parts += AsideBlock(r.pick(words), (0 until r.range(2, 4)).map(_ => r.pick(navWords)))
    parts += FooterBlock("(c) " + r.pick(navWords))
    HtmlDocPlan(id, parts.result())
  }

  private def pdfPlan(id: String, r: Lcg): PdfDocPlan = {
    val nPages = r.range(1, 5)
    val pages = (0 until nPages).map { p =>
      val nCols = if (r.chance(30)) 2 else 1
      val cols = (0 until nCols).map { _ =>
        (0 until r.range(1, 4)).map { b =>
          val lines = (0 until r.range(1, 4)).map { _ =>
            (0 until r.range(2, 5)).map(_ => r.pick(words)).mkString(" ")
          }
          PdfBlock(if (p == 0 && b == 0 && r.chance(40)) ("# " + lines.head) +: lines.tail else lines)
        }
      }
      PdfPage(cols)
    }
    PdfDocPlan(id, pages)
  }

  private def mixedPlan(id: String, r: Lcg): MixedDocPlan = {
    val items = (0 until r.range(3, 8)).map { _ =>
      if (r.chance(45)) Right(mediaRef(r)) else Left(paragraph(r))
    }
    MixedDocPlan(id, items)
  }

  // ---- rendering: plan -> raw input Doc -------------------------------

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Render the HTML payload. Boilerplate containers are link-dense and
    * short; content paragraphs are long and link-free — the structure the
    * density heuristics must separate. Whitespace is deliberately messy
    * (indentation, newlines inside <p>) to exercise normalization. */
  def renderHtml(parts: Seq[HtmlPart], r: Lcg): String = {
    val sb = new StringBuilder
    sb.append("<!DOCTYPE html>\n<html>\n<head>\n<title>Fixture</title>\n")
    sb.append("<style>body { margin: 0; } .x > div { color: red; }</style>\n")
    sb.append("<script>var n = 1 < 2 && 3 > 2; function f() { return \"<p>\"; }</script>\n")
    sb.append("</head>\n<body>\n")
    parts.foreach {
      case NavBlock(links) =>
        sb.append("<nav><ul>\n")
        links.foreach(l => sb.append(s"""  <li><a href="/${l.toLowerCase(java.util.Locale.ROOT)}">$l</a></li>\n"""))
        sb.append("</ul></nav>\n")
      case Heading(1, text) =>
        sb.append(s"<header>\n  <h1>${esc(text)}</h1>\n</header>\n")
      case Heading(level, text) =>
        sb.append(s"<h$level>${esc(text)}</h$level>\n")
      case Para(text) =>
        // break the paragraph across lines with indentation, and wrap some
        // words in inline formatting tags (extraction must see through them)
        val broken = text.split(' ').grouped(9).map(_.mkString(" ")).mkString("\n    ")
        val decorated = esc(broken).split(' ').zipWithIndex.map { case (w, i) =>
          if (i % 7 == 3) {
            val t = r.pick(Vector("b", "em", "strong", "code", "span"))
            s"<$t>$w</$t>"
          } else w
        }.mkString(" ")
        sb.append(s"<p>\n    $decorated\n  </p>\n")
      case Img(ref) =>
        if (r.chance(50)) sb.append(s"""<figure><img src="$ref" alt="fig"/></figure>\n""")
        else sb.append(s"""<img src="$ref">\n""")
      case Bullets(items) =>
        sb.append("<ul>\n")
        items.foreach { it =>
          // sometimes leave </li> implied (valid HTML; exercises recovery)
          if (r.chance(30)) sb.append(s"  <li>${esc(it)}\n")
          else sb.append(s"  <li>${esc(it)}</li>\n")
        }
        sb.append("</ul>\n")
      case Numbered(items) =>
        sb.append("<ol>\n")
        items.foreach { it =>
          if (r.chance(30)) sb.append(s"  <li>${esc(it)}\n")
          else sb.append(s"  <li>${esc(it)}</li>\n")
        }
        sb.append("</ol>\n")
      case Quote(text) =>
        sb.append(s"<blockquote><p>${esc(text)}</p></blockquote>\n")
      case TablePart(headers, rows) =>
        sb.append("<table>\n  <tr>")
        headers.foreach(h => sb.append(s"<th>${esc(h)}</th>"))
        sb.append("</tr>\n")
        rows.foreach { row =>
          sb.append("  <tr>")
          // sometimes leave </td> implied (exercises cell-boundary recovery)
          row.foreach { c =>
            if (r.chance(30)) sb.append(s"<td>${esc(c)}")
            else sb.append(s"<td>${esc(c)}</td>")
          }
          sb.append("</tr>\n")
        }
        sb.append("</table>\n")
      case SpanTable(headers, rows) =>
        sb.append("<table>\n  <tr>")
        headers.foreach(h => sb.append(s"<th>${esc(h)}</th>"))
        sb.append("</tr>\n")
        rows.foreach { row =>
          sb.append("  <tr>")
          row.foreach { case (c, colspan) =>
            if (colspan > 1) sb.append(s"""<td colspan="$colspan">${esc(c)}</td>""")
            else if (r.chance(30)) sb.append(s"<td>${esc(c)}") // implied close
            else sb.append(s"<td>${esc(c)}</td>")
          }
          sb.append("</tr>\n")
        }
        sb.append("</table>\n")
      case CaptionedTable(caption, headers, rows) =>
        sb.append("<table>\n")
        // sometimes leave </caption> implied (td/tr close it)
        if (r.chance(30)) sb.append(s"  <caption>${esc(caption)}\n")
        else sb.append(s"  <caption>${esc(caption)}</caption>\n")
        sb.append("  <tr>")
        headers.foreach(h => sb.append(s"<th>${esc(h)}</th>"))
        sb.append("</tr>\n")
        rows.foreach { row =>
          sb.append("  <tr>")
          row.foreach(c => sb.append(s"<td>${esc(c)}</td>"))
          sb.append("</tr>\n")
        }
        sb.append("</table>\n")
      case LinkGridTable(links) =>
        // layout table: every cell is one link — per-row link density = 1
        sb.append("<table>\n")
        links.foreach { row =>
          sb.append("  <tr>")
          row.foreach(l => sb.append(s"""<td><a href="/${l.toLowerCase(java.util.Locale.ROOT)}">$l</a></td>"""))
          sb.append("</tr>\n")
        }
        sb.append("</table>\n")
      case RowSpanTable(headers, spanCell, rows) =>
        sb.append("<table>\n  <tr>")
        headers.foreach(h => sb.append(s"<th>${esc(h)}</th>"))
        sb.append("</tr>\n")
        rows.zipWithIndex.foreach { case (row, i) =>
          sb.append("  <tr>")
          if (i == 0) sb.append(s"""<td rowspan="${rows.length}">${esc(spanCell)}</td>""")
          row.foreach { c =>
            if (r.chance(30)) sb.append(s"<td>${esc(c)}") // implied close
            else sb.append(s"<td>${esc(c)}</td>")
          }
          sb.append("</tr>\n")
        }
        sb.append("</table>\n")
      case NestedTablePart(headers, leftCell, before, innerRows, after) =>
        sb.append("<table>\n  <tr>")
        headers.foreach(h => sb.append(s"<th>${esc(h)}</th>"))
        sb.append("</tr>\n")
        sb.append(s"  <tr><td>${esc(leftCell)}</td><td>${esc(before)}\n    <table>\n")
        innerRows.foreach { row =>
          sb.append("      <tr>")
          row.foreach(c => sb.append(s"<td>${esc(c)}</td>"))
          sb.append("</tr>\n")
        }
        sb.append(s"    </table>\n  ${esc(after)}</td></tr>\n</table>\n")
      case LinkFarmTable(contentRow, linkRows) =>
        // nav table with a decoy content row: only the whole-table
        // density aggregate can kill the content row
        sb.append("<table>\n  <tr>")
        contentRow.foreach(c => sb.append(s"<td>${esc(c)}</td>"))
        sb.append("</tr>\n")
        linkRows.foreach { row =>
          sb.append("  <tr>")
          row.foreach(l => sb.append(s"""<td><a href="/${l.toLowerCase(java.util.Locale.ROOT)}">$l</a></td>"""))
          sb.append("</tr>\n")
        }
        sb.append("</table>\n")
      case CodeBlock(lines) =>
        // NO indentation added: <pre> bodies are whitespace-verbatim
        sb.append("<pre>").append(esc(lines.mkString("\n"))).append("</pre>\n")
      case RelatedLinks(links) =>
        // plain div, pure links: must die by link density alone
        sb.append("""<div class="related">Related: """)
        links.foreach(l => sb.append(s"""<a href="/r/${l.hashCode}">${esc(l)}</a> """))
        sb.append("</div>\n")
      case ShortNotice(text) =>
        sb.append(s"""<div class="notice">${esc(text)} <a href="#ok">OK</a></div>\n""")
      case AsideBlock(text, links) =>
        sb.append("<aside>")
        sb.append(esc(text))
        links.foreach(l => sb.append(s""" <a href="#">$l</a>"""))
        sb.append("</aside>\n")
      case FooterBlock(text) =>
        sb.append(s"""<footer><p>${esc(text)}</p><a href="#top">Top</a></footer>\n""")
    }
    sb.append("</body>\n</html>\n")
    sb.toString
  }

  /** Render the deterministic PDF position encoding: one `page,x,y,text`
    * run per line, fixed-point ints, runs emitted in DETERMINISTICALLY
    * SHUFFLED order so the extractor must truly re-cluster (FIXTURES.md). */
  def renderPdf(pages: Seq[PdfPage], r: Lcg): String = {
    val runs = Seq.newBuilder[String]
    pages.zipWithIndex.foreach { case (page, p) =>
      page.columns.zipWithIndex.foreach { case (blocks, c) =>
        val x0 = 100 + c * 3400
        var y = 100
        blocks.foreach { block =>
          block.lines.foreach { line =>
            // split the line into 1-3 runs at word boundaries; x advances
            // by 12 fixed-point units per character (incl. the joining
            // space); per-run y jitter of ±2 stays inside the extractor's
            // line tolerance and forces real clustering
            val ws = line.split(' ')
            var x = x0
            var i = 0
            while (i < ws.length) {
              val take = math.min(r.range(1, 2), ws.length - i)
              val runText = ws.slice(i, i + take).mkString(" ")
              val yj = y + r.range(-2, 2)
              runs += s"$p,$x,$yj,$runText"
              x += (runText.length + 1) * 12
              i += take
            }
            y += 50
          }
          y += 150 // block gap (> BlockGap threshold of 100)
        }
      }
    }
    val arr = runs.result().toArray
    // Fisher-Yates with the doc's own rng
    var i = arr.length - 1
    while (i > 0) {
      val j = r.nextInt(i + 1)
      val t = arr(i); arr(i) = arr(j); arr(j) = t
      i -= 1
    }
    arr.mkString("\n")
  }

  /** Plan → raw input document (the canonical input row). */
  def render(p: DocPlan): Doc = {
    val r = new Lcg(mix(0x5eedL, p.docId.hashCode.toLong)) // render-only jitter rng
    p match {
      case HtmlDocPlan(id, parts) =>
        Doc(id, Vector(Span(Model.Kind.Html, renderHtml(parts, r), "", 0)))
      case PdfDocPlan(id, pages) =>
        Doc(id, Vector(Span(Model.Kind.Pdf, renderPdf(pages, r), "", 0)))
      case MediaDocPlan(id, refs) =>
        Doc(id, refs.zipWithIndex.map { case (ref, i) => Span(Model.Kind.Image, "", ref, i) }.toVector)
      case MixedDocPlan(id, items) =>
        Doc(id, items.zipWithIndex.map {
          case (Left(text), i) => Span(Model.Kind.Text, text, "", i)
          case (Right(ref), i) => Span(Model.Kind.Image, "", ref, i)
        }.toVector)
      case MockDocPlan(id, mime, size) =>
        Doc(id, Vector(Span(Model.Kind.Mock, s"$mime|$size", "", 0)))
      case UnsupportedDocPlan(id, kind) =>
        Doc(id, Vector(Span(kind, "", "", 0)))
      case CorruptImageDocPlan(id) =>
        Doc(id, Vector(Span(Model.Kind.Image, "", "", 0))) // empty media_ref = unloadable image
    }
  }

  def doc(idx: Long, seed: Long = DefaultSeed): Doc = render(plan(idx, seed))

  def docs(n: Int, seed: Long = DefaultSeed): Seq[Doc] =
    (0L until n.toLong).map(doc(_, seed))
}
