package graft.adapters

import graft.core.{Model, Span}
import scala.collection.mutable.ArrayBuffer

/** From-scratch HTML main-content extraction: a fused single-pass scanner
  * (tokenizer + block builder in one loop, no intermediate token objects)
  * feeding text-density / link-density classification in the style of
  * jusText / Readability (public algorithms; see PAPERS.md).
  *
  * The reference never parses HTML itself — its analog is the VLM prompt
  * contract "Preserve the document structure and hierarchy … Maintain the
  * original text order and layout" (reference:
  * src/paddleocr_server/prompts.py:6-16, adapters/vllm_remote_engine.py:269-278).
  * Those requirements become hard rules here: blocks are emitted strictly
  * in document order; headings keep their level as markdown `#` prefixes;
  * `<img>` nodes become media_ref passthrough spans (north rule).
  *
  * Classification rules (deterministic, no model):
  *  - content under a boilerplate ancestor (`nav aside footer header
  *    script style head noscript`) is dropped — EXCEPT headings under
  *    `<header>` (page titles live there);
  *  - headings kept when text length ≥ 3 and zero link density;
  *  - list items render as markdown bullets (`- `), kept when length ≥ 3
  *    and link density < 1/3 (navigation lists die by ancestry or link
  *    density, content lists survive despite short items);
  *  - blockquote content renders with a `> ` prefix;
  *  - `<pre>` bodies keep their whitespace verbatim inside ``` fences;
  *  - other blocks kept when text length ≥ `MinTextLen` and link density
  *    (chars inside `<a>` / total chars) < 1/3 — the jusText-style rule
  *    that kills navigation and footer link farms;
  *  - tables render as markdown rows; `colspan=k` pads k-1 empty cells and
  *    a `rowspan=k` cell leaves k-1 empty fill cells in the rows below it
  *    (markdown has neither, column counts must still align); a row whose
  *    aggregate link density ≥ 1/3 is dropped, and a TABLE whose
  *    whole-text aggregate link density ≥ 1/3 is dropped wholesale (rows
  *    that individually passed included) — layout/navigation tables are
  *    chrome, not content, even when one row looks texty; media refs
  *    always pass through; `<caption>` emits as a plain text span (short
  *    is fine there, like list items); a nested table linearizes — its
  *    rows emit just before the row of the cell containing it, and that
  *    cell keeps its direct text from both sides of the inner table; a
  *    nested table that survives its OWN density verdict is immune to
  *    enclosing tables' kills (old-web layout wrappers: nav-link
  *    wrapper tables must not drag down the content table inside them).
  *
  * Throughput notes (this is the hot loop of the 100 TB job): text runs are
  * appended to the paragraph buffer by (start,end) range — no per-run
  * substring; attributes are parsed only for `<img>` (the one tag whose
  * attribute we need); raw-text elements are skipped with a no-copy
  * case-insensitive scan. The tolerant behaviors (unclosed tags, bare
  * attributes, stray `<`) are preserved: anything unparseable degrades to
  * text rather than failing.
  */
object HtmlExtractor extends SpanExtractor {
  override val name = "html"

  private val MinTextLen = 25
  private val MaxLinkDensity = 0.34

  private val BlockTags: Set[String] = Set(
    "p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "div", "td", "th",
    "section", "article", "blockquote", "pre", "ul", "ol", "table", "tr",
    "nav", "aside", "footer", "header", "main", "figure", "figcaption",
    "body", "html", "form", "dl", "dt", "dd", "caption", "br", "hr")

  // boilerplate ancestry (nav/aside/footer/header/noscript -> boilerDepth;
  // script/style/head -> skipDepth) and raw-text handling are encoded as
  // TagInfo opcodes below — see opFor

  // ---- public API -----------------------------------------------------

  override def extract(span: Span): Either[ExtractFailure, Vector[Span]] = {
    if (span.text == null || span.text.isEmpty)
      return Left(ExtractFailure("Failed to parse HTML: empty payload", "validation"))
    val items = scan(span.text)
    Right(items.zipWithIndex.map {
      case (TextItem(md), idx) => Span(Model.Kind.Text, md, "", idx)
      case (MediaItem(ref), idx) => Span(Model.Kind.Image, "", ref, idx)
      case (JudgedText(t), idx) => Span(Model.Kind.Text, t.markdown, "", idx) // unreachable: unwrapped at top-level pop
    })
  }

  private[adapters] sealed trait Item
  private[adapters] final case class TextItem(markdown: String) extends Item
  private[adapters] final case class MediaItem(ref: String) extends Item
  /** A text item that already survived ITS OWN table's density verdict —
    * immune to enclosing tables' kills (scan-internal; unwrapped before
    * items leave the scanner). The old-web layout pattern this protects:
    * a content table nested in a cell of a link-heavy wrapper table must
    * survive on its own merits, exactly as jusText judges blocks
    * independently of their container. */
  private final case class JudgedText(t: TextItem) extends Item

  /** Cap on materialized cells per markdown row: adversarial
    * `colspan=1000` × thousands-of-cells markup would otherwise expand a
    * 10 MB payload into gigabytes of empty-cell padding. Beyond the cap
    * the grid stops padding (alignment is moot at that width); text is
    * still captured and counted. */
  private val MaxCols = 4096

  /** Per-<table> scan context. Three jobs:
    *  - buffer the table's rendered output (rows, caption, media — in
    *    document order) so the WHOLE-TABLE link-density aggregate can kill
    *    layout/navigation tables at close, not just individual link rows;
    *  - track the rowspan grid: `pending(col)` counts how many upcoming
    *    rows are still spanned by a cell above, and those columns render
    *    as empty cells (markdown has no rowspan — same padding convention
    *    as colspan);
    *  - hold the suspended state of the containing cell when this table is
    *    nested: markdown has no nested tables either, so the inner table
    *    linearizes (its rows emit just before the containing row) and the
    *    containing cell keeps its direct text on both sides of it. */
  private final class TableCtx {
    val out = ArrayBuffer.empty[Item]
    val rowCells = ArrayBuffer.empty[String]
    var rowOpen = false  // a <tr> opened since the last endRow
    var rowHasHeader = false
    var rowLink = 0
    var rowTotal = 0
    var tableLink = 0
    var tableTotal = 0
    var colIdx = 0
    val pending = ArrayBuffer.empty[Int] // col -> rows still spanned from above
    // suspended containing-cell state (nested tables only)
    var savedCell: String = ""
    var savedLink = 0
    var savedTotal = 0
    var savedInCell = false
    var savedInCaption = false
    var savedColspan = 1
    var savedRowspan = 1

    private def ensureCol(i: Int): Unit = while (pending.length <= i) pending += 0

    /** Place one captured cell: skip columns occupied by rowspans from
      * earlier rows (empty fill), write the cell, pad colspan-1 empties,
      * record this cell's own rowspan occupancy for the rows below. */
    def captureCell(text: String, colspan: Int, rowspan: Int, lc: Int, tc: Int): Unit = {
      while (colIdx < pending.length && pending(colIdx) > 0 && colIdx < MaxCols) {
        rowCells += ""
        colIdx += 1
      }
      // the cell's TEXT is always captured, even past MaxCols — the cap
      // bounds colspan PADDING amplification (and rowspan bookkeeping),
      // never content (real cells are bounded by the payload size)
      var k = 0
      while (k < colspan && (k == 0 || colIdx < MaxCols)) {
        rowCells += (if (k == 0) text else "")
        if (rowspan > 1 && colIdx < MaxCols) { ensureCol(colIdx); pending(colIdx) = rowspan }
        colIdx += 1
        k += 1
      }
      rowLink += lc
      rowTotal += tc
    }

    /** Close the current row: trailing rowspan fills, occupancy decrement,
      * then emit unless boilerplate ancestry or per-row link density kills
      * it. Grid bookkeeping runs even for killed rows — the HTML grid
      * exists regardless of what survives classification — and killed
      * rows still feed the whole-table density aggregate (that is the
      * point: link rows push a layout table over the threshold). */
    def endRow(boiler: Boolean): Unit = {
      // no <tr> opened and no cell captured since the last row closed:
      // this is the second endRow of the `</tr><tr>` pair — running the
      // grid bookkeeping would double-decrement rowspan occupancy. A
      // genuinely empty <tr></tr> (rowOpen) DOES consume a grid row: its
      // rowspan fills render and occupancy decrements.
      if (!rowOpen && rowCells.isEmpty && colIdx == 0) return
      var last = pending.length - 1
      while (last >= colIdx && pending(last) == 0) last -= 1
      while (colIdx <= last && colIdx < MaxCols) {
        rowCells += ""
        colIdx += 1
      }
      var c = 0
      while (c < pending.length) {
        if (pending(c) > 0) pending(c) -= 1
        c += 1
      }
      if (rowCells.nonEmpty && !boiler && rowCells.exists(_.nonEmpty)) {
        tableLink += rowLink
        tableTotal += rowTotal
        // jusText rule applied per table row: a row whose cells are mostly
        // link text is navigation chrome (layout table), not content
        val d = if (rowTotal == 0) 0.0 else rowLink.toDouble / rowTotal.toDouble
        if (d < MaxLinkDensity) {
          out += TextItem("| " + rowCells.mkString(" | ") + " |")
          if (rowHasHeader) out += TextItem("|" + (" --- |" * rowCells.length))
        }
      }
      rowCells.clear(); rowHasHeader = false; rowLink = 0; rowTotal = 0
      colIdx = 0; rowOpen = false
    }
  }

  // ---- fused scanner --------------------------------------------------

  private def scan(html: String): Vector[Item] = {
    val n = html.length
    val items = ArrayBuffer.empty[Item]
    // java StringBuilder: the 3-arg append(CharSequence, start, end) is the
    // zero-copy range append (scala's StringBuilder would auto-tuple it)
    val sb = new java.lang.StringBuilder(256)
    var linkChars = 0
    var totalChars = 0
    var linkDepth = 0
    var headingLevel = 0        // >0 while inside h1..h6
    var boilerDepth = 0         // open nav/aside/footer/header/script/style/head
    var headerOnlyDepth = 0     // open <header> specifically
    var skipDepth = 0           // open script/style/head (text fully dropped)
    var inLi = false            // inside a list item (implied closes keep it set)
    var liNumber = 0            // current <ol> item number; 0 = bulleted
    // list-nesting stack: -1 for <ul>, current item count for <ol>
    val listStack = ArrayBuffer.empty[Int]
    var quoteDepth = 0          // open <blockquote>
    var preDepth = 0            // open <pre> (whitespace-verbatim)
    val tableStack = ArrayBuffer.empty[TableCtx] // one ctx per open <table>
    var inCell = false          // inside <td>/<th>
    var inCaption = false       // inside <caption> (short text is content here)
    var cellColspan = 1         // colspan of the open cell (markdown: pad empties)
    var cellRowspan = 1         // rowspan of the open cell (fills later rows)

    // table output buffers inside the innermost open table so the
    // whole-table density aggregate can decide its fate at close
    def sink: ArrayBuffer[Item] =
      if (tableStack.isEmpty) items else tableStack.last.out

    /** Close the innermost table: final implied row, whole-table link
      * density verdict, then release the buffer to the enclosing sink and
      * resume a suspended containing cell (nested tables). */
    def popTable(): Unit = {
      if (tableStack.isEmpty) return
      val ctx = tableStack.remove(tableStack.length - 1)
      ctx.endRow(boilerDepth > 0) // an unclosed trailing row still emits
      // jusText's density rule lifted to the whole table: a table whose
      // aggregate visible text is mostly links is navigation/layout chrome
      // — its text dies wholesale, rows that individually passed the
      // per-row rule included. Media refs pass through unconditionally
      // (north rule), same as everywhere else in the scanner.
      val dense = ctx.tableTotal > 0 &&
        ctx.tableLink.toDouble / ctx.tableTotal.toDouble >= MaxLinkDensity
      val nested = tableStack.nonEmpty
      val dest = if (nested) tableStack.last.out else items
      ctx.out.foreach {
        // survivors of an inner table's own verdict are immune to this
        // (and any enclosing) table's kill; wrapping persists only while
        // further enclosing tables remain
        case JudgedText(t) => dest += (if (nested) JudgedText(t) else t)
        case t: TextItem => if (!dense) dest += (if (nested) JudgedText(t) else t)
        case m: MediaItem => dest += m
      }
      if (ctx.savedInCell || ctx.savedInCaption) {
        // nested table: restore the containing cell's in-flight text; the
        // text after the inner table keeps accumulating into the same cell
        sb.setLength(0); sb.append(ctx.savedCell)
        linkChars = ctx.savedLink; totalChars = ctx.savedTotal
        inCell = ctx.savedInCell; inCaption = ctx.savedInCaption
        cellColspan = ctx.savedColspan; cellRowspan = ctx.savedRowspan
      }
    }

    /** Capture the open cell/caption — called ONLY at real cell/row/table
      * boundaries (td/th/tr/table open+close, EOF). Block tags inside a
      * cell are NOT boundaries: `<td><p>a</p>b</td>` is ONE cell "a b",
      * not three (flush() is a no-op inside a cell — the markup's own
      * whitespace separates the fragments and normalizeDecode collapses
      * it). */
    def closeCell(): Unit = {
      if (tableStack.isEmpty) return
      if (inCaption) {
        // table captions are legitimately short (like list items): ancestry
        // + link density decide, not the paragraph length gate
        val ctx = tableStack.last
        val text = normalizeDecode(sb)
        val density = if (totalChars == 0) 0.0 else linkChars.toDouble / totalChars.toDouble
        // captions count toward the whole-table density aggregate
        ctx.tableLink += linkChars; ctx.tableTotal += totalChars
        sb.setLength(0); linkChars = 0; totalChars = 0
        if (boilerDepth == 0 && text.length >= 3 && density < MaxLinkDensity)
          ctx.out += TextItem(text)
      } else if (inCell) {
        // table cell capture: cells are short by nature — no length gate;
        // ancestry (boilerDepth at endRow) and the density rules decide.
        // The ctx places the cell into the rowspan/colspan grid.
        tableStack.last.captureCell(normalizeDecode(sb), cellColspan, cellRowspan,
          linkChars, totalChars)
        cellColspan = 1; cellRowspan = 1
        sb.setLength(0); linkChars = 0; totalChars = 0
      }
    }

    def flush(): Unit = {
      // inside an open cell/caption a block boundary is not a cell
      // boundary — keep accumulating (see closeCell), but it IS a word
      // boundary: minified `</li><li>` must not weld adjacent fragments
      if ((inCell || inCaption) && tableStack.nonEmpty) {
        if (sb.length > 0 && sb.charAt(sb.length - 1) > ' ') sb.append(' ')
        return
      }
      if (sb.length == 0) { linkChars = 0; totalChars = 0; return }
      if (preDepth > 0) {
        // verbatim code block: entities decoded, whitespace PRESERVED
        val raw = trimNewlines(decodeEntities(sb.toString))
        sb.setLength(0); linkChars = 0; totalChars = 0
        if (raw.nonEmpty && boilerDepth == 0) sink += TextItem("```\n" + raw + "\n```")
        return
      }
      val text = normalizeDecode(sb)
      val lc = linkChars; val tc = totalChars
      sb.setLength(0); linkChars = 0; totalChars = 0
      if (text.isEmpty) return
      val linkDensity = if (tc == 0) 0.0 else lc.toDouble / tc.toDouble
      if (headingLevel > 0) {
        val keep = text.length >= 3 && lc == 0 &&
          (boilerDepth == 0 || boilerDepth == headerOnlyDepth) // headings allowed under <header> only
        if (keep) sink += TextItem(("#" * headingLevel) + " " + text)
      } else if (inLi) {
        // list items are legitimately short; ancestry + link density decide
        val keep = boilerDepth == 0 && text.length >= 3 && linkDensity < MaxLinkDensity
        val marker = if (liNumber > 0) s"$liNumber. " else "- "
        if (keep) sink += TextItem((if (quoteDepth > 0) "> " + marker else marker) + text)
      } else {
        val keep = boilerDepth == 0 && text.length >= MinTextLen && linkDensity < MaxLinkDensity
        if (keep) sink += TextItem((if (quoteDepth > 0) "> " else "") + text)
      }
    }

    def appendText(from: Int, until: Int): Unit = {
      if (skipDepth == 0 && until > from) {
        sb.append(html, from, until)
        var j = from
        var visible = 0
        while (j < until) {
          val c = html.charAt(j)
          // ASCII > 0x20 is never whitespace — skip the Character call
          if ((c > ' ' && c < 0x80) || !Character.isWhitespace(c)) visible += 1
          j += 1
        }
        totalChars += visible
        if (linkDepth > 0) linkChars += visible
      }
    }

    var i = 0
    var tick = 0
    while (i < n) {
      // cooperative per-span budget: one nanoTime per 4096 tags keeps the
      // poll at noise level while bounding how long adversarial markup can
      // hold a task core (see graft.adapters.Deadline)
      tick += 1
      if ((tick & 0xFFF) == 0) Deadline.check()
      val lt = html.indexOf('<', i)
      if (lt < 0) { appendText(i, n); i = n }
      else {
        appendText(i, lt)
        if (html.startsWith("<!--", lt)) {
          val close = html.indexOf("-->", lt + 4)
          i = if (close < 0) n else close + 3
        } else if (lt + 1 < n && (html.charAt(lt + 1) == '!' || html.charAt(lt + 1) == '?')) {
          val close = html.indexOf('>', lt)
          i = if (close < 0) n else close + 1
        } else {
          val close = html.indexOf('>', lt)
          if (close < 0) { appendText(lt, n); i = n } // stray '<': literal text
          else {
            val isEnd = lt + 1 < close && html.charAt(lt + 1) == '/'
            val nameStart = if (isEnd) lt + 2 else lt + 1
            var nameEnd = nameStart
            while (nameEnd < close && !Character.isWhitespace(html.charAt(nameEnd)) &&
                   html.charAt(nameEnd) != '/') nameEnd += 1
            val tag = tagInfoAt(html, nameStart, nameEnd)
            i = close + 1
            if (isEnd) (tag.op: @scala.annotation.switch) match {
              case OpTd | OpTh => closeCell(); inCell = false; inCaption = false
              case OpTr =>
                closeCell(); flush(); inCell = false; inCaption = false
                if (tableStack.nonEmpty) tableStack.last.endRow(boilerDepth > 0)
              case OpTable =>
                closeCell(); flush(); inCell = false; inCaption = false
                popTable()
              case OpCaption => closeCell(); inCaption = false
              case OpHeading => flush(); headingLevel = 0
              case OpHeader =>
                flush()
                if (boilerDepth > 0) boilerDepth -= 1
                if (headerOnlyDepth > 0) headerOnlyDepth -= 1
              case OpBoiler =>
                flush()
                if (boilerDepth > 0) boilerDepth -= 1
              case OpLi => flush(); inLi = false
              case OpUl | OpOl =>
                flush()
                if (listStack.nonEmpty) listStack.remove(listStack.length - 1)
                // a nested list closing inside an outer <li> leaves us in
                // that item; only the outermost close ends list context
                inLi = listStack.nonEmpty
              case OpQuote => flush(); if (quoteDepth > 0) quoteDepth -= 1
              case OpPre => flush(); if (preDepth > 0) preDepth -= 1
              case OpVoid | OpBlock => flush()
              case OpA => if (linkDepth > 0) linkDepth -= 1
              case OpSkip =>
                if (skipDepth > 0) { skipDepth -= 1; if (boilerDepth > 0) boilerDepth -= 1 }
              case _ => () // unknown/img end tags: transparent
            } else {
              val selfClosing = html.charAt(close - 1) == '/'
              (tag.op: @scala.annotation.switch) match {
                case OpImg =>
                  if (boilerDepth == 0) {
                    val ref = attrValue(html, nameEnd, close, "src")
                    if (ref != null && ref.nonEmpty) sink += MediaItem(decodeEntities(ref))
                  }
                case OpTd | OpTh =>
                  closeCell() // captures an implied-closed previous cell/caption
                  flush()     // stray non-cell text before the cell
                  inCaption = false
                  if (!selfClosing && tableStack.nonEmpty) {
                    inCell = true
                    if (tag.op == OpTh) tableStack.last.rowHasHeader = true
                    // span attributes: only parsed when the tag has any
                    cellColspan = 1; cellRowspan = 1
                    if (nameEnd < close) {
                      cellColspan = spanAttr(html, nameEnd, close, "colspan", 1000)
                      cellRowspan = spanAttr(html, nameEnd, close, "rowspan", 65534)
                    }
                  }
                case OpTr =>
                  closeCell(); flush(); inCell = false; inCaption = false
                  if (tableStack.nonEmpty) {
                    tableStack.last.endRow(boilerDepth > 0)
                    tableStack.last.rowOpen = true
                  }
                case OpTable =>
                  if (!selfClosing) {
                    val ctx = new TableCtx
                    if (tableStack.nonEmpty && (inCell || inCaption)) {
                      // nested table opening inside a cell/caption: suspend
                      // the containing cell's in-flight text — it resumes
                      // (same cell, same buffer) when this table closes
                      ctx.savedCell = sb.toString
                      ctx.savedLink = linkChars; ctx.savedTotal = totalChars
                      ctx.savedInCell = inCell; ctx.savedInCaption = inCaption
                      ctx.savedColspan = cellColspan; ctx.savedRowspan = cellRowspan
                      sb.setLength(0); linkChars = 0; totalChars = 0
                    } else flush()
                    inCell = false; inCaption = false; cellColspan = 1; cellRowspan = 1
                    tableStack += ctx
                  } else flush()
                case OpCaption | OpHeading | OpHeader | OpBoiler | OpLi | OpUl |
                     OpOl | OpQuote | OpPre | OpVoid | OpBlock =>
                  flush()
                  if (!selfClosing && tag.op != OpVoid) {
                    if (tag.op == OpCaption && tableStack.nonEmpty) inCaption = true
                    // a block element opening inside an unclosed <hN> implies
                    // the heading closed (else every later block would be
                    // misclassified as heading text and link-bearing ones
                    // silently dropped)
                    headingLevel = tag.headingLevel
                    if (tag.op == OpBoiler || tag.op == OpHeader) boilerDepth += 1
                    if (tag.op == OpHeader) headerOnlyDepth += 1
                    if (tag.op == OpLi) {
                      inLi = true
                      // number the item when the innermost open list is <ol>
                      if (listStack.nonEmpty && listStack.last >= 0) {
                        listStack(listStack.length - 1) += 1
                        liNumber = listStack.last
                      } else liNumber = 0
                    }
                    if (tag.op == OpUl) listStack += -1
                    if (tag.op == OpOl) listStack += 0
                    if (tag.op == OpQuote) quoteDepth += 1
                    if (tag.op == OpPre) preDepth += 1
                  }
                case OpA => if (!selfClosing) linkDepth += 1
                case OpSkip =>
                  if (!selfClosing) {
                    skipDepth += 1; boilerDepth += 1
                    if (tag.endNeedle != null) {
                      // raw-text element: no markup inside; skip to its end tag
                      val closeAt = indexOfIgnoreCase(html, tag.endNeedle, i)
                      // the end-tag handler above will pop the depths
                      i = if (closeAt < 0) n else closeAt
                    }
                  }
                case _ => () // other inline tags: transparent
              }
            }
          }
        }
      }
    }
    closeCell()
    flush()
    // unclosed tables at EOF: close them innermost-first so buffered rows
    // (and their density verdicts) still emit in document order; a cell
    // suspended by a nested table is restored by popTable and must close
    // into its own row before ITS table closes
    while (tableStack.nonEmpty) {
      popTable()
      closeCell()
      inCell = false; inCaption = false
    }
    items.toVector
  }

  /** Parse a numeric span attribute (colspan/rowspan) per the HTML
    * non-negative-integer rules: leading digits parse, trailing garbage
    * is ignored ("5abc" → 5 and "99999abc" → max behave consistently);
    * clamped to [1, max] (HTML spec caps colspan at 1000, rowspan at
    * 65534; rowspan=0 "span to end of section" is simplified to 1);
    * absent / no leading digit → 1. */
  private def spanAttr(s: String, from: Int, until: Int, name: String, max: Int): Int = {
    val v = attrValue(s, from, until, name)
    if (v == null || v.isEmpty) return 1
    var n = 0
    var k = 0
    var sawDigit = false
    var stop = false
    while (k < v.length && !stop) {
      val c = v.charAt(k)
      if (c >= '0' && c <= '9') {
        sawDigit = true
        n = n * 10 + (c - '0')
        if (n > max) { n = max; stop = true }
      } else stop = true
      k += 1
    }
    if (sawDigit && n > 1) n else 1
  }

  // ---- tag interning + opcode dispatch ----------------------------------
  // The scanner classifies a few hundred tags per document; materializing a
  // lowercase String per tag is measurable allocation in the hot loop, and a
  // chain of string comparisons + Set hash lookups per tag is measurable
  // ALU. Both are folded into ONE table lookup: tags are interned through an
  // in-place case-insensitive hash to a TagInfo carrying the canonical name
  // plus a small-int OPCODE the scanner `match`es on (a tableswitch, not a
  // comparison chain). Unknown tags all behave identically (transparent
  // inline), so they resolve to one shared UnknownTag — no allocation at
  // all on the miss path. regionMatches guards against collisions.

  private[adapters] final class TagInfo(
      val name: String,
      val op: Int,
      val headingLevel: Int, // 1-6 for h1..h6, else 0
      val endNeedle: String) // "</script"/"</style" for raw-text elements

  // opcode constants (literal final vals -> @switch-able tableswitch)
  private final val OpOther = 0
  private final val OpA = 1
  private final val OpImg = 2
  private final val OpTd = 3
  private final val OpTh = 4
  private final val OpTr = 5
  private final val OpTable = 6
  private final val OpCaption = 7
  private final val OpLi = 8
  private final val OpUl = 9
  private final val OpOl = 10
  private final val OpQuote = 11
  private final val OpPre = 12
  private final val OpVoid = 13    // br, hr: flush only, no state
  private final val OpHeader = 14  // <header>: boiler + headerOnly depth
  private final val OpBoiler = 15  // nav, aside, footer, noscript
  private final val OpSkip = 16    // script, style, head: text fully dropped
  private final val OpHeading = 17 // h1..h6 (level in TagInfo)
  private final val OpBlock = 18   // generic block: flush + heading reset

  private def opFor(t: String): Int = t match {
    case "a" => OpA
    case "img" => OpImg
    case "td" => OpTd
    case "th" => OpTh
    case "tr" => OpTr
    case "table" => OpTable
    case "caption" => OpCaption
    case "li" => OpLi
    case "ul" => OpUl
    case "ol" => OpOl
    case "blockquote" => OpQuote
    case "pre" => OpPre
    case "br" | "hr" => OpVoid
    case "header" => OpHeader
    case "nav" | "aside" | "footer" | "noscript" => OpBoiler
    case "script" | "style" | "head" => OpSkip
    case _ if isHeading(t) => OpHeading
    case _ if BlockTags(t) => OpBlock
    case _ => OpOther
  }

  private def isHeading(t: String): Boolean =
    t.length == 2 && t.charAt(0) == 'h' && t.charAt(1) >= '1' && t.charAt(1) <= '6'

  private val UnknownTag = new TagInfo("", OpOther, 0, null)
  private def tagHash(s: CharSequence, from: Int, until: Int): Int = {
    var h = 0
    var i = from
    while (i < until) {
      val c0 = s.charAt(i)
      val c = if (c0 >= 'A' && c0 <= 'Z') (c0 + 32).toChar else c0
      h = h * 31 + c
      i += 1
    }
    h
  }

  private val internedTags: java.util.HashMap[Integer, TagInfo] = {
    val m = new java.util.HashMap[Integer, TagInfo]()
    val tags = Seq(
      "p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "div", "td", "th",
      "section", "article", "blockquote", "pre", "ul", "ol", "table", "tr",
      "nav", "aside", "footer", "header", "main", "figure", "figcaption",
      "body", "html", "form", "dl", "dt", "dd", "caption", "br", "hr",
      "script", "style", "head", "noscript", "a", "img",
      "em", "strong", "b", "i", "u", "s", "code", "span", "small", "sub",
      "sup", "mark", "abbr", "time", "label", "thead", "tbody", "tfoot")
    tags.foreach { t =>
      val h = Integer.valueOf(tagHash(t, 0, t.length))
      require(!m.containsKey(h) || m.get(h).name == t,
        s"tag hash collision: $t vs ${m.get(h).name}")
      m.put(h, new TagInfo(t, opFor(t),
        if (isHeading(t)) t.charAt(1) - '0' else 0,
        if (t == "script" || t == "style") "</" + t else null))
    }
    m
  }

  private def tagInfoAt(s: String, from: Int, until: Int): TagInfo = {
    if (until <= from) return UnknownTag
    val cand = internedTags.get(tagHash(s, from, until))
    if (cand != null && cand.name.length == until - from &&
        s.regionMatches(true, from, cand.name, 0, cand.name.length)) cand
    else UnknownTag
  }

  /** ASCII-lowercased substring (tag names are short; avoids Locale work). */
  private def lowerAscii(s: String, from: Int, until: Int): String = {
    if (until <= from) return ""
    val arr = new Array[Char](until - from)
    var i = from
    while (i < until) {
      val c = s.charAt(i)
      arr(i - from) = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
      i += 1
    }
    new String(arr)
  }

  /** Find one attribute's value inside a tag body [from, until) — only
    * called for `<img src=…>`; supports quoted, single-quoted and bare
    * values, case-insensitive names. */
  private def attrValue(s: String, from: Int, until: Int, want: String): String = {
    var i = from
    val end = math.min(until, s.length)
    while (i < end) {
      while (i < end && (Character.isWhitespace(s.charAt(i)) || s.charAt(i) == '/')) i += 1
      if (i >= end) return null
      val nameStart = i
      while (i < end && s.charAt(i) != '=' && !Character.isWhitespace(s.charAt(i))) i += 1
      val name = lowerAscii(s, nameStart, i)
      while (i < end && Character.isWhitespace(s.charAt(i))) i += 1
      var value: String = ""
      if (i < end && s.charAt(i) == '=') {
        i += 1
        while (i < end && Character.isWhitespace(s.charAt(i))) i += 1
        if (i < end && (s.charAt(i) == '"' || s.charAt(i) == '\'')) {
          val q = s.charAt(i); i += 1
          val vStart = i
          while (i < end && s.charAt(i) != q) i += 1
          value = s.substring(vStart, i)
          if (i < end) i += 1
        } else {
          val vStart = i
          while (i < end && !Character.isWhitespace(s.charAt(i))) i += 1
          value = s.substring(vStart, i)
        }
      }
      if (name == want) return value
    }
    null
  }

  private def indexOfIgnoreCase(hay: String, needle: String, from: Int): Int = {
    val n = needle.length
    val max = hay.length - n
    var i = math.max(from, 0)
    while (i <= max) {
      if (hay.regionMatches(true, i, needle, 0, n)) return i
      i += 1
    }
    -1
  }

  /** Minimal entity decoder for the entities our corpus (and common web
    * text) uses; unknown entities pass through literally. No-op (no copy)
    * when the string has no '&'. */
  private[adapters] def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i)
        if (semi > i && semi - i <= 10) {
          val ent = s.substring(i + 1, semi)
          def cpString(cp: Int): String =
            if (Character.isValidCodePoint(cp)) new String(Character.toChars(cp)) else null
          val rep = ent match {
            case "amp" => "&"
            case "lt" => "<"
            case "gt" => ">"
            case "quot" => "\""
            case "apos" => "'"
            case "nbsp" => " "
            case e if e.startsWith("#x") || e.startsWith("#X") =>
              try cpString(Integer.parseInt(e.drop(2), 16)) catch { case _: Exception => null }
            case e if e.startsWith("#") =>
              try cpString(Integer.parseInt(e.drop(1))) catch { case _: Exception => null }
            case _ => null
          }
          if (rep != null) { sb.append(rep); i = semi + 1 }
          else { sb.append(c); i += 1 }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Strip leading/trailing newlines only (pre-block trim: internal
    * whitespace is the content). */
  private def trimNewlines(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && (s.charAt(a) == '\n' || s.charAt(a) == '\r')) a += 1
    while (b > a && (s.charAt(b - 1) == '\n' || s.charAt(b - 1) == '\r')) b -= 1
    s.substring(a, b)
  }

  /** Entity decode + whitespace normalization fused into ONE pass over the
    * paragraph buffer (the hot path runs this per block; the two-pass
    * compose allocates an intermediate string per block). Semantics are
    * exactly normalizeWs(decodeEntities(s)) — decoded entities that expand
    * to whitespace (&nbsp;) collapse like literal whitespace. */
  private def normalizeDecode(buf: java.lang.StringBuilder): String = {
    val n = buf.length
    val out = new java.lang.StringBuilder(n)
    var lastWs = true
    var i = 0
    // ASCII > 0x20 is never java-whitespace; only <= ' ' and >= 0x80 need
    // the real check (NB:  is NOT whitespace — no `c <= ' '` shortcut)
    @inline def isWs(c: Char): Boolean =
      if (c > ' ' && c < 0x80) false else Character.isWhitespace(c)
    while (i < n) {
      val c = buf.charAt(i)
      if (c == '&') {
        // try to decode an entity at i
        var cp: Int = c
        var step = 1
        var semi = -1
        var j = i + 1
        val max = math.min(n, i + 12)
        while (semi < 0 && j < max) { if (buf.charAt(j) == ';') semi = j; j += 1 }
        if (semi > i) {
          val rep = decodeEntity(buf, i + 1, semi)
          if (rep >= 0) { cp = rep; step = semi - i + 1 }
        }
        if (Character.isWhitespace(cp)) { if (!lastWs) out.append(' '); lastWs = true }
        else { out.appendCodePoint(cp); lastWs = false } // surrogate-pair safe
        i += step
      } else if (isWs(c)) {
        if (!lastWs) out.append(' ')
        lastWs = true
        i += 1
      } else {
        // bulk run of plain chars: find the next special char, copy the
        // whole range at once (the hot path — most text is plain)
        var j = i + 1
        var stop = false
        while (j < n && !stop) {
          val d = buf.charAt(j)
          if (d == '&' || isWs(d)) stop = true else j += 1
        }
        out.append(buf, i, j)
        lastWs = false
        i = j
      }
    }
    if (out.length > 0 && out.charAt(out.length - 1) == ' ') out.setLength(out.length - 1)
    out.toString
  }

  /** Decode one entity name in buf[from, until) to a CODEPOINT (may be
    * supplementary-plane); -1 when unknown/invalid. */
  private def decodeEntity(buf: java.lang.StringBuilder, from: Int, until: Int): Int = {
    val len = until - from
    def is(s: String): Boolean =
      len == s.length && (0 until len).forall(k => buf.charAt(from + k) == s.charAt(k))
    if (is("amp")) '&'
    else if (is("lt")) '<'
    else if (is("gt")) '>'
    else if (is("quot")) '"'
    else if (is("apos")) '\''
    else if (is("nbsp")) ' '
    else if (len > 1 && buf.charAt(from) == '#') {
      try {
        val hex = buf.charAt(from + 1) == 'x' || buf.charAt(from + 1) == 'X'
        val s = buf.subSequence(from + (if (hex) 2 else 1), until).toString
        val cp = Integer.parseInt(s, if (hex) 16 else 10)
        if (Character.isValidCodePoint(cp)) cp else -1
      } catch { case _: Exception => -1 }
    } else -1
  }

}
