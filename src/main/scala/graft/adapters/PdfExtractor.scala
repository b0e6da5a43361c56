package graft.adapters

import graft.core.{Model, Span}
import scala.collection.mutable.ArrayBuffer

/** From-scratch PDF layout parse in the PDFBox text-position-clustering
  * style (public algorithm family; see PAPERS.md): the input span's `text`
  * carries a deterministic position encoding — one glyph run per line,
  * `page,x,y,run-text` with fixed-point integer coordinates (FIXTURES.md §2)
  * — and the extractor reconstructs reading order with NO reliance on input
  * line order:
  *
  *   1. parse runs; group by page (ascending);
  *   2. detect columns per page from the x distribution (largest x gap >
  *      `ColumnGap` splits the page into left/right columns);
  *   3. cluster runs into text lines by y proximity (± `YTol`) within a
  *      column; order runs within a line by x;
  *   4. cluster lines into blocks by vertical gap (> `BlockGap` starts a
  *      new paragraph block); order blocks by (column, y);
  *   5. page markdown = blocks joined by blank lines; document = pages
  *      combined exactly per the reference's ordered page re-combine
  *      (`_combine_pages`, reference: src/simple_ocr/adapters/
  *      deepseek_engine.py:336-358) — exercised via [[PageCombine]].
  *
  * This mirrors the reference's structural template — one document explodes
  * into N ordered page units, each extracted independently, then re-combined
  * in page order (deepseek_engine.py:135-163) — with the VLM page OCR
  * replaced by deterministic layout clustering (north rule).
  *
  * Emits one output span per page (kind=text, page markdown), preserving
  * page order; pages of one document never cross an executor boundary.
  *
  * Throughput notes (pdf is ~half the corpus CPU): ONE global sort by
  * (page, y, x, text) replaces the groupBy-page + per-column (y, x) sorts —
  * page slices and column filters preserve that order — and each page's
  * markdown is built in a single StringBuilder pass (runs append directly;
  * no intermediate line/block strings or tuple buffers). Within a line,
  * runs re-order by (x, text) ignoring the ±YTol y spread; lines are short,
  * so a stable insertion sort does it allocation-free.
  */
object PdfExtractor extends SpanExtractor {
  override val name = "pdf"

  private val ColumnGap = 1000 // min x gap separating two columns
  private val YTol = 5         // same-line y tolerance
  private val BlockGap = 100   // y gap starting a new block

  private final case class Run(page: Int, x: Int, y: Int, text: String)

  private val runOrder: java.util.Comparator[Run] = new java.util.Comparator[Run] {
    def compare(a: Run, b: Run): Int = {
      if (a.page != b.page) return Integer.compare(a.page, b.page)
      if (a.y != b.y) return Integer.compare(a.y, b.y)
      if (a.x != b.x) return Integer.compare(a.x, b.x)
      a.text.compareTo(b.text)
    }
  }

  override def extract(span: Span): Either[ExtractFailure, Vector[Span]] = {
    if (span.text == null || span.text.isEmpty)
      return Left(ExtractFailure("Failed to parse PDF layout: empty payload", "validation"))
    parseRuns(span.text) match {
      case Left(err) => Left(err)
      case Right(runs) =>
        java.util.Arrays.sort(runs, runOrder)
        val out = Vector.newBuilder[Span]
        var pageIdx = 0
        var i = 0
        while (i < runs.length) {
          var j = i
          val page = runs(i).page
          while (j < runs.length && runs(j).page == page) j += 1
          out += Span(Model.Kind.Text, layoutPage(runs, i, j), "", pageIdx)
          pageIdx += 1
          i = j
        }
        Right(out.result())
    }
  }

  /** Full combined markdown for a pdf payload (pages joined per the
    * reference's `_combine_pages`). */
  def extractCombined(span: Span): Either[ExtractFailure, String] =
    extract(span).map(spans => PageCombine.combinePages(spans.map(_.text)))

  /** In-place integer field parse over [from, until): tolerates
    * surrounding spaces, rejects anything else; Int.MinValue = malformed.
    * (PDF parsing is ~half the corpus CPU — no per-field substrings.) */
  private def parseIntField(s: String, from: Int, until: Int): Int = {
    var i = from
    var end = until
    while (i < end && s.charAt(i) == ' ') i += 1
    while (end > i && s.charAt(end - 1) == ' ') end -= 1
    if (i >= end) return Int.MinValue
    var neg = false
    if (s.charAt(i) == '-') { neg = true; i += 1; if (i >= end) return Int.MinValue }
    var v = 0
    while (i < end) {
      val c = s.charAt(i)
      if (c < '0' || c > '9' || v > 214748363) return Int.MinValue
      v = v * 10 + (c - '0')
      i += 1
    }
    if (neg) -v else v
  }

  private def parseRuns(payload: String): Either[ExtractFailure, Array[Run]] = {
    val out = ArrayBuffer.empty[Run]
    val n = payload.length
    var lineStart = 0
    var lineNo = 0
    while (lineStart < n) {
      // cooperative per-span budget (see graft.adapters.Deadline)
      if ((lineNo & 0xFFF) == 0) Deadline.check()
      var lineEnd = payload.indexOf('\n', lineStart)
      if (lineEnd < 0) lineEnd = n
      lineNo += 1
      if (lineEnd > lineStart) {
        // split on the first 3 commas only: run text may contain commas
        val c1 = payload.indexOf(',', lineStart)
        val c2 = if (c1 < 0 || c1 >= lineEnd) -1 else payload.indexOf(',', c1 + 1)
        val c3 = if (c2 < 0 || c2 >= lineEnd) -1 else payload.indexOf(',', c2 + 1)
        if (c3 < 0 || c3 >= lineEnd)
          return Left(ExtractFailure(s"Failed to parse PDF layout: malformed run at line $lineNo", "validation"))
        val page = parseIntField(payload, lineStart, c1)
        val x = parseIntField(payload, c1 + 1, c2)
        val y = parseIntField(payload, c2 + 1, c3)
        if (page == Int.MinValue || x == Int.MinValue || y == Int.MinValue)
          return Left(ExtractFailure(s"Failed to parse PDF layout: bad coordinates at line $lineNo", "validation"))
        out += Run(page, x, y, payload.substring(c3 + 1, lineEnd))
      }
      lineStart = lineEnd + 1
    }
    if (out.isEmpty) Left(ExtractFailure("Failed to parse PDF layout: no runs", "validation"))
    else Right(out.toArray)
  }

  /** Lay out one page (runs[from, until) sorted by (y, x, text)): detect
    * columns, then stream each column's blocks into one builder. */
  private def layoutPage(runs: Array[Run], from: Int, until: Int): String = {
    // column detection: largest gap in sorted x starts (duplicates only add
    // zero-gaps, so no distinct needed)
    val nRuns = until - from
    val xs = new Array[Int](nRuns)
    var i = from
    while (i < until) { xs(i - from) = runs(i).x; i += 1 }
    java.util.Arrays.sort(xs)
    var splitX = Int.MinValue // MinValue = single column
    if (nRuns >= 2) {
      var bestGap = 0
      i = 1
      while (i < nRuns) {
        val gap = xs(i) - xs(i - 1)
        if (gap > bestGap) { bestGap = gap; splitX = xs(i) }
        i += 1
      }
      if (bestGap <= ColumnGap) splitX = Int.MinValue
    }
    val sb = new java.lang.StringBuilder(64 * nRuns)
    if (splitX == Int.MinValue) columnInto(sb, runs, from, until, Int.MinValue, Int.MaxValue)
    else {
      columnInto(sb, runs, from, until, Int.MinValue, splitX)
      columnInto(sb, runs, from, until, splitX, Int.MaxValue)
    }
    sb.toString
  }

  // reusable per-line scratch (extract is called from a single thread per
  // task; ThreadLocal keeps executor threads isolated)
  private val lineScratch = new ThreadLocal[ArrayBuffer[Run]] {
    override def initialValue(): ArrayBuffer[Run] = new ArrayBuffer[Run](8)
  }

  /** Stream one column's lines/blocks into the page builder. Runs in
    * [from, until) with xLo <= x < xHi belong to this column; they arrive in
    * (y, x, text) order. Lines cluster at |y - anchorY| <= YTol (anchor =
    * first run's y); blocks split when the anchor gap exceeds BlockGap;
    * separators: ' ' within a line, '\n' between lines, "\n\n" between
    * blocks (and between columns, since block separation carries over). */
  private def columnInto(sb: java.lang.StringBuilder, runs: Array[Run],
      from: Int, until: Int, xLo: Int, xHi: Int): Unit = {
    val line = lineScratch.get()
    var anchorY = Int.MinValue // current line's anchor
    var prevAnchor = Int.MinValue // previous line's anchor (block gap test)
    var i = from

    def emitLine(): Unit = {
      if (line.isEmpty) return
      // block/line separator BEFORE this line's text; a column's first line
      // (prevAnchor unset, builder non-empty) starts a new block — columns
      // join as blocks, mirroring the old flatMap+mkString("\n\n")
      if (sb.length > 0) {
        if (prevAnchor == Int.MinValue || anchorY - prevAnchor > BlockGap) sb.append("\n\n")
        else sb.append('\n')
      }
      // stable insertion sort by (x, text): lines are 1-5 runs
      var a = 1
      while (a < line.length) {
        val r = line(a)
        var b = a - 1
        while (b >= 0 && (line(b).x > r.x || (line(b).x == r.x && line(b).text.compareTo(r.text) > 0))) {
          line(b + 1) = line(b); b -= 1
        }
        line(b + 1) = r
        a += 1
      }
      var k = 0
      while (k < line.length) {
        if (k > 0) sb.append(' ')
        sb.append(line(k).text)
        k += 1
      }
      prevAnchor = anchorY
      line.clear()
    }

    while (i < until) {
      val r = runs(i)
      if (r.x >= xLo && r.x < xHi) {
        if (line.isEmpty) anchorY = r.y
        else if (math.abs(r.y - anchorY) > YTol) {
          val nextAnchor = r.y
          emitLine()
          anchorY = nextAnchor
        }
        line += r
      }
      i += 1
    }
    emitLine()
  }
}
