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
  */
object PdfExtractor extends SpanExtractor {
  override val name = "pdf"

  private val ColumnGap = 1000 // min x gap separating two columns
  private val YTol = 5         // same-line y tolerance
  private val BlockGap = 100   // y gap starting a new block

  private final case class Run(page: Int, x: Int, y: Int, text: String)

  override def extract(span: Span): Either[ExtractFailure, Vector[Span]] = {
    if (span.text == null || span.text.isEmpty)
      return Left(ExtractFailure("Failed to parse PDF layout: empty payload", "validation"))
    parseRuns(span.text) match {
      case Left(err) => Left(err)
      case Right(runs) =>
        val pages = runs.groupBy(_.page).toSeq.sortBy(_._1).map { case (_, rs) => layoutPage(rs) }
        Right(pages.zipWithIndex.map { case (md, i) => Span(Model.Kind.Text, md, "", i) }.toVector)
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

  private def parseRuns(payload: String): Either[ExtractFailure, Vector[Run]] = {
    val out = ArrayBuffer.empty[Run]
    val n = payload.length
    var lineStart = 0
    var lineNo = 0
    while (lineStart < n) {
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
    else Right(out.toVector)
  }

  private def layoutPage(runs: Seq[Run]): String = {
    // column detection: largest gap in sorted distinct x starts
    val xs = runs.map(_.x).distinct.sorted
    val splitX: Option[Int] =
      if (xs.length < 2) None
      else {
        var bestGap = 0; var bestAt = -1
        var i = 1
        while (i < xs.length) {
          val gap = xs(i) - xs(i - 1)
          if (gap > bestGap) { bestGap = gap; bestAt = xs(i) }
          i += 1
        }
        if (bestGap > ColumnGap) Some(bestAt) else None
      }
    val columns: Seq[Seq[Run]] = splitX match {
      case Some(sx) => Seq(runs.filter(_.x < sx), runs.filter(_.x >= sx))
      case None => Seq(runs)
    }
    val blocks = columns.flatMap(columnBlocks)
    blocks.mkString("\n\n")
  }

  /** Cluster one column's runs into lines (by y) then blocks (by y gap). */
  private def columnBlocks(runs: Seq[Run]): Seq[String] = {
    if (runs.isEmpty) return Nil
    // lines: sort by y, new line when y jumps more than YTol
    // (sortWith avoids a boxed tuple per comparison in the hot path)
    val sorted = runs.sortWith((a, b) => a.y < b.y || (a.y == b.y && a.x < b.x))
    val lines = ArrayBuffer.empty[(Int, ArrayBuffer[Run])] // (anchorY, runs)
    sorted.foreach { r =>
      if (lines.nonEmpty && math.abs(r.y - lines.last._1) <= YTol) lines.last._2 += r
      else lines += ((r.y, ArrayBuffer(r)))
    }
    val lineTexts = lines.map { case (y, rs) =>
      (y, rs.sortWith((a, b) => a.x < b.x || (a.x == b.x && a.text < b.text))
        .map(_.text).mkString(" "))
    }
    // blocks: split where the vertical gap exceeds BlockGap
    val blocks = ArrayBuffer.empty[ArrayBuffer[String]]
    var prevY = Int.MinValue
    lineTexts.foreach { case (y, text) =>
      if (blocks.isEmpty || (prevY != Int.MinValue && y - prevY > BlockGap)) blocks += ArrayBuffer(text)
      else blocks.last += text
      prevY = y
    }
    blocks.map(_.mkString("\n")).toSeq
  }
}
