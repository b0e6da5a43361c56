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

  private def parseRuns(payload: String): Either[ExtractFailure, Vector[Run]] = {
    val out = ArrayBuffer.empty[Run]
    val it = payload.linesIterator
    var lineNo = 0
    while (it.hasNext) {
      val line = it.next(); lineNo += 1
      if (line.nonEmpty) {
        // split on the first 3 commas only: run text may contain commas
        val c1 = line.indexOf(',')
        val c2 = if (c1 < 0) -1 else line.indexOf(',', c1 + 1)
        val c3 = if (c2 < 0) -1 else line.indexOf(',', c2 + 1)
        if (c3 < 0)
          return Left(ExtractFailure(s"Failed to parse PDF layout: malformed run at line $lineNo", "validation"))
        try {
          out += Run(
            line.substring(0, c1).trim.toInt,
            line.substring(c1 + 1, c2).trim.toInt,
            line.substring(c2 + 1, c3).trim.toInt,
            line.substring(c3 + 1))
        } catch {
          case _: NumberFormatException =>
            return Left(ExtractFailure(s"Failed to parse PDF layout: bad coordinates at line $lineNo", "validation"))
        }
      }
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
    val sorted = runs.sortBy(r => (r.y, r.x))
    val lines = ArrayBuffer.empty[(Int, ArrayBuffer[Run])] // (anchorY, runs)
    sorted.foreach { r =>
      if (lines.nonEmpty && math.abs(r.y - lines.last._1) <= YTol) lines.last._2 += r
      else lines += ((r.y, ArrayBuffer(r)))
    }
    val lineTexts = lines.map { case (y, rs) => (y, rs.sortBy(r => (r.x, r.text)).map(_.text).mkString(" ")) }
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
