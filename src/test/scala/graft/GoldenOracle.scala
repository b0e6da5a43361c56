package graft

import graft.core._

/** Separately-coded oracle of the reference extraction semantics
  * (FIXTURES.md §3): consumes the generator's structured PLAN (never the
  * rendered HTML/PDF payload) and produces the expected normalized span
  * sequence. `Dispatch.extractDoc(Fixtures.render(plan))` must equal
  * `GoldenOracle.expected(plan)` under strict (kind, text, media_ref,
  * order) equality — the north rule's per-row invariant.
  */
object GoldenOracle {

  /** Left((errorMessage, errorType)) for failure docs, Right(spans) else. */
  def expected(p: DocPlan): Either[(String, String), Vector[Span]] = p match {
    case HtmlDocPlan(_, parts) =>
      val spans = parts.flatMap {
        case Heading(level, text) => Seq(("text", ("#" * level) + " " + text, ""))
        case Para(text) => Seq(("text", text, ""))
        case Img(ref) => Seq(("image", "", ref))
        case Bullets(items) => items.map(it => ("text", "- " + it, ""))
        case Numbered(items) => items.zipWithIndex.map { case (it, i) => ("text", s"${i + 1}. " + it, "") }
        case Quote(text) => Seq(("text", "> " + text, ""))
        case CodeBlock(lines) => Seq(("text", "```\n" + lines.mkString("\n") + "\n```", ""))
        case TablePart(headers, rows) =>
          Seq(("text", "| " + headers.mkString(" | ") + " |", ""),
              ("text", "|" + (" --- |" * headers.length), "")) ++
            rows.map(row => ("text", "| " + row.mkString(" | ") + " |", ""))
        case SpanTable(headers, rows) =>
          // colspan=k flattens to the cell followed by k-1 empty cells
          Seq(("text", "| " + headers.mkString(" | ") + " |", ""),
              ("text", "|" + (" --- |" * headers.length), "")) ++
            rows.map { row =>
              val cells = row.flatMap { case (c, cs) => c +: Seq.fill(cs - 1)("") }
              ("text", "| " + cells.mkString(" | ") + " |", "")
            }
        case LinkGridTable(_) => Seq.empty // pure-link rows: dropped by link density
        case RowSpanTable(headers, spanCell, rows) =>
          // rowspan=k leaves an empty leading fill cell in rows 2..k
          Seq(("text", "| " + headers.mkString(" | ") + " |", ""),
              ("text", "|" + (" --- |" * headers.length), "")) ++
            rows.zipWithIndex.map { case (row, i) =>
              val cells = (if (i == 0) spanCell else "") +: row
              ("text", "| " + cells.mkString(" | ") + " |", "")
            }
        case NestedTablePart(headers, leftCell, before, innerRows, after) =>
          // inner table linearizes before its containing row; the cell
          // keeps its direct text from both sides of the inner table
          Seq(("text", "| " + headers.mkString(" | ") + " |", ""),
              ("text", "|" + (" --- |" * headers.length), "")) ++
            innerRows.map(row => ("text", "| " + row.mkString(" | ") + " |", "")) :+
            ("text", s"| $leftCell | $before $after |", "")
        case LinkFarmTable(_, _) =>
          Seq.empty // whole-table link-density aggregate kills everything
        case CaptionedTable(caption, headers, rows) =>
          Seq(("text", caption, ""),
              ("text", "| " + headers.mkString(" | ") + " |", ""),
              ("text", "|" + (" --- |" * headers.length), "")) ++
            rows.map(row => ("text", "| " + row.mkString(" | ") + " |", ""))
        case _ => Seq.empty
      }
      Right(number(spans.toVector))

    case PdfDocPlan(_, pages) =>
      val spans = pages.map { page =>
        val blocks = page.columns.flatten.map(_.lines.mkString("\n"))
        ("text", blocks.mkString("\n\n"), "")
      }
      Right(number(spans.toVector))

    case MediaDocPlan(_, refs) =>
      Right(number(refs.map(r => ("image", "", r)).toVector))

    case MixedDocPlan(_, items) =>
      Right(number(items.map {
        case Left(text) => ("text", text, "")
        case Right(ref) => ("image", "", ref)
      }.toVector))

    case MockDocPlan(_, mime, size) =>
      Right(Vector(Span("text", mockMarkdown(mime, size), "", 0)))

    case UnsupportedDocPlan(_, kind) =>
      Left((s"${kind.toUpperCase(java.util.Locale.ROOT)} processing not yet implemented", "validation"))

    case CorruptImageDocPlan(_) =>
      Left(("Failed to load image: empty media_ref (kind=image)", "validation"))
  }

  private def number(xs: Vector[(String, String, String)]): Vector[Span] =
    xs.zipWithIndex.map { case ((k, t, m), i) => Span(k, t, m, i) }

  /** Independent transcription of the reference mock engine's output
    * (reference src/simple_ocr/adapters/mock_engine.py:123-224), written
    * directly from the Python — NOT from graft.adapters.Mock — so template
    * drift is caught. Timestamp pinned per FIXTURES.md §3. */
  private def mockMarkdown(mime: String, size: Long): String = {
    val isImage = Set("image/jpeg", "image/jpg", "image/png", "image/tiff",
      "image/bmp", "image/webp", "image/gif")(mime.toLowerCase(java.util.Locale.ROOT))
    val pages: Long =
      if (isImage) 1L
      else if (mime.contains("pdf")) math.max(1L, size / 51200L)
      else if (mime.contains("docx") || mime.contains("pptx")) math.max(1L, size / 30720L)
      else 1L
    val contentType = if (isImage) "image" else "document"
    def human(sz: Long): String = {
      var s = sz.toDouble
      for (u <- Seq("B", "KB", "MB", "GB")) {
        if (s < 1024.0)
          return new java.math.BigDecimal(s).setScale(1, java.math.RoundingMode.HALF_EVEN).toPlainString + " " + u
        s /= 1024.0
      }
      new java.math.BigDecimal(s).setScale(1, java.math.RoundingMode.HALF_EVEN).toPlainString + " TB"
    }
    // exactly the Python structure: a list of lines joined by "\n"
    // (mock_engine.py:169-206)
    val lines = scala.collection.mutable.Buffer[String](
      "# Mock OCR Result",
      "",
      "This is a mock OCR result generated by MockOCREngine.",
      "",
      "## Document Information",
      "",
      s"- **Type**: $contentType",
      s"- **MIME Type**: $mime",
      s"- **Size**: ${human(size)}",
      s"- **Pages**: $pages",
      "- **Processed**: 2025-01-01T00:00:00+00:00",
      "")
    var p = 1L
    while (p <= pages) {
      if (pages > 1) { lines += s"## Page $p"; lines += "" }
      lines += "Lorem ipsum dolor sit amet, consectetur adipiscing elit. " +
        "Sed do eiusmod tempor incididunt ut labore et dolore magna aliqua."
      lines += ""
      lines += s"### Section $p.1"
      lines += ""
      lines += "Ut enim ad minim veniam, quis nostrud exercitation ullamco " +
        "laboris nisi ut aliquip ex ea commodo consequat."
      lines += ""
      lines += s"### Section $p.2"
      lines += ""
      lines += "Duis aute irure dolor in reprehenderit in voluptate velit " +
        "esse cillum dolore eu fugiat nulla pariatur."
      lines += ""
      if (p < pages) lines += "---\n"
      p += 1L
    }
    lines.mkString("\n")
  }

  /** Combined expected markdown for a pdf plan (page combine semantics of
    * reference deepseek_engine.py:336-358) — coded independently of
    * PageCombine: join with explicit separators. */
  def expectedPdfMarkdown(pages: Seq[String]): String =
    if (pages.length == 1) pages.head
    else pages.zipWithIndex.map { case (md, i) =>
      if (i == 0) md else "\n\n---\n\n" + s"<!-- Page ${i + 1} -->\n\n" + md
    }.mkString("")
}
