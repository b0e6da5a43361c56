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
      val spans = parts.collect {
        case Heading(level, text) => ("text", ("#" * level) + " " + text, "")
        case Para(text) => ("text", text, "")
        case Img(ref) => ("image", "", ref)
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

    case UnsupportedDocPlan(_, kind) =>
      Left((s"${kind.toUpperCase} processing not yet implemented", "validation"))

    case CorruptImageDocPlan(_) =>
      Left(("Failed to load image: empty media_ref (kind=image)", "validation"))
  }

  private def number(xs: Vector[(String, String, String)]): Vector[Span] =
    xs.zipWithIndex.map { case ((k, t, m), i) => Span(k, t, m, i) }

  /** Combined expected markdown for a pdf plan (page combine semantics of
    * reference deepseek_engine.py:336-358) — coded independently of
    * PageCombine: join with explicit separators. */
  def expectedPdfMarkdown(pages: Seq[String]): String =
    if (pages.length == 1) pages.head
    else pages.zipWithIndex.map { case (md, i) =>
      if (i == 0) md else "\n\n---\n\n" + s"<!-- Page ${i + 1} -->\n\n" + md
    }.mkString("")
}
