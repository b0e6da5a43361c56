package graft

import graft.adapters.Dispatch
import graft.core.{Doc, Lcg, Span}
import org.scalatest.funsuite.AnyFunSuite

/** Hostile-input robustness: at corpus scale the extractor sees every kind
  * of garbage; the contract is the reference's — a bad document produces a
  * failed ROW (or degraded output), never a thrown task error
  * (tests/integration/test_pipeline.py:140-215). Seeded fuzz over raw
  * bytes-ish strings, pathological markup, and truncations. */
class FuzzSpec extends AnyFunSuite {

  private def randomString(r: Lcg, n: Int): String = {
    val sb = new StringBuilder(n)
    (0 until n).foreach { _ =>
      val c = r.nextInt(96)
      sb.append(if (c < 94) (32 + c).toChar else if (c == 94) '\n' else 'é')
    }
    sb.toString
  }

  test("random garbage payloads never throw, for every kind") {
    val r = new Lcg(0xfedcba98L)
    val kinds = Vector("html", "pdf", "mock", "text", "image", "docx", "weird/kind", "")
    (0 until 3000).foreach { i =>
      val kind = kinds(r.nextInt(kinds.length))
      val payload = randomString(r, r.nextInt(400))
      val mediaRef = if (r.chance(30)) "media://" + r.hex(8) else ""
      val doc = Doc(s"fuzz-$i", Vector(Span(kind, payload, mediaRef, 0)))
      val out = Dispatch.extractDoc(doc) // must not throw
      assert(out.status == "completed" || out.status == "failed")
      if (out.status == "failed") assert(out.error.nonEmpty && out.spans.isEmpty)
    }
  }

  test("pathological html: unclosed tags, nested quotes, truncated entities, deep nesting") {
    val cases = Seq(
      "<p>unclosed paragraph with plenty of text to pass the length threshold here",
      "<div><div><div><div><div><div><div><div>deeply nested but long enough content text",
      "<a href=\"unterminated quote>link text</a><p>following paragraph with enough length to keep</p>",
      "<p>truncated entity &am and &#xZZ; and &unknown; inside a long enough paragraph body</p>",
      "<script>never closed script body <p>hidden</p>",
      "<style>p { color: red; }",
      "<img src=>no source<img>no attrs<img src='x'>",
      "<<>><p></p><><p>some real content text that is long enough to survive filters</p>",
      "<!-- unterminated comment <p>invisible</p>",
      "<p>" + ("x" * 100000) + "</p>",
      "<h1></h1><h2>ok heading</h2>",
      "<p>&#60;escaped tag&#62; inside a paragraph long enough to be kept by density rules</p>")
    cases.foreach { html =>
      val out = Dispatch.extractDoc(Doc("p", Vector(Span("html", html, "", 0))))
      assert(out.status == "completed", s"should degrade, not fail: ${out.error}")
    }
  }

  test("pathological tables: misnesting, huge span attributes, deep nesting, orphan cells") {
    val deep = ("<table><tr><td>" * 500) + "innermost cell text" + ("</td></tr></table>" * 500)
    val cases = Seq(
      // misnested close order: </tr> before </td>, </table> inside a cell
      "<table><tr><td>a</tr></td><td>b</td></table>",
      "<table><tr><td>cell<table></tr></td>inner stray</table>rest</table>",
      // adversarial span attributes: the MaxCols cap must bound padding
      "<table><tr><td colspan=\"999999999\">wide</td></tr></table>",
      "<table><tr><td rowspan=\"999999999\">tall</td><td>x</td></tr><tr><td>y</td></tr></table>",
      "<table><tr><td colspan=\"1000\" rowspan=\"65534\">max rect</td></tr><tr><td>n</td></tr></table>",
      "<table><tr><td colspan=\"-3\">negative</td><td colspan=\"abc\">junk</td></tr></table>",
      // orphan table parts outside any table
      "<td>orphan cell</td><tr>orphan row</tr></table><caption>orphan caption</caption>",
      // header-only, cells-only, caption-only tables
      "<table><tr><th>h1</th><th>h2</th></tr></table>",
      "<table><caption>only a caption</caption></table>",
      "<table></table><p>a paragraph long enough to pass the length threshold rules</p>",
      // 500-deep table nesting (context stack growth, linearized unwind)
      deep)
    cases.foreach { html =>
      val out = Dispatch.extractDoc(Doc("p", Vector(Span("html", html, "", 0))))
      assert(out.status == "completed", s"should degrade, not fail: ${out.error}")
    }
    // the deep nesting case must keep the innermost content
    val deepOut = Dispatch.extractDoc(Doc("p", Vector(Span("html", deep, "", 0))))
    assert(deepOut.spans.exists(_.text.contains("innermost cell text")))
    // the capped-colspan row must not materialize a billion cells
    val wide = Dispatch.extractDoc(Doc("p", Vector(
      Span("html", "<table><tr><td colspan=\"999999999\">wide</td></tr></table>", "", 0))))
    assert(wide.spans.forall(_.text.length < 100000))
  }

  test("pathological pdf encodings fail as validation rows with line context") {
    val cases = Seq("no commas at all", "1,2", "1,2,3", "a,b,c,text", "1,,3,text",
      "9999999999999999999,1,1,x")
    cases.foreach { payload =>
      val out = Dispatch.extractDoc(Doc("p", Vector(Span("pdf", payload, "", 0))))
      assert(out.status == "failed" && out.error_type == "validation", payload)
    }
    // but a well-formed run with commas INSIDE the text survives
    val ok = Dispatch.extractDoc(Doc("p", Vector(Span("pdf", "0,100,100,a, b, c", "", 0))))
    assert(ok.status == "completed" && ok.spans.head.text == "a, b, c")
  }

  test("unclosed heading closes implicitly at the next block (regression)") {
    val html = "<h2>Title<p>Some long paragraph body with a <a href=x>link</a> " +
      "and plenty of additional text to pass thresholds.</p>"
    val out = Dispatch.extractDoc(Doc("h", Vector(Span("html", html, "", 0))))
    val texts = out.spans.map(_.text)
    assert(texts.head == "## Title", texts)
    assert(texts.exists(_.startsWith("Some long paragraph body")),
      s"paragraph after unclosed heading must survive as text: $texts")
  }

  test("supplementary-plane character references decode to real codepoints (regression)") {
    val html = "<p>Great result &#128512; everyone agreed this was fine today indeed.</p>" +
      "<pre>code &#x1F680; launch</pre>"
    val out = Dispatch.extractDoc(Doc("e", Vector(Span("html", html, "", 0))))
    assert(out.spans.exists(_.text.contains("😀")), out.spans.map(_.text))
    assert(out.spans.exists(_.text.contains("🚀")), out.spans.map(_.text))
    // invalid numeric refs pass through literally, never corrupt
    val bad = Dispatch.extractDoc(Doc("b", Vector(Span("html",
      "<p>broken ref &#99999999999; stays literal in this long enough text.</p>", "", 0))))
    assert(bad.spans.head.text.contains("&#99999999999;"))
  }

  test("mixed doc with one bad span fails the whole doc (reference job granularity)") {
    val doc = Doc("m", Vector(
      Span("text", "fine", "", 0),
      Span("pdf", "garbage payload", "", 1),
      Span("image", "", "media://ok", 2)))
    val out = Dispatch.extractDoc(doc)
    assert(out.status == "failed" && out.spans.isEmpty)
  }

  test("per-span timeout: a pathological span becomes a failed row, never a hung task") {
    import graft.adapters.ExtractLimits
    // ~1M tags of adversarial markup; a 1 ms budget must trip the
    // cooperative deadline long before the scan finishes
    val hostile = "<p>x</p>" * 500000
    val doc = Doc("slow", Vector(Span("html", hostile, "", 0)))
    val t0 = System.nanoTime()
    val out = Dispatch.extractDoc(doc,
      ExtractLimits(maxPayloadBytes = 64L * 1024 * 1024, timeoutMs = 1L))
    val elapsedMs = (System.nanoTime() - t0) / 1000000L
    assert(out.status == "failed")
    assert(out.error_type == "timeout", out.error)
    assert(out.error.contains("timeout"), out.error)
    assert(out.spans.isEmpty)
    assert(out.metadata == Map("error_type" -> "timeout"))
    assert(elapsedMs < 5000, s"deadline should cut work off promptly, took ${elapsedMs}ms")
    // the same doc completes with the default 30 s budget
    val ok = Dispatch.extractDoc(doc, ExtractLimits(maxPayloadBytes = 64L * 1024 * 1024))
    assert(ok.status == "completed")
  }

  test("payload cap: an oversized span fails as a validation row before any extraction") {
    import graft.adapters.ExtractLimits
    val big = "word " * 300 // 1500 chars
    val doc = Doc("big", Vector(Span("html", big, "", 0)))
    val out = Dispatch.extractDoc(doc, ExtractLimits(maxPayloadBytes = 1024L, timeoutMs = 0L))
    assert(out.status == "failed")
    assert(out.error_type == "validation")
    assert(out.error.contains("exceeds maximum"), out.error)
    // multi-byte payloads are measured in UTF-8 bytes, not chars
    val multi = "é" * 600 // 600 chars, 1200 UTF-8 bytes
    val out2 = Dispatch.extractDoc(Doc("mb", Vector(Span("text", multi, "", 0))),
      ExtractLimits(maxPayloadBytes = 1024L, timeoutMs = 0L))
    assert(out2.status == "failed" && out2.error.contains("1200 bytes"), out2.error)
    // under the cap: unchanged behavior
    val ok = Dispatch.extractDoc(doc, ExtractLimits(maxPayloadBytes = 1024L * 1024, timeoutMs = 0L))
    assert(ok.status == "completed")
  }
}
