package graft

import graft.adapters.Dispatch
import graft.core._
import org.scalatest.funsuite.AnyFunSuite

/** The north-rule invariant, without Spark in the loop: for every fixture
  * plan, extractor(render(plan)) must equal oracle(plan) under strict
  * (kind, text, media_ref, order) span-sequence equality; failure docs must
  * produce failed rows with the reference's error messages. */
class ExtractorGoldenSpec extends AnyFunSuite {

  private val N = 2000

  test(s"span-sequence equality over $N fixture docs (all classes)") {
    var htmlN, pdfN, mediaN, mixedN, mockN, failN = 0
    (0L until N.toLong).foreach { idx =>
      val plan = Fixtures.plan(idx)
      val doc = Fixtures.render(plan)
      val got = Dispatch.extractDoc(doc)
      GoldenOracle.expected(plan) match {
        case Right(spans) =>
          assert(got.status == Model.Completed, s"doc ${plan.docId}: ${got.error}")
          assert(got.spans == spans,
            s"doc ${plan.docId} (${plan.getClass.getSimpleName}) span mismatch:\n got=${got.spans.take(4)}\n exp=${spans.take(4)}")
          assert(got.span_count == spans.length)
        case Left((msg, errType)) =>
          assert(got.status == Model.Failed, s"doc ${plan.docId} should fail")
          assert(got.error == msg, s"doc ${plan.docId}: got '${got.error}' want '$msg'")
          assert(got.error_type == errType)
          assert(got.spans.isEmpty)
      }
      plan match {
        case _: HtmlDocPlan => htmlN += 1
        case _: PdfDocPlan => pdfN += 1
        case _: MediaDocPlan => mediaN += 1
        case _: MixedDocPlan => mixedN += 1
        case _: MockDocPlan => mockN += 1
        case _ => failN += 1
      }
    }
    // the corpus must actually exercise every class
    assert(htmlN > 100, s"html docs: $htmlN")
    assert(pdfN > 100, s"pdf docs: $pdfN")
    assert(mediaN > 50, s"media docs: $mediaN")
    assert(mixedN > 20, s"mixed docs: $mixedN")
    assert(mockN > 20, s"mock docs: $mockN")
    assert(failN > 0, s"failure docs: $failN")
  }

  test("extraction is deterministic and idempotent") {
    (0L until 50L).foreach { idx =>
      val d1 = Dispatch.extractDoc(Fixtures.doc(idx))
      val d2 = Dispatch.extractDoc(Fixtures.doc(idx))
      assert(d1.copy(processing_time_ms = 0) == d2.copy(processing_time_ms = 0))
    }
  }

  test("span order is recovered from scrambled input offsets") {
    // shuffle the input span order of a mixed doc; offsets still encode order
    val plan = (0L until 500L).map(Fixtures.plan(_)).collectFirst {
      case p: MixedDocPlan if p.items.length >= 4 => p
    }.get
    val doc = Fixtures.render(plan)
    val scrambled = doc.copy(spans = doc.spans.reverse)
    val got = Dispatch.extractDoc(scrambled)
    assert(Right(got.spans) == GoldenOracle.expected(plan))
  }

  test("pdf combined markdown matches independently-coded page combine") {
    val plan = (0L until 200L).map(Fixtures.plan(_)).collectFirst {
      case p: PdfDocPlan if p.pages.length >= 3 => p
    }.get
    val got = Dispatch.extractDoc(Fixtures.render(plan))
    val pageTexts = got.spans.map(_.text)
    assert(Dispatch.combinedPdfMarkdown(got.spans) == GoldenOracle.expectedPdfMarkdown(pageTexts))
    assert(Dispatch.combinedPdfMarkdown(got.spans).contains("<!-- Page 2 -->"))
  }

  test("dispatch truth table (ocr_service.py:224-244, test_pipeline.py:283-296)") {
    Seq("image/jpeg", "image/png", "image/tiff", "image/bmp", "image/webp", "image/gif", "image/jpg")
      .foreach { k =>
        assert(Dispatch.adapterFor(k).map(_.name) == Right("media"), k)
      }
    assert(Dispatch.adapterFor("pdf").map(_.name) == Right("pdf"))
    assert(Dispatch.adapterFor("application/pdf").map(_.name) == Right("pdf"))
    assert(Dispatch.adapterFor("html").map(_.name) == Right("html"))
    assert(Dispatch.adapterFor("text").map(_.name) == Right("text"))
    assert(Dispatch.adapterFor("docx").left.map(_.message) == Left("DOCX processing not yet implemented"))
    assert(Dispatch.adapterFor("pptx").left.map(_.message) == Left("PPTX processing not yet implemented"))
    assert(Dispatch.adapterFor("xlsx").left.map(_.message) == Left("XLSX processing not yet implemented"))
    assert(Dispatch.adapterFor("weird/thing").isLeft)
  }

  test("colspan cells pad empty markdown columns; link-grid rows die by density") {
    // crafted directly (not via fixtures) so the expectation is independent
    val html =
      """<table>
        |  <tr><th>a</th><th>b</th><th>c</th></tr>
        |  <tr><td colspan="2">wide</td><td>x</td></tr>
        |  <tr><td>y</td><td colspan='2'>tail</td></tr>
        |</table>
        |<table>
        |  <tr><td><a href="/h">Home</a></td><td><a href="/a">About</a></td></tr>
        |</table>
        |<p>This paragraph is long enough to be kept as real content here.</p>
        |""".stripMargin
    val got = graft.adapters.HtmlExtractor.extract(Span("html", html, "", 0)).toOption.get
    assert(got.map(_.text) == Vector(
      "| a | b | c |",
      "| --- | --- | --- |",
      "| wide |  | x |",
      "| y | tail |  |",
      "This paragraph is long enough to be kept as real content here."))
    // fixture corpus must actually exercise both new parts
    val parts = (0L until 2000L).map(Fixtures.plan(_)).collect {
      case p: HtmlDocPlan => p.parts
    }.flatten
    assert(parts.exists(_.isInstanceOf[SpanTable]), "corpus lacks SpanTable docs")
    assert(parts.exists(_.isInstanceOf[LinkGridTable]), "corpus lacks LinkGridTable docs")
  }

  test("media-heavy skew docs exist and pass through in order") {
    val heavy = (0L until 2000L).map(Fixtures.plan(_)).collect {
      case p: MediaDocPlan if p.refs.length >= 50 => p
    }
    assert(heavy.nonEmpty, "skew knob must produce media-heavy docs")
    val got = Dispatch.extractDoc(Fixtures.render(heavy.head))
    assert(got.spans.map(_.media_ref) == heavy.head.refs)
  }
}
