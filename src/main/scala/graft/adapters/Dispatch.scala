package graft.adapters

import graft.core.{Doc, ExtractedDoc, Model, Span}
import scala.collection.mutable.ArrayBuffer

/** Deterministic media_ref passthrough — the north rule's re-expression of
  * the reference's OCR adapter stubs: a media span survives extraction with
  * its reference intact and its position preserved, the way the mock engine
  * acknowledges an image without decoding it (reference:
  * src/simple_ocr/adapters/mock_engine.py:27-62). A media span with an empty
  * `media_ref` is the analog of an unloadable image and is a permanent
  * validation failure ("Failed to load image", deepseek_engine.py:213-234,
  * tested at tests/unit/test_ocr_adapters.py:362-371). */
object MediaPassthrough extends SpanExtractor {
  override val name = "media"
  override def extract(span: Span): Either[ExtractFailure, Vector[Span]] =
    if (span.media_ref == null || span.media_ref.isEmpty)
      Left(ExtractFailure(s"Failed to load image: empty media_ref (kind=${span.kind})", "validation"))
    else Right(Vector(Span(Model.Kind.Image, "", span.media_ref, 0)))
}

/** The reference's mock OCR engine as a pipeline adapter: payload
  * `"<mime>|<size_bytes>"` dispatches image-vs-document exactly like
  * `OCRService` (P1, ocr_service.py:85-101) and renders the byte-exact
  * mock markdown template with the estimator-driven page count
  * (mock_engine.py:27-141). The template's `Processed:` timestamp is the
  * reference's one nondeterministic field — pinned to a constant, which
  * is precisely what its fixtures do (FIXTURES.md §3). */
object MockAdapter extends SpanExtractor {
  override val name = "mock"
  val PinnedTimestamp = "2025-01-01T00:00:00+00:00"
  override def extract(span: Span): Either[ExtractFailure, Vector[Span]] = {
    val sep = if (span.text == null) -1 else span.text.lastIndexOf('|')
    if (sep <= 0)
      return Left(ExtractFailure("Failed to parse mock payload: want '<mime>|<size_bytes>'", "validation"))
    val mime = span.text.substring(0, sep)
    val size = try span.text.substring(sep + 1).toLong catch {
      case _: NumberFormatException =>
        return Left(ExtractFailure("Failed to parse mock payload: bad size", "validation"))
    }
    val isImage = Dispatch.imageKinds(mime.toLowerCase(java.util.Locale.ROOT))
    val md =
      if (isImage)
        Mock.generateMockMarkdown("image", mime, size, 1L, PinnedTimestamp)
      else
        Mock.generateMockMarkdown("document", mime, size,
          Mock.estimatePageCount(mime, size), PinnedTimestamp)
    Right(Vector(Span(Model.Kind.Text, md, "", 0)))
  }

  /** The reference mock engine's response metadata
    * (mock_engine.py:56-61,101-107): engine/mime_type/size_bytes (+
    * page_count for documents); `processed_at` — its one nondeterministic
    * field — is pinned exactly as the template timestamp is. */
  override def metadata(span: Span): Map[String, String] = {
    val sep = if (span.text == null) -1 else span.text.lastIndexOf('|')
    if (sep <= 0) return Map.empty
    val mime = span.text.substring(0, sep)
    val size = try span.text.substring(sep + 1).toLong catch {
      case _: NumberFormatException => return Map.empty
    }
    val base = Map(
      "engine" -> "mock",
      "mime_type" -> mime,
      "size_bytes" -> size.toString,
      "processed_at" -> PinnedTimestamp)
    if (Dispatch.imageKinds(mime.toLowerCase(java.util.Locale.ROOT))) base
    else base + ("page_count" -> Mock.estimatePageCount(mime, size).toString)
  }
}

/** Plain text spans pass through verbatim (whitespace-normalized), keeping
  * reading order. */
object TextPassthrough extends SpanExtractor {
  override val name = "text"
  override def extract(span: Span): Either[ExtractFailure, Vector[Span]] =
    Right(Vector(Span(Model.Kind.Text, span.text, "", 0)))
}

/** Content-type dispatch + per-document assembly — the Spark analog of
  * `OCRService.process_job` steps 2-3 and `_is_image_mime_type`
  * (reference: src/simple_ocr/services/ocr_service.py:85-101,224-244) plus
  * the document-path sub-dispatch with its explicit docx/pptx/xlsx
  * rejections (adapters/deepseek_engine.py:236-266).
  *
  * Spans are processed strictly in `offset` order (sorted deterministically
  * here, never relying on array order surviving an exchange — SURVEY.md
  * §7.4d); output offsets are renumbered 0..n-1 over the concatenated
  * outputs. A failing span fails the whole document — the reference's job
  * granularity (one job == one document, ocr_service.py:146-207) — and
  * produces a failed ROW, never a thrown task error, mirroring
  * ack-with-error semantics (tests/integration/test_pipeline.py:140-215).
  */
object Dispatch {

  /** The reference's 7-entry image MIME list (ocr_service.py:224-244),
    * plus the bare `image` kind used by the interleaved corpus. */
  val imageKinds: Set[String] = Set(
    "image", "image/jpeg", "image/jpg", "image/png", "image/tiff",
    "image/bmp", "image/webp", "image/gif")

  // ---- runtime adapter registry (U4 extension surface) ----------------
  // The reference's factory is a runtime extension point:
  // `OCREngineFactory.register_engine(name, cls)` stores the class in a
  // process-global dict, lowercased, overriding built-ins, and raises
  // TypeError on a non-engine argument (factory.py:102-126, tested at
  // tests/unit/test_ocr_adapters.py:177-203). Same contract here \u2014 the
  // non-subclass TypeError becomes a compile error for typed callers and
  // a null-check for reflective ones. The registry is consulted BEFORE
  // the built-in dispatch, so a registered extractor can also override a
  // built-in kind (exactly as re-registering "mock" would in the
  // reference).
  //
  // JVM-scope note: like the reference's module-level registry (which
  // every Python worker re-imports), this map is per-JVM. local[*] shares
  // one JVM; on a multi-executor cluster, [[GraftAdapterPlugin]] runs the
  // configured [[AdapterRegistrar]]s in every executor JVM before tasks
  // dispatch spans (`--conf spark.plugins=graft.adapters.GraftAdapterPlugin
  // --conf spark.graft.adapterRegistrars=com.example.MyRegistrar`).
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, SpanExtractor]()

  /** Register a custom adapter for a kind (case-insensitive), overriding
    * any built-in dispatch for it. Mirrors
    * `OCREngineFactory.register_engine` (factory.py:102-126). */
  def register(kind: String, extractor: SpanExtractor): Unit = {
    if (kind == null || kind.trim.isEmpty)
      throw new IllegalArgumentException("adapter kind must be a non-empty string")
    if (extractor == null)
      throw new IllegalArgumentException(
        s"extractor for kind '$kind' must be a SpanExtractor instance (got null)")
    registry.put(kind.toLowerCase(java.util.Locale.ROOT), extractor)
  }

  /** Remove a registered adapter (test/teardown surface; built-in
    * dispatch for the kind resumes). */
  def unregister(kind: String): Unit =
    if (kind != null) registry.remove(kind.toLowerCase(java.util.Locale.ROOT))

  /** Registered custom kinds \u2014 the analog of the factory's
    * `list_engines` (factory.py:128-136) for the extension registry. */
  def registeredKinds: Set[String] = {
    import scala.jdk.CollectionConverters._
    registry.keySet().asScala.toSet
  }

  def adapterFor(kind: String): Either[ExtractFailure, SpanExtractor] = {
    // Locale.ROOT: default-locale lowercasing breaks kind dispatch on
    // Turkish-locale JVMs ("IMAGE" -> "\u0131mage")
    val k = if (kind == null) "" else kind.toLowerCase(java.util.Locale.ROOT)
    val custom = registry.get(k)
    if (custom != null) Right(custom)
    else if (imageKinds(k)) Right(MediaPassthrough)
    else if (k == Model.Kind.Mock) Right(MockAdapter)
    else if (k.contains("pdf")) Right(PdfExtractor)
    else if (k == "html" || k.contains("text/html")) Right(HtmlExtractor)
    else if (k == "text" || k.startsWith("text/")) Right(TextPassthrough)
    else if (k.contains("docx")) Left(ExtractFailure("DOCX processing not yet implemented", "validation"))
    else if (k.contains("pptx")) Left(ExtractFailure("PPTX processing not yet implemented", "validation"))
    else if (k.contains("xlsx")) Left(ExtractFailure("XLSX processing not yet implemented", "validation"))
    else Left(ExtractFailure(s"Failed to load image: unsupported kind '$k'", "validation"))
  }

  /** Extract one document. Pure and deterministic (timing is filled in by
    * the pipeline, which measures wall-clock around this call).
    *
    * Result metadata mirrors the reference's F10 right-biased merge
    * (ocr_service.py:117-123): engine defaults (page_count, adapter — the
    * analogs of its job_id/page_count/source_mime_type) ++ adapter
    * response metadata ++ the document's own metadata, rightmost wins.
    * On failure, metadata is exactly {"error_type": …}
    * (ocr_service.py:188,206) — job metadata is NOT merged, matching the
    * reference's failure path. */
  def extractDoc(doc: Doc): ExtractedDoc = extractDoc(doc, ExtractLimits())

  /** UTF-8 byte length without encoding (one pass over the chars). */
  private def utf8Length(s: String): Long = {
    var bytes = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      bytes += (if (c < 0x80) 1 else if (c < 0x800) 2
                else if (Character.isHighSurrogate(c)) { i += 1; 4 } else 3)
      i += 1
    }
    bytes
  }

  /** Payload-size guard (config.py:105-108): fail fast BEFORE the adapter
    * touches the span. Chars lower-bound bytes, so the exact UTF-8 count
    * only runs for spans that could plausibly exceed the cap. */
  private def payloadFailure(span: Span, maxBytes: Long): ExtractFailure =
    if (maxBytes <= 0L || span.text == null) null
    else {
      val chars = span.text.length.toLong
      if (chars <= maxBytes / 4) null // even 4-byte-per-char text fits
      else {
        val bytes = utf8Length(span.text)
        if (bytes > maxBytes)
          ExtractFailure(
            s"Payload size $bytes bytes exceeds maximum $maxBytes bytes (kind=${span.kind})",
            "validation")
        else null
      }
    }

  def extractDoc(doc: Doc, limits: ExtractLimits): ExtractedDoc = {
    // a null spans array — or a null span ELEMENT (externally-written
    // parquet with nullable spans / containsNull=true) — is malformed
    // input: fail AS A ROW, never as a thrown task error, the same
    // philosophy as every other guard here
    if (doc.spans == null)
      return ExtractedDoc(doc.doc_id, Vector.empty, Model.Failed,
        "Failed to read document: null spans array", "validation", "", 0, 0, 0L,
        Map("error_type" -> "validation"))
    if (doc.spans.exists(_ == null))
      return ExtractedDoc(doc.doc_id, Vector.empty, Model.Failed,
        "Failed to read document: null span element", "validation", "", 0, 0, 0L,
        Map("error_type" -> "validation"))
    val ordered =
      if (doc.spans.lengthCompare(1) <= 0) doc.spans
      else doc.spans.sortBy(s => (s.offset, s.kind, s.media_ref))
    val out = ArrayBuffer.empty[Span]
    val adaptersUsed = ArrayBuffer.empty[String]
    var adapterMeta: Map[String, String] = Map.empty
    var pageCount = 0
    var failure: ExtractFailure = null
    val budgetMs = limits.effectiveTimeoutMs
    val it = ordered.iterator
    try {
      while (failure == null && it.hasNext) {
        val span = it.next()
        failure = payloadFailure(span, limits.maxPayloadBytes)
        if (failure == null) adapterFor(span.kind) match {
          case Left(f) => failure = f
          case Right(adapter) =>
            // per-span budget — the spec's "timeout applies per page"
            Deadline.arm(budgetMs)
            adapter.extract(span) match {
              case Left(f) => failure = f
              case Right(spans) =>
                if (!adaptersUsed.contains(adapter.name)) adaptersUsed += adapter.name
                if (adapter eq PdfExtractor) pageCount += spans.length
                val m = adapter.metadata(span)
                if (m.nonEmpty) adapterMeta = adapterMeta ++ m
                out ++= spans
            }
        }
      }
    } catch {
      case _: Deadline.Exceeded =>
        failure = ExtractFailure(
          s"Processing timeout: span exceeded ${budgetMs} ms budget", "timeout")
    } finally Deadline.disarm()
    if (failure != null)
      ExtractedDoc(doc.doc_id, Vector.empty, Model.Failed, failure.message,
        failure.errorType, adaptersUsed.mkString("+"), 0, 0, 0L,
        Map("error_type" -> failure.errorType))
    else {
      // renumber 0..n-1 without tuple/iterator churn; spans already carrying
      // their final offset (the common single-adapter case) are reused as-is
      val arr = new Array[Span](out.length)
      var i = 0
      while (i < out.length) {
        val s = out(i)
        arr(i) = if (s.offset == i) s else s.copy(offset = i)
        i += 1
      }
      val renumbered = scala.collection.immutable.ArraySeq.unsafeWrapArray(arr)
      val adapters = adaptersUsed.mkString("+")
      val pages = math.max(1, pageCount)
      val docMeta = if (doc.metadata == null) Map.empty[String, String] else doc.metadata
      val merged = Map("page_count" -> pages.toString, "adapter" -> adapters) ++
        adapterMeta ++ docMeta
      ExtractedDoc(doc.doc_id, renumbered, Model.Completed, "", "",
        adapters, renumbered.length, pages, 0L, merged)
    }
  }

  /** Combined markdown view of an extracted document: text spans in
    * offset order joined by blank lines; media spans render as markdown
    * image references. */
  def combinedMarkdown(spans: Seq[Span]): String =
    spans.sortBy(_.offset).map { s =>
      if (s.kind == Model.Kind.Image) s"![](${s.media_ref})" else s.text
    }.mkString("\n\n")

  /** PDF-page re-combine view: applies the reference's ordered page
    * separators (`_combine_pages`, deepseek_engine.py:336-358) across the
    * spans — only meaningful when each span is one pdf PAGE. */
  def combinedPdfMarkdown(pageSpans: Seq[Span]): String =
    PageCombine.combinePages(
      pageSpans.sortBy(_.offset).map(_.text) match { case Nil => Seq(""); case xs => xs })
}
