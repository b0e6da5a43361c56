package graft.core

import org.apache.spark.sql.types._

/** Core data model of the extraction engine.
  *
  * The canonical input row mirrors BASELINE.json `input_hint`:
  * `(doc_id: string, spans: array<struct<kind,text,media_ref,offset>>)`.
  * This is the Spark projection of the reference's `OCRJob`
  * (reference: src/simple_ocr/models/job.py:19-31) with document content
  * inlined as typed spans instead of a presigned `source_url`.
  */
final case class Span(kind: String, text: String, media_ref: String, offset: Int)

/** One input document == one reference job (models/job.py:19-31);
  * `metadata` is the job's per-document metadata dict (models/job.py:30),
  * threaded through extraction with the reference's right-biased merge. */
final case class Doc(doc_id: String, spans: Seq[Span],
                     metadata: Map[String, String] = Map.empty)

/** Per-document extraction output — the Spark analog of the reference's
  * `OCRResponse` + `OCRResult` pair (adapters/base.py:9-19,
  * models/job.py:33-43). `spans` is the normalized ordered span sequence
  * whose (kind, text, media_ref, order) is the equality surface of the
  * north rule; `status`/`error` carry the job state machine
  * (models/job.py:10-16: pending → processing → completed | failed).
  *
  * `metadata` carries the reference's F10 merge
  * (services/ocr_service.py:117-123): engine defaults, overridden by
  * adapter-response metadata, overridden by the document's own metadata
  * (rightmost wins); on failure it is exactly {"error_type": …}
  * (ocr_service.py:188,206).
  */
final case class ExtractedDoc(
    doc_id: String,
    spans: Seq[Span],
    status: String,            // "completed" | "failed"
    error: String,             // "" when completed
    error_type: String,        // "" | "validation" | "transient" | "timeout"
    adapter: String,           // winning adapter name(s), e.g. "html+media"
    span_count: Int,
    page_count: Int,
    processing_time_ms: Long,
    metadata: Map[String, String] = Map.empty)

object Model {
  val Completed = "completed"
  val Failed = "failed"

  /** Canonical input StructType (explicit — no inferSchema, mirroring the
    * reference's eager pydantic validation, workers/nats_worker.py:205). */
  val spanType: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("media_ref", StringType, nullable = false),
    StructField("offset", IntegerType, nullable = false)))

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("spans", ArrayType(spanType, containsNull = false), nullable = false),
    StructField("metadata", MapType(StringType, StringType, valueContainsNull = false),
      nullable = true)))

  /** Input span kinds (the `mime_type` analog, services/ocr_service.py:224-244). */
  object Kind {
    val Html = "html"
    val Pdf = "pdf"
    val Image = "image"
    val Text = "text"
    /** Deterministic mock-engine payload: `"<mime>|<size_bytes>"` — runs
      * the reference's exact mock template path (mock_engine.py). */
    val Mock = "mock"
    /** Rejected by the reference with explicit "not yet implemented"
      * errors (adapters/deepseek_engine.py:256-263). */
    val Unsupported: Set[String] = Set("docx", "pptx", "xlsx")
  }
}
