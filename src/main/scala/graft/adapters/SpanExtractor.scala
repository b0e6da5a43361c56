package graft.adapters

import graft.core.Span

/** Permanent-vs-retryable failure taxonomy, mirroring the reference's
  * error classification (openspec spec: validation errors are permanent
  * and never retried; transient errors are retryable —
  * openspec/.../specs/ocr-service/spec.md:102-121). */
final case class ExtractFailure(message: String, errorType: String)

/** The Spark-native counterpart of the reference's `BaseOCREngine` ABC
  * (src/simple_ocr/adapters/base.py:22-93). Deliberately a plain Scala
  * trait invoked inside `Dataset.mapPartitions` — NOT a Catalyst
  * `Expression` — because extraction is multi-KB-per-row, needs
  * per-partition setup amortization, and benefits from batched per-kind
  * dispatch (SURVEY.md §2.9).
  *
  * `extract` maps ONE input span to its ordered output spans (offsets are
  * renumbered at the document level by [[Dispatch]]).
  */
trait SpanExtractor extends Serializable {
  def name: String
  def extract(span: Span): Either[ExtractFailure, Vector[Span]]

  /** Adapter-contributed result metadata for a successfully-extracted
    * span — the analog of the reference's `OCRResponse.metadata`
    * (adapters/base.py:18). Merged right-biased over the engine defaults
    * and under the document's own metadata by [[Dispatch.extractDoc]],
    * mirroring ocr_service.py:117-123. Empty for adapters whose reference
    * counterparts emit none. */
  def metadata(span: Span): Map[String, String] = Map.empty
}
