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
}
