package graft.adapters

/** Per-document resource guards, mirroring the reference's declared (but
  * never enforced) processing limits:
  *
  *  - `maxPayloadBytes` — the 10 MB image-size cap
  *    (reference config.py:105-108 `max_image_size`), applied here to any
  *    span payload: at 100 TB one 2 GB span must become a failed ROW, not
  *    an executor OOM;
  *  - `timeoutMs` — the per-request processing budget
  *    (openspec/.../specs/ocr-service/spec.md:123-139: 30 s default,
  *    300 s maximum, applied PER PAGE — "timeout applies per page, not to
  *    total document"). Applied per span (the page analog), so an
  *    adversarial payload (pathological HTML, quadratic blowups) stalls a
  *    task core for at most one budget, then fails the row.
  *
  * `0` disables a guard.
  */
final case class ExtractLimits(
    maxPayloadBytes: Long = ExtractLimits.DefaultMaxPayloadBytes,
    timeoutMs: Long = ExtractLimits.DefaultTimeoutMs) {
  /** Spec bound: custom timeouts above the maximum are rejected down to it
    * (spec.md:131-134). */
  def effectiveTimeoutMs: Long = math.min(timeoutMs, ExtractLimits.MaxTimeoutMs)
}

object ExtractLimits {
  val DefaultMaxPayloadBytes: Long = 10L * 1024 * 1024 // config.py:105-108
  val DefaultTimeoutMs: Long = 30000L                  // spec.md:126-129
  val MaxTimeoutMs: Long = 300000L                     // spec.md:131-134; config.py processing_timeout
  val Disabled: ExtractLimits = ExtractLimits(0L, 0L)
}

/** Cooperative per-span deadline, checked inside extractor hot loops.
  *
  * True preemption would need task-thread interruption; instead the
  * deadline rides a ThreadLocal and extractors poll [[check]] every few
  * thousand loop iterations (one `System.nanoTime` per poll — measured
  * noise-level). Tasks are single-threaded per span, so a ThreadLocal is
  * exact. The control-flow exception carries no stack trace (it is caught
  * one frame up in [[Dispatch.extractDoc]] and converted to a failed row).
  */
object Deadline {
  final class Exceeded extends RuntimeException("per-span deadline exceeded") {
    override def fillInStackTrace(): Throwable = this
  }

  private val holder = new ThreadLocal[Array[Long]] {
    override def initialValue(): Array[Long] = Array(0L)
  }

  /** Arm the deadline `budgetMs` from now (0 disarms). */
  def arm(budgetMs: Long): Unit =
    holder.get()(0) = if (budgetMs <= 0L) 0L else System.nanoTime() + budgetMs * 1000000L

  def disarm(): Unit = holder.get()(0) = 0L

  /** Throws [[Exceeded]] if armed and past due. Call every ~4096 loop
    * iterations in extractor scan loops. */
  def check(): Unit = {
    val d = holder.get()(0)
    if (d != 0L && System.nanoTime() - d > 0L) throw new Exceeded
  }
}
