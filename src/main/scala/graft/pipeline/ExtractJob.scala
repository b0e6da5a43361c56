package graft.pipeline

import graft.adapters.Dispatch
import graft.core.{Doc, ExtractedDoc}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The extraction dataflow — the Spark re-expression of the reference's
  * worker loop (reference: src/simple_ocr/workers/nats_worker.py:134-240 +
  * services/ocr_service.py:50-207), as ONE Catalyst-planned job:
  *
  * {{{
  * scan docs (columnar, pruned)                         — replaces NATS pull-subscribe
  *   → resume anti-join vs progress(status=completed)   — replaces idempotency lookup
  *   → salted repartition (skew break, north rule)      — replaces queue load balancing
  *   → mapPartitions(batched per-kind dispatch)         — replaces per-job asyncio loop
  *   → write extracted table + progress snapshot        — replaces upload + result event
  * }}}
  *
  * Scale notes (designed for 10^12 docs / 1000 executors, tested on
  * local[32]):
  *  - All relational trimming happens BEFORE the object boundary: the
  *    anti-join and any column pruning sit above `as[Doc]`, because
  *    Catalyst cannot push through `mapPartitions` (SURVEY.md §4).
  *  - The repartition key salts `hash(doc_id)` with the span count so the
  *    rare media-heavy documents (50-200 spans, FIXTURES.md skew knob)
  *    spread uniformly instead of landing by ingest order; AQE balances
  *    bytes, not per-row CPU, so this is explicit.
  *  - The anti-join broadcasts when the completed-set is small and falls
  *    back to shuffle join at scale — left to Catalyst/AQE, with doc_id
  *    the only column read from progress (pruned at the scan).
  *  - Pages of one document never cross partitions: per-doc work happens
  *    entirely inside one `mapPartitions` call, mirroring the reference's
  *    in-process page loop (deepseek_engine.py:135-163).
  */
object ExtractJob {

  /** Run the extraction map over pending docs.
    *
    * Skew strategy (measured, not assumed): per-document extraction has no
    * grouping semantics, so a shuffle is pure load-balancing — and moving
    * every payload byte through an exchange is exactly what cannot be
    * afforded at 100 TB (and measurably does not scale even in local mode:
    * the exchange cost is flat in core count while the map stage scales).
    * The DEFAULT path therefore relies on fine-grained input splits
    * (`spark.sql.files.maxPartitionBytes` sized so a split holds seconds
    * of work) plus Spark's dynamic task scheduling: free cores pull the
    * next split, which absorbs media-heavy documents statistically.
    * `saltPartitions > 0` opts into the explicit salted repartition for
    * adversarial ingest layouts (e.g. crawl output sorted by size, where
    * heavy docs clump into few splits): hash(doc_id, size(spans)) scatters
    * docs by their own weight. repartition() hash-partitions the given
    * expression's VALUE — never wrap it in pmod(…, n), which collapses the
    * key space to n values and leaves partitions empty after re-hashing.
    */
  def extract(
      spark: SparkSession,
      docs: DataFrame,
      saltPartitions: Int = 0,
      completedDocIds: Option[DataFrame] = None,
      maxSpansPerDoc: Int = 0,
      capObservation: Option[org.apache.spark.sql.Observation] = None,
      limits: graft.adapters.ExtractLimits = graft.adapters.ExtractLimits()): Dataset[ExtractedDoc] = {
    import spark.implicits._

    // per-doc metadata is optional on the wire: inputs written before the
    // column existed (or external tables without it) get an empty map,
    // matching the reference's `metadata: dict = {}` default (job.py:30)
    val withMeta =
      if (docs.columns.contains("metadata")) docs
      else docs.withColumn("metadata", typedLit(Map.empty[String, String]))

    // resume: drop docs already marked completed in the progress table
    // (reference idempotency spec: skip already-processed jobs,
    // openspec/.../specs/job-processing/spec.md:26-45)
    val pending0 = completedDocIds match {
      case Some(done) => withMeta.join(done.select("doc_id"), Seq("doc_id"), "left_anti")
      case None => withMeta
    }

    // page-cap guard (the reference's max_pdf_pages config, config.py:109-112
    // — declared there but never enforced; enforced here when set): a
    // relational slice ABOVE the object boundary, so runaway documents are
    // trimmed before any per-span bytes are deserialized (SURVEY.md §4.2)
    // the truncation metric observes PENDING docs (after the resume
    // anti-join), so resumed runs count only docs actually processed
    val pending1 = capObservation match {
      case Some(o) if maxSpansPerDoc > 0 =>
        pending0.observe(o,
          coalesce(sum(when(size(col("spans")) > maxSpansPerDoc, 1L).otherwise(0L)), lit(0L))
            .as("n_truncated"))
      case _ => pending0
    }
    val pending =
      if (maxSpansPerDoc > 0)
        pending1.withColumn("spans", slice(col("spans"), 1, maxSpansPerDoc))
      else pending1

    val balanced =
      if (saltPartitions > 0)
        pending.repartition(saltPartitions, hash(col("doc_id"), size(col("spans"))))
      else pending

    balanced.as[Doc].mapPartitions { it =>
      // per-partition setup happens ONCE here — the analog of the
      // reference's lazy once-per-process engine init
      // (deepseek_engine.py:49-74 `_ensure_initialized`)
      it.map { doc =>
        val t0 = System.nanoTime()
        val out = Dispatch.extractDoc(doc, limits)
        out.copy(processing_time_ms = (System.nanoTime() - t0) / 1000000L)
      }
    }
  }

  /** Expression-based path: identical semantics to [[extract]] (same
    * Dispatch per row, asserted equal in PipelineSpec) evaluated as a
    * Catalyst expression over the raw row — no encoder nodes in the plan.
    * MEASURED at ~parity with the typed path (the typed encoder is already
    * codegen'd; inherent string work dominates both), so this exists as
    * the composable column-level surface — extraction inside a wider
    * single-projection pipeline (e.g. select(extract_spans(spans),
    * quality(text), …)) — not as a speedup. [[extract]] remains the
    * extension surface for adapters needing per-partition setup. */
  def extractExpr(
      spark: SparkSession,
      docs: DataFrame,
      saltPartitions: Int = 0,
      completedDocIds: Option[DataFrame] = None): DataFrame = {
    val withMeta =
      if (docs.columns.contains("metadata")) docs
      else docs.withColumn("metadata", typedLit(Map.empty[String, String]))
    val pending = completedDocIds match {
      case Some(done) => withMeta.join(done.select("doc_id"), Seq("doc_id"), "left_anti")
      case None => withMeta
    }
    val balanced =
      if (saltPartitions > 0)
        pending.repartition(saltPartitions, hash(col("doc_id"), size(col("spans"))))
      else pending
    balanced
      .select(col("doc_id"),
        graft.functions.ExtractSpansExpr.extractSpans(col("spans"), col("metadata")).as("_x"))
      .select(col("doc_id"), col("_x.spans").as("spans"), col("_x.status").as("status"),
        col("_x.error").as("error"), col("_x.error_type").as("error_type"),
        col("_x.adapter").as("adapter"), col("_x.span_count").as("span_count"),
        col("_x.page_count").as("page_count"),
        col("_x.processing_time_ms").as("processing_time_ms"),
        col("_x.metadata").as("metadata"))
  }

  /** Extract and persist: data parquet first, progress snapshot second —
    * commit ordering guarantees a progress row only ever references
    * committed data (SURVEY.md §7.4c).
    *
    * Resume semantics mirror the reference's job state machine: completed
    * AND failed docs are both terminal (failed = dead-letter queue,
    * openspec/.../specs/job-processing/spec.md:243-262) and are skipped on
    * resume; `retryFailed = true` is the explicit DLQ replay (`force`),
    * which re-attempts failed docs — each write stamps an `attempt` number
    * so readers resolve the latest attempt per doc via [[Progress.readLatest]].
    *
    * Returns the latest-attempt view of the committed table. */
  def runAndCommit(
      spark: SparkSession,
      docs: DataFrame,
      outDir: String,
      saltPartitions: Int = 0,
      resume: Boolean = true,
      retryFailed: Boolean = false,
      maxSpansPerDoc: Int = 0): DataFrame = {
    // a legacy FLAT data layout must be migrated to the attempt-partitioned
    // layout BEFORE this write appends attempt=N dirs beside root-level
    // parquet files (a mixed-depth tree Spark cannot read); no-op otherwise
    Progress.migrateLegacyLayout(spark, outDir)
    // likewise, a compaction that crashed mid-swap must be completed (or
    // its unsealed staging discarded) before new attempts land
    Progress.recoverCompaction(spark, outDir)
    val done =
      if (!resume) None
      else if (retryFailed) Progress.completedDocIds(spark, outDir)
      else Progress.attemptedDocIds(spark, outDir)
    val attempt = Progress.nextAttempt(spark, outDir)
    // when the page cap is active, count capped docs on the SAME action
    // (observe piggybacks on the write — no second scan), mirroring the
    // "logged metric" the SURVEY promises for the cap; the observation is
    // attached INSIDE extract(), downstream of the resume anti-join, so
    // resumed runs don't count already-completed docs as truncated
    val capObs =
      if (maxSpansPerDoc > 0) Some(new org.apache.spark.sql.Observation(s"graft-cap-a$attempt"))
      else None
    val extracted = extract(spark, docs, saltPartitions, done, maxSpansPerDoc, capObs)
    // in-flight observability (A6 analog: queue-depth/error-rate counters,
    // reference docs/PIPELINE.md:390-394): accumulator-backed metrics
    // piggyback on the write action — no second pass over the data
    val obs = new org.apache.spark.sql.Observation(s"graft-extract-a$attempt")
    extracted.toDF()
      .observe(obs,
        count(lit(1)).as("n_docs"),
        sum(when(col("status") === "failed", 1L).otherwise(0L)).as("n_failed"),
        sum(col("span_count")).as("n_spans"),
        sum(col("processing_time_ms")).as("extract_ms"))
      .withColumn("part_id", spark_partition_id())
      .withColumn("attempt", lit(attempt))
      // attempt-partitioned layout: snapshot commits and readLatest get
      // directory-level pruning, and nextAttempt is a pure listing
      .write.partitionBy("attempt").mode("append").parquet(Progress.dataDir(outDir))
    log.info(s"extract attempt=$attempt metrics=${obs.get}")
    capObs.foreach(o => log.info(
      s"extract attempt=$attempt span cap=$maxSpansPerDoc truncated_docs=${o.get("n_truncated")}"))
    Progress.commitSnapshot(spark, outDir)
    Progress.readLatest(spark, outDir)
  }

  private lazy val log = org.apache.logging.log4j.LogManager.getLogger("graft.pipeline")
}
