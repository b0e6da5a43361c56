package graft.streaming

import graft.core.Model
import graft.pipeline.ExtractJob
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.functions._

/** Structured-Streaming variant of the extraction pipeline — the direct
  * analog of the reference's queue consumer loop (reference:
  * src/simple_ocr/workers/nats_worker.py:134-168: durable pull-subscribe,
  * batch fetch, process, ack):
  *
  *  - the file source plays the JetStream subject: new parquet files under
  *    `inputDir` are discovered per micro-batch (a batch == one `fetch()`);
  *  - `foreachBatch` runs the SAME batch extraction + progress commit as
  *    the batch job, so every streaming guarantee reduces to the batch
  *    path's idempotency: the resume anti-join drops already-terminal
  *    doc_ids, making redelivered files (at-least-once source) exactly-once
  *    in effect — the Spark form of ack-after-publish + idempotency-key
  *    (openspec/.../specs/job-processing/spec.md:26-45,115-140);
  *  - the streaming checkpoint under `outDir/_stream_checkpoint` is the
  *    durable-consumer cursor (nats_worker.py:146-151), and the progress
  *    table remains the authority for WHAT completed.
  *
  * The north rule specifies a batch pipeline; this variant exists because
  * the reference's production surface is the queue worker, and a user
  * migrating from it gets the same continuous-ingest shape here.
  */
object StreamingExtract {

  def start(
      spark: SparkSession,
      inputDir: String,
      outDir: String,
      trigger: Trigger = Trigger.AvailableNow(),
      maxFilesPerTrigger: Int = 64): StreamingQuery = {
    val stream = spark.readStream
      .schema(Model.docSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger) // fetch(batch=…) analog
      .parquet(inputDir)
    stream.writeStream
      .queryName("graft-extract-stream")
      .trigger(trigger)
      .option("checkpointLocation", s"$outDir/_stream_checkpoint")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        // same code path as the batch job: extract + data write + progress
        // snapshot; resume=true dedupes any source redelivery
        ExtractJob.runAndCommit(spark, batch, outDir)
        ()
      }
      .start()
  }

  /** Event-time windowed counts with watermark-bounded state — the
    * late-data discipline a continuous training-data ingest needs and the
    * job-queue reference never faces (its "stream" has no event time,
    * SURVEY.md §2.8). The watermark makes state FINITE at 100 TB scale:
    * a window's state is dropped once `max(event_time) - delay` passes the
    * window end, and events arriving older than the watermark are
    * discarded instead of growing the state store without bound. In
    * append mode a window is emitted exactly once, when it closes. */
  def eventTimeWindowCounts(
      events: org.apache.spark.sql.DataFrame,
      tsCol: String,
      delay: String,
      win: String): org.apache.spark.sql.DataFrame =
    events
      .withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), win).as("win"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("win.start").as("win_start"), col("win.end").as("win_end"),
        col("n_events"))

  /** Windowed extraction-rate metrics over the committed output — the
    * observability stream (queue-depth/error-rate analog,
    * reference docs/PIPELINE.md:390-394): spans and failures per
    * processing-time window per adapter. */
  def metricsStream(spark: SparkSession, outDir: String): org.apache.spark.sql.DataFrame = {
    spark.readStream
      .schema(spark.read.parquet(s"$outDir/data").schema)
      .parquet(s"$outDir/data")
      .withColumn("ingest_ts", current_timestamp())
      .withWatermark("ingest_ts", "10 seconds")
      .groupBy(window(col("ingest_ts"), "5 seconds"), col("adapter"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("span_count")).as("n_spans"),
        sum(when(col("status") === "failed", 1L).otherwise(0L)).as("n_failed"))
  }
}
