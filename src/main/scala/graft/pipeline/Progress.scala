package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Checkpointed progress table (north rule): per-partition doc_id watermark
  * + lineage + span-count metrics, committed as immutable snapshots AFTER
  * the data files land — the Spark form of the reference's ack-only-after-
  * publish ordering (reference: src/simple_ocr/workers/nats_worker.py:217-240:
  * result published, then msg.ack()).
  *
  * In production this is an Iceberg table and each commit an Iceberg
  * snapshot; in-sandbox (no Iceberg jars, SURVEY.md §7.1) snapshots are
  * emulated as immutable `snapshot-NNNNNN` directories finalized by an
  * atomic rename — readers only ever see fully-written snapshots.
  *
  * Schema (FIXTURES.md §1):
  * `(part_id, doc_id_watermark, status, n_docs, n_completed, n_failed,
  *   span_count, processing_time_ms, adapters, snapshot_id)`
  *
  * Resume authority is the committed DATA table (its doc_ids with
  * status=completed); the progress table carries the per-partition lineage
  * and metrics the north rule requires and is what an operator queries.
  * Failed docs are retried on resume (only `completed` is skipped),
  * mirroring the DLQ-replay semantics
  * (openspec/.../specs/job-processing/spec.md:243-262).
  */
object Progress {

  def dataDir(outDir: String): String = s"$outDir/data"
  def progressDir(outDir: String): String = s"$outDir/progress"

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(spark: SparkSession, dir: String): Boolean =
    fs(spark, dir).exists(new Path(dir))

  /** doc_ids already extracted successfully — the resume anti-join input
    * for DLQ replay (`retryFailed`). Only `doc_id` is selected, so the
    * scan is pruned to one column. */
  def completedDocIds(spark: SparkSession, outDir: String): Option[DataFrame] = {
    val dd = dataDir(outDir)
    if (!exists(spark, dd)) None
    else Some(
      spark.read.parquet(dd)
        .filter(col("status") === "completed")
        .select("doc_id").distinct())
  }

  /** All terminal doc_ids (completed + dead-lettered failed) — the default
    * resume anti-join input; guarantees append-only writes never produce a
    * duplicate doc_id within one attempt lineage. */
  def attemptedDocIds(spark: SparkSession, outDir: String): Option[DataFrame] = {
    val dd = dataDir(outDir)
    if (!exists(spark, dd)) None
    else Some(spark.read.parquet(dd).select("doc_id").distinct())
  }

  /** Next attempt number: 1 + the max attempt in the COMMITTED DATA — the
    * data table is the authority. (Deriving it from the snapshot count
    * would reuse an attempt number after a crash between the data commit
    * and the snapshot commit, creating duplicate (doc_id, attempt) rows
    * with a nondeterministic readLatest winner.) */
  def nextAttempt(spark: SparkSession, outDir: String): Long = {
    val dd = dataDir(outDir)
    if (!exists(spark, dd)) 0L
    else {
      val row = spark.read.parquet(dd).agg(max(col("attempt"))).first()
      if (row.isNullAt(0)) 0L else row.getLong(0) + 1L
    }
  }

  private def snapshotCount(fsys: org.apache.hadoop.fs.FileSystem, pd: String): Long =
    if (!fsys.exists(new Path(pd))) 0L
    else fsys.listStatus(new Path(pd)).count(_.getPath.getName.startsWith("snapshot-")).toLong

  /** Latest-attempt view of the extracted table: one row per doc_id, the
    * highest `attempt` winning (only DLQ replays ever produce more than
    * one attempt for a doc). */
  def readLatest(spark: SparkSession, outDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val df = spark.read.parquet(dataDir(outDir))
    // attempt numbers are unique per write (nextAttempt reads the data
    // max); status breaks any legacy tie deterministically, completed first
    df.withColumn("_rn",
        row_number().over(Window.partitionBy(col("doc_id"))
          .orderBy(col("attempt").desc, col("status").asc)))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** Aggregate the committed data into one per-partition progress snapshot
    * and publish it with an atomic staged rename. Aggregates the
    * LATEST-ATTEMPT view: after a DLQ replay the raw append log still
    * contains superseded failure rows, and an operator querying the
    * snapshot must not see phantom failures or double-counted docs. */
  def commitSnapshot(spark: SparkSession, outDir: String): Long = {
    val pd = progressDir(outDir)
    val fsys = fs(spark, pd)
    val snapshotId: Long = snapshotCount(fsys, pd)

    val snap = readLatest(spark, outDir)
      .groupBy(col("part_id"))
      .agg(
        max(col("doc_id")).as("doc_id_watermark"),
        count(lit(1)).as("n_docs"),
        sum(when(col("status") === "completed", 1L).otherwise(0L)).as("n_completed"),
        sum(when(col("status") === "failed", 1L).otherwise(0L)).as("n_failed"),
        sum(col("span_count")).as("span_count"),
        sum(col("processing_time_ms")).as("processing_time_ms"),
        // lineage: the distinct set of adapter names that ran in this
        // partition ("html+media" rows are split back into elements)
        concat_ws("+", sort_array(array_remove(
          array_distinct(flatten(collect_set(split(col("adapter"), "\\+")))), ""))).as("adapters"))
      .withColumn("status", when(col("n_failed") === 0L, lit("completed")).otherwise(lit("completed_with_failures")))
      .withColumn("snapshot_id", lit(snapshotId))

    val tmp = new Path(pd, f"_tmp-$snapshotId%06d")
    val fin = new Path(pd, f"snapshot-$snapshotId%06d")
    snap.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    if (!fsys.rename(tmp, fin))
      throw new IllegalStateException(s"progress snapshot commit failed: $tmp -> $fin")
    snapshotId
  }

  /** Latest committed snapshot (the queryable progress/metrics view). */
  def latestSnapshot(spark: SparkSession, outDir: String): Option[DataFrame] = {
    val pd = progressDir(outDir)
    val fsys = fs(spark, pd)
    if (!fsys.exists(new Path(pd))) None
    else {
      val snaps = fsys.listStatus(new Path(pd)).map(_.getPath.getName)
        .filter(_.startsWith("snapshot-")).sorted
      snaps.lastOption.map(s => spark.read.parquet(s"$pd/$s"))
    }
  }
}
