package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
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
  * atomic rename — readers only ever see fully-written snapshots. The data
  * table is partitioned by `attempt` (the Iceberg hidden-partitioning
  * analog), so every incremental read below is directory-pruned.
  *
  * SCALE SHAPE — commit cost is independent of table size:
  *  - snapshot rows are an immutable per-(attempt, part_id) LEDGER: each
  *    commit aggregates ONLY the attempts written since the previous
  *    snapshot (partition-pruned scan) and carries earlier rows forward
  *    verbatim (they are immutable — exactly Iceberg manifest reuse);
  *  - `nextAttempt` lists `attempt=N` directories (O(#attempts) filesystem
  *    metadata, no data scan);
  *  - supersession (DLQ replays, crash-window duplicate writes) is
  *    accounted by correction columns (`n_superseded*`, `span_superseded`)
  *    on the NEW rows, computed by joining the (usually small)
  *    new-attempt doc set against a three-column pruned scan of earlier
  *    attempts — AQE broadcasts the small side at runtime (a map-side
  *    semi-join, no shuffle of the table), and a mass replay degrades
  *    to a shuffle join instead of OOMing on a forced broadcast. At
  *    warehouse scale that doc-existence probe is the same cost class
  *    as the resume anti-join itself and would be backed by the same
  *    doc_id index/bloom.
  *  - `readLatest` replaces the former full-table row_number window with a
  *    runtime (AQE) broadcast of the replay "winners" (docs in attempt ≥ 1 — a
  *    partition-pruned, tiny scan): the big table is filtered map-side,
  *    never shuffled.
  *
  * Ledger schema: `(attempt, part_id, doc_id_watermark, status, n_docs,
  * n_completed, n_failed, span_count, processing_time_ms, adapters,
  * n_superseded, n_superseded_completed, n_superseded_failed,
  * span_superseded, snapshot_id)`.
  *
  * Corrected corpus totals (see [[summaryTotals]]):
  * docs = Σ n_docs − Σ n_superseded; failed = Σ n_failed − Σ
  * n_superseded_failed; completed = Σ n_completed − Σ n_superseded_completed;
  * spans = Σ span_count − Σ span_superseded (exact by construction:
  * span_superseded carries the superseded row's OWN span_count, so the
  * subtraction is correct even when a completed row is superseded by a
  * failed one or extraction behavior changed between attempts).
  * processing_time_ms stays cumulative — compute spent on superseded
  * attempts was really spent.
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

  /** Attempt numbers present in the data table — directory listing only
    * (the layout is partitioned by attempt), no data scan.
    *
    * Legacy fallback: a data dir written by the pre-partitioned flat
    * layout (parquet files directly under `data/` with `attempt` as a
    * data column) has no `attempt=` directories; returning empty there
    * would make [[nextAttempt]] restart at 0 and mint duplicate
    * (doc_id, attempt) rows with nondeterministic readLatest winners —
    * so flat layouts fall back to a pruned one-column attempt scan,
    * CACHED per data dir for the session: a flat layout is read-only
    * within a session (every write path migrates it to the partitioned
    * layout first, after which the directory listing wins and the stale
    * cache entry is dropped), so readLatest/nextAttempt/commitSnapshot
    * pay the fallback scan once, not per call. */
  def attempts(spark: SparkSession, outDir: String): Seq[Long] = {
    val dd = dataDir(outDir)
    val fsys = fs(spark, dd)
    if (!fsys.exists(new Path(dd))) Seq.empty
    else {
      val entries = fsys.listStatus(new Path(dd)).toSeq
      val fromDirs = entries
        .map(_.getPath.getName)
        .filter(_.startsWith("attempt="))
        .map(_.stripPrefix("attempt=").toLong)
        .sorted
      if (fromDirs.nonEmpty) { flatAttemptsCache.remove(dd); fromDirs }
      else if (!entries.exists(_.getPath.getName.endsWith(".parquet"))) Seq.empty
      else {
        // fingerprint the (already-listed) flat files so an externally
        // modified or deleted-and-recreated table invalidates the cache —
        // serving a stale attempt list would let nextAttempt mint
        // duplicate (doc_id, attempt) rows. The fingerprint is the
        // (name, len, mtime) sequence ITSELF, compared by equality — it
        // is tiny and costs no extra I/O (derived from the listing this
        // call just did); a 32-bit hash of it could collide after an
        // external modification and serve the stale list anyway
        val fp = entries.map(st =>
          (st.getPath.getName, st.getLen, st.getModificationTime))
        val cached = flatAttemptsCache.get(dd)
        if (cached != null && cached._1 == fp) cached._2
        else {
          val flat = spark.read.parquet(dd)
          val got =
            if (!flat.columns.contains("attempt")) Seq(0L)
            else flat.select(col("attempt").cast("long")).distinct()
              .collect().map(_.getLong(0)).toSeq.sorted
          flatAttemptsCache.put(dd, (fp, got))
          got
        }
      }
    }
  }

  private val flatAttemptsCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Seq[(String, Long, Long)], Seq[Long])]()

  /** Read the data table with `attempt` normalized to long (partition
    * columns are inferred as int; a pre-`attempt` flat layout reads as
    * attempt 0). */
  def readData(spark: SparkSession, outDir: String): DataFrame =
    normalizeAttempt(spark.read.parquet(dataDir(outDir)))

  private def normalizeAttempt(df: DataFrame): DataFrame =
    if (df.columns.contains("attempt")) df.withColumn("attempt", col("attempt").cast("long"))
    else df.withColumn("attempt", lit(0L))

  /** doc_ids already extracted successfully — the resume anti-join input
    * for DLQ replay (`retryFailed`). Only `doc_id`/`status` are selected,
    * so the scan is pruned to two columns. */
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

  /** Next attempt number: 1 + the max attempt DIRECTORY in the committed
    * data — the data layout is the authority, and the directory is created
    * by the data write itself, so a crash between the data commit and the
    * snapshot commit can never reuse an attempt number (which would create
    * duplicate (doc_id, attempt) rows with a nondeterministic readLatest
    * winner). Listing cost is O(#attempts), not O(table). */
  def nextAttempt(spark: SparkSession, outDir: String): Long =
    attempts(spark, outDir).lastOption.map(_ + 1L).getOrElse(0L)

  // ---- legacy flat-layout migration -----------------------------------

  private def flatDataFiles(fsys: org.apache.hadoop.fs.FileSystem, dd: String): Seq[Path] =
    if (!fsys.exists(new Path(dd))) Seq.empty
    else fsys.listStatus(new Path(dd)).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getPath)

  private def stagingDir(outDir: String) = new Path(s"$outDir/data_migrating")
  private val StagedMarker = "_GRAFT_STAGED"

  /** Rewrite a legacy FLAT data layout (parquet files directly under
    * `data/` with `attempt` as a data column) into the attempt-partitioned
    * layout, so subsequent `partitionBy("attempt")` appends don't create a
    * mixed-depth directory tree Spark cannot read. Called from the WRITE
    * path ([[ExtractJob.runAndCommit]]) — read paths fall back to the
    * column scan in [[attempts]] without side effects.
    *
    * Crash-recoverable staging protocol: the flat rows are rewritten into
    * `data_migrating/attempt=N/`, a marker file seals the staging as
    * complete, and only then are the staged dirs moved into `data/` and
    * the flat files deleted. A crash BEFORE the marker discards staging
    * and redoes the rewrite (flat files untouched); a crash AFTER it is
    * completed by the next write. Readers during a post-marker crash
    * window see a mixed-layout read error — never silently partial data —
    * until the next write completes the move. */
  def migrateLegacyLayout(spark: SparkSession, outDir: String): Unit = {
    val dd = dataDir(outDir)
    val fsys = fs(spark, dd)
    val staging = stagingDir(outDir)
    if (fsys.exists(staging)) {
      if (fsys.exists(new Path(staging, StagedMarker))) {
        completeMigration(fsys, staging, dd) // finish a post-marker crash
        return
      }
      fsys.delete(staging, true) // pre-marker crash: staging is garbage
    }
    val flats = flatDataFiles(fsys, dd)
    if (flats.isEmpty) return
    val withAttempt = normalizeAttempt(spark.read.parquet(flats.map(_.toString): _*))
    withAttempt.write.partitionBy("attempt").mode(SaveMode.Overwrite).parquet(staging.toString)
    if (!fsys.createNewFile(new Path(staging, StagedMarker)))
      throw new IllegalStateException(s"could not seal migration staging at $staging")
    completeMigration(fsys, staging, dd)
  }

  private def completeMigration(fsys: org.apache.hadoop.fs.FileSystem,
                                staging: Path, dd: String): Unit = {
    // a successful rename REMOVES the dir from staging, so a staged dir
    // whose destination already exists is never "already moved" — it is a
    // collision with pre-existing data (duplicate-attempt tables minted
    // by a pre-fallback binary, or a partial non-atomic rename). Validate
    // EVERY destination before renaming ANY, then fail loudly before any
    // deletion: a mid-loop abort would leave staging half-drained with
    // flat rows duplicated into data/, and silently skipping a move and
    // then deleting the flat sources would lose rows permanently.
    val staged = fsys.listStatus(staging).toSeq
      .filter(_.getPath.getName.startsWith("attempt="))
    staged.foreach { st =>
      val dest = new Path(dd, st.getPath.getName)
      if (fsys.exists(dest))
        throw new IllegalStateException(
          s"legacy migration collision: $dest already exists while staged rows " +
            s"remain at ${st.getPath}; the table mixes a flat layout with " +
            "pre-existing attempt directories — merge manually (flat files and " +
            "staging are untouched)")
    }
    staged.foreach { st =>
      val dest = new Path(dd, st.getPath.getName)
      if (!fsys.rename(st.getPath, dest))
        throw new IllegalStateException(s"migration move failed: ${st.getPath} -> $dest")
    }
    flatDataFiles(fsys, dd).foreach(p => fsys.delete(p, false))
    fsys.delete(staging, true)
  }

  // strictly-numeric names only: a foreign entry (editor backup, partial
  // copy, "snapshot-000003.bak") must be ignored, not crash the read path
  // with a NumberFormatException — this filter is shared by every
  // snapshot-name consumer so they cannot drift
  private val SnapshotName = "snapshot-(\\d+)".r

  private def snapshotNumbers(fsys: org.apache.hadoop.fs.FileSystem, pd: String): Seq[Long] =
    if (!fsys.exists(new Path(pd))) Seq.empty
    else fsys.listStatus(new Path(pd)).toSeq.map(_.getPath.getName)
      .collect { case SnapshotName(n) => n.toLong }.sorted

  /** Next snapshot id = highest existing + 1 (NOT a file count: compaction
    * prunes superseded snapshot files, and a count would then regress and
    * collide with the surviving collapsed snapshot). */
  private def nextSnapshotId(fsys: org.apache.hadoop.fs.FileSystem, pd: String): Long =
    snapshotNumbers(fsys, pd).lastOption.map(_ + 1L).getOrElse(0L)

  /** Latest-attempt view of the extracted table: one row per doc_id, the
    * highest `attempt` winning (only DLQ replays or crash-window duplicate
    * writes ever produce more than one attempt for a doc).
    *
    * Scale shape: the set of docs appearing in attempt ≥ 1 is usually
    * tiny (the replayed failures), read from pruned partitions; the
    * attempt-0 bulk is filtered against it — the former row_number
    * window over every doc_id (a full-table shuffle per call) is gone.
    * The join strategy is deliberately left to AQE: for normal replays
    * the winners side is megabytes and AQE broadcasts it at runtime,
    * while a MASS replay (re-attempting 10^8 failed docs) degrades
    * gracefully to a shuffle join instead of the driver/executor OOM a
    * hard-coded `broadcast()` hint would force. */
  def readLatest(spark: SparkSession, outDir: String): DataFrame = {
    val df = readData(spark, outDir)
    if (attempts(spark, outDir).lengthCompare(1) <= 0) return df
    val winners = df.filter(col("attempt") >= 1L)
      .groupBy(col("doc_id")).agg(max(col("attempt")).as("_w"))
    df.join(winners, Seq("doc_id"), "left")
      .filter(col("_w").isNull || col("attempt") === col("_w"))
      .drop("_w")
  }

  private val correctionCols =
    Seq("n_superseded", "n_superseded_completed", "n_superseded_failed", "span_superseded")

  /** Aggregate the newly-committed attempts into per-(attempt, part_id)
    * ledger rows, merge with the previous snapshot's (immutable) rows, and
    * publish with an atomic staged rename. Only the NEW attempts' data is
    * read (partition-pruned); supersession corrections ride the new rows.
    * Cost per commit: O(new rows) + one two-column probe of earlier
    * attempts filtered by a broadcast of the new doc set. */
  def commitSnapshot(spark: SparkSession, outDir: String): Long = {
    val pd = progressDir(outDir)
    val fsys = fs(spark, pd)
    val snapshotId: Long = nextSnapshotId(fsys, pd)

    val prev = latestSnapshot(spark, outDir)
    val covered: Long = prev.map { p =>
      val r = p.agg(max(col("attempt"))).first()
      if (r.isNullAt(0)) -1L else r.getLong(0)
    }.getOrElse(-1L)
    val allAttempts = attempts(spark, outDir)
    val newAttempts = allAttempts.filter(_ > covered)

    val newRows: Option[DataFrame] =
      if (newAttempts.isEmpty) None
      else {
        // partition-pruned: only the new attempts' directories are read
        val fresh = readData(spark, outDir).filter(col("attempt") > covered)
        val agg = fresh
          .groupBy(col("attempt"), col("part_id"))
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
        // supersession corrections: which of the new docs replace a row
        // from an earlier attempt, and what that earlier row contributed.
        // The new doc set is usually small (replays/duplicates), so AQE
        // broadcasts it at runtime against the three-column pruned scan
        // of earlier attempts; NO hard-coded broadcast() hint — a mass
        // DLQ replay must degrade to a shuffle join, not an OOM. The
        // prior (status, span_count) of the LATEST earlier attempt
        // classifies the correction and supplies the exact span total to
        // subtract — the superseded row's OWN count, not the new row's
        // (they differ when a completed row is superseded by a failed
        // one, e.g. tighter limits on a crash-window re-run).
        val corrections =
          if (covered < 0L && newAttempts == Seq(0L)) None
          else {
            val newDocs = fresh.select(col("doc_id"), col("attempt"), col("part_id"))
            val earlier = readData(spark, outDir)
              .filter(col("attempt") < lit(newAttempts.max))
              .select(col("doc_id"), col("attempt").as("_pa"), col("status").as("_ps"),
                col("span_count").as("_psc"))
            val priorOfNew = earlier.join(newDocs.select("doc_id", "attempt").distinct()
                .withColumnRenamed("attempt", "_na"), Seq("doc_id"))
              .filter(col("_pa") < col("_na"))
              .groupBy(col("doc_id"), col("_na"))
              .agg(max(struct(col("_pa"), col("_ps"), col("_psc"))).as("_prior"))
              .select(col("doc_id"), col("_na").as("attempt"),
                col("_prior._ps").as("_prior_status"), col("_prior._psc").as("_prior_span"))
            Some(newDocs.join(priorOfNew, Seq("doc_id", "attempt"))
              .groupBy(col("attempt"), col("part_id"))
              .agg(
                count(lit(1)).as("n_superseded"),
                sum(when(col("_prior_status") === "completed", 1L).otherwise(0L))
                  .as("n_superseded_completed"),
                sum(when(col("_prior_status") === "failed", 1L).otherwise(0L))
                  .as("n_superseded_failed"),
                // subtract what the superseded row actually contributed:
                // its own span_count (failed rows carried 0 anyway)
                sum(when(col("_prior_status") === "completed", col("_prior_span")).otherwise(0L))
                  .as("span_superseded")))
          }
        val withCorrections = corrections match {
          case Some(c) =>
            agg.join(c, Seq("attempt", "part_id"), "left")
              .na.fill(0L, correctionCols)
          case None =>
            correctionCols.foldLeft(agg)((d, n) => d.withColumn(n, lit(0L)))
        }
        Some(withCorrections
          .withColumn("status",
            when(col("n_failed") === 0L, lit("completed")).otherwise(lit("completed_with_failures"))))
      }

    val snap = (prev, newRows) match {
      case (Some(p), Some(n)) =>
        p.drop("snapshot_id").unionByName(n).withColumn("snapshot_id", lit(snapshotId))
      case (Some(p), None) => p.drop("snapshot_id").withColumn("snapshot_id", lit(snapshotId))
      case (None, Some(n)) => n.withColumn("snapshot_id", lit(snapshotId))
      case (None, None) =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], emptySnapshotSchema)
    }

    val tmp = new Path(pd, f"_tmp-$snapshotId%06d")
    val fin = new Path(pd, f"snapshot-$snapshotId%06d")
    snap.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    if (!fsys.rename(tmp, fin))
      throw new IllegalStateException(s"progress snapshot commit failed: $tmp -> $fin")
    snapshotId
  }

  private def emptySnapshotSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("attempt", LongType), StructField("part_id", IntegerType),
      StructField("doc_id_watermark", StringType), StructField("n_docs", LongType),
      StructField("n_completed", LongType), StructField("n_failed", LongType),
      StructField("span_count", LongType), StructField("processing_time_ms", LongType),
      StructField("adapters", StringType), StructField("n_superseded", LongType),
      StructField("n_superseded_completed", LongType), StructField("n_superseded_failed", LongType),
      StructField("span_superseded", LongType), StructField("status", StringType),
      StructField("snapshot_id", LongType)))
  }

  /** Latest committed snapshot (the queryable progress/metrics ledger). */
  def latestSnapshot(spark: SparkSession, outDir: String): Option[DataFrame] = {
    val pd = progressDir(outDir)
    val fsys = fs(spark, pd)
    if (!fsys.exists(new Path(pd))) None
    else {
      // newest by NUMERIC id, matching snapshotNumbers/nextSnapshotId — a
      // lexicographic sort would rank "snapshot-1000000" before
      // "snapshot-999999" once ids outgrow the 6-digit pad, silently
      // serving a stale ledger on exactly the long-lived tables
      // compaction exists for; non-numeric names are ignored (see
      // SnapshotName), not parsed
      val snaps = fsys.listStatus(new Path(pd)).map(_.getPath.getName)
        .collect { case n @ SnapshotName(_) => n }
      if (snaps.isEmpty) None
      else Some(spark.read.parquet(
        s"$pd/${snaps.maxBy(_.stripPrefix("snapshot-").toLong)}"))
    }
  }

  /** Corrected corpus totals over a snapshot ledger: one row
    * `(n_docs, n_completed, n_failed, span_count, processing_time_ms)`
    * where superseded contributions are subtracted (see class doc). */
  def summaryTotals(snapshot: DataFrame): Row =
    snapshot.agg(
      (sum(col("n_docs")) - sum(col("n_superseded"))).as("n_docs"),
      (sum(col("n_completed")) - sum(col("n_superseded_completed"))).as("n_completed"),
      (sum(col("n_failed")) - sum(col("n_superseded_failed"))).as("n_failed"),
      (sum(col("span_count")) - sum(col("span_superseded"))).as("span_count"),
      sum(col("processing_time_ms")).as("processing_time_ms")).first()

  // ---- compaction ------------------------------------------------------

  private def compactStagingDir(outDir: String) = new Path(s"$outDir/compact_staging")
  private val CompactPlanMarker = "_GRAFT_COMPACT_PLAN"

  /** Compact a long-lived table: drop superseded attempt rows from the
    * data layout, collapse the cumulative snapshot ledger into one base
    * snapshot, and prune the superseded snapshot files — without a
    * compaction, thousands of DLQ replays pay O(history) per commit (each
    * `snapshot-NNNNNN` carries the whole ledger forward) and superseded
    * data rows accumulate forever.
    *
    * INVARIANTS (tested): [[readLatest]], [[nextAttempt]] and
    * [[summaryTotals]] are identical before and after — compaction only
    * removes rows every read path already filters out. The max attempt
    * directory always survives (its rows cannot be superseded), so attempt
    * numbering never regresses; cumulative `processing_time_ms` spent on
    * superseded attempts is preserved in a dedicated `part_id = -1`
    * "compacted" ledger row.
    *
    * Crash protocol, staged + marker-sealed like [[migrateLegacyLayout]]:
    * rewritten attempt dirs and the collapsed snapshot are staged under
    * `compact_staging/`, a plan marker (snapshot id + fully-superseded
    * attempts to drop) seals the staging, and only then are directories
    * swapped. A crash BEFORE the marker discards staging (original table
    * untouched); a crash AFTER it is completed idempotently by the next
    * [[compact]] or write ([[ExtractJob.runAndCommit]] recovers via
    * [[recoverCompaction]]). The only reader-visible window is between
    * removing an old attempt dir and installing its staged replacement —
    * concurrent readers should be quiesced during compaction, exactly the
    * contract an Iceberg snapshot-pointer swap would make atomic.
    *
    * Returns true when a compaction (or a crash recovery) ran. */
  def compact(spark: SparkSession, outDir: String): Boolean = {
    val dd = dataDir(outDir)
    val pd = progressDir(outDir)
    val fsys = fs(spark, dd)
    val staging = compactStagingDir(outDir)
    if (fsys.exists(staging)) {
      if (fsys.exists(new Path(staging, CompactPlanMarker))) {
        completeCompaction(spark, outDir) // finish a post-marker crash
        return true
      }
      fsys.delete(staging, true) // pre-marker crash: staging is garbage
    }
    if (!fsys.exists(new Path(dd))) return false
    // a legacy FLAT table must be migrated BEFORE compacting: staging
    // writes attempt= dirs, and swapping those in beside flat *.parquet
    // files would create the mixed-depth tree Spark cannot read (the
    // exact corruption migrateLegacyLayout exists to prevent). No-op on
    // already-partitioned layouts.
    migrateLegacyLayout(spark, outDir)
    val allAttempts = attempts(spark, outDir)
    if (allAttempts.isEmpty) return false
    // bring the ledger current first (incremental, partition-pruned) so
    // the collapsed snapshot covers every committed attempt; the ledger
    // is re-read ONCE after and reused for coveredMax-check + prevTime
    val snapBefore = latestSnapshot(spark, outDir)
    val coveredMax = snapBefore.map { p =>
      val r = p.agg(max(col("attempt"))).first()
      if (r.isNullAt(0)) -1L else r.getLong(0)
    }.getOrElse(-1L)
    val ledger =
      if (coveredMax < allAttempts.max) {
        commitSnapshot(spark, outDir); latestSnapshot(spark, outDir)
      } else snapBefore

    val df = readData(spark, outDir)
    // losers: (doc_id, attempt) rows superseded by a later attempt of the
    // same doc — the (usually tiny) replayed set, computed on two columns
    val dup = df.groupBy(col("doc_id"))
      .agg(max(col("attempt")).as("_w"), count(lit(1)).as("_n"))
      .filter(col("_n") > 1)
    val losers = df.select(col("doc_id"), col("attempt"))
      .join(dup.select(col("doc_id"), col("_w")), Seq("doc_id"))
      .filter(col("attempt") < col("_w"))
      .select(col("doc_id"), col("attempt"))
    val rewriteAttempts = losers.select(col("attempt")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    val nSnapshots = snapshotNumbers(fsys, pd).length
    if (rewriteAttempts.isEmpty && nSnapshots <= 1) return false // nothing to compact

    val snapshotId = nextSnapshotId(fsys, pd)
    fsys.mkdirs(staging)
    // stage winners-only rewrites of ONLY the attempts that lost rows;
    // untouched attempts keep their files (no rewrite, no crash window)
    if (rewriteAttempts.nonEmpty)
      df.filter(col("attempt").isin(rewriteAttempts: _*))
        .join(losers, Seq("doc_id", "attempt"), "left_anti")
        .write.partitionBy("attempt").mode(SaveMode.Overwrite).parquet(staging.toString)
    val stagedAttempts = fsys.listStatus(staging).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("attempt=")).map(_.stripPrefix("attempt=").toLong).toSet
    // an attempt whose every row was superseded stages nothing → drop it
    val dropAttempts = rewriteAttempts.filterNot(stagedAttempts.contains)

    // collapsed base ledger from the winners, corrections all zero (there
    // is nothing superseded left to correct)
    val winners = df.join(losers, Seq("doc_id", "attempt"), "left_anti")
    val agg = winners
      .groupBy(col("attempt"), col("part_id"))
      .agg(
        max(col("doc_id")).as("doc_id_watermark"),
        count(lit(1)).as("n_docs"),
        sum(when(col("status") === "completed", 1L).otherwise(0L)).as("n_completed"),
        sum(when(col("status") === "failed", 1L).otherwise(0L)).as("n_failed"),
        sum(col("span_count")).as("span_count"),
        sum(col("processing_time_ms")).as("processing_time_ms"),
        concat_ws("+", sort_array(array_remove(
          array_distinct(flatten(collect_set(split(col("adapter"), "\\+")))), ""))).as("adapters"))
    val withCorrections = correctionCols.foldLeft(agg)((d, n) => d.withColumn(n, lit(0L)))
      .withColumn("status",
        when(col("n_failed") === 0L, lit("completed")).otherwise(lit("completed_with_failures")))
      // the collapsed ledger is tiny (one row per (attempt, part_id));
      // caching it lets winnersTime and the staged write share ONE scan
      // of the corpus-sized winners frame instead of re-running it
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // preserve the cumulative processing_time_ms contract: time spent on
    // superseded attempts was really spent — park the residual in one
    // part_id = -1 ledger row instead of silently shrinking the total
    val prevTime = ledger
      .map(s => Option(s.agg(sum(col("processing_time_ms"))).first().get(0))
        .map(_.asInstanceOf[Long]).getOrElse(0L))
      .getOrElse(0L)
    val winnersTime = Option(withCorrections.agg(sum(col("processing_time_ms"))).first().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    val residual = prevTime - winnersTime
    val collapsed0 =
      if (residual > 0L) {
        val spark0 = spark
        val residualRow = spark0.createDataFrame(
          java.util.List.of(Row(allAttempts.max, -1, null, 0L, 0L, 0L, 0L, residual,
            "compacted", 0L, 0L, 0L, 0L, "compacted")),
          org.apache.spark.sql.types.StructType(emptySnapshotSchema.filter(_.name != "snapshot_id")))
        withCorrections.select(residualRow.columns.map(col): _*).unionByName(residualRow)
      } else withCorrections
    collapsed0.withColumn("snapshot_id", lit(snapshotId))
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(new Path(staging, "snapshot").toString)
    withCorrections.unpersist(blocking = false)

    // seal: the plan marker carries what completion needs (idempotent)
    val out = fsys.create(new Path(staging, CompactPlanMarker), false)
    try out.write(s"$snapshotId\n${dropAttempts.mkString(",")}\n".getBytes("UTF-8"))
    finally out.close()
    completeCompaction(spark, outDir)
    true
  }

  /** Complete an interrupted compaction if one is staged+sealed; discard
    * an unsealed staging. Called from the write path so a crashed
    * compaction cannot leave a half-swapped table. */
  def recoverCompaction(spark: SparkSession, outDir: String): Unit = {
    val fsys = fs(spark, outDir)
    val staging = compactStagingDir(outDir)
    if (!fsys.exists(staging)) return
    if (fsys.exists(new Path(staging, CompactPlanMarker))) completeCompaction(spark, outDir)
    else fsys.delete(staging, true)
  }

  /** Idempotent completion: swap staged attempt dirs in (staged copy is
    * authoritative), drop fully-superseded attempts, install + prune
    * snapshots, remove staging. Safe to re-run after a crash at any
    * point past the marker. */
  private def completeCompaction(spark: SparkSession, outDir: String): Unit = {
    val dd = dataDir(outDir)
    val pd = progressDir(outDir)
    val fsys = fs(spark, dd)
    val staging = compactStagingDir(outDir)
    val plan = {
      val in = fsys.open(new Path(staging, CompactPlanMarker))
      val txt = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      val lines = txt.split("\n", -1)
      (lines(0).trim.toLong,
        lines(1).trim.split(",").filter(_.nonEmpty).map(_.toLong).toSeq)
    }
    val (snapshotId, dropAttempts) = plan
    fsys.listStatus(staging).toSeq.filter(_.getPath.getName.startsWith("attempt="))
      .foreach { st =>
        val dest = new Path(dd, st.getPath.getName)
        if (fsys.exists(dest)) fsys.delete(dest, true) // staged is authoritative
        if (!fsys.rename(st.getPath, dest))
          throw new IllegalStateException(s"compaction move failed: ${st.getPath} -> $dest")
      }
    dropAttempts.foreach { n =>
      val p = new Path(dd, s"attempt=$n")
      if (fsys.exists(p)) fsys.delete(p, true)
    }
    val snapSrc = new Path(staging, "snapshot")
    if (fsys.exists(snapSrc)) {
      fsys.mkdirs(new Path(pd))
      val snapDest = new Path(pd, f"snapshot-$snapshotId%06d")
      if (fsys.exists(snapDest)) fsys.delete(snapDest, true)
      if (!fsys.rename(snapSrc, snapDest))
        throw new IllegalStateException(s"compaction snapshot install failed: $snapSrc -> $snapDest")
    }
    snapshotNumbers(fsys, pd).filter(_ < snapshotId)
      .foreach(n => fsys.delete(new Path(pd, f"snapshot-$n%06d"), true))
    fsys.delete(staging, true)
  }
}
