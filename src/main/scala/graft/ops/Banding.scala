package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Shared candidate-pair generation for the banded LSH self-joins
  * (minhash bands, simhash bands, sign-LSH embedding buckets) with a
  * GIANT-BUCKET GUARD.
  *
  * The unguarded shape — `bucket ⋈ bucket` all-pairs — is quadratic in
  * bucket size. At sandbox SFs every bucket is small, but a real web
  * corpus's first move is a boilerplate cluster of 10^5-10^7 near- (not
  * exact-) identical pages: the exact tier doesn't remove them, they all
  * share band buckets, and one such bucket materializes 10^10+ candidate
  * pairs before any `distinct()` can help. The standard LSH mitigation:
  * members of a monster bucket are trivially near-dups of each other, so
  * emit a LINEAR star instead of the quadratic clique.
  *
  * The guarded plan is ONE lazy declarative plan — building or
  * `explain()`-ing a guarded query runs NO Spark jobs (the former eager
  * sizing pass double-charged benchmark timings and made query
  * construction side-effecting). Each row is annotated with its bucket's
  * size and min-id anchor by a window over the bucket key (the window's
  * shuffle is on the same key the self-join shuffles on anyway):
  *
  *  - rows in buckets ≤ `maxBucket` (the normal case, and always the
  *    case at the verify SFs) self-join all-pairs exactly as the
  *    unguarded plan would;
  *  - rows in oversized buckets contribute only `(anchor, member)` star
  *    pairs, anchor = the bucket's minimum id. O(|bucket|) rows instead
  *    of O(|bucket|²); downstream verify (Jaccard / Hamming / cosine)
  *    still runs on every star pair, and connected components still
  *    collapses the cluster through the anchor. When nothing caps, this
  *    branch is empty and the output is exactly the unguarded pair set.
  *
  * Approximation contract (documented, not silent): within an oversized
  * bucket, pairs NOT mediated by the anchor are never emitted, so two
  * members that each fail the verify against the anchor but would pass
  * against each other are missed. For the boilerplate clusters the guard
  * exists for — everything near-identical to everything — the star is
  * lossless after CC. Per the no-silent-caps rule, capped-bucket counts
  * ride the SAME action as the query (`observe()`/CollectMetrics — the
  * exactly-once metric channel, same mechanism as the span-cap count in
  * [[graft.pipeline.ExtractJob]]): a session listener harvests them into
  * [[Banding.lastCapStats]], logs a warning on capped runs, and
  * [[Banding.commitStats]] persists them as an auditable table next to
  * the run's output — at warehouse scale the approximation must be
  * auditable from the table, not the driver log.
  */
object Banding {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Capped-bucket metrics of a guarded call per tier. */
  final case class CapStats(tier: String, maxBucket: Int,
                            nCappedBuckets: Long, nRowsInCapped: Long,
                            maxBucketSize: Long)

  private val capStats =
    new java.util.concurrent.ConcurrentHashMap[String, CapStats]()
  // tier -> newest guardedPairs call id constructed / harvested: lets
  // lastCapStats wait for the metrics of the call the caller just ran
  // instead of racing the (async) listener bus
  private val issuedSeq =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private val harvestedSeq =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private val callMeta =
    new java.util.concurrent.ConcurrentHashMap[Long, (String, Int)]()
  private val callCounter = new java.util.concurrent.atomic.AtomicLong(0L)
  private val MetricPrefix = "graft_banding_"

  /** Metrics of the most recent guarded call for `tier` (None = no such
    * call ever ran). Entries are recorded on capped AND uncapped calls,
    * so a formerly capped tier that stops capping reads as
    * nCappedBuckets = 0. The metrics arrive via the async listener bus,
    * so this waits (up to `timeoutMs`) until the newest CONSTRUCTED call
    * for the tier has been harvested — callers that build a guarded
    * query but never execute it will pay the timeout and get the last
    * executed call's stats. */
  def lastCapStats(tier: String, timeoutMs: Long = 30000L): Option[CapStats] = {
    val want: Long = Option(issuedSeq.get(tier)).map(_.longValue).getOrElse(-1L)
    val deadline = System.nanoTime + timeoutMs * 1000000L
    while (Option(harvestedSeq.get(tier)).map(_.longValue).getOrElse(-1L) < want
           && System.nanoTime < deadline)
      Thread.sleep(5)
    Option(capStats.get(tier))
  }

  /** Every tier a guarded query was CONSTRUCTED for in this process —
    * the drift-proof argument to [[commitStats]]: callers audit what
    * actually ran instead of maintaining a hardcoded tier list that a
    * newly added banded operator would silently fall out of. */
  def seenTiers: Seq[String] = {
    import scala.jdk.CollectionConverters._
    issuedSeq.keySet.asScala.toSeq.sorted
  }

  /** Whether the newest CONSTRUCTED guarded call for `tier` has been
    * harvested — false means [[lastCapStats]] would serve a PREVIOUS
    * call's stats (the newest query was planned but never executed, or
    * its metrics have not arrived). */
  private def isFresh(tier: String): Boolean =
    Option(harvestedSeq.get(tier)).map(_.longValue).getOrElse(-1L) >=
      Option(issuedSeq.get(tier)).map(_.longValue).getOrElse(-1L)

  /** Per-bucket sizes above `maxBucket` — the queryable monitoring view
    * (keyCols..., n_rows, anchor_id). */
  def oversizedBuckets(banded: DataFrame, keyCols: Seq[String], idCol: String,
                       maxBucket: Int): DataFrame =
    banded.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"), min(col(idCol)).as("anchor_id"))
      .filter(col("n_rows") > maxBucket)

  /** Distinct candidate id pairs (`id_a` < `id_b`) from per-bucket
    * self-joins over `banded`, guarded as per the class doc. `banded`
    * must expose `keyCols` and `idCol`; ids must be mutually comparable
    * with a total `<`. Pure plan construction — no jobs run until the
    * result is acted on.
    *
    * `carryCols` (r06): SLIM per-row columns to carry through the pair
    * generation — the output then also exposes `<c>_a` / `<c>_b` per
    * carried column, so a verify whose per-doc value is a few bytes
    * (the 8-byte simhash signature) reads it off the pair row instead of
    * joining the signature frame back twice. Only for columns narrow
    * enough to ride the banding exchange (the slim-shuffle contract);
    * wide values (shingle arrays, embeddings) must keep the join-back
    * design. Carried values are functionally determined by the id, so
    * the trailing distinct still deduplicates exactly the pair set. */
  def guardedPairs(banded: DataFrame, keyCols: Seq[String], idCol: String,
                   maxBucket: Int, tier: String,
                   carryCols: Seq[String] = Nil): DataFrame = {
    require(maxBucket >= 1, s"maxBucket must be >= 1, got $maxBucket")
    ensureListener(banded.sparkSession)
    val callId = callCounter.incrementAndGet()
    callMeta.put(callId, (tier, maxBucket))
    issuedSeq.merge(tier, java.lang.Long.valueOf(callId),
      (a, b) => if (a.longValue >= b.longValue) a else b)
    val slim = banded.select((keyCols ++ (idCol +: carryCols)).map(col): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
    // `annotated` feeds three consumers (both self-join sides + the
    // capped branch). Its exchange on keyCols is deduplicated by
    // ReuseExchange (identical subtrees), but the window sort/agg above
    // it runs once per consumer — accepted: the rows are slim, and the
    // alternative (eagerly persisting the annotation) is exactly the
    // construction-time side effect this lazy design removed.
    val annotated0 = slim
      .withColumn("_bn", count(lit(1)).over(w))
      .withColumn("_anchor", min(col(idCol)).over(w))
    // the star branch pairs the anchor with each member, so the anchor's
    // carried values must be available on every row: min_by over the same
    // window (ids are unique within a bucket, so the pick is total)
    val annotated = carryCols.foldLeft(annotated0) { (df, c) =>
      df.withColumn(s"_anchor_$c", min_by(col(c), col(idCol)).over(w))
    }
    def side(suffix: String) =
      annotated.filter(col("_bn") <= maxBucket).select(
        (keyCols.map(col) :+ col(idCol).as(s"id_$suffix")) ++
          carryCols.map(c => col(c).as(s"${c}_$suffix")): _*)
    val smallPairs = side("a")
      .join(side("b"), keyCols)
      .filter(col("id_a") < col("id_b"))
      .select((col("id_a") +: col("id_b") +:
        carryCols.flatMap(c => Seq(col(s"${c}_a"), col(s"${c}_b")))): _*)
    // the capped branch is always in the plan (empty when nothing caps);
    // its cap metrics ride the same action via CollectMetrics — the
    // anchor row stands in for "one row per bucket" in the bucket count
    val capped = annotated.filter(col("_bn") > maxBucket)
      .observe(s"$MetricPrefix$callId",
        // coalesce like max_bucket_size: on an uncapped run sum(...) over
        // the empty branch is NULL, and the listener's getAs[Long] would
        // only read 0 via the null-unboxing accident (ADVICE r05)
        coalesce(sum(when(col(idCol) === col("_anchor"), 1L).otherwise(0L)), lit(0L))
          .as("n_capped_buckets"),
        count(lit(1)).as("n_rows_in_capped"),
        coalesce(max(col("_bn")), lit(0L)).as("max_bucket_size"))
    val starPairs = capped.filter(col(idCol) =!= col("_anchor"))
      .select((col("_anchor").as("id_a") +: col(idCol).as("id_b") +:
        carryCols.flatMap(c => Seq(col(s"_anchor_$c").as(s"${c}_a"), col(c).as(s"${c}_b")))): _*)
    smallPairs.unionByName(starPairs).distinct()
  }

  // ---- metric harvesting ----------------------------------------------

  private val registered = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  private def ensureListener(spark: SparkSession): Unit =
    if (registered.add(spark))
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
          qe.observedMetrics.foreach { case (name, row) =>
            if (name.startsWith(MetricPrefix)) {
              val callId = name.stripPrefix(MetricPrefix).toLong
              Option(callMeta.get(callId)).foreach { case (tier, maxBucket) =>
                val stats = CapStats(tier, maxBucket,
                  row.getAs[Long]("n_capped_buckets"),
                  row.getAs[Long]("n_rows_in_capped"),
                  row.getAs[Long]("max_bucket_size"))
                val prev: Long =
                  Option(harvestedSeq.get(tier)).map(_.longValue).getOrElse(-1L)
                if (callId >= prev) {
                  capStats.put(tier, stats)
                  // warn once per call, not per re-executed action
                  if (stats.nCappedBuckets > 0L && callId > prev)
                    log.warn(s"[$tier] ${stats.nCappedBuckets} bucket(s) exceeded " +
                      s"maxBucket=$maxBucket (${stats.nRowsInCapped} rows total, largest " +
                      s"${stats.maxBucketSize}): emitted linear (bucket-min anchor, member) " +
                      "star pairs for them instead of the quadratic all-pairs clique; " +
                      "pairs not mediated by an anchor were not generated")
                  harvestedSeq.merge(tier, java.lang.Long.valueOf(callId),
                    (a, b) => if (a.longValue >= b.longValue) a else b)
                  // harvested entries are dropped so constructions don't
                  // leak map entries for the JVM's lifetime; a later
                  // re-execution of the same plan re-fires this metric,
                  // finds no meta, and skips — the recorded stats are
                  // identical by determinism. (Planned-but-never-executed
                  // calls still hold their entry — rare by comparison.)
                  callMeta.remove(callId)
                }
              }
            }
          }
        override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()
      })

  // ---- durable audit surface ------------------------------------------

  private val StatsName = "capstats-(\\d+)".r

  private def statsDir(outDir: String): String = s"$outDir/banding_stats"

  /** Commit the harvested cap stats of `tiers` (default: every tier
    * constructed this process, [[seenTiers]]) as an immutable
    * `capstats-NNNNNN` parquet snapshot under `outDir/banding_stats`
    * (atomic staged rename, monotonically numbered — the same commit
    * protocol as [[graft.pipeline.Progress]] snapshots). Tiers that never
    * ran are skipped. Schema: `(tier, max_bucket, n_capped_buckets,
    * n_rows_in_capped, max_bucket_size, stats_fresh, stats_id)` —
    * `stats_fresh = false` flags a tier whose newest constructed query
    * was never executed (or whose metrics had not arrived within
    * `timeoutMs`), meaning the row reports a PREVIOUS call of that tier;
    * the wait is bounded (metrics normally arrive in milliseconds) so a
    * planned-but-never-run query stalls the commit briefly instead of
    * 30 s per tier. Returns the snapshot id, or -1 when no tier had
    * stats to commit. */
  def commitStats(spark: SparkSession, outDir: String, tiers: Seq[String],
                  timeoutMs: Long = 10000L): Long = {
    val rows = tiers.flatMap(t => lastCapStats(t, timeoutMs).map(s => (s, isFresh(t))))
    if (rows.isEmpty) return -1L
    val sd = statsDir(outDir)
    val fsys = new Path(sd).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val existing =
      if (!fsys.exists(new Path(sd))) Seq.empty[Long]
      else fsys.listStatus(new Path(sd)).toSeq.map(_.getPath.getName)
        .collect { case StatsName(n) => n.toLong }
    val statsId = existing.sorted.lastOption.map(_ + 1L).getOrElse(0L)
    import spark.implicits._
    val df = rows.map { case (s, fresh) => (s.tier, s.maxBucket, s.nCappedBuckets,
        s.nRowsInCapped, s.maxBucketSize, fresh, statsId) }
      .toDF("tier", "max_bucket", "n_capped_buckets", "n_rows_in_capped",
        "max_bucket_size", "stats_fresh", "stats_id")
    val tmp = new Path(sd, f"_tmp-$statsId%06d")
    val fin = new Path(sd, f"capstats-$statsId%06d")
    df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    if (!fsys.rename(tmp, fin))
      throw new IllegalStateException(s"cap-stats commit failed: $tmp -> $fin")
    statsId
  }

  /** The latest committed cap-stats snapshot under `outDir`, if any. */
  def readStats(spark: SparkSession, outDir: String): Option[DataFrame] = {
    val sd = statsDir(outDir)
    val fsys = new Path(sd).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fsys.exists(new Path(sd))) None
    else {
      val snaps = fsys.listStatus(new Path(sd)).toSeq.map(_.getPath.getName)
        .collect { case n @ StatsName(_) => n }
      if (snaps.isEmpty) None
      else Some(spark.read.parquet(
        s"$sd/${snaps.maxBy(_.stripPrefix("capstats-").toLong)}"))
    }
  }
}
