package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
  * Guarded plan, chosen per call from ONE cheap aggregation over the
  * already-slim banded frame (the frames are FrameCache-persisted by the
  * callers, so the sizing pass reads cached blocks):
  *
  *  - no bucket over `maxBucket` (the normal case, and always the case at
  *    the verify SFs): the plan is EXACTLY the unguarded all-pairs join —
  *    zero overhead beyond the sizing aggregation;
  *  - otherwise: buckets ≤ `maxBucket` join all-pairs as before, while
  *    each oversized bucket contributes only `(anchor, member)` star
  *    pairs, anchor = the bucket's minimum id. O(|bucket|) rows instead
  *    of O(|bucket|²); downstream verify (Jaccard / Hamming / cosine)
  *    still runs on every star pair, and connected components still
  *    collapses the cluster through the anchor.
  *
  * Approximation contract (documented, not silent): within an oversized
  * bucket, pairs NOT mediated by the anchor are never emitted, so two
  * members that each fail the verify against the anchor but would pass
  * against each other are missed. For the boilerplate clusters the guard
  * exists for — everything near-identical to everything — the star is
  * lossless after CC. Per the no-silent-caps rule, every capped call
  * logs a warning with bucket counts/sizes and records the same numbers
  * retrievably in [[Banding.lastCapStats]].
  */
object Banding {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Capped-bucket metrics of the most recent guarded call per tier. */
  final case class CapStats(tier: String, maxBucket: Int,
                            nCappedBuckets: Long, nRowsInCapped: Long,
                            maxBucketSize: Long)

  private val capStats =
    new java.util.concurrent.ConcurrentHashMap[String, CapStats]()

  /** Metrics of the last guarded call for `tier` (None = never capped —
    * entries are recorded on capped AND uncapped calls so a formerly
    * capped tier that stops capping reads as nCappedBuckets = 0). */
  def lastCapStats(tier: String): Option[CapStats] = Option(capStats.get(tier))

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
    * with a total `<`. */
  def guardedPairs(banded: DataFrame, keyCols: Seq[String], idCol: String,
                   maxBucket: Int, tier: String): DataFrame = {
    require(maxBucket >= 1, s"maxBucket must be >= 1, got $maxBucket")
    val slim = banded.select((keyCols :+ idCol).map(col): _*)
    val a = slim.withColumnRenamed(idCol, "id_a")
    val b = slim.withColumnRenamed(idCol, "id_b")
    def allPairs(left: DataFrame, right: DataFrame): DataFrame =
      left.join(right, keyCols)
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"))
    val big = oversizedBuckets(slim, keyCols, idCol, maxBucket)
    // ONE eager sizing pass (map-side-partial agg on the slim cached
    // frame) picks the plan; it is also what makes the cap non-silent
    val s = big.agg(count(lit(1)).as("n"),
      coalesce(sum(col("n_rows")), lit(0L)).as("rows"),
      coalesce(max(col("n_rows")), lit(0L)).as("mx")).first()
    val stats = CapStats(tier, maxBucket, s.getLong(0), s.getLong(1), s.getLong(2))
    capStats.put(tier, stats)
    if (stats.nCappedBuckets == 0L) allPairs(a, b).distinct()
    else {
      log.warn(s"[$tier] ${stats.nCappedBuckets} bucket(s) exceed maxBucket=$maxBucket " +
        s"(${stats.nRowsInCapped} rows total, largest ${stats.maxBucketSize}): " +
        "emitting linear (bucket-min anchor, member) star pairs for them instead of " +
        "the quadratic all-pairs clique; pairs not mediated by an anchor are not generated")
      val bigKeys = big.select(keyCols.map(col): _*)
      val smallPairs = allPairs(
        a.join(bigKeys, keyCols, "left_anti"),
        b.join(bigKeys, keyCols, "left_anti"))
      // anchor = min(id) of the bucket, so star pairs are ordered already
      val starPairs = slim.join(big.select((keyCols.map(col) :+ col("anchor_id")): _*), keyCols)
        .filter(col(idCol) =!= col("anchor_id"))
        .select(col("anchor_id").as("id_a"), col(idCol).as("id_b"))
      smallPairs.unionByName(starPairs).distinct()
    }
  }
}
