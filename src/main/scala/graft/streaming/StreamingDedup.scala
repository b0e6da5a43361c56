package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming exact deduplication — the ingest-time counterpart of the
  * batch dedup ladder's exact tier (`ops.Dedup.exactGroups`): documents
  * arrive in micro-batches, are keyed by their normalized-text
  * fingerprint, and the FIRST document of each fingerprint becomes the
  * keeper; every later arrival — same micro-batch or any later one —
  * emits as an `exact_dup` of that keeper.
  *
  * KEEPER CONTRACT — first-arrival, not global min-id. Within one
  * micro-batch the smallest doc_id wins (the iterator is sorted, making
  * the choice deterministic), but ACROSS micro-batches the first-seen
  * keeper is final: append-mode output cannot retract an
  * already-emitted `kept` decision, so a smaller doc_id arriving in a
  * later batch is emitted as an `exact_dup` of the earlier keeper. This
  * is the standard streaming-dedup semantic. It coincides with the
  * batch tier's `min(id)` rule only when micro-batches arrive in
  * ascending doc_id order (the replay case — verified in
  * StreamingSpec); out-of-order ingest diverges on the keeper CHOICE
  * while still agreeing on group membership and sizes (also verified,
  * with a smaller id arriving in a later batch).
  *
  * State is one `(keeper_id, n_seen)` entry per DISTINCT fingerprint —
  * the same cardinality as the batch tier's aggregation, sharded across
  * executors by the `groupByKey` exchange. At warehouse scale this runs
  * on the RocksDB state store provider; for bounded retention (dedup
  * within a crawl window) add a `GroupStateTimeout` TTL — unbounded here
  * because the batch ladder remains the full-corpus backstop.
  */
object StreamingDedup {

  final case class FpDoc(doc_id: Long, fp: String)
  final case class DedupState(keeper_id: Long, n_seen: Long)
  final case class Decision(doc_id: Long, keeper_id: Long, decision: String)

  /** Pure per-key decision step (unit-testable without a stream): the
    * iterator order within a batch is arbitrary, so sort by doc_id to
    * make the first-keeper choice deterministic. */
  def decide(docs: Iterator[FpDoc],
             state: Option[DedupState]): (Seq[Decision], DedupState) = {
    val sorted = docs.toSeq.sortBy(_.doc_id)
    var st = state.getOrElse(DedupState(-1L, 0L))
    val out = sorted.map { d =>
      if (st.n_seen == 0L) {
        st = DedupState(d.doc_id, 1L)
        Decision(d.doc_id, d.doc_id, "kept")
      } else {
        st = DedupState(st.keeper_id, st.n_seen + 1L)
        Decision(d.doc_id, st.keeper_id, "exact_dup")
      }
    }
    (out, st)
  }

  /** Streaming form: one state entry per distinct fingerprint. */
  def stream(spark: SparkSession, docs: Dataset[FpDoc]): Dataset[Decision] = {
    import spark.implicits._
    docs.groupByKey(_.fp)
      .flatMapGroupsWithState[DedupState, Decision](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, it: Iterator[FpDoc], state: GroupState[DedupState]) =>
          val (out, st) = decide(it, state.getOption)
          state.update(st)
          out.iterator
      }
  }

  /** Project a (doc_id, text) frame — batch or streaming — to the
    * fingerprinted shape the dedup state is keyed by. The fingerprint is
    * the SAME expression the batch exact tier uses, so batch and stream
    * agree byte-for-byte on what counts as a duplicate. */
  def fingerprinted(spark: SparkSession, df: DataFrame): Dataset[FpDoc] = {
    import spark.implicits._
    df.select(col("doc_id").cast("long").as("doc_id"),
        graft.ops.TextAnalysis.fingerprint(col("text")).as("fp"))
      .as[FpDoc]
  }

  // ---- streaming simhash near-dup tier ---------------------------------

  final case class BandDoc(band_id: Int, band_key: Long, doc_id: Long, sim: Long)
  final case class SimEntry(doc_id: Long, sim: Long)
  final case class BandState(entries: Seq[SimEntry])
  /** One row per (near-dup pair, shared band). A pair within Hamming ≤ 3
    * can share several of the 4 bands and then emits once per shared-band
    * group — append output cannot distinct across state groups, so
    * CONSUMERS DEDUPE on (id_a, id_b) (exactly what the batch tier's
    * global `distinct()` does; verified equivalent in StreamingSpec). */
  final case class NearPair(id_a: Long, id_b: Long, hamming: Int, band_id: Int)

  /** Ingest-time SimHash near-dup detection — the streaming counterpart of
    * the batch ladder's simhash tier (`ops.Dedup.simhashCandidates`),
    * sharing its exact signature + banding expressions so batch and
    * stream agree bit-for-bit on WHAT is a candidate.
    *
    * State: per (band_id, band_key) bucket, the arrival-ordered list of
    * (doc_id, sim) seen so far — the streaming form of the batch banded
    * frame, sharded by the groupByKey exchange. Each arriving doc
    * Hamming-verifies against its bucket's state (and earlier same-batch
    * arrivals, doc_id-sorted for determinism) and then joins the state.
    *
    * KEEPER/PAIR CONTRACT — first-arrival, like the exact tier: `id_a` is
    * the EARLIER arrival of the pair. Under id-ordered replay that
    * coincides with the batch tier's `id_a < id_b`; out-of-order ingest
    * diverges on pair ORIENTATION only (membership and Hamming agree) —
    * both directions are tested in StreamingSpec. Membership equality
    * with the batch tier likewise holds for UNCAPPED buckets only (see
    * the guard paragraph below: over-cap buckets emit the first-
    * `maxBucket` clique + anchor stars here vs batch's star-only set —
    * a superset of verified pairs, r05 review).
    *
    * GIANT-BUCKET GUARD — the stream mirror of [[graft.ops.Banding]]:
    * once a bucket's state holds `maxBucket` entries, new members verify
    * against the bucket's FIRST arrival only (the anchor) and do not join
    * the state, so a boilerplate cluster costs O(1) per arrival instead
    * of O(|cluster|), at the same documented star approximation.
    *
    * State is unbounded across distinct band keys (like the exact tier):
    * RocksDB state store at warehouse scale, `GroupStateTimeout` TTL for
    * windowed retention; the batch ladder remains the full-corpus
    * backstop. */
  def decideNear(docs: Iterator[BandDoc], state: Option[BandState],
                 maxHamming: Int, maxBucket: Int): (Seq[NearPair], BandState) = {
    // matches Banding.guardedPairs' validation: maxBucket <= 0 would make
    // every bucket "capped" over an empty state — the whole tier would
    // silently emit nothing, a total recall loss with no error signal
    require(maxBucket >= 1, s"maxBucket must be >= 1, got $maxBucket")
    val sorted = docs.toSeq.sortBy(_.doc_id)
    var entries = state.map(_.entries.toVector).getOrElse(Vector.empty)
    val out = Seq.newBuilder[NearPair]
    sorted.foreach { d =>
      val capped = entries.length >= maxBucket
      val compareAgainst = if (capped) entries.take(1) else entries
      compareAgainst.foreach { e =>
        if (e.doc_id != d.doc_id) {
          val h = java.lang.Long.bitCount(e.sim ^ d.sim)
          if (h <= maxHamming) out += NearPair(e.doc_id, d.doc_id, h, d.band_id)
        }
      }
      if (!capped) entries = entries :+ SimEntry(d.doc_id, d.sim)
    }
    (out.result(), BandState(entries))
  }

  /** Band the documents of a (doc_id, text) frame — batch or streaming —
    * with the batch tier's exact simhash + 4×16-bit band expressions. */
  def simhashBanded(spark: SparkSession, df: DataFrame): Dataset[BandDoc] = {
    import spark.implicits._
    import graft.ops.Dedup
    df.select(col("doc_id").cast("long").as("doc_id"),
        Dedup.simhash64(Dedup.tokensCol(col("text"))).as("sim"))
      .select(col("doc_id"), col("sim"),
        posexplode(Dedup.simhashBandKeys(col("sim"))))
      .withColumnRenamed("pos", "band_id").withColumnRenamed("col", "band_key")
      .select($"band_id".cast("int").as("band_id"), $"band_key", $"doc_id", $"sim")
      .as[BandDoc]
  }

  /** Streaming form: one state entry list per distinct (band, key). */
  def streamNear(spark: SparkSession, banded: Dataset[BandDoc],
                 maxHamming: Int = 3,
                 maxBucket: Int = graft.ops.Dedup.DefaultMaxBucket): Dataset[NearPair] = {
    require(maxBucket >= 1, s"maxBucket must be >= 1, got $maxBucket") // fail at plan time, not per group
    import spark.implicits._
    banded.groupByKey(b => (b.band_id, b.band_key))
      .flatMapGroupsWithState[BandState, NearPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (Int, Long), it: Iterator[BandDoc], state: GroupState[BandState]) =>
          val (out, st) = decideNear(it, state.getOption, maxHamming, maxBucket)
          state.update(st)
          out.iterator
      }
  }

  // ---- streaming minhash/Jaccard near-dup tier -------------------------

  final case class MinhashBandDoc(band_id: Int, band_hash: Long, doc_id: Long,
                                  sh: Seq[String])
  final case class ShEntry(doc_id: Long, sh: Seq[String])
  final case class MinhashBandState(entries: Seq[ShEntry])
  /** One row per (verified near-dup pair, shared band) — like
    * [[NearPair]], consumers dedupe on (id_a, id_b): the `jaccard_milli`
    * is a pure function of the pair, so a distinct over all three columns
    * is exactly the batch tier's global `distinct()`. */
  final case class MinhashPair(id_a: Long, id_b: Long, jaccard_milli: Long,
                               band_id: Int)

  /** Ingest-time MinHash+LSH near-dup detection — the streaming
    * counterpart of the batch ladder's minhash tier
    * (`ops.Dedup.minhashCandidates`), completing the streaming ladder
    * (exact → simhash → minhash). Banding shares the batch tier's exact
    * shingle, signature, and band-hash expressions
    * ([[graft.ops.Dedup.minhashBandHashes]] is the single definition), so
    * batch and stream agree bit-for-bit on WHAT shares a bucket.
    *
    * VERIFY CHOICE — exact Jaccard at ingest (not signature-estimate):
    * each bucket's state carries the arrival-ordered (doc_id, shingle
    * set) entries, and an arriving doc verifies with the SAME
    * `|A∩B| / (|A|+|B|-|A∩B|)` per-mille computation the batch tier runs,
    * so under id-ordered replay the streamed pair set (deduped across
    * bands) equals `minhashCandidates` exactly, jaccard values included
    * (verified in StreamingSpec). CAVEAT (r05 review): the equality claim
    * holds for UNCAPPED buckets only — in an over-cap bucket this tier
    * emits the full clique among the first `maxBucket` arrivals and
    * anchor-star pairs afterwards, while the batch guard emits star-only
    * pairs for the whole bucket, so the stream emits a SUPERSET there
    * (extra verified true pairs, never false ones). The cost of that choice is state WIDTH:
    * a doc's shingle set (~its token count in strings) is duplicated
    * across its NumBands buckets, where the simhash tier stores 8 bytes.
    * That is the honest trade at warehouse scale — for a leaner ingest
    * path, band on the signature alone, emit UNVERIFIED candidate ids,
    * and let the batch ladder's Jaccard verify (which reads the persisted
    * shingle frame) be the backstop; this tier keeps the verify at ingest
    * so its emissions are decisions, not suggestions. Bound retention
    * with a `GroupStateTimeout` TTL (crawl-window dedup) and run on the
    * RocksDB state store provider; the batch ladder remains the
    * full-corpus backstop.
    *
    * PAIR CONTRACT — first-arrival orientation like the other tiers:
    * `id_a` is the earlier arrival, coinciding with the batch `id_a <
    * id_b` under ordered replay; out-of-order ingest diverges on
    * orientation only (membership and jaccard agree).
    *
    * GIANT-BUCKET GUARD — the stream mirror of [[graft.ops.Banding]]:
    * once a bucket holds `maxBucket` entries, later arrivals verify
    * against the FIRST arrival only (the anchor) and do not join the
    * state — a boilerplate cluster costs O(1) per arrival (and O(1)
    * state) instead of O(|cluster|), at the same documented star
    * approximation. */
  def decideMinhash(docs: Iterator[MinhashBandDoc], state: Option[MinhashBandState],
                    minJaccardMilli: Long, maxBucket: Int)
      : (Seq[MinhashPair], MinhashBandState) = {
    require(maxBucket >= 1, s"maxBucket must be >= 1, got $maxBucket")
    val sorted = docs.toSeq.sortBy(_.doc_id)
    var entries = state.map(_.entries.toVector).getOrElse(Vector.empty)
    val out = Seq.newBuilder[MinhashPair]
    sorted.foreach { d =>
      val capped = entries.length >= maxBucket
      val compareAgainst = if (capped) entries.take(1) else entries
      compareAgainst.foreach { e =>
        if (e.doc_id != d.doc_id) {
          val jm = jaccardMilli(e.sh, d.sh)
          if (jm >= minJaccardMilli) out += MinhashPair(e.doc_id, d.doc_id, jm, d.band_id)
        }
      }
      if (!capped) entries = entries :+ ShEntry(d.doc_id, d.sh)
    }
    (out.result(), MinhashBandState(entries))
  }

  /** Exact per-mille Jaccard over distinct shingle sets — the Scala
    * transcription of the batch verify's `|A∩B|*1000 / (|A|+|B|-|A∩B|)`
    * column expression (inputs are `array_distinct`'d by construction;
    * both computations floor, so they agree integer-for-integer). */
  private[streaming] def jaccardMilli(a: Seq[String], b: Seq[String]): Long = {
    val (small, large) = if (a.length <= b.length) (a, b) else (b, a)
    val set = small.toSet
    var inter = 0
    large.foreach(s => if (set.contains(s)) inter += 1)
    val denom = a.length + b.length - inter
    if (denom == 0) 1000L else (inter.toLong * 1000L) / denom
  }

  /** Band the documents of a (doc_id, text) frame — batch or streaming —
    * with the batch tier's exact shingle + signature + band-hash
    * expressions. The shingle set rides along for the ingest-time verify
    * (see [[decideMinhash]]'s verify-choice note); the signature itself
    * is consumed by the banding and not carried further. */
  def minhashBanded(spark: SparkSession, df: DataFrame, w: Int = 3): Dataset[MinhashBandDoc] = {
    import spark.implicits._
    import graft.ops.Dedup
    df.select(col("doc_id").cast("long").as("doc_id"),
        Dedup.shinglesCol(Dedup.tokensCol(col("text")), w).as("sh"))
      .withColumn("sig", Dedup.minhashSig(col("sh")))
      .select(col("doc_id"), col("sh"), posexplode(Dedup.minhashBandHashes(col("sig"))))
      .withColumnRenamed("pos", "band_id").withColumnRenamed("col", "band_hash")
      .select($"band_id".cast("int").as("band_id"), $"band_hash", $"doc_id", $"sh")
      .as[MinhashBandDoc]
  }

  /** Streaming form: one state entry list per distinct (band, hash). */
  def streamMinhash(spark: SparkSession, banded: Dataset[MinhashBandDoc],
                    minJaccardMilli: Long = 500L,
                    maxBucket: Int = graft.ops.Dedup.DefaultMaxBucket): Dataset[MinhashPair] = {
    require(maxBucket >= 1, s"maxBucket must be >= 1, got $maxBucket") // fail at plan time, not per group
    import spark.implicits._
    banded.groupByKey(b => (b.band_id, b.band_hash))
      .flatMapGroupsWithState[MinhashBandState, MinhashPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: (Int, Long), it: Iterator[MinhashBandDoc], state: GroupState[MinhashBandState]) =>
          val (out, st) = decideMinhash(it, state.getOption, minJaccardMilli, maxBucket)
          state.update(st)
          out.iterator
      }
  }
}
