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
}
