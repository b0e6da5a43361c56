package graft.ops

import graft.functions.ColumnFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Passage-level (sub-document) exact duplicate detection — the
  * "exact substring dedup" tier of a training-data pipeline (Lee et al.
  * 2022, "Deduplicating Training Data Makes Language Models Better"):
  * document-level tiers miss the news article quoted inside an otherwise
  * unique page, the license header pasted into every file, the boilerplate
  * paragraph shared by 10^6 product pages. This operator finds, per
  * document, how much of its content also appears verbatim elsewhere in
  * the corpus.
  *
  * Design (Spark-first, no suffix arrays): every k-token window (stride 1
  * — windows at EVERY position, so a copied passage is found at any
  * alignment) is hashed to 64 bits with the codegen'd FNV-1a expression.
  * A window value duplicated across documents is "owned" by the smallest
  * doc id containing it (the same first-arrival keeper rule as the
  * document tiers); every other document counts that window as shared.
  *
  * Why this shape at 100 TB:
  *  - the heavy text pass is ONE projection inside whole-stage codegen
  *    (tokenize → windows → per-window FNV), emitting a slim
  *    (id, hash) stream: ~16 B per token, never the window strings;
  *  - ownership is a map-side-partial `groupBy(hash)` agg — the classic
  *    word-count shuffle shape, uniform keys by construction (hashes);
  *  - only hashes seen in ≥ 2 documents survive to the ownership join,
  *    so the join's build side is the duplicated subset, not the corpus;
  *    a boilerplate hash shared by 10^7 docs is ONE row on the owner
  *    side — the join fans out to exactly one output row per instance
  *    (linear, never quadratic; contrast the pair-join LSH tiers, which
  *    need [[Banding]]'s giant-bucket guard);
  *  - decisions depend only on (hash, id) — deterministic on any
  *    partition layout, any cluster size (the determinism contract of
  *    [[Sampling]]).
  *
  * The DuckDB oracle replays the tokenizer, the window construction, and
  * the FNV-1a fold byte-for-byte, so the driver check is exact.
  */
object PassageDedup {

  /** Distinct 64-bit FNV-1a hashes of all k-token windows (stride 1) of a
    * token array; empty when the document has fewer than k tokens. The
    * per-window hash runs inside codegen ([[graft.functions.Fnv64]]); the
    * window string is a transient `concat_ws` that never leaves the
    * projection. */
  def windowHashes(tokens: Column, k: Int): Column = {
    require(k >= 2, s"passage window must span at least 2 tokens, got $k")
    when(size(tokens) >= k,
      array_distinct(transform(
        sequence(lit(0), size(tokens) - k),
        i => ColumnFns.fnv64(concat_ws(" ", slice(tokens, i + lit(1), lit(k)))))))
      .otherwise(array().cast("array<bigint>"))
  }

  /** Per-document passage-sharing stats over the corpus:
    * `(id, n_windows, n_shared, shared_milli)` where `n_windows` counts
    * the document's distinct k-token windows, `n_shared` those windows
    * also present in a document with a SMALLER id (first-arrival
    * ownership — the canonical copy reports 0), and `shared_milli` the
    * per-mille shared fraction. Documents shorter than k tokens report
    * zeros.
    *
    * Plan: one codegen'd text pass → `explode_outer` (zero-window docs
    * keep a null row instead of needing a corpus-wide re-join) → one
    * `groupBy(hash)` ownership agg filtered to duplicated hashes → one
    * left join (instances ⋈ owners, one owner row per hash) → one
    * `groupBy(id)`. The instance frame feeds both the ownership agg and
    * the join, so it is eagerly persisted (the warehouse-scale analog is
    * a written window-hash table next to the corpus — the same shape
    * [[Dedup.dedupFrame]] documents). */
  def stats(df: DataFrame, idCol: String, textCol: String, k: Int = 8): DataFrame = {
    val inst = FrameCache.persistBounded("passage_inst", TinyInput.parallelized(df)
      .select(col(idCol).as("id"), windowHashes(Dedup.tokensCol(col(textCol)), k).as("whs"))
      // n_windows rides each instance row (8 B) so no second text pass and
      // no corpus-wide join is needed to recover it after the explode
      .select(col("id"), size(col("whs")).as("n_windows"), explode_outer(col("whs")).as("ph")))
    val owners = inst.filter(col("ph").isNotNull)
      .groupBy(col("ph"))
      .agg(min(col("id")).as("owner"), count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > 1)
      .select(col("ph"), col("owner"))
    inst.join(owners, Seq("ph"), "left")
      .groupBy(col("id"))
      .agg(first(col("n_windows")).as("n_windows"),
        sum(when(col("owner").isNotNull && col("id") > col("owner"), 1L).otherwise(0L))
          .as("n_shared"))
      .select(col("id"), col("n_windows").cast("long").as("n_windows"),
        col("n_shared"),
        floor(col("n_shared") * lit(1000L) / greatest(col("n_windows"), lit(1)))
          .cast("long").as("shared_milli"))
  }

  /** The DECISION step over [[stats]] — the Lee et al. pipeline's
    * document-level consumer of `shared_milli`: a document whose shared
    * fraction reaches `dropMilli` per-mille is marked `dropped`, the rest
    * `kept` (the canonical copy always reports 0 shared under
    * first-arrival ownership, so it is always kept). Emits the decision
    * alongside the stats rather than filtering, so the drop set is
    * auditable and the caller chooses between `filter($"decision" ===
    * "kept")` and keeping the labeled frame; same plan shape and scale
    * properties as [[stats]]. */
  def dropByShared(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 8, dropMilli: Long = 500L): DataFrame = {
    require(dropMilli >= 1 && dropMilli <= 1000,
      s"dropMilli must be in [1, 1000], got $dropMilli")
    stats(df, idCol, textCol, k)
      .withColumn("decision",
        when(col("shared_milli") >= dropMilli, lit("dropped")).otherwise(lit("kept")))
  }

  /** The SPAN-LEVEL cut — the other Lee et al. consumer: instead of
    * dropping whole documents, excise the duplicated passages themselves.
    * A token is covered when any k-token window containing it is owned by
    * a SMALLER doc id (same first-arrival ownership as [[stats]] — the
    * canonical copy keeps its text intact); the cleaned text is the
    * uncovered tokens in original order, joined by single spaces (the
    * normalized token stream — the representation a training pipeline
    * tokenizes anyway). Returns `(id, n_tokens, n_removed, text_clean)`
    * for every document; docs shorter than k tokens pass through whole.
    *
    * Plan: the tokenized frame is persisted once and feeds both the
    * positioned window pass and the final cut, so the text is scanned
    * once. Positioned (id, pos, hash) rows are slim (12 B past the
    * exchange); ownership is the same duplicated-subset aggregation as
    * [[stats]]; owned window starts fold back per doc (bounded by doc
    * length), expand to covered token positions via
    * `flatten(transform(...sequence))`, and one `array_except` keeps the
    * uncovered positions in order — O(windows · k + tokens) per doc,
    * never quadratic, all inside one codegen'd projection. */
  def excise(df: DataFrame, idCol: String, textCol: String, k: Int = 8): DataFrame = {
    require(k >= 2, s"passage window must span at least 2 tokens, got $k")
    val toksF = FrameCache.persistBounded("passage_toks", TinyInput.parallelized(df)
      .select(col(idCol).as("id"), Dedup.tokensCol(col(textCol)).as("toks")))
    val winPos = toksF.filter(size(col("toks")) >= k)
      .select(col("id"), posexplode(transform(
        sequence(lit(0), size(col("toks")) - k),
        i => ColumnFns.fnv64(concat_ws(" ", slice(col("toks"), i + lit(1), lit(k)))))))
      .withColumnRenamed("col", "ph")
    // same ownership rule as stats(): distinct per doc, smallest doc wins,
    // only hashes present in >= 2 documents
    val owners = winPos.select(col("id"), col("ph")).distinct()
      .groupBy(col("ph"))
      .agg(min(col("id")).as("owner"), count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > 1)
      .select(col("ph"), col("owner"))
    val starts = winPos.join(owners, Seq("ph"))
      .filter(col("id") > col("owner"))
      .groupBy(col("id"))
      .agg(collect_set(col("pos")).as("starts"))
    toksF.join(starts, Seq("id"), "left")
      .withColumn("covered", array_distinct(flatten(transform(
        coalesce(col("starts"), array().cast("array<int>")),
        p => sequence(p, p + lit(k - 1))))))
      .withColumn("kept", array_except(
        when(size(col("toks")) > 0, sequence(lit(0), size(col("toks")) - 1))
          .otherwise(array().cast("array<int>")),
        col("covered")))
      .select(col("id"), size(col("toks")).as("n_tokens"),
        (size(col("toks")) - size(col("kept"))).as("n_removed"),
        concat_ws(" ", transform(col("kept"), j => element_at(col("toks"), j + lit(1))))
          .as("text_clean"))
  }
}
