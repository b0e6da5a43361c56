package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sequence packing — the step that turns a filtered,
  * deduplicated corpus into fixed-token-budget training sequences
  * (pretraining batches concatenate documents to fill the context window;
  * the assignment doc → (sequence, offset) must be reproducible so a
  * resumed/re-run job materializes byte-identical batches).
  *
  * Packing rule: within a shard, documents are laid end-to-end in id
  * order; a document belongs to the sequence where it STARTS
  * (`seq_id = start_token / budget`), at `seq_offset = start % budget`.
  * Documents may straddle a boundary — the standard pretraining layout
  * (a crossing doc continues into the next sequence) — so no token is
  * dropped and every sequence except a shard's last is exactly full.
  *
  * Why shards: the layout is a running sum, which is inherently
  * sequential — ONE global cumulative sum would be a total sort of the
  * corpus through one task. Sharding by `id % nShards` makes each shard
  * an independent packing unit (its own sequence numbering), sized by
  * choosing `nShards` ≈ cluster parallelism × a small factor; at 100 TB
  * each shard is still billions of tokens but its window sort is
  * disk-backed and embarrassingly parallel ACROSS shards. The shard
  * assignment is a pure function of the id, so the layout is identical
  * on any cluster topology (the engine's determinism contract).
  *
  * `seq_id`/`seq_offset` are pure integer arithmetic (SQL `div` / `pmod`
  * on longs), exact for any positive budget and any cumulative token
  * count a long can hold — no floating-point division anywhere.
  */
object Packing {

  /** Pack documents into `budget`-token sequences. `tokenCol` is the
    * per-document token count (e.g. [[TextAnalysis.tokenCount]] or the
    * BPE count — whatever the training run budgets by). `idCol` must be
    * numeric and UNIQUE per shard — a duplicate id would make the
    * running sum lump the tied rows into one cumulative bucket and
    * produce overlapping offsets, so duplicates fail loudly
    * (`raise_error`) instead. Hash string ids to a long first with the
    * 64-bit [[graft.functions.ColumnFns.fnv64]] (NOT the 32-bit
    * [[Sampling.sampleKey]]: at corpus scale 32-bit collisions are
    * certain, and the check here would then abort the job).
    *
    * Output: `(id, shard, n_tokens, seq_id, seq_offset)` — `seq_id`
    * numbering is per-shard, `seq_offset` is the document's first-token
    * position inside its starting sequence. */
  def packSequences(df: DataFrame, idCol: String, tokenCol: Column,
                    budget: Long, nShards: Int = 32): DataFrame = {
    require(budget > 0, s"token budget must be positive: $budget")
    require(nShards > 0, s"nShards must be positive: $nShards")
    // explicit ROWS frame: a running sum is O(1) per row, and the default
    // RANGE frame's tie semantics never apply (ties are rejected below)
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
    val wRows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prevId = lag(col(idCol), 1).over(w)
    df.withColumn("shard", pmod(col(idCol).cast("long"), lit(nShards.toLong)))
      .withColumn("n_tokens", tokenCol.cast("long"))
      .withColumn("_p_start",
        when(prevId.isNotNull && prevId === col(idCol),
          raise_error(concat(lit("packSequences: duplicate id within shard: "),
            col(idCol).cast("string"))).cast("long"))
          .otherwise((sum(col("n_tokens")).over(wRows) - col("n_tokens")).cast("long")))
      .withColumn("seq_id", expr(s"_p_start div ${budget}L"))
      .withColumn("seq_offset", pmod(col("_p_start"), lit(budget)).cast("long"))
      .drop("_p_start")
  }
}
