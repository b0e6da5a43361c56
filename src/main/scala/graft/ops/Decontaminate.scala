package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — flag training documents that share w-gram
  * overlap with an evaluation/benchmark set (the GPT-3/LLaMA-style
  * n-gram decontamination pass every serious training pipeline runs
  * before a data release).
  *
  * Scale shape at 100 TB:
  *  - the BENCHMARK side is distinct'd w-grams and broadcast — eval sets
  *    are bounded by contract (thousands of documents, millions of
  *    n-grams ≪ executor memory). This is the one place a broadcast hint
  *    is deliberately FORCED rather than left to AQE: the fallback plan
  *    would shuffle the corpus-side gram stream (corpus-scale!), which
  *    is strictly worse than failing fast on an out-of-contract bench
  *    set;
  *  - the CORPUS side explodes to slim (doc_id, gram) pairs that
  *    semi-join map-side against the broadcast; only the HITS (tiny)
  *    reach the aggregation exchange, and the final per-doc join back is
  *    AQE-broadcast of the hit set. Nothing corpus-sized shuffles.
  *
  * Shingling reuses the dedup ladder's tokenizer/shingler
  * ([[Dedup.tokensCol]]/[[Dedup.shinglesCol]]), so "n-gram" means the
  * same thing in dedup, Jaccard verify, and decontamination — one
  * definition to oracle-check.
  */
object Decontaminate {

  /** One row per corpus doc: `(doc_id, n_hits, contaminated)` where
    * n_hits = number of DISTINCT w-grams shared with the benchmark set
    * (doc shingles are distinct by construction) and contaminated =
    * n_hits ≥ minHits. */
  def flag(corpus: DataFrame, bench: DataFrame, idCol: String, textCol: String,
           w: Int = 8, minHits: Long = 1L): DataFrame = {
    def shingles(df: DataFrame) = df.select(col(idCol).as("doc_id"),
      Dedup.shinglesCol(Dedup.tokensCol(col(textCol)), w).as("sh"))
    val benchGrams = shingles(bench).select(explode(col("sh")).as("g")).distinct()
    val docGrams = shingles(TinyInput.parallelized(corpus))
      .select(col("doc_id"), explode(col("sh")).as("g"))
    val hits = docGrams.join(broadcast(benchGrams), Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
    corpus.select(col(idCol).as("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) >= minHits).as("contaminated"))
  }
}
