package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for web-scale training corpora. Four tiers,
  * cheapest first — at 100 TB you run them in this order and each tier
  * prunes the candidate space of the next:
  *
  *  1. exact     — hash-groupBy on a normalized fingerprint (one shuffle);
  *  2. minhash   — shingle → k minhashes → banded LSH; only docs sharing a
  *                 (band, band-hash) bucket are candidate pairs, so the
  *                 quadratic verify join runs per-bucket, never globally;
  *  3. simhash   — 64-bit near-dup signature; Hamming-ball lookup via
  *                 4×16-bit band keys (any pair within Hamming distance 3
  *                 shares at least one of 4 bands by pigeonhole);
  *  4. n-gram Jaccard — the exact verifier applied to candidate pairs.
  *
  * Everything before the per-bucket joins is built-in expressions
  * (codegen'd, no UDF): shingling via `transform`+`sequence`, minhashing
  * via `array_min` over `xxhash64`, simhash via bit-bucket counting.
  */
object Dedup {

  /** Per-call-site cache bound: persisting signature frames is required
    * (both join sides read them) but a lazily-returned DataFrame has no
    * natural unpersist point — so each helper evicts ITS previous
    * invocation's cache, bounding storage to one corpus-sized frame per
    * function instead of one per call across a query sweep. */
  private val lastPersisted =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  private def persistBounded(key: String, df: DataFrame): DataFrame = {
    val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val prev = lastPersisted.put(key, cached)
    // blocking: async removal lets dead blocks pile up across repeated
    // calls and later persists pay synchronous eviction storms (measured:
    // repeated minhash sweeps degraded 7s → 22s with non-blocking)
    if (prev != null && (prev ne cached)) prev.unpersist(blocking = true)
    cached
  }

  private def parallelized(df: DataFrame): DataFrame = TinyInput.parallelized(df)

  // ---- shared tokenization -------------------------------------------

  def tokensCol(text: Column): Column =
    filter(split(regexp_replace(lower(text), "\\s+", " "), " "), t => t =!= lit(""))

  /** Word w-shingles: transform over a 0..n-w index sequence, each index
    * sliced+joined — stays entirely inside codegen. */
  def shinglesCol(tokens: Column, w: Int): Column =
    when(size(tokens) >= w,
      array_distinct(transform(
        sequence(lit(0), size(tokens) - w),
        i => concat_ws(" ", slice(tokens, i + lit(1), lit(w))))))
      .otherwise(array_distinct(array(concat_ws(" ", tokens))))

  // ---- 1. exact dedup -------------------------------------------------

  /** Exact duplicate groups by normalized-text fingerprint: one
    * hash-partitioned aggregation, map-side partial agg does the heavy
    * lifting; output is only the duplicated groups (tiny). */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(count(lit(1)).as("n_dups"), min(col(idCol)).as("keeper_id"))
      .filter(col("n_dups") > 1)

  // ---- 2. minhash + banded LSH ---------------------------------------

  val NumHashes = 32
  // 16 bands x 2 rows: P(candidate) = 1-(1-j^2)^16 — ≥0.999 at j=0.6,
  // ≥0.99 at j=0.5; false candidates are cheap because the exact-Jaccard
  // verify immediately follows in the same stage.
  val NumBands = 16

  /** k-permutation minhash signature — single-pass custom expression
    * (see [[graft.functions.MinHashSig]] for why a cheaper two-hash
    * construction is NOT valid for minhash). */
  def minhashSig(shingles: Column, k: Int = NumHashes): Column =
    graft.functions.ColumnFns.minhashSig(shingles, k)

  /** Candidate near-dup pairs via banded LSH + exact Jaccard verify.
    * The explode is bounded: NumBands rows per doc; the self-join runs on
    * (band_id, band_hash) buckets so the shuffle key is uniform unless the
    * corpus truly contains giant duplicate clusters — those are exactly
    * the rows you want co-located anyway. */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        w: Int = 3, minJaccardMilli: Long = 500L): DataFrame = {
    val rowsPerBand = NumHashes / NumBands
    // persist: the signatures frame feeds the banding pass AND the verify
    // joins; without it shingling+minhashing recomputes per consumer. At
    // warehouse scale this is a persisted signatures table.
    val withSig = persistBounded("minhash", parallelized(df)
      .select(col(idCol).as("id"), shinglesCol(tokensCol(col(textCol)), w).as("sh"))
      .withColumn("sig", minhashSig(col("sh"))))
    // candidate ID pairs from bands only — the self-join shuffles SLIM
    // (band_id, band_hash, id) rows, never the shingle arrays (which are
    // ~100x the id width and would otherwise cross the exchange twice)
    val banded = withSig.select(
      col("id"),
      posexplode(transform(sequence(lit(0), lit(NumBands - 1)),
        b => xxhash64(concat_ws(",", slice(col("sig"), b * rowsPerBand + lit(1), lit(rowsPerBand)))))))
      .withColumnRenamed("pos", "band_id").withColumnRenamed("col", "band_hash")
    val candidates = banded.select(col("band_id"), col("band_hash"), col("id").as("id_a"))
      .join(banded.select(col("band_id"), col("band_hash"), col("id").as("id_b")),
        Seq("band_id", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    // verify: fetch shingles ONLY for the (tiny) candidate set
    val shA = withSig.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val shB = withSig.select(col("id").as("id_b"), col("sh").as("sh_b"))
    // |A∪B| = |A|+|B|-|A∩B| (shingles are array_distinct'd): one hash-set
    // pass per pair instead of two — the union build was ~half the verify
    candidates.join(shA, Seq("id_a")).join(shB, Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .select(col("id_a"), col("id_b"),
        ((col("inter") * 1000L).cast("long")
          / (size(col("sh_a")) + size(col("sh_b")) - col("inter"))).cast("long")
          .as("jaccard_milli"))
      .filter(col("jaccard_milli") >= minJaccardMilli)
  }

  // ---- 3. simhash -----------------------------------------------------

  /** 64-bit SimHash signature — a custom single-pass Catalyst expression
    * (see [[graft.functions.SimHash64]]); composing it from built-in array
    * functions would re-traverse the token array once per bit. */
  def simhash64(tokens: Column): Column =
    graft.functions.ColumnFns.simhash64(tokens)

  /** Near-dup pairs by SimHash: pairs within Hamming distance `maxHamming`
    * found via 4×16-bit band keys (pigeonhole: distance ≤ 3 ⇒ at least one
    * of the 4 bands is identical). */
  def simhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        maxHamming: Int = 3): DataFrame = {
    val withSig = persistBounded("simhash", parallelized(df).select(col(idCol).as("id"),
      simhash64(tokensCol(col(textCol))).as("sim")))
    val banded = withSig.select(col("id"), col("sim"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("sim"), b * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .withColumnRenamed("pos", "band_id").withColumnRenamed("col", "band_key")
    val a = banded.select(col("band_id"), col("band_key"), col("id").as("id_a"), col("sim").as("sim_a"))
    val b = banded.select(col("band_id"), col("band_key"), col("id").as("id_b"), col("sim").as("sim_b"))
    a.join(b, Seq("band_id", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ---- 4. exact n-gram Jaccard ---------------------------------------

  /** Exact token-set Jaccard (per-mille, integer) for all pairs within a
    * grouping column — the verify step; the group key bounds the join.
    * At 100 TB the group is an LSH bucket; here it's also exposed over a
    * natural key (`source`) for the DuckDB oracle. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   groupCol: String, minMilli: Long): DataFrame = {
    val t = persistBounded("jaccard", parallelized(df).select(col(groupCol).as("g"), col(idCol).as("id"),
      array_distinct(tokensCol(col(textCol))).as("toks")))
    val a = t.select(col("g"), col("id").as("id_a"), col("toks").as("toks_a"))
    val b = t.select(col("g"), col("id").as("id_b"), col("toks").as("toks_b"))
    // |A∪B| = |A|+|B|-|A∩B| (toks are distinct): skip the array_union
    // hash-set build — it was half the per-pair cost of the verify tier
    a.join(b, Seq("g"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("inter", size(array_intersect(col("toks_a"), col("toks_b"))))
      .select(col("id_a"), col("id_b"),
        floor((col("inter") * lit(1000L))
          / (size(col("toks_a")) + size(col("toks_b")) - col("inter"))).as("jaccard_milli"))
      .filter(col("jaccard_milli") >= minMilli)
  }

  /** Keeper selection over near-dup pairs: smallest id in each connected
    * component approximated by min-neighbor (single pass; exact grouping
    * via [[connectedComponents]] when dup chains matter). */
  def keepers(pairs: DataFrame): DataFrame =
    pairs.select(col("id_a").as("id"), col("id_b").as("dup"))
      .groupBy(col("dup")).agg(min(col("id")).as("keeper"))

  /** Connected components over the near-dup pair graph by iterated
    * min-label propagation — the exact keeper grouping for transitive dup
    * chains (A~B, B~C ⇒ one component even when A~C was never emitted).
    *
    * Scale shape: each iteration is one join + one aggregation (2 shuffles
    * on the node id); iterations needed = O(log(diameter)) for near-dup
    * graphs, whose components are small and dense. `localCheckpoint` after
    * every iteration cuts the exponentially-stacking lineage (classic
    * iterative-Spark failure mode); on a cluster with executor loss
    * concerns use reliable `checkpoint` with a checkpoint dir instead.
    * The edge list persists once and feeds every iteration.
    *
    * Returns (id, comp) for every id appearing in `pairs`, comp = min id
    * of the component. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val sym = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()
    val compType = labels.schema("comp").dataType
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      val prop = sym.join(labels, sym("src") === labels("id"))
        .select(col("dst").as("id"), col("comp"))
      // carry the previous label through the aggregation so the
      // convergence count rides the SAME action as the checkpoint
      // materialization (an extra count job per iteration doubles the
      // per-iteration latency on small graphs). Every prop id exists in
      // labels (labels covers all endpoints), so prev is never null.
      val obs = new org.apache.spark.sql.Observation(s"graft-cc-i$iter-${labels.hashCode()}")
      val next = labels.select(col("id"), col("comp"), col("comp").as("prev"))
        .unionByName(prop.withColumn("prev", lit(null).cast(compType)))
        .groupBy("id").agg(min("comp").as("comp"), max("prev").as("prev"))
        .observe(obs, coalesce(sum(when(col("comp") =!= col("prev"), 1L).otherwise(0L)), lit(0L))
          .as("n_changed"))
        .select(col("id"), col("comp"))
        .localCheckpoint()
      changed = obs.get("n_changed").asInstanceOf[Long]
      labels = next
      iter += 1
    }
    sym.unpersist(blocking = false)
    labels
  }
}
