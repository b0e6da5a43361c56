package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable document sampling — the training-mix
  * operator (per-source/per-language rates à la C4/LLaMA data recipes).
  *
  * The sample decision is a pure function of the document id: keep iff the
  * first 8 hex chars of `md5(salt || "-" || id)` are lexicographically
  * below a threshold. Hex strings order exactly like the 32-bit numbers
  * they encode, so threshold "1a000000" keeps ≈ 0x1a/0x100 ≈ 10.2% and a
  * rate r maps to the threshold `hex(floor(r * 2^32))`.
  *
  * Why this shape at 100 TB:
  *  - a pure codegen'd FILTER — no shuffle, no RNG state, no
  *    partition-order dependence: a doc's fate is identical on any
  *    cluster topology, any run, any engine (md5 is the same everywhere,
  *    which is also what makes the DuckDB oracle exact);
  *  - resumable/composable: re-running a failed partition cannot change
  *    the sample (contrast `rand()`-based sampling, which draws a new
  *    fate per attempt — SURVEY §7.4d determinism rule);
  *  - stratification is just a per-stratum threshold column, still one
  *    filter pass.
  */
object Sampling {

  /** 8-hex-char sample key in [0x00000000, 0xffffffff], uniform under the
    * md5 assumption, independent per salt. */
  def sampleKey(id: Column, salt: String): Column =
    substring(md5(concat(lit(salt + "-"), id.cast("string"))), 1, 8)

  /** Threshold for a keep-rate in [0,1]: hex(floor(rate * 2^32)),
    * zero-padded to 8 chars. rate = 1.0 returns "g" — lexicographically
    * above every 8-hex-char key ([0-9a-f]*), so `key < threshold` keeps
    * ALL docs; clamping to "ffffffff" with a strict `<` would
    * deterministically drop the ~1-in-2^32 docs whose key is exactly
    * "ffffffff" from a stratum configured to keep everything. */
  def thresholdFor(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1]: $rate")
    if (rate == 1.0) "g" else f"${(rate * 4294967296.0).toLong}%08x"
  }

  /** Uniform deterministic sample at `rate`. */
  def hashSample(df: DataFrame, idCol: String, salt: String, rate: Double): DataFrame =
    df.filter(sampleKey(col(idCol), salt) < lit(thresholdFor(rate)))

  /** Weighted deterministic sample: each doc is kept with probability
    * equal to its own `weight` column (clamped to [0,1]) — the
    * quality-weighted downsampling step of a training-mix recipe (e.g.
    * weight = a quality score, so better docs survive more often), still
    * a pure filter with a per-row threshold. The comparison stays in hex
    * string space (lowercased, zero-padded), which is what lets the
    * DuckDB oracle reproduce it exactly via printf('%08x', …). */
  def weightedSample(df: DataFrame, idCol: String, salt: String,
                     weight: Column): DataFrame = {
    // fail loudly on NULL weights: null would propagate through the clamp
    // and threshold, the filter comparison would evaluate to null, and the
    // doc would silently vanish from the sample — a missing quality score
    // must be an upstream bug, not a drop decision (coalesce a default
    // explicitly at the call site if dropping/keeping is intended)
    val checked = when(weight.isNotNull, weight).otherwise(raise_error(lit(
      "weightedSample: NULL weight — coalesce missing scores to an explicit default upstream")))
    val w = least(lit(1.0), greatest(lit(0.0), checked))
    // weight 1.0 takes the same "g" sentinel as [[thresholdFor]] (above
    // every hex key). For w < 1.0, floor(w·2^32) < 2^32 has at most 8 hex
    // chars, so the zero-pad is safe (lpad TRUNCATES when longer — never
    // feed it the w=1.0 value, whose hex is 9 chars).
    val thr = when(w >= 1.0, lit("g"))
      .otherwise(lower(lpad(hex(floor(w * lit(4294967296.0)).cast("long")), 8, "0")))
    df.filter(sampleKey(col(idCol), salt) < thr)
  }

  /** Exact deterministic per-group cap — "keep at most `cap` documents
    * per domain/source", the domain-balancing step of a web-corpus mix
    * (a handful of link farms otherwise dominate the crawl). The kept set
    * is the `cap` smallest `(sampleKey, id)` pairs per group: a pure
    * function of the data (same determinism contract as the samplers),
    * uniformly "random" under the md5 assumption, and exactly
    * reproducible by a single `row_number()` in any engine — which is
    * what the DuckDB oracle does.
    *
    * Why two phases at 100 TB: a single `Window.partitionBy(group)` puts
    * EVERY row of a group into one task — a 10^9-page domain becomes one
    * straggler sort. Instead:
    *  1. rank within `(group, shard)` — `nShards` deterministic md5-slice
    *     shards per group, so each sort handles ~1/nShards of the group —
    *     and keep rank ≤ cap. Any row in the global top-`cap` of its
    *     group has shard-local rank ≤ its global rank, so phase 1 never
    *     drops a final keeper; it bounds phase 2's input to
    *     ≤ nShards·cap rows per group.
    *  2. exact `row_number` over the survivors per group, keep ≤ cap.
    *
    * Returns the kept rows with their final `rank` (1-based). Ties in the
    * sample key are broken by id, so the order is total. */
  def cappedPerGroup(df: DataFrame, idCol: String, groupCol: String,
                     salt: String, cap: Int, nShards: Int = 32): DataFrame = {
    require(cap > 0, s"cap must be positive: $cap")
    require(nShards > 0, s"nShards must be positive: $nShards")
    import org.apache.spark.sql.expressions.Window
    val full = md5(concat(lit(salt + "-"), col(idCol).cast("string")))
    val keyed = df
      .withColumn("_g_md5", full)
      .withColumn("_g_key", substring(col("_g_md5"), 1, 8))
      // an INDEPENDENT slice of the same md5 (chars 9-12) shards the
      // group; reusing chars 1-8 would sort each shard's keys into
      // disjoint ranges and phase 1 would keep the same top keys anyway —
      // correct, but the shards would stop balancing the final sort
      .withColumn("_g_shard",
        pmod(conv(substring(col("_g_md5"), 9, 4), 16, 10).cast("int"), lit(nShards)))
    val local = Window.partitionBy(col(groupCol), col("_g_shard"))
      .orderBy(col("_g_key"), col(idCol))
    val global = Window.partitionBy(col(groupCol))
      .orderBy(col("_g_key"), col(idCol))
    keyed
      .withColumn("_g_lrank", row_number().over(local))
      .filter(col("_g_lrank") <= cap)
      .withColumn("rank", row_number().over(global))
      .filter(col("rank") <= cap)
      .drop("_g_md5", "_g_key", "_g_shard", "_g_lrank")
  }

  /** Per-stratum keep-rates (stratum value → rate); docs whose stratum is
    * not in the map are DROPPED (an explicit mix recipe, not a default).
    * One filter pass; the rate table compiles to a CASE expression. */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       salt: String, rates: Seq[(String, Double)]): DataFrame = {
    require(rates.nonEmpty, "at least one stratum rate required")
    val thr = rates.tail.foldLeft(
      when(col(stratumCol) === rates.head._1, lit(thresholdFor(rates.head._2)))) {
      case (acc, (k, r)) => acc.when(col(stratumCol) === k, lit(thresholdFor(r)))
    }
    df.withColumn("_graft_thr", thr)
      .filter(col("_graft_thr").isNotNull &&
        sampleKey(col(idCol), salt) < col("_graft_thr"))
      .drop("_graft_thr")
  }
}
