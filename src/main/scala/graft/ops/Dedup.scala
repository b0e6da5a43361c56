package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

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
  * via a single-pass custom expression, simhash via bit-bucket counting.
  */
object Dedup {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private def persistBounded(key: String, df: DataFrame): DataFrame =
    FrameCache.persistBounded(key, df)

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
  // default giant-bucket cap for the banded self-joins (see Banding):
  // 10^4 members caps any single bucket's pair clique at ~5·10^7 before
  // the star guard kicks in — large enough that organic dup groups never
  // trip it, small enough that a 10^6-page boilerplate cluster costs
  // O(10^6) star rows instead of O(10^12) clique rows
  val DefaultMaxBucket = 10000

  /** k-permutation minhash signature — single-pass custom expression
    * (see [[graft.functions.MinHashSig]] for why a cheaper two-hash
    * construction is NOT valid for minhash). */
  def minhashSig(shingles: Column, k: Int = NumHashes): Column =
    graft.functions.ColumnFns.minhashSig(shingles, k)

  /** The per-doc dedup frame `(id, fp, sh, sig)` — ONE heavy pass over the
    * corpus computing the exact-tier fingerprint, the shingle set and the
    * minhash signature together, eagerly persisted so every tier of the
    * ladder (exact groups, banding, verify joins) reads cached blocks
    * instead of re-running the text pass. At warehouse scale this is the
    * persisted signatures table next to the corpus. */
  def dedupFrame(df: DataFrame, idCol: String, textCol: String, w: Int = 3,
                 cacheKey: String = "dedup_frame"): DataFrame =
    persistBounded(cacheKey, parallelized(df)
      .select(col(idCol).as("id"),
        TextAnalysis.fingerprint(col(textCol)).as("fp"),
        shinglesCol(tokensCol(col(textCol)), w).as("sh"))
      .withColumn("sig", minhashSig(col("sh"))))

  /** Candidate near-dup pairs from a precomputed `(id, sh, sig)` frame
    * (must be materialized — see [[dedupFrame]]). The explode is bounded:
    * NumBands rows per doc; the self-join runs on (band_id, band_hash)
    * buckets so the shuffle key is uniform — and buckets over `maxBucket`
    * members (boilerplate clusters, the web-corpus norm) are star-routed
    * through [[Banding.guardedPairs]] instead of going quadratic. */
  /** The NumBands band hashes of a k-minhash signature (NumHashes/NumBands
    * signature rows per band, xxhash64 over the band's joined values). THE
    * single definition — the batch tier and
    * [[graft.streaming.StreamingDedup]] both band through it, which is
    * what makes their candidate sets agree bit-for-bit. */
  def minhashBandHashes(sig: Column): Column = {
    val rowsPerBand = NumHashes / NumBands
    transform(sequence(lit(0), lit(NumBands - 1)),
      b => xxhash64(concat_ws(",", slice(sig, b * rowsPerBand + lit(1), lit(rowsPerBand)))))
  }

  def minhashCandidatesFromSig(withSig: DataFrame, minJaccardMilli: Long,
                               maxBucket: Int = DefaultMaxBucket): DataFrame = {
    // candidate ID pairs from bands only — the self-join shuffles SLIM
    // (band_id, band_hash, id) rows, never the shingle arrays (which are
    // ~100x the id width and would otherwise cross the exchange twice)
    val banded = withSig.select(
      col("id"), posexplode(minhashBandHashes(col("sig"))))
      .withColumnRenamed("pos", "band_id").withColumnRenamed("col", "band_hash")
    val candidates =
      Banding.guardedPairs(banded, Seq("band_id", "band_hash"), "id", maxBucket, "minhash")
    // verify: fetch shingles ONLY for the (tiny) candidate set
    val shA = withSig.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val shB = withSig.select(col("id").as("id_b"), col("sh").as("sh_b"))
    // |A∪B| = |A|+|B|-|A∩B| (shingles are array_distinct'd): one hash-set
    // pass per pair instead of two — the union build was ~half the verify.
    // intersectCount = size(array_intersect(...)) without materializing
    // the intersection array per pair (r06 per-task work)
    candidates.join(shA, Seq("id_a")).join(shB, Seq("id_b"))
      .withColumn("inter", graft.functions.ColumnFns.intersectCount(col("sh_a"), col("sh_b")))
      .select(col("id_a"), col("id_b"),
        ((col("inter") * 1000L).cast("long")
          / (size(col("sh_a")) + size(col("sh_b")) - col("inter"))).cast("long")
          .as("jaccard_milli"))
      .filter(col("jaccard_milli") >= minJaccardMilli)
  }

  /** Candidate near-dup pairs via banded LSH + exact Jaccard verify,
    * computing the signature frame from raw text (see
    * [[minhashCandidatesFromSig]] to reuse an existing frame). */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        w: Int = 3, minJaccardMilli: Long = 500L,
                        maxBucket: Int = DefaultMaxBucket): DataFrame =
    minhashCandidatesFromSig(dedupFrame(df, idCol, textCol, w), minJaccardMilli, maxBucket)

  // ---- 3. simhash -----------------------------------------------------

  /** 64-bit SimHash signature — a custom single-pass Catalyst expression
    * (see [[graft.functions.SimHash64]]); composing it from built-in array
    * functions would re-traverse the token array once per bit. */
  def simhash64(tokens: Column): Column =
    graft.functions.ColumnFns.simhash64(tokens)

  /** The 4×16-bit band keys of a 64-bit SimHash signature (pigeonhole:
    * Hamming ≤ 3 ⇒ at least one band identical). THE single definition —
    * the batch tier and [[graft.streaming.StreamingDedup]] both band
    * through it, which is what makes their candidate sets agree
    * bit-for-bit. */
  def simhashBandKeys(sim: Column): Column =
    array((0 until 4).map(b =>
      shiftrightunsigned(sim, b * 16).bitwiseAND(lit(0xFFFFL))): _*)

  /** Near-dup pairs by SimHash: pairs within Hamming distance `maxHamming`
    * found via 4×16-bit band keys (pigeonhole: distance ≤ 3 ⇒ at least one
    * of the 4 bands is identical). Candidate pairs are generated SLIM
    * (ids only, [[Banding.guardedPairs]] with the giant-bucket star
    * guard); the 64-bit signatures are fetched back from the persisted
    * frame only for the distinct candidates' Hamming verify. */
  def simhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        maxHamming: Int = 3,
                        maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val withSig = persistBounded("simhash", parallelized(df).select(col(idCol).as("id"),
      simhash64(tokensCol(col(textCol))).as("sim")))
    val banded = withSig.select(col("id"), col("sim"),
      posexplode(simhashBandKeys(col("sim"))))
      .withColumnRenamed("pos", "band_id").withColumnRenamed("col", "band_key")
    // the 8-byte signature rides the banding exchange (carryCols — still
    // slim), so the Hamming verify reads it off the pair row: the two
    // signature-fetch joins the minhash/embed tiers need for their WIDE
    // verify payloads are unnecessary here (r06; −2 joins per pass)
    Banding.guardedPairs(banded, Seq("band_id", "band_key"), "id", maxBucket,
        "simhash", carryCols = Seq("sim"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  // ---- 4. exact n-gram Jaccard ---------------------------------------

  /** Exact token-set Jaccard (per-mille, integer) for all pairs within a
    * grouping column — the verify step; the group key bounds the join.
    * At 100 TB the group is an LSH bucket; here it's also exposed over a
    * natural key (`source`) for the DuckDB oracle. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   groupCol: String, minMilli: Long,
                   cacheKey: String = "jaccard"): DataFrame = {
    val t = persistBounded(cacheKey, parallelized(df).select(col(groupCol).as("g"), col(idCol).as("id"),
      array_distinct(tokensCol(col(textCol))).as("toks")))
    val a = t.select(col("g"), col("id").as("id_a"), col("toks").as("toks_a"))
    val b = t.select(col("g"), col("id").as("id_b"), col("toks").as("toks_b"))
    // |A∪B| = |A|+|B|-|A∩B| (toks are distinct): skip the array_union
    // hash-set build — it was half the per-pair cost of the verify tier;
    // intersectCount additionally skips materializing the intersection
    // array per pair (r06 per-task work)
    a.join(b, Seq("g"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("inter", graft.functions.ColumnFns.intersectCount(col("toks_a"), col("toks_b")))
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

  /** Connected components over the near-dup pair graph — the exact keeper
    * grouping for transitive dup chains (A~B, B~C ⇒ one component even
    * when A~C was never emitted). Returns (id, comp) for every id
    * appearing in `pairs`, comp = min id of the component.
    *
    * Strategy by edge count (the near-dup EDGE set is orders of magnitude
    * smaller than the corpus — it only contains documents that survived
    * LSH banding AND the Jaccard verify):
    *
    *  - ≤ `collectThreshold` edges: driver-side union-find. One collect of
    *    slim (src, dst) pairs, O(E α(E)) with path compression, exact and
    *    iteration-free. Long/int ids take a primitive-specialized path:
    *    edges collect as specialized (Long, Long) tuples, are unzipped
    *    into primitive arrays, and vertices live in one sorted primitive
    *    array indexed by binary search — no boxed Rows, no per-vertex
    *    HashMap entries. Peak driver footprint ≈ 60 B/edge ≈ 300 MB at
    *    the 5M default — the budget class of a large broadcast build
    *    side. Other id types (strings) go through the boxed generic path,
    *    whose per-edge cost is ~5× higher, so they use collectThreshold/5.
    *  - above: distributed min-label propagation ACCELERATED with pointer
    *    jumping (each round also adopts the label of one's current label),
    *    which contracts chains geometrically — O(log diameter) rounds
    *    instead of the O(diameter) of plain propagation. Each round is two
    *    joins + one aggregation on slim (id, comp) rows; `localCheckpoint`
    *    cuts the exponentially-stacking lineage and the superseded frame
    *    is unpersisted each round. On a cluster with executor-loss
    *    concerns use reliable `checkpoint` with a checkpoint dir instead.
    *
    * Throws `IllegalStateException` if the distributed loop exhausts
    * `maxIter` without converging — silently returning partial labels
    * would mislabel any component whose contracted diameter exceeds the
    * budget. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 50,
                          collectThreshold: Long = 5000000L): DataFrame = {
    val idType = pairs.schema("id_a").dataType
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .filter(col("src") =!= col("dst"))
    val primitiveIds = idType == LongType ||
      idType.isInstanceOf[org.apache.spark.sql.types.IntegerType]
    // the cutover is type-dependent (boxed ids cost ~5x more driver memory
    // per edge), so callers passing an explicit threshold for string ids
    // get threshold/5 — say which strategy actually ran and why
    val effectiveThreshold = if (primitiveIds) collectThreshold else collectThreshold / 5
    // ONE bounded probe instead of persist+count+collect (r06 guide §1.2:
    // don't run three actions where one suffices): limit(threshold+1)
    // either returns the COMPLETE edge list (length ≤ threshold — limit
    // only truncates when more rows exist) and union-find runs on it
    // directly, or proves the set is over budget, in which case the
    // distributed path persists and recomputes the full edge set (rare by
    // construction: the near-dup edge set is orders of magnitude smaller
    // than the corpus). Driver memory stays bounded by threshold+1 rows
    // either way — the same budget the old count-first dance enforced.
    val probeLimit = (math.min(effectiveThreshold, Int.MaxValue - 2L) + 1L).toInt
    if (primitiveIds) {
      val spark = edges.sparkSession
      import spark.implicits._
      val collected = edges.select(col("src").cast("long"), col("dst").cast("long"))
        .as[(Long, Long)].limit(probeLimit).collect()
      if (collected.length < probeLimit) {
        log.info(s"connectedComponents: ${collected.length} edges, id type $idType " +
          "-> driver union-find (primitive)")
        return driverUnionFindPrimitive(collected, idType, spark)
      }
    } else {
      val collected = edges.limit(probeLimit).collect()
      if (collected.length < probeLimit) {
        log.info(s"connectedComponents: ${collected.length} edges, id type $idType, " +
          s"effective collect threshold $effectiveThreshold (= $collectThreshold/5 for " +
          "non-primitive ids) -> driver union-find (boxed)")
        return driverUnionFind(collected, idType, edges.sparkSession)
      }
    }
    log.info(s"connectedComponents: > $effectiveThreshold edges, id type $idType " +
      "-> distributed label propagation")
    val persisted = edges.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // eager: propagateLabels' first action reads the edges from TWO
    // branches of one union job, and concurrent stages of one job do not
    // share in-flight cache blocks (FrameCache scaladoc) — without this
    // count the whole upstream candidate pipeline would compute twice
    persisted.count()
    val out = propagateLabels(persisted, maxIter)
    persisted.unpersist(blocking = false)
    out
  }

  /** Primitive-specialized driver union-find for long/int ids: collects
    * specialized (Long, Long) tuples (no Row boxing), unzips into
    * primitive arrays, and indexes vertices via a sorted primitive array
    * + binary search instead of a boxed HashMap — ~60 B/edge peak vs
    * ~300 B/edge for the generic Row path. */
  private def driverUnionFindPrimitive(
      collected: Array[(Long, Long)], idType: org.apache.spark.sql.types.DataType,
      spark: org.apache.spark.sql.SparkSession): DataFrame = {
    var pairs = collected
    val m = pairs.length
    val src = new Array[Long](m)
    val dst = new Array[Long](m)
    var i = 0
    while (i < m) { src(i) = pairs(i)._1; dst(i) = pairs(i)._2; i += 1 }
    pairs = null // the tuple objects are the collect's transient peak
    // vertex table: sorted distinct endpoint ids; idx(v) = binarySearch
    val verts = {
      val all = new Array[Long](2 * m)
      System.arraycopy(src, 0, all, 0, m)
      System.arraycopy(dst, 0, all, m, m)
      java.util.Arrays.sort(all)
      var w = 0; var r = 0
      while (r < all.length) {
        if (w == 0 || all(r) != all(w - 1)) { all(w) = all(r); w += 1 }
        r += 1
      }
      java.util.Arrays.copyOf(all, w)
    }
    val n = verts.length
    val parent = Array.tabulate(n)(identity)
    val rank = new Array[Byte](n)
    def find(x0: Int): Int = {
      var x = x0
      while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }
      x
    }
    i = 0
    while (i < m) {
      val ra = find(java.util.Arrays.binarySearch(verts, src(i)))
      val rb = find(java.util.Arrays.binarySearch(verts, dst(i)))
      if (ra != rb) {
        if (rank(ra) < rank(rb)) parent(ra) = rb
        else if (rank(ra) > rank(rb)) parent(rb) = ra
        else { parent(rb) = ra; rank(ra) = (rank(ra) + 1).toByte }
      }
      i += 1
    }
    // comp = min id per root: verts ascend, so the first vertex touching a
    // root is that component's minimum
    val minOfRoot = new Array[Long](n)
    val seen = new Array[Boolean](n)
    val isInt = idType != LongType
    val outRows = new Array[Row](n)
    var j = 0
    while (j < n) {
      val r = find(j)
      if (!seen(r)) { seen(r) = true; minOfRoot(r) = verts(j) }
      outRows(j) =
        if (isInt) Row(verts(j).toInt, minOfRoot(r).toInt)
        else Row(verts(j), minOfRoot(r))
      j += 1
    }
    val schema = StructType(Seq(
      StructField("id", idType, nullable = false),
      StructField("comp", idType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(scala.collection.immutable.ArraySeq.unsafeWrapArray(outRows), 1),
      schema)
  }

  /** Driver-side union-find with path compression + union by rank over a
    * collected slim edge list; comp = min id per component (id ordering =
    * the column's natural ordering). */
  private def driverUnionFind(rows: Array[Row],
                              idType: org.apache.spark.sql.types.DataType,
                              spark: org.apache.spark.sql.SparkSession): DataFrame = {
    // dense-index the vertices
    val index = new java.util.HashMap[Any, Integer](rows.length * 2)
    val ids = new scala.collection.mutable.ArrayBuffer[Any]()
    def idx(v: Any): Int = {
      val got = index.get(v)
      if (got != null) got.intValue()
      else { val i = ids.length; index.put(v, Integer.valueOf(i)); ids += v; i }
    }
    val parent = new scala.collection.mutable.ArrayBuffer[Int]()
    val rank = new scala.collection.mutable.ArrayBuffer[Byte]()
    def ensure(i: Int): Unit = while (parent.length <= i) { parent += parent.length; rank += 0 }
    def find(x0: Int): Int = {
      var x = x0
      while (parent(x) != x) { parent(x) = parent(parent(x)); x = parent(x) }
      x
    }
    rows.foreach { r =>
      val a = idx(r.get(0)); val b = idx(r.get(1))
      ensure(math.max(a, b))
      val ra = find(a); val rb = find(b)
      if (ra != rb) {
        if (rank(ra) < rank(rb)) parent(ra) = rb
        else if (rank(ra) > rank(rb)) parent(rb) = ra
        else { parent(rb) = ra; rank(ra) = (rank(ra) + 1).toByte }
      }
    }
    // min id per root under the column type's ordering
    val ord: Ordering[Any] = idType match {
      case LongType => Ordering.Long.on[Any](_.asInstanceOf[Number].longValue())
      case _: org.apache.spark.sql.types.IntegerType => Ordering.Int.on[Any](_.asInstanceOf[Number].intValue())
      case _: org.apache.spark.sql.types.StringType => Ordering.String.on[Any](_.asInstanceOf[String])
      case _: org.apache.spark.sql.types.DoubleType => Ordering.Double.TotalOrdering.on[Any](_.asInstanceOf[Number].doubleValue())
      case other => throw new IllegalArgumentException(s"unsupported id type for connectedComponents: $other")
    }
    val minOfRoot = new java.util.HashMap[Int, Any]()
    var i = 0
    while (i < ids.length) {
      val r = find(i)
      val cur = minOfRoot.get(r)
      if (cur == null || ord.lt(ids(i), cur)) minOfRoot.put(r, ids(i))
      i += 1
    }
    val outRows = (0 until ids.length).map(i => Row(ids(i), minOfRoot.get(find(i))))
    val schema = StructType(Seq(
      StructField("id", idType, nullable = false),
      StructField("comp", idType, nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(outRows, 1), schema)
  }

  /** Distributed label propagation with pointer jumping (scale path). */
  private def propagateLabels(edges: DataFrame, maxIter: Int): DataFrame = {
    val sym = edges
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sym.count() // eager: every iteration's join reads these blocks
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
      val merged = labels.select(col("id"), col("comp"), col("comp").as("prev"))
        .unionByName(prop.withColumn("prev", lit(null).cast(compType)))
        .groupBy("id").agg(min("comp").as("comp"), max("prev").as("prev"))
      // pointer jump: also adopt the label OF the label — contracts label
      // chains geometrically, turning O(diameter) rounds into O(log d).
      // Every comp value is some vertex's id, so the inner join is total.
      val obs = new org.apache.spark.sql.Observation(s"graft-cc-i$iter-${labels.hashCode()}")
      val next = merged
        .join(labels.select(col("id").as("comp"), col("comp").as("comp2")), Seq("comp"))
        .select(col("id"), least(col("comp"), col("comp2")).as("comp"), col("prev"))
        .observe(obs, coalesce(sum(when(col("comp") =!= col("prev"), 1L).otherwise(0L)), lit(0L))
          .as("n_changed"))
        .select(col("id"), col("comp"))
        .localCheckpoint()
      changed = obs.get("n_changed").asInstanceOf[Long]
      labels.unpersist(blocking = false) // superseded checkpoint blocks
      labels = next
      iter += 1
    }
    sym.unpersist(blocking = false)
    if (changed > 0)
      throw new IllegalStateException(
        s"connectedComponents did not converge after $maxIter iterations " +
          s"($changed labels still changing) — raise maxIter; returning partial " +
          "labels would silently mislabel components")
    labels
  }
}
