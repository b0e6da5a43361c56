package graft.ops

import graft.core.Lcg
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`). Two paths:
  *
  *  - brute force — broadcast the (small) query set, score every corpus
  *    vector, window top-k: exact, one pass over the corpus, NO shuffle of
  *    the corpus (the only exchange is the final per-query top-k, whose
  *    input is already reduced to k rows per partition per query by a
  *    partial top-k);
  *  - hyperplane LSH — 16 seeded random hyperplanes → 16-bit bucket key;
  *    join on bucket (plus probing the query's Hamming-1 neighbor buckets)
  *    and score only the bucket's members: the corpus-side work drops to
  *    ~|bucket| per query, the scale path for 10^9+ vectors.
  *
  * Scoring is built-in `zip_with`/`aggregate` expressions (codegen'd, no
  * UDF). An integer (fixed-point) dot product is used wherever results
  * feed the cross-engine oracle: `floor(x*1000)` per element makes scores
  * bit-identical in any engine; the cosine path keeps full double
  * precision for in-engine use.
  */
object Similarity {

  /** Fixed-point quantization: floor(x * 1000) per element — deterministic
    * across engines (float→double promotion is exact; floor is exact). */
  def quantize(emb: Column): Column =
    transform(emb, x => floor(x.cast("double") * 1000).cast("long"))

  def dotInt(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  def dotDouble(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))

  def cosine(a: Column, b: Column): Column = dotDouble(a, b) / (norm(a) * norm(b))

  /** Exact top-k neighbors for each query vector, integer-scored.
    * `queries` must be small (it is broadcast). Output:
    * (query_id, vec_id, dot, rank). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id"), quantize(col("embedding")).as("qv"))
    val q = queries.select(col("vec_id").as("query_id"), quantize(col("embedding")).as("qq"))
    val scored = c.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), dotInt(col("qv"), col("qq")).as("dot"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("dot").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Seeded random hyperplanes (deterministic; Box-Muller-free — signed
    * uniform components suffice for sign-LSH). */
  def hyperplanes(dim: Int, nPlanes: Int = 16, seed: Long = 7L): Seq[Seq[Double]] = {
    val r = new Lcg(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)((r.nextLong() >>> 11).toDouble / (1L << 53).toDouble - 0.5))
  }

  /** 16-bit sign bucket of an embedding under the given hyperplanes. */
  def bucketCol(emb: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dotDouble(emb, typedLit(p)) >= 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** ANN top-k via LSH buckets with Hamming-1 multiprobe: each query also
    * probes the `nPlanes` buckets one bit-flip away, trading bounded extra
    * candidates for recall. Output schema matches [[bruteForceTopK]]. */
  def annTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              dim: Int, nPlanes: Int = 16, seed: Long = 7L): DataFrame = {
    val planes = hyperplanes(dim, nPlanes, seed)
    val c = corpus.select(col("vec_id"), quantize(col("embedding")).as("qv"),
      bucketCol(col("embedding"), planes).as("bucket"))
    val probes = (0 until nPlanes).map(b => lit(1 << b))
    val q = queries.select(col("vec_id").as("query_id"), quantize(col("embedding")).as("qq"),
      bucketCol(col("embedding"), planes).as("qbucket"))
      .select(col("query_id"), col("qq"),
        explode(array((lit(0) +: probes).map(m => col("qbucket").bitwiseXOR(m)): _*)).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), dotInt(col("qv"), col("qq")).as("dot"))
      .distinct()
    val w = Window.partitionBy(col("query_id")).orderBy(col("dot").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** Embedding near-duplicate pairs: cosine ≥ threshold, found via shared
    * LSH bucket (both vectors in the same bucket) — the embedding tier of
    * the dedup ladder. cos_milli is fixed-point for stable thresholds. */
  def nearDupPairs(corpus: DataFrame, dim: Int, minCosMilli: Long = 950L,
                   nPlanes: Int = 12, seed: Long = 7L): DataFrame = {
    val planes = hyperplanes(dim, nPlanes, seed)
    val c = corpus.select(col("vec_id"), col("embedding"),
      bucketCol(col("embedding"), planes).as("bucket"))
    val a = c.select(col("bucket"), col("vec_id").as("id_a"), col("embedding").as("em_a"))
    val b = c.select(col("bucket"), col("vec_id").as("id_b"), col("embedding").as("em_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        floor(cosine(col("em_a"), col("em_b")) * 1000).as("cos_milli"))
      .filter(col("cos_milli") >= minCosMilli)
      .distinct()
  }
}
