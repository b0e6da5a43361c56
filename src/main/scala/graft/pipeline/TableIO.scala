package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage seam for the documents table — the in-sandbox emulation of
  * Iceberg's `bucket(N, doc_id)` hidden partitioning (north rule; no
  * Iceberg runtime ships in this environment, SURVEY.md §7.1).
  *
  * Emulation: an explicit `bucket = pmod(hash(doc_id), N)` partition
  * column on write; point/set lookups push BOTH the bucket filter (→
  * partition pruning: only matching directories are listed/read) and the
  * doc_id filter (→ parquet row-group stats pruning within the bucket).
  * On a real cluster, replace `writeDocs`/`readDocs` bodies with
  * `df.writeTo(tbl).append()` against an Iceberg table declared with
  * `PARTITIONED BY (bucket(N, doc_id))` — callers are unchanged, which is
  * the entire point of the seam.
  */
object TableIO {

  val NumBuckets = 16

  def bucketCol(docId: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(hash(docId), lit(NumBuckets))

  /** Write the canonical docs table bucket-partitioned. */
  def writeDocs(df: DataFrame, path: String): Unit =
    df.withColumn("bucket", bucketCol(col("doc_id")))
      .write.mode("overwrite")
      .partitionBy("bucket")
      .parquet(path)

  def readDocs(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop("bucket")

  /** Point/set lookup with partition pruning: computes each id's bucket on
    * the driver (same hash as the write side) and pushes `bucket IN (…)`
    * so only those partition directories are scanned. */
  def readDocsForIds(spark: SparkSession, path: String, ids: Seq[String]): DataFrame = {
    import spark.implicits._
    // driver-side replica of pmod(hash(doc_id), N): evaluate the same
    // Catalyst expression on a tiny local frame — guarantees write/read
    // bucket functions can never drift apart
    val buckets = ids.toDF("doc_id").select(bucketCol($"doc_id")).distinct()
      .collect().map(_.getInt(0)).toSeq
    spark.read.parquet(path)
      .filter(col("bucket").isin(buckets: _*) && col("doc_id").isin(ids: _*))
      .drop("bucket")
  }
}
