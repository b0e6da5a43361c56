package graft

import graft.core.Fixtures
import graft.pipeline.TableIO
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed-table seam: write/read round trip, and point lookups must
  * actually PRUNE partitions (read a strict subset of files), emulating
  * Iceberg bucket(doc_id) hidden partitioning. */
class TableIOSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("tableio-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("bucketed write + pruned point lookup") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-tableio").toString + "/docs"
    val docs = spark.range(400).mapPartitions(_.map(i => Fixtures.doc(i))).toDF()
    TableIO.writeDocs(docs, path)

    // round trip
    val back = TableIO.readDocs(spark, path)
    assert(back.count() == 400)
    assert(back.columns.toSet == Set("doc_id", "spans", "metadata"))

    // point lookup: correct rows AND a pruned scan
    val wanted = Seq("doc-000000000007", "doc-000000000123", "doc-000000000399")
    val got = TableIO.readDocsForIds(spark, path, wanted)
    assert(got.select("doc_id").collect().map(_.getString(0)).sorted.toSeq == wanted.sorted)

    // inputFiles lists the relation pre-pruning; the scan's numFiles metric
    // reflects what partition pruning actually admitted
    import org.apache.spark.sql.execution.FileSourceScanExec
    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan
        .collectLeaves().collectFirst { case f: FileSourceScanExec => f }
        .map(_.metrics("numFiles").value).getOrElse(-1L)
    }
    val allFiles = spark.read.parquet(path).inputFiles.length.toLong
    val prunedFiles = scannedFiles(got)
    assert(prunedFiles > 0 && prunedFiles < allFiles,
      s"lookup must scan a strict subset of files: $prunedFiles vs $allFiles")
    assert(prunedFiles <= 3L * (allFiles / TableIO.NumBuckets + 1),
      s"expected <=3 buckets' worth of files, got $prunedFiles of $allFiles")
  }
}
