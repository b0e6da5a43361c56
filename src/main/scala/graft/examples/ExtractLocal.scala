package graft.examples

import graft.core._
import graft.pipeline._
import org.apache.spark.sql.{SparkSession, functions => F}

/** Local end-to-end runner — the analog of the reference's manual harness
  * (reference: examples/test_local_file.py:17-95): generate a deterministic
  * fixture corpus, run the extraction pipeline twice (partial, then full
  * with resume), and print what an operator would look at.
  *
  * Usage: sbt "runMain graft.examples.ExtractLocal [nDocs] [outDir]"
  */
object ExtractLocal {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toInt else 500
    val out = if (args.length > 1) args(1)
              else java.nio.file.Files.createTempDirectory("graft-extract").toString
    val spark = SparkSession.builder().master("local[8]")
      .appName("graft-extract-local")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "graft.pipeline", org.apache.logging.log4j.Level.INFO)
    import spark.implicits._

    // corpus generated ON EXECUTORS (deterministic per (seed, index))
    val docs = spark.range(nDocs.toLong).mapPartitions(_.map(i => Fixtures.doc(i))).toDF()
    println("=== input sample ===")
    docs.select($"doc_id", F.size($"spans").as("n_spans"), $"spans"(0)("kind").as("kind0"))
      .show(5, false)

    val cutoff = f"doc-${(nDocs * 3) / 5}%012d"
    val part1 = ExtractJob.runAndCommit(spark, docs.filter($"doc_id" < cutoff), out, 8)
    println(s"=== after partial run (< $cutoff): status counts ===")
    part1.groupBy($"status").count().show(false)

    val full = ExtractJob.runAndCommit(spark, docs, out, 8)
    println(s"rows after resume=${full.count()} distinct docs=${full.select("doc_id").distinct.count()}")
    println("=== duplicate docs (must be empty) ===")
    full.groupBy($"doc_id").count().filter($"count" > 1).show(5, false)

    println("=== latest progress snapshot (per-partition watermark+metrics) ===")
    Progress.latestSnapshot(spark, out).foreach(_.orderBy($"part_id").show(40, false))

    println("=== failed rows (reference error taxonomy) ===")
    full.filter($"status" === "failed").select($"doc_id", $"error", $"error_type").show(8, false)

    println("=== extracted html sample spans ===")
    full.filter($"adapter" === "html").limit(1).select(F.explode($"spans")).show(8, 100)

    println(s"outDir=$out")
    spark.stop()
  }
}
