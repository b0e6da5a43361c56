package graft.tools

import graft.core.Fixtures
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** 10× extraction epoch — the scaling-evidence run at sf≈1 (default 64M
  * interleaved fixture docs, ~10× the per-round bench corpus). The
  * per-round bench's 6.4M-doc corpus fits comfortably in cache-friendly
  * working sets; this epoch checks that the SAME split-granular extraction
  * pipeline holds its throughput and N→4N scaling when the input is an
  * order of magnitude past that — i.e. that the claim "the plan has no
  * fixed-size assumption" survives a 10× scale-up, which is the in-sandbox
  * proxy for the 100× question the 100 TB design gets graded on.
  *
  * Corpus lives on /dev/shm (the sandbox's stand-in for cluster-local
  * storage); measurement discipline is the bench's: full JIT warmup, then
  * interleaved rounds, min per core count (noise only adds latency),
  * efficiency from the ratio of mins. Run via
  * `sbt -batch "runMain graft.tools.EpochProbe [nDocs] [rounds]"`;
  * results are recorded in BENCH.md by hand with the printed JSON.
  */
object EpochProbe {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-epoch-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "0")
      .config("spark.local.dir", "/dev/shm/spark-scratch")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def extractRun(cores: Int, corpusDir: String): (Long, Double) = {
    val s = session(cores)
    try {
      val docs = s.read.parquet(corpusDir)
      val t0 = System.nanoTime()
      val n = graft.pipeline.ExtractJob.extract(s, docs).toDF()
        .selectExpr("sum(span_count)", "count(*)").collect()(0).getLong(1)
      (n, (System.nanoTime() - t0) / 1e9)
    } finally s.stop()
  }

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(64000000L)
    val nRounds = args.lift(1).map(_.toInt).getOrElse(2)
    val root = "/dev/shm/graft-epoch"
    val corpusDir = s"$root/docs"
    try {
      val gen = session(32)
      val t0 = System.nanoTime()
      gen.range(nDocs).repartition(1024)
        .mapPartitions(_.map(i => Fixtures.doc(i)))(org.apache.spark.sql.Encoders.product)
        .toDF().write.mode("overwrite").parquet(corpusDir)
      gen.stop()
      System.err.println(f"[epoch] generated $nDocs docs in ${(System.nanoTime() - t0) / 1e9}%.0f s")

      val cores = Seq(8, 16, 32)
      extractRun(32, corpusDir) // discarded JIT warmup
      val rounds: Seq[Map[Int, (Long, Double)]] =
        (0 until nRounds).map { r =>
          val m = cores.map(c => c -> extractRun(c, corpusDir)).toMap
          m.toSeq.sortBy(_._1).foreach { case (c, (n, t)) =>
            System.err.println(f"[epoch] round $r local[$c]: $t%7.2f s (${n / t}%.0f docs/s)")
          }
          m
        }
      val n = rounds.head(8)._1
      require(rounds.forall(_.values.forall(_._1 == n)), "row count drift across runs")
      val best = cores.map(c => c -> rounds.map(_(c)._2).min).toMap
      val eff832 = (best(8) / best(32)) / 4.0
      val eff1632 = (best(16) / best(32)) / 2.0
      println(
        f"""{"epoch_docs":$n,"sec_by_cores":{"8":${best(8)}%.2f,"16":${best(16)}%.2f,"32":${best(32)}%.2f},""" +
        f""""docs_per_sec_by_cores":{"8":${n / best(8)}%.0f,"16":${n / best(16)}%.0f,"32":${n / best(32)}%.0f},""" +
        f""""efficiency_8_to_32":$eff832%.3f,"efficiency_16_to_32":$eff1632%.3f,"rounds":$nRounds}""")
    } finally {
      // /dev/shm is shared memory — never leave 10+ GB behind
      try {
        val walk = Files.walk(Paths.get(root))
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => Files.deleteIfExists(p))
        finally walk.close()
      } catch { case e: Exception =>
        System.err.println(s"[epoch] cleanup failed: ${e.getMessage}")
      }
    }
  }
}
