package graft.tools

import graft.core.Fixtures
import org.apache.spark.sql.SparkSession
import java.nio.file.Files

/** Scaling-diagnosis probe: runs three per-doc workloads over the SAME
  * fixture corpus at 8 and 32 cores to attribute the 8→32 efficiency gap.
  *
  *  - `extract`: the real extraction pipeline (string-heavy: allocation +
  *    memory streaming + ALU);
  *  - `alu`: pure register arithmetic per doc over the doc_id column only
  *    (near-zero memory traffic) — if THIS scales, cores are real and the
  *    scheduler is fine, so any extract gap is the memory subsystem;
  *  - `stream`: read-only char streaming over every span text with no
  *    allocation — isolates memory READ bandwidth from GC/allocation.
  */
object ScalingProbe {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-probe-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "0")
      .config("spark.local.dir", "/dev/shm/spark-scratch")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def timed[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  private def run(cores: Int, dir: String, mode: String): Double = {
    val s = session(cores)
    try {
      import s.implicits._
      mode match {
        case "extract" =>
          timed(graft.pipeline.ExtractJob.extract(s, s.read.parquet(dir)).toDF()
            .selectExpr("count(*)").collect())
        case "alu" =>
          timed(s.read.parquet(dir).select("doc_id").as[String].mapPartitions(_.map { id =>
            var h = 0xcbf29ce484222325L ^ id.length
            var k = 0
            while (k < 40000) { h = (h ^ k) * 0x100000001b3L; k += 1 }
            h
          }).filter(_ == 0L).count())
        case "stream" =>
          timed(s.read.parquet(dir)
            .selectExpr("doc_id", "spans.text AS texts").as[(String, Seq[String])]
            .mapPartitions(_.map { case (_, texts) =>
              var h = 0L
              var rep = 0
              // re-stream several times so the kernel dwarfs fixed job
              // overhead; strings exceed L1/L2 residency in aggregate
              while (rep < 6) {
                texts.foreach { t =>
                  var i = 0
                  val n = t.length
                  while (i < n) { h = h * 31 + t.charAt(i); i += 1 }
                }
                rep += 1
              }
              h
            }).filter(_ == 0L).count())
      }
    } finally s.stop()
  }

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(3200000)
    val gen = session(32)
    val dir = Files.createTempDirectory("graft-probe").toString + "/docs"
    gen.range(nDocs.toLong).repartition(256)
      .mapPartitions(_.map(i => Fixtures.doc(i)))(org.apache.spark.sql.Encoders.product)
      .toDF().write.mode("overwrite").parquet(dir)
    gen.stop()
    val modes = Seq("extract", "alu", "stream")
    // JIT warmup per mode at 32 cores
    modes.foreach(m => run(32, dir, m))
    val rounds = 2
    val res = scala.collection.mutable.Map.empty[(String, Int), Double].withDefaultValue(1e9)
    (0 until rounds).foreach { _ =>
      for (m <- modes; c <- Seq(8, 32)) {
        val t = run(c, dir, m)
        res((m, c)) = math.min(res((m, c)), t)
      }
    }
    modes.foreach { m =>
      val e = (res((m, 8)) / res((m, 32))) / 4.0
      println(f"PROBE $m%-8s t8=${res((m, 8))}%7.2fs t32=${res((m, 32))}%7.2fs eff_8_32=$e%.3f")
    }
  }
}
