package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Ad-hoc stage profiler: times named `SparkEntry.queries` twice each
  * (the driver's min-of-2 pattern) in a fresh session, printing per-pass
  * wall seconds. Usage: `runMain graft.tools.Profile <sfDir> <q1> <q2> …`
  * (no args = the dedup trio). */
object Profile {

  def session(cores: Int = 32): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-profile")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "0")
      .config("spark.local.dir", "/dev/shm/spark-scratch")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q_dedup_minhash", "q_dedup_cc", "q_dedup_pipeline")
    val s = session()
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val (r1, t1) = timed(fn(s, sfDir).count())
      val (r2, t2) = timed(fn(s, sfDir).count())
      println(f"PROFILE $n%-24s pass1=$t1%7.2fs pass2=$t2%7.2fs rows=$r1/$r2")
    }
    s.stop()
  }
}
