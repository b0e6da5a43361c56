package graft.tools

import org.apache.spark.sql.SparkSession

/** Variance probe for the simhash tier (BENCH_r02 regression diagnosis):
  * interleaved passes of q_dedup_simhash and q_dedup_minhash at the bench
  * session config. Run: `sbt "runMain graft.tools.SimhashProbe"`. */
object SimhashProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "0")
      .config("spark.local.dir", "/dev/shm/spark-scratch")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(s, dir).count()
      (System.nanoTime() - t0) / 1e9
    }
    for (i <- 0 until 5) {
      val sh = time("q_dedup_simhash")
      val mh = time("q_dedup_minhash")
      println(f"[probe] round=$i simhash=$sh%.2f minhash=$mh%.2f")
    }
    s.stop()
  }
}
