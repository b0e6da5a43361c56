package graft.tools

import graft.SparkEntry
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Instrumented per-query measurement harness (guide §1: measure first) —
  * NOT the driver bench (`graft.Bench` is frozen). For each named query,
  * runs `.count()` `nPasses` times in a Bench-identical session and
  * prints, per pass, the wall time plus the pass's Spark job count, stage
  * count, task count, and summed executor run time — the breakdown that
  * tells job-scheduling overhead apart from real compute at bench SFs.
  *
  * Usage: `runMain graft.tools.BenchExtra <sfDir> [nPasses] <q1> <q2> …`
  * (no query names = the 10 most expensive queries of BENCH_r05).
  */
object BenchExtra {

  private class Counter extends SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val execRunMs = new java.util.concurrent.atomic.AtomicLong
    // per-job attribution for the detail dump: (jobId -> callsite, startNs)
    val jobInfo = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    val jobLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile var detail = false
    override def onJobStart(j: SparkListenerJobStart): Unit = {
      jobs.incrementAndGet()
      if (detail) {
        val cs = Option(j.properties).map(_.getProperty("callSite.short", "?")).getOrElse("?")
        jobInfo.put(j.jobId, (cs, System.nanoTime()))
      }
    }
    override def onJobEnd(j: SparkListenerJobEnd): Unit =
      if (detail) Option(jobInfo.remove(j.jobId)).foreach { case (cs, t0) =>
        jobLog.add(f"  job ${j.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%7.3fs  $cs")
      }
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      stages.incrementAndGet()
      tasks.addAndGet(sc.stageInfo.numTasks.toLong)
      execRunMs.addAndGet(sc.stageInfo.taskMetrics.executorRunTime)
    }
    def snapshot: (Long, Long, Long, Long) =
      (jobs.get, stages.get, tasks.get, execRunMs.get)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nPasses = args.lift(1).flatMap(_.toIntOption).getOrElse(3)
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else Seq("q_dedup_pipeline", "q_semdedup", "q_embed_neardup",
        "q_ann_recall", "q_ann_lsh", "q_ann_ivf", "q_dedup_ladder_sql",
        "q_dedup_minhash", "q_dedup_simhash", "q3_join")
    val s = Profile.session()
    val counter = new Counter
    s.sparkContext.addSparkListener(counter)
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      (1 to nPasses).foreach { p =>
        counter.detail = p == nPasses // per-job dump on the last (warm) pass
        counter.jobLog.clear()
        val before = counter.snapshot
        val (rows, sec) = Profile.timed(fn(s, sfDir).count())
        // listener bus is async (and private to spark): poll until the
        // counters stop moving so straggling events don't leak into the
        // next pass's delta (bounded at 3 s)
        var last = counter.snapshot
        var stableMs = 0
        var totalMs = 0
        while (stableMs < 400 && totalMs < 3000) {
          Thread.sleep(100)
          totalMs += 100
          val cur = counter.snapshot
          if (cur == last) stableMs += 100
          else { last = cur; stableMs = 0 }
        }
        val after = counter.snapshot
        println(f"EXTRA $n%-22s pass$p%d sec=$sec%7.3f rows=$rows%7d " +
          f"jobs=${after._1 - before._1}%3d stages=${after._2 - before._2}%4d " +
          f"tasks=${after._3 - before._3}%5d execMs=${after._4 - before._4}%6d")
        if (counter.detail) counter.jobLog.forEach(l => println(l))
        counter.detail = false
      }
    }
    s.stop()
  }
}
