package graft

import graft.core.{Doc, Fixtures}
import org.apache.spark.TaskContext
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Transient-failure semantics (reference: exponential-backoff retry for
  * transient errors, openspec/.../specs/job-processing/spec.md:74-92 →
  * Spark task re-attempts): a task that dies mid-partition is re-run and
  * the job still produces exactly-one row per doc, because outputs are
  * doc_id-keyed and the task commit protocol discards the failed attempt.
  * Permanent (validation) failures, by contrast, surface as failed ROWS
  * and are never retried — covered in PipelineSpec/FuzzSpec. */
class RetrySpec extends AnyFunSuite {

  // local[4, 2]: 4 threads, maxFailures=2 — local mode defaults to
  // maxFailures=1 where any task failure kills the job. getOrCreate reuses
  // an existing context (ignoring the new master), so a context created by
  // an earlier suite must be stopped first; later suites transparently
  // recreate theirs.
  lazy val spark: SparkSession = {
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sparkContext)
      .filterNot(_.master.startsWith("local[4, 2]"))
      .foreach(_.stop())
    SparkSession.builder()
      .master("local[4, 2]")
      .appName("retry-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  test("a transient task crash mid-extraction is retried; no loss, no duplicates") {
    import spark.implicits._
    val docs = spark.range(200).repartition(4)
      .mapPartitions(_.map(i => Fixtures.doc(i))).toDF()
    val out = docs.as[Doc].mapPartitions { it =>
      val tc = TaskContext.get()
      // crash the FIRST attempt of partition 0 after a few docs — the
      // retried attempt must reprocess the whole partition
      val poisoned = tc.partitionId() == 0 && tc.attemptNumber() == 0
      var n = 0
      it.map { doc =>
        n += 1
        if (poisoned && n == 3) throw new RuntimeException("simulated transient failure")
        graft.adapters.Dispatch.extractDoc(doc)
      }
    }
    val rows = out.collect()
    assert(rows.length == 200, "every doc exactly once after the retry")
    assert(rows.map(_.doc_id).distinct.length == 200)
    // and the results are identical to a clean run
    val clean = (0L until 200L).map(i => graft.adapters.Dispatch.extractDoc(Fixtures.doc(i)))
      .map(d => d.doc_id -> d.spans).toMap
    rows.foreach(d => assert(d.spans == clean(d.doc_id), d.doc_id))
  }
}
