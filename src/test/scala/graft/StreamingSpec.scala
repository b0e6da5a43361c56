package graft

import graft.core.Fixtures
import graft.streaming.StreamingExtract
import org.apache.spark.sql.{SparkSession, functions => F}
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Streaming variant semantics: continuous file ingest == the batch
  * pipeline per micro-batch; restart resumes from the checkpoint without
  * duplicating docs (the reference's durable-consumer + idempotency
  * contract, nats_worker.py:146-151 + job-processing/spec.md:26-45). */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("streaming-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def writeChunk(inputDir: String, from: Long, until: Long): Unit = {
    import spark.implicits._
    spark.range(from, until).repartition(2)
      .mapPartitions(_.map(i => Fixtures.doc(i))).toDF()
      .write.mode("append").parquet(inputDir)
  }

  test("stateful streaming sessionization equals the batch window formulation") {
    import spark.implicits._
    import graft.streaming.Sessionize
    val base = java.nio.file.Files.createTempDirectory("graft-sess").toString
    val inDir = s"$base/events"
    // the real events table, split into two time-ordered file chunks so
    // sessions SPAN the micro-batch boundary (state must carry over)
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select($"user_id", $"event_id",
        org.apache.spark.sql.functions.unix_micros($"ts".cast("timestamp")).as("ts_us"))
    val cut = ev.selectExpr("percentile_approx(ts_us, 0.5)").collect()(0).getLong(0)
    ev.filter($"ts_us" <= cut).coalesce(1).write.parquet(s"$inDir/part=a")
    ev.filter($"ts_us" > cut).coalesce(1).write.parquet(s"$inDir/part=b")

    val stream = spark.readStream
      .schema(spark.read.parquet(inDir).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(inDir)
      .as[Sessionize.Event]
    val q = Sessionize.stream(spark, stream)
      .writeStream.format("memory").queryName("sessionized")
      .outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("sessionized")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap // event_id -> session_id
    val batch = SparkEntry.queries("q_sessionize")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(streamed.size == batch.size)
    assert(streamed == batch, "per-event session ids must match the batch window formulation")
  }

  test("event-time windows close at the watermark; late data is dropped") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Long] // epoch seconds
    val events = ms.toDF().select(F.timestamp_seconds($"value").as("ts"))
    val counts = StreamingExtract.eventTimeWindowCounts(
      events, "ts", delay = "5 minutes", win = "5 minutes")
    val q = counts.writeStream.format("memory").queryName("wincounts")
      .outputMode("append").start()
    def hm(h: Int, m: Int): Long = (h * 3600 + m * 60).toLong
    try {
      // batch 1: two events in the 10:00-10:05 window — nothing emitted yet
      ms.addData(hm(10, 0), hm(10, 1)); q.processAllAvailable()
      assert(spark.table("wincounts").count() == 0,
        "append mode must not emit a window before the watermark closes it")
      // batch 2: 10:20 advances the watermark to 10:15 → 10:00 window closes
      ms.addData(hm(10, 20)); q.processAllAvailable()
      // batch 3: a LATE event for the closed 10:00 window (10:02 < watermark
      // 10:15) must be dropped; 10:40 closes the 10:20 window
      ms.addData(hm(10, 2), hm(10, 40)); q.processAllAvailable()
      val rows = spark.table("wincounts")
        .select(F.unix_timestamp($"win_start"), $"n_events")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(rows(hm(10, 0)) == 2L, "late event must NOT be added to the closed window")
      assert(rows(hm(10, 20)) == 1L)
      assert(!rows.contains(hm(10, 40)), "open window must not be emitted yet")
    } finally q.stop()
  }

  test("streamed extraction processes arriving files; restart adds no duplicates") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val inputDir = s"$base/in"
    val outDir = s"$base/out"

    writeChunk(inputDir, 0, 120)
    val q1 = StreamingExtract.start(spark, inputDir, outDir, Trigger.AvailableNow())
    q1.awaitTermination(120000)
    val afterFirst = spark.read.parquet(s"$outDir/data")
    assert(afterFirst.select("doc_id").distinct().count() == 120)

    // new files arrive while the query is down; restart from checkpoint
    writeChunk(inputDir, 120, 200)
    val q2 = StreamingExtract.start(spark, inputDir, outDir, Trigger.AvailableNow())
    q2.awaitTermination(120000)

    val all = spark.read.parquet(s"$outDir/data")
    assert(all.count() == 200, "each doc exactly once across restarts")
    assert(all.select("doc_id").distinct().count() == 200)
    // outputs equal the batch pipeline's on the same corpus
    val statuses = all.groupBy($"status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expectFailed = (0L until 200L).count(i => GoldenOracle.expected(Fixtures.plan(i)).isLeft)
    assert(statuses.getOrElse("failed", 0L) == expectFailed.toLong)
    assert(statuses("completed") == 200L - expectFailed)
  }
}
