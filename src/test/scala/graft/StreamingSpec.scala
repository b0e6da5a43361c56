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
    q.awaitTermination(300000)

    val streamed = spark.table("sessionized")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap // event_id -> session_id
    val batch = SparkEntry.queries("q_sessionize")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(streamed.size == batch.size)
    assert(streamed == batch, "per-event session ids must match the batch window formulation")
  }

  test("streaming exact dedup equals the batch exact tier across micro-batch boundaries") {
    import spark.implicits._
    import graft.streaming.StreamingDedup
    val base = java.nio.file.Files.createTempDirectory("graft-sdedup").toString
    val inDir = s"$base/docs"
    // chunk A: dups WITHIN the batch; chunk B: dups ACROSS the boundary
    // (state must remember A's keepers) plus a fresh within-batch dup
    val texts = Map("t1" -> "alpha beta gamma", "t2" -> "delta epsilon", "t3" -> "zeta eta",
      "t4" -> "theta iota", "t5" -> "kappa lambda")
    val chunkA = Seq(1L -> "t1", 2L -> "t2", 3L -> "t1", 4L -> "t3", 5L -> "t2", 6L -> "t4")
    val chunkB = Seq(7L -> "t3", 8L -> "t5", 9L -> "t5", 10L -> "t1")
    def write(part: String, rows: Seq[(Long, String)]): Unit =
      rows.map { case (id, k) => (id, texts(k)) }.toDF("doc_id", "text")
        .coalesce(1).write.parquet(s"$inDir/part=$part")
    write("a", chunkA)
    write("b", chunkB)

    val stream = spark.readStream
      .schema(spark.read.parquet(inDir).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(inDir)
    val q = StreamingDedup.stream(spark, StreamingDedup.fingerprinted(spark, stream))
      .writeStream.format("memory").queryName("sdedup")
      .outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(300000)

    val got = spark.table("sdedup").as[StreamingDedup.Decision]
      .collect().map(d => d.doc_id -> (d.keeper_id, d.decision)).toMap
    val want = Map(
      1L -> (1L, "kept"), 2L -> (2L, "kept"), 3L -> (1L, "exact_dup"),
      4L -> (4L, "kept"), 5L -> (2L, "exact_dup"), 6L -> (6L, "kept"),
      7L -> (4L, "exact_dup"), 8L -> (8L, "kept"), 9L -> (8L, "exact_dup"),
      10L -> (1L, "exact_dup"))
    assert(got == want)

    // equivalence with the batch exact tier on the replayed corpus:
    // same keepers, same group sizes
    val all = (chunkA ++ chunkB).map { case (id, k) => (id, texts(k)) }.toDF("doc_id", "text")
    val batch = graft.ops.Dedup.exactGroups(all, "doc_id", "text")
      .collect().map(r => r.getLong(2) -> r.getLong(1)).toMap // keeper -> n_dups
    val streamedGroups = got.groupBy(_._2._1).map { case (k, m) => k -> m.size.toLong }
    batch.foreach { case (keeper, n) =>
      assert(streamedGroups(keeper) == n, s"group of keeper $keeper")
      assert(got(keeper)._2 == "kept")
    }
  }

  test("streaming dedup keeper is FIRST-ARRIVAL: a smaller id in a later batch becomes the dup") {
    import spark.implicits._
    import graft.streaming.StreamingDedup
    val base = java.nio.file.Files.createTempDirectory("graft-sdedup-ooo").toString
    val inDir = s"$base/docs"
    // out-of-order ingest: doc 50 arrives first, doc 3 (same text) later —
    // the batch tier's min(id) rule would keep 3; the documented streaming
    // contract keeps the first arrival (50) because its `kept` decision is
    // already emitted and append output cannot retract it
    Seq((50L, "mu nu xi")).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$inDir/part=a")
    Seq((3L, "mu nu xi"), (60L, "omicron pi")).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$inDir/part=b")
    val stream = spark.readStream
      .schema(spark.read.parquet(inDir).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(inDir)
    val q = StreamingDedup.stream(spark, StreamingDedup.fingerprinted(spark, stream))
      .writeStream.format("memory").queryName("sdedup_ooo")
      .outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(300000)
    val got = spark.table("sdedup_ooo").as[StreamingDedup.Decision]
      .collect().map(d => d.doc_id -> ((d.keeper_id, d.decision))).toMap
    assert(got == Map(
      50L -> ((50L, "kept")),
      3L -> ((50L, "exact_dup")), // first-arrival keeper, NOT min-id
      60L -> ((60L, "kept"))))
    // the divergence from the batch rule is exactly the keeper CHOICE:
    // group membership/sizes still agree
    val batchKeeper = graft.ops.Dedup.exactGroups(
      Seq((50L, "mu nu xi"), (3L, "mu nu xi"), (60L, "omicron pi")).toDF("doc_id", "text"),
      "doc_id", "text").select("keeper_id").first().getLong(0)
    assert(batchKeeper == 3L, "batch tier picks min id — documented divergence under out-of-order ingest")
  }

  test("streaming simhash tier equals the batch tier under id-ordered replay (cross-batch state)") {
    import spark.implicits._
    import graft.streaming.StreamingDedup
    val base = java.nio.file.Files.createTempDirectory("graft-snear").toString
    val inDir = s"$base/docs"
    val r = new graft.core.Lcg(17L)
    val words = (0 until 300).map(i => s"w$i").toVector
    def text(n: Int) = (0 until n).map(_ => words(r.nextInt(words.length))).mkString(" ")
    // bases in chunk A; near-dup copies (1 token in 20 dropped) and exact
    // copies in chunk B — every true pair SPANS the micro-batch boundary,
    // so state must carry chunk A's signatures
    val bases = (0 until 15).map(i => (i.toLong, text(80)))
    val copies = bases.take(8).map { case (i, t) =>
      (1000L + i, t.split(" ").zipWithIndex.collect { case (w, j) if j % 20 != 7 => w }.mkString(" "))
    }
    val exacts = bases.slice(8, 11).map { case (i, t) => (2000L + i, t) }
    bases.toDF("doc_id", "text").coalesce(1).write.parquet(s"$inDir/part=a")
    (copies ++ exacts).toDF("doc_id", "text").coalesce(1).write.parquet(s"$inDir/part=b")

    val maxHamming = 8
    val stream = spark.readStream
      .schema(spark.read.parquet(inDir).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(inDir)
    val q = StreamingDedup.streamNear(spark,
        StreamingDedup.simhashBanded(spark, stream), maxHamming = maxHamming)
      .writeStream.format("memory").queryName("snear")
      .outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(300000)
    // consumers dedupe on (id_a, id_b) — the stream emits one row per
    // shared band (the batch tier's global distinct is not expressible in
    // append mode); the deduped set must equal the batch tier exactly
    val streamed = spark.table("snear")
      .select($"id_a", $"id_b", $"hamming").distinct()
      .collect().map(row => (row.getLong(0), row.getLong(1), row.getInt(2))).toSet
    val all = (bases ++ copies ++ exacts).toDF("doc_id", "text")
    val batch = graft.ops.Dedup.simhashCandidates(all, "doc_id", "text", maxHamming = maxHamming)
      .collect().map(row => (row.getLong(0), row.getLong(1), row.getInt(2))).toSet
    assert(batch.nonEmpty, "corpus must contain true near-dup pairs")
    assert(streamed == batch,
      s"id-ordered replay must equal the batch tier; missing=${batch -- streamed} extra=${streamed -- batch}")
  }

  test("streaming simhash pair orientation is FIRST-ARRIVAL; membership still matches batch") {
    import spark.implicits._
    import graft.streaming.StreamingDedup
    val base = java.nio.file.Files.createTempDirectory("graft-snear-ooo").toString
    val inDir = s"$base/docs"
    // doc 50 arrives before its identical twin doc 3: the streamed pair is
    // (id_a=50, id_b=3) — earlier arrival first — while the batch tier
    // orients by id (3, 50). Same membership, same hamming.
    Seq((50L, "mu nu xi omicron pi")).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$inDir/part=a")
    Seq((3L, "mu nu xi omicron pi"), (60L, "rho sigma tau upsilon phi")).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$inDir/part=b")
    val stream = spark.readStream
      .schema(spark.read.parquet(inDir).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(inDir)
    val q = StreamingDedup.streamNear(spark, StreamingDedup.simhashBanded(spark, stream))
      .writeStream.format("memory").queryName("snear_ooo")
      .outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(300000)
    val streamed = spark.table("snear_ooo")
      .select($"id_a", $"id_b", $"hamming").distinct()
      .collect().map(row => (row.getLong(0), row.getLong(1), row.getInt(2))).toSet
    assert(streamed == Set((50L, 3L, 0)), s"first-arrival orientation: $streamed")
    val batch = graft.ops.Dedup.simhashCandidates(
        Seq((50L, "mu nu xi omicron pi"), (3L, "mu nu xi omicron pi"),
          (60L, "rho sigma tau upsilon phi")).toDF("doc_id", "text"),
        "doc_id", "text", maxHamming = 3)
      .collect().map(row => (row.getLong(0), row.getLong(1), row.getInt(2))).toSet
    assert(batch == Set((3L, 50L, 0)), "batch orients by id — documented divergence")
  }

  test("streaming simhash giant-bucket guard: capped state verifies against the anchor only") {
    import graft.streaming.StreamingDedup.{decideNear, BandDoc, BandState, SimEntry, NearPair}
    // bucket cap 3: the first three arrivals fill the state; later
    // arrivals emit only the anchor pair and do not join the state
    val batch1 = (0 until 3).map(i => BandDoc(1, 42L, i.toLong, 0L))
    val (out1, st1) = decideNear(batch1.iterator, None, maxHamming = 3, maxBucket = 3)
    assert(out1.toSet == Set(NearPair(0, 1, 0, 1), NearPair(0, 2, 0, 1), NearPair(1, 2, 0, 1)))
    assert(st1.entries == (0 until 3).map(i => SimEntry(i.toLong, 0L)))
    val batch2 = Seq(BandDoc(1, 42L, 10L, 0L), BandDoc(1, 42L, 11L, 3L))
    val (out2, st2) = decideNear(batch2.iterator, Some(st1), maxHamming = 3, maxBucket = 3)
    assert(out2.toSet == Set(NearPair(0, 10, 0, 1), NearPair(0, 11, 2, 1)),
      s"over-cap arrivals pair with the anchor only: $out2")
    assert(st2 == st1, "over-cap arrivals must not grow the state")
  }

  test("streaming minhash tier equals the batch tier under id-ordered replay (cross-batch state)") {
    import spark.implicits._
    import graft.streaming.StreamingDedup
    val base = java.nio.file.Files.createTempDirectory("graft-sminhash").toString
    val inDir = s"$base/docs"
    val r = new graft.core.Lcg(29L)
    val words = (0 until 300).map(i => s"w$i").toVector
    def text(n: Int) = (0 until n).map(_ => words(r.nextInt(words.length))).mkString(" ")
    // bases in chunk A; near-dup copies (1 token in 12 dropped) and exact
    // copies in chunk B — every true pair SPANS the micro-batch boundary,
    // so state must carry chunk A's shingle sets
    val bases = (0 until 15).map(i => (i.toLong, text(90)))
    val copies = bases.take(8).map { case (i, t) =>
      (1000L + i, t.split(" ").zipWithIndex.collect { case (w, j) if j % 12 != 5 => w }.mkString(" "))
    }
    val exacts = bases.slice(8, 11).map { case (i, t) => (2000L + i, t) }
    bases.toDF("doc_id", "text").coalesce(1).write.parquet(s"$inDir/part=a")
    (copies ++ exacts).toDF("doc_id", "text").coalesce(1).write.parquet(s"$inDir/part=b")

    val minJaccardMilli = 400L
    val stream = spark.readStream
      .schema(spark.read.parquet(inDir).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(inDir)
    val q = StreamingDedup.streamMinhash(spark,
        StreamingDedup.minhashBanded(spark, stream), minJaccardMilli = minJaccardMilli)
      .writeStream.format("memory").queryName("sminhash")
      .outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(300000)
    // one row per shared band; the (id_a, id_b, jaccard_milli) distinct is
    // the batch tier's global distinct — jaccard values must match too,
    // because the stream runs the batch verify's exact computation
    val streamed = spark.table("sminhash")
      .select($"id_a", $"id_b", $"jaccard_milli").distinct()
      .collect().map(row => (row.getLong(0), row.getLong(1), row.getLong(2))).toSet
    val all = (bases ++ copies ++ exacts).toDF("doc_id", "text")
    val batch = graft.ops.Dedup.minhashCandidates(all, "doc_id", "text",
        minJaccardMilli = minJaccardMilli)
      .collect().map(row => (row.getLong(0), row.getLong(1), row.getLong(2))).toSet
    assert(batch.nonEmpty, "corpus must contain true near-dup pairs")
    assert(batch.exists(p => p._3 < 1000L), "corpus must contain NEAR (non-exact) pairs")
    assert(streamed == batch,
      s"id-ordered replay must equal the batch tier; missing=${batch -- streamed} extra=${streamed -- batch}")
  }

  test("streaming minhash pair orientation is FIRST-ARRIVAL; membership still matches batch") {
    import spark.implicits._
    import graft.streaming.StreamingDedup
    val base = java.nio.file.Files.createTempDirectory("graft-sminhash-ooo").toString
    val inDir = s"$base/docs"
    // doc 50 arrives before its identical twin doc 3: the streamed pair is
    // (id_a=50, id_b=3) — earlier arrival first — while the batch tier
    // orients by id (3, 50). Same membership, same jaccard.
    Seq((50L, "mu nu xi omicron pi rho")).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$inDir/part=a")
    Seq((3L, "mu nu xi omicron pi rho"), (60L, "sigma tau upsilon phi chi psi")).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$inDir/part=b")
    val stream = spark.readStream
      .schema(spark.read.parquet(inDir).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(inDir)
    val q = StreamingDedup.streamMinhash(spark, StreamingDedup.minhashBanded(spark, stream))
      .writeStream.format("memory").queryName("sminhash_ooo")
      .outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(300000)
    val streamed = spark.table("sminhash_ooo")
      .select($"id_a", $"id_b", $"jaccard_milli").distinct()
      .collect().map(row => (row.getLong(0), row.getLong(1), row.getLong(2))).toSet
    assert(streamed == Set((50L, 3L, 1000L)), s"first-arrival orientation: $streamed")
    val batch = graft.ops.Dedup.minhashCandidates(
        Seq((50L, "mu nu xi omicron pi rho"), (3L, "mu nu xi omicron pi rho"),
          (60L, "sigma tau upsilon phi chi psi")).toDF("doc_id", "text"),
        "doc_id", "text")
      .collect().map(row => (row.getLong(0), row.getLong(1), row.getLong(2))).toSet
    assert(batch == Set((3L, 50L, 1000L)), "batch orients by id — documented divergence")
  }

  test("streaming minhash giant-bucket guard: capped state verifies against the anchor only") {
    import graft.streaming.StreamingDedup.{decideMinhash, MinhashBandDoc, MinhashBandState, ShEntry, MinhashPair}
    val sh = Seq("a b c", "b c d", "c d e") // identical sets -> jaccard 1000
    def doc(id: Long, s: Seq[String] = sh) = MinhashBandDoc(1, 42L, id, s)
    // bucket cap 3: the first three arrivals fill the state; later
    // arrivals emit only the anchor pair and do not join the state
    val (out1, st1) = decideMinhash((0L until 3L).map(doc(_)).iterator, None,
      minJaccardMilli = 500L, maxBucket = 3)
    assert(out1.toSet == Set(MinhashPair(0, 1, 1000, 1), MinhashPair(0, 2, 1000, 1),
      MinhashPair(1, 2, 1000, 1)))
    assert(st1.entries == (0L until 3L).map(ShEntry(_, sh)))
    // doc 11's set shares 2 of 4 distinct shingles with the anchor -> 500
    val (out2, st2) = decideMinhash(
      Seq(doc(10L), doc(11L, Seq("a b c", "b c d", "x y z"))).iterator, Some(st1),
      minJaccardMilli = 500L, maxBucket = 3)
    assert(out2.toSet == Set(MinhashPair(0, 10, 1000, 1), MinhashPair(0, 11, 500, 1)),
      s"over-cap arrivals pair with the anchor only: $out2")
    assert(st2 == st1, "over-cap arrivals must not grow the state")
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
    q1.awaitTermination(300000)
    val afterFirst = spark.read.parquet(s"$outDir/data")
    assert(afterFirst.select("doc_id").distinct().count() == 120)

    // new files arrive while the query is down; restart from checkpoint
    writeChunk(inputDir, 120, 200)
    val q2 = StreamingExtract.start(spark, inputDir, outDir, Trigger.AvailableNow())
    q2.awaitTermination(300000)

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
