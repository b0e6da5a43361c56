package graft

import graft.core._
import graft.pipeline.{ExtractJob, Progress}
import org.apache.spark.sql.{SparkSession, functions => F}
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end pipeline semantics on a real SparkSession: span equality
  * through the distributed path, resume-from-checkpoint without dup/loss
  * (reference idempotency spec, job-processing/spec.md:26-45), DLQ replay,
  * and progress-snapshot integrity. */
class PipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("pipeline-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def fixtureDf(n: Int) = {
    import spark.implicits._
    spark.range(n.toLong).mapPartitions(_.map(i => Fixtures.doc(i))).toDF()
  }

  test("distributed extraction matches the golden oracle span-for-span") {
    import spark.implicits._
    val n = 400
    val got = ExtractJob.extract(spark, fixtureDf(n)).collect().map(d => d.doc_id -> d).toMap
    assert(got.size == n)
    (0L until n.toLong).foreach { idx =>
      val plan = Fixtures.plan(idx)
      (GoldenOracle.expected(plan), got(plan.docId)) match {
        case (Right(spans), d) =>
          assert(d.status == Model.Completed, s"${plan.docId}: ${d.error}")
          assert(d.spans == spans, s"${plan.docId} span mismatch via Spark path")
        case (Left((msg, _)), d) =>
          assert(d.status == Model.Failed && d.error == msg, plan.docId)
      }
    }
  }

  test("expression fast path equals the typed path and evaluates once per row") {
    import spark.implicits._
    val docs = fixtureDf(300)
    val fast = ExtractJob.extractExpr(spark, docs)
    // the struct expansion must NOT duplicate the (expensive) expression
    val nExprs = "ExtractSpansExpr|extractspansexpr".r
      .findAllIn(fast.queryExecution.optimizedPlan.toString.toLowerCase).length
    assert(nExprs == 1, s"expression duplicated $nExprs times by the optimizer")
    val typed = ExtractJob.extract(spark, docs).toDF()
    val a = fast.drop("processing_time_ms").collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    val b = typed.drop("processing_time_ms").collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(a.keySet == b.keySet)
    a.keySet.foreach(k => assert(a(k) == b(k), s"doc $k differs between paths"))
  }

  test("F10 metadata merge: doc metadata propagates, overrides engine keys, fails to {error_type}") {
    import spark.implicits._
    // mirrors reference tests/integration/test_pipeline.py:218-255
    // (test_pipeline_metadata_propagation) + the ocr_service.py:117-123
    // merge order: defaults ++ adapter metadata ++ job metadata
    val docs = Seq(
      // html doc with user metadata incl. a key that collides with the
      // engine default ("page_count") — the doc's value must win
      Doc("doc-meta-1", Vector(Span("html", "<p>hello world of metadata tests</p>", "", 0)),
        Map("custom_key" -> "custom_value", "user" -> "test_user", "page_count" -> "42")),
      // mock doc: adapter metadata (engine/mime_type/size_bytes/page_count)
      // must appear under the doc metadata
      Doc("doc-meta-2", Vector(Span("mock", "application/pdf|204800", "", 0)),
        Map("user" -> "test_user")),
      // failing doc: metadata is exactly {error_type}, job metadata dropped
      Doc("doc-meta-3", Vector(Span("docx", "x", "", 0)),
        Map("custom_key" -> "custom_value"))).toDF()
    val got = ExtractJob.extract(spark, docs).collect().map(d => d.doc_id -> d).toMap

    val m1 = got("doc-meta-1")
    assert(m1.status == Model.Completed)
    assert(m1.metadata("custom_key") == "custom_value")
    assert(m1.metadata("user") == "test_user")
    assert(m1.metadata("page_count") == "42", "doc metadata must override the engine default")
    assert(m1.metadata("adapter") == "html")

    val m2 = got("doc-meta-2")
    assert(m2.status == Model.Completed)
    assert(m2.metadata("engine") == "mock")
    assert(m2.metadata("mime_type") == "application/pdf")
    assert(m2.metadata("size_bytes") == "204800")
    // mock adapter's estimated page count overrides the pipeline default
    // (reference: **ocr_response.metadata after the defaults)
    assert(m2.metadata("page_count") == graft.adapters.Mock.estimatePageCount("application/pdf", 204800L).toString)
    assert(m2.metadata("user") == "test_user")

    val m3 = got("doc-meta-3")
    assert(m3.status == Model.Failed)
    assert(m3.metadata == Map("error_type" -> "validation"),
      "failure metadata must be exactly {error_type}, job metadata dropped (ocr_service.py:188)")

    // propagation through the committed table (progress write)
    val out = java.nio.file.Files.createTempDirectory("graft-meta").toString
    ExtractJob.runAndCommit(spark, docs, out)
    val persisted = spark.read.parquet(s"$out/data")
      .select($"doc_id", $"metadata").collect()
      .map(r => r.getString(0) -> r.getMap[String, String](1)).toMap
    assert(persisted("doc-meta-1")("custom_key") == "custom_value")
    assert(persisted("doc-meta-2")("engine") == "mock")
  }

  test("resume from checkpoint: no duplicates, no loss, failed docs are terminal") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-resume").toString
    val docs = fixtureDf(300)
    val firstHalf = docs.filter($"doc_id" < f"doc-${180}%012d")
    val r1 = ExtractJob.runAndCommit(spark, firstHalf, out, 4)
    assert(r1.count() == 180)

    val r2 = ExtractJob.runAndCommit(spark, docs, out, 4)
    assert(r2.count() == 300)
    assert(r2.select("doc_id").distinct().count() == 300)
    // failed docs from run 1 must NOT have been re-attempted (terminal DLQ)
    val attempts = spark.read.parquet(s"$out/data")
      .groupBy($"doc_id").agg(F.countDistinct($"attempt").as("n"))
      .filter($"n" > 1).count()
    assert(attempts == 0, "default resume must not re-attempt any doc")
  }

  test("DLQ replay (retryFailed) re-attempts failed docs, latest attempt wins") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-replay").toString
    val docs = fixtureDf(300)
    val r1 = ExtractJob.runAndCommit(spark, docs, out, 4)
    val nFailed = r1.filter($"status" === "failed").count()
    assert(nFailed > 0, "corpus must contain failure docs")

    val r2 = ExtractJob.runAndCommit(spark, docs, out, 4, retryFailed = true)
    assert(r2.count() == 300, "latest-attempt view stays one row per doc")
    // the replayed rows carry attempt=1
    val replayed = spark.read.parquet(s"$out/data").filter($"attempt" === 1).count()
    assert(replayed == nFailed)
  }

  test("attempt numbers stay unique after a crash between data commit and snapshot commit") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-crash").toString
    val docs = fixtureDf(120)
    ExtractJob.runAndCommit(spark, docs, out, 4)
    // simulate the crash window: data rows for attempt 1 land (a few docs
    // re-extracted), but the snapshot commit never happens
    ExtractJob.extract(spark, docs.limit(3), 0).toDF()
      .withColumn("part_id", F.spark_partition_id()).withColumn("attempt", F.lit(1L))
      .write.partitionBy("attempt").mode("append").parquet(s"$out/data")
    // next run must pick attempt 2 (data authority), not reuse 1
    assert(graft.pipeline.Progress.nextAttempt(spark, out) == 2L)
    val r = ExtractJob.runAndCommit(spark, docs, out, 4, retryFailed = true)
    assert(r.count() == 120)
    assert(r.select("doc_id").distinct().count() == 120)
    // the ledger's corrected totals equal the latest view: the replayed
    // docs and the crash-window duplicates are accounted as superseded,
    // never double-counted
    val snap = graft.pipeline.Progress.latestSnapshot(spark, out).get
    val totals = graft.pipeline.Progress.summaryTotals(snap)
    assert(totals.getAs[Long]("n_docs") == 120,
      s"snapshot must not double-count replayed docs: $totals")
    val latestFailed = r.filter($"status" === "failed").count()
    assert(totals.getAs[Long]("n_failed") == latestFailed,
      s"corrected failure count must match the latest view: $totals vs $latestFailed")
    val latestSpans = r.agg(F.sum("span_count")).first().getLong(0)
    assert(totals.getAs[Long]("span_count") == latestSpans,
      s"corrected span count must match the latest view: $totals vs $latestSpans")
  }

  test("progress snapshot: per-partition watermark and metrics are consistent with data") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-progress").toString
    ExtractJob.runAndCommit(spark, fixtureDf(200), out, 4)
    val snap = Progress.latestSnapshot(spark, out).get
    val data = spark.read.parquet(s"$out/data")
    val expected = data.groupBy($"part_id")
      .agg(F.max($"doc_id").as("wm"), F.count(F.lit(1)).as("n"), F.sum($"span_count").as("sc"))
      .collect().map(r => r.getInt(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    val got = snap.collect().map(r => r.getAs[Int]("part_id") ->
      ((r.getAs[String]("doc_id_watermark"), r.getAs[Long]("n_docs"), r.getAs[Long]("span_count")))).toMap
    assert(got == expected)
    assert(got.size >= 3, "multiple partitions should carry docs")
  }

  test("everything-already-done rerun commits an empty attempt without error") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-empty").toString
    ExtractJob.runAndCommit(spark, fixtureDf(50), out)
    // second run: resume drops every doc; the job must still commit cleanly
    val after = ExtractJob.runAndCommit(spark, fixtureDf(50), out)
    assert(after.select("doc_id").distinct().count() == 50)
    // and a literally empty input works too (e.g. an empty ingest slice)
    val res = ExtractJob.runAndCommit(spark, fixtureDf(50).filter($"doc_id" === "nope"), out)
    assert(res.select("doc_id").distinct().count() == 50, "prior results remain authoritative")
  }

  test("span cap (max_pdf_pages analog) trims above the object boundary") {
    import spark.implicits._
    // media-heavy skew docs carry 50-200 spans; cap at 40
    val n = 2000
    val cap = 40
    val heavyIds = (0L until n.toLong)
      .filter(i => Fixtures.doc(i).spans.length > cap).map(i => Fixtures.plan(i).docId).toSet
    assert(heavyIds.nonEmpty, "corpus must contain docs above the cap")
    val out = java.nio.file.Files.createTempDirectory("graft-cap").toString
    val res = ExtractJob.runAndCommit(spark, fixtureDf(n), out, maxSpansPerDoc = cap)
    val counts = res.select($"doc_id", $"span_count", $"status").collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getString(2))).toMap
    assert(counts.size == n)
    heavyIds.foreach { id =>
      assert(counts(id)._1 == cap, s"$id should be truncated to $cap spans")
      assert(counts(id)._2 == Model.Completed)
    }
    // docs under the cap are untouched: equal to the uncapped golden output
    (0L until 200L).foreach { i =>
      val plan = Fixtures.plan(i)
      if (!heavyIds(plan.docId)) GoldenOracle.expected(plan) match {
        case Right(spans) => assert(counts(plan.docId)._1 == spans.length, plan.docId)
        case Left(_) => assert(counts(plan.docId)._2 == Model.Failed)
      }
    }
  }

  test("null spans array fails as a ROW on both paths, never as a task error") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", StringType, nullable = false),
      StructField("spans", ArrayType(Model.spanType, containsNull = true), nullable = true),
      StructField("metadata", MapType(StringType, StringType), nullable = true)))
    val rows = Seq(
      Row("doc-null", null, null),
      Row("doc-nullelem", Seq(Row("text", "a", "", 0), null), null),
      Row("doc-ok", Seq(Row("text", "hello world", "", 0)), null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val typed = ExtractJob.extract(spark, df).collect().map(d => d.doc_id -> d).toMap
    assert(typed("doc-null").status == Model.Failed)
    assert(typed("doc-null").error_type == "validation")
    assert(typed("doc-null").error.contains("null spans"))
    assert(typed("doc-nullelem").status == Model.Failed)
    assert(typed("doc-nullelem").error.contains("null span element"))
    assert(typed("doc-ok").status == Model.Completed)
    // expression path: same per-row degradation, identical output
    val exprRes = ExtractJob.extractExpr(spark, df)
      .select("doc_id", "status", "error", "error_type").collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2), r.getString(3)))).toMap
    assert(exprRes("doc-null") ==
      ((typed("doc-null").status, typed("doc-null").error, typed("doc-null").error_type)))
    assert(exprRes("doc-nullelem") ==
      ((typed("doc-nullelem").status, typed("doc-nullelem").error, typed("doc-nullelem").error_type)))
    assert(exprRes("doc-ok")._1 == Model.Completed)
  }

  test("span_superseded subtracts the superseded row's OWN span_count (completed -> failed)") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-supersede").toString
    ExtractJob.runAndCommit(spark, fixtureDf(60), out, 4)
    val data = spark.read.parquet(s"$out/data")
    val victim = data.filter($"status" === "completed" && $"span_count" > 0)
      .select("doc_id").orderBy("doc_id").first().getString(0)
    val victimSpans = data.filter($"doc_id" === victim).select("span_count").first().getInt(0)
    // supersede the completed row with a FAILED attempt-1 row (the
    // tighter-limits-on-replay shape): its span_count is 0, so the
    // correction must subtract the PRIOR row's count, not the new row's
    data.filter($"doc_id" === victim)
      .withColumn("status", F.lit("failed"))
      .withColumn("error", F.lit("boom")).withColumn("error_type", F.lit("timeout"))
      .withColumn("span_count", F.lit(0))
      .withColumn("attempt", F.lit(1L))
      .write.partitionBy("attempt").mode("append").parquet(s"$out/data")
    Progress.commitSnapshot(spark, out)
    val totals = Progress.summaryTotals(Progress.latestSnapshot(spark, out).get)
    val latest = Progress.readLatest(spark, out)
    assert(latest.count() == 60)
    val latestSpans = latest.agg(F.sum("span_count")).first().getLong(0)
    assert(totals.getAs[Long]("span_count") == latestSpans,
      s"corrected span total must drop the superseded row's $victimSpans spans: " +
        s"$totals vs $latestSpans")
    assert(totals.getAs[Long]("n_docs") == 60)
  }

  test("legacy flat data layout (attempt as a data column) keeps attempt numbering monotonic") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-legacy").toString
    // the pre-partitioned layout: parquet files directly under data/ with
    // attempt carried as a data column
    ExtractJob.extract(spark, fixtureDf(20)).toDF()
      .withColumn("part_id", F.spark_partition_id())
      .withColumn("attempt", F.lit(0L))
      .write.mode("append").parquet(s"$out/data")
    assert(Progress.attempts(spark, out) == Seq(0L))
    assert(Progress.nextAttempt(spark, out) == 1L,
      "a legacy flat layout must not reset attempt numbering to 0")
    assert(Progress.readLatest(spark, out).count() == 20)
  }

  test("a resumed write migrates a legacy flat layout instead of corrupting it") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-migrate").toString
    ExtractJob.extract(spark, fixtureDf(20)).toDF()
      .withColumn("part_id", F.spark_partition_id())
      .withColumn("attempt", F.lit(0L))
      .write.mode("append").parquet(s"$out/data")
    // resumed write: 20 docs skip via resume, 20 new docs land — the write
    // must first rewrite the flat files into attempt=0/, else the
    // partitionBy append creates a mixed-depth tree Spark cannot read
    val r = ExtractJob.runAndCommit(spark, fixtureDf(40), out, 4)
    assert(r.count() == 40)
    assert(r.select("doc_id").distinct().count() == 40)
    val fsys = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rootEntries = fsys.listStatus(new org.apache.hadoop.fs.Path(s"$out/data")).toSeq
    assert(!rootEntries.exists(st => st.isFile && st.getPath.getName.endsWith(".parquet")),
      "no flat parquet files may remain at the data root after migration")
    assert(rootEntries.exists(_.getPath.getName == "attempt=0"))
    assert(!fsys.exists(new org.apache.hadoop.fs.Path(s"$out/data_migrating")),
      "migration staging must be cleaned up")
    // the migrated table is fully readable via normal partition discovery
    assert(spark.read.parquet(s"$out/data").count() == 40)
    assert(Progress.readLatest(spark, out).count() == 40)
  }

  test("legacy migration recovers from a crash on either side of the staging marker") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-migrate-crash").toString
    val flat = ExtractJob.extract(spark, fixtureDf(10)).toDF()
      .withColumn("part_id", F.spark_partition_id())
      .withColumn("attempt", F.lit(0L))
    flat.write.mode("append").parquet(s"$out/data")
    val fsys = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // pre-marker crash: garbage staging without the marker is discarded
    // and the migration redone from the intact flat files
    flat.limit(3).write.partitionBy("attempt").parquet(s"$out/data_migrating")
    Progress.migrateLegacyLayout(spark, out)
    assert(spark.read.parquet(s"$out/data").count() == 10,
      "pre-marker staging must be discarded, not moved")
    // post-marker crash: a sealed staging with flat files still present is
    // COMPLETED (moved + flats deleted), not redone
    val out2 = java.nio.file.Files.createTempDirectory("graft-migrate-crash2").toString
    flat.write.mode("append").parquet(s"$out2/data")
    flat.withColumn("attempt", F.lit(0L)).write.partitionBy("attempt")
      .parquet(s"$out2/data_migrating")
    fsys.createNewFile(new org.apache.hadoop.fs.Path(s"$out2/data_migrating/_GRAFT_STAGED"))
    Progress.migrateLegacyLayout(spark, out2)
    assert(!fsys.exists(new org.apache.hadoop.fs.Path(s"$out2/data_migrating")))
    assert(spark.read.parquet(s"$out2/data").count() == 10)
    assert(Progress.attempts(spark, out2) == Seq(0L))
    // collision: staged rows whose destination dir ALREADY exists must
    // fail loudly BEFORE any rename or deletion. Staging carries TWO
    // attempts and only attempt=1 collides — validate-then-act means
    // attempt=0 must NOT have been moved either (a mid-loop abort would
    // leave staging half-drained with flat rows duplicated into data/)
    val out3 = java.nio.file.Files.createTempDirectory("graft-migrate-clash").toString
    flat.write.mode("append").parquet(s"$out3/data")
    flat.limit(2).withColumn("attempt", F.lit(1L))
      .write.partitionBy("attempt").mode("append").parquet(s"$out3/data")
    flat.withColumn("attempt", F.lit(0L))
      .unionByName(flat.limit(1).withColumn("attempt", F.lit(1L)))
      .write.partitionBy("attempt").parquet(s"$out3/data_migrating")
    fsys.createNewFile(new org.apache.hadoop.fs.Path(s"$out3/data_migrating/_GRAFT_STAGED"))
    val e = intercept[IllegalStateException] { Progress.migrateLegacyLayout(spark, out3) }
    assert(e.getMessage.contains("migration collision"))
    // nothing was renamed or deleted: flat sources and FULL staging intact
    val root3 = fsys.listStatus(new org.apache.hadoop.fs.Path(s"$out3/data")).toSeq
    assert(root3.exists(st => st.isFile && st.getPath.getName.endsWith(".parquet")),
      "flat files must survive a collision abort")
    assert(!fsys.exists(new org.apache.hadoop.fs.Path(s"$out3/data/attempt=0")),
      "non-colliding staged dirs must not move when ANY destination collides")
    assert(fsys.exists(new org.apache.hadoop.fs.Path(s"$out3/data_migrating/attempt=0")))
    assert(fsys.exists(new org.apache.hadoop.fs.Path(s"$out3/data_migrating/attempt=1")))
  }

  test("compact migrates a legacy flat layout first instead of creating a mixed-depth tree") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-compact-flat").toString
    // flat layout WITH superseded rows: attempts 0 and 1 of the same docs
    // carried as a data column in files directly under data/
    val base = ExtractJob.extract(spark, fixtureDf(10)).toDF()
      .withColumn("part_id", F.spark_partition_id())
    base.withColumn("attempt", F.lit(0L))
      .unionByName(base.withColumn("attempt", F.lit(1L)))
      .write.mode("append").parquet(s"$out/data")
    val before = Progress.readLatest(spark, out)
      .select("doc_id", "attempt").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(before.forall(_._2 == 1L) && before.size == 10)
    // compact must migrate to attempt= dirs BEFORE staging its swap —
    // renaming attempt dirs in next to flat parquet files would produce
    // the mixed-depth tree Spark cannot read
    assert(Progress.compact(spark, out))
    val fsys = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rootEntries = fsys.listStatus(new org.apache.hadoop.fs.Path(s"$out/data")).toSeq
    assert(!rootEntries.exists(st => st.isFile && st.getPath.getName.endsWith(".parquet")),
      "no flat parquet files may survive a compaction")
    assert(spark.read.parquet(s"$out/data").count() == 10,
      "superseded attempt-0 rows must be gone and the tree readable")
    val after = Progress.readLatest(spark, out)
      .select("doc_id", "attempt").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(after == before, "readLatest must be identical across compaction")
    assert(Progress.nextAttempt(spark, out) == 2L)
  }

  test("flat-layout attempt cache invalidates when the directory changes externally") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-flat-stale").toString
    val base = ExtractJob.extract(spark, fixtureDf(5)).toDF()
      .withColumn("part_id", F.spark_partition_id())
    base.withColumn("attempt", F.lit(0L)).write.mode("append").parquet(s"$out/data")
    assert(Progress.attempts(spark, out) == Seq(0L)) // populates the cache
    // an external legacy writer appends attempt-3 rows to the still-flat
    // table; a stale cache would keep answering Seq(0) and nextAttempt
    // would mint colliding attempt numbers
    base.withColumn("attempt", F.lit(3L)).write.mode("append").parquet(s"$out/data")
    assert(Progress.attempts(spark, out) == Seq(0L, 3L),
      "externally appended attempts must invalidate the cached flat scan")
    assert(Progress.nextAttempt(spark, out) == 4L)
  }

  test("compaction: readLatest/nextAttempt/summaryTotals identical; superseded rows, attempts and snapshots pruned") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val docs = fixtureDf(120)
    ExtractJob.runAndCommit(spark, docs, out, 4)
    // two DLQ replays: the failed docs fail again deterministically, so
    // attempt 1 is FULLY superseded by attempt 2 (must be dropped) and
    // attempt 0 keeps only its winners
    ExtractJob.runAndCommit(spark, docs, out, 4, retryFailed = true)
    ExtractJob.runAndCommit(spark, docs, out, 4, retryFailed = true)
    def latestView = Progress.readLatest(spark, out)
      .select("doc_id", "attempt", "status", "span_count").orderBy("doc_id").collect().toSeq
    val before = latestView
    val beforeNext = Progress.nextAttempt(spark, out)
    val beforeTotals = Progress.summaryTotals(Progress.latestSnapshot(spark, out).get).toSeq
    val rowsBefore = spark.read.parquet(s"$out/data").count()
    assert(rowsBefore > 120, "replays must have produced superseded rows")

    assert(Progress.compact(spark, out), "there was history to compact")

    assert(latestView == before, "readLatest must be identical after compaction")
    assert(Progress.nextAttempt(spark, out) == beforeNext)
    assert(Progress.summaryTotals(Progress.latestSnapshot(spark, out).get).toSeq == beforeTotals,
      "corrected totals (incl. cumulative processing time) must be preserved")
    assert(spark.read.parquet(s"$out/data").count() == 120, "only winners remain")
    val fsys = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fsys.exists(new org.apache.hadoop.fs.Path(s"$out/data/attempt=1")),
      "a fully-superseded attempt dir must be dropped")
    assert(fsys.exists(new org.apache.hadoop.fs.Path(s"$out/data/attempt=2")),
      "the max attempt dir must survive (attempt numbering authority)")
    val snaps = fsys.listStatus(new org.apache.hadoop.fs.Path(s"$out/progress"))
      .map(_.getPath.getName).filter(_.startsWith("snapshot-")).sorted.toSeq
    assert(snaps.length == 1, s"superseded snapshots must be pruned: $snaps")
    assert(!fsys.exists(new org.apache.hadoop.fs.Path(s"$out/compact_staging")))
    // a second compact with nothing to do is a no-op
    assert(!Progress.compact(spark, out))
    // the table keeps working: another replay commits attempt 3 and a new
    // snapshot with a HIGHER id than the collapsed one (no id regression)
    ExtractJob.runAndCommit(spark, docs, out, 4, retryFailed = true)
    assert(Progress.nextAttempt(spark, out) == beforeNext + 1)
    assert(Progress.summaryTotals(Progress.latestSnapshot(spark, out).get)
      .getAs[Long]("n_docs") == 120)
  }

  test("compaction recovers from a crash on either side of the staging marker") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-compact-crash").toString
    val docs = fixtureDf(60)
    ExtractJob.runAndCommit(spark, docs, out, 4)
    ExtractJob.runAndCommit(spark, docs, out, 4, retryFailed = true)
    val fsys = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def latestView = Progress.readLatest(spark, out)
      .select("doc_id", "attempt", "status").orderBy("doc_id").collect().toSeq
    val before = latestView
    // pre-marker crash: unsealed staging garbage is discarded, then the
    // real compaction runs from the intact table
    spark.range(3).toDF("x").write.parquet(s"$out/compact_staging/attempt=99")
    assert(Progress.compact(spark, out))
    assert(latestView == before)
    assert(!fsys.exists(new org.apache.hadoop.fs.Path(s"$out/data/attempt=99")),
      "garbage staging must never be swapped in")
    // post-marker crash: a sealed staging (attempt rewrite + snapshot +
    // plan marker) left by a crashed compaction is COMPLETED by the next
    // write via recoverCompaction — staged content is authoritative
    val out2 = java.nio.file.Files.createTempDirectory("graft-compact-crash2").toString
    val docs2 = fixtureDf(120) // large enough to contain failure-plan docs
    ExtractJob.runAndCommit(spark, docs2, out2, 4)
    ExtractJob.runAndCommit(spark, docs2, out2, 4, retryFailed = true)
    assert(fsys.exists(new org.apache.hadoop.fs.Path(s"$out2/data/attempt=1")),
      "the replay must have re-attempted failed docs (superseded rows exist)")
    val attempt0RowsBefore = Progress.readData(spark, out2)
      .filter($"attempt" === 0L).count()
    val winners0 = Progress.readLatest(spark, out2).filter($"attempt" === 0L)
    winners0.write.partitionBy("attempt").parquet(s"$out2/compact_staging")
    Progress.latestSnapshot(spark, out2).get
      .withColumn("snapshot_id", F.lit(7L))
      .coalesce(1).write.parquet(s"$out2/compact_staging/snapshot")
    val marker = fsys.create(
      new org.apache.hadoop.fs.Path(s"$out2/compact_staging/_GRAFT_COMPACT_PLAN"), false)
    marker.write("7\n\n".getBytes("UTF-8")); marker.close()
    val expectLatest = Progress.readLatest(spark, out2)
      .select("doc_id", "attempt", "status").orderBy("doc_id").collect().toSeq
    Progress.recoverCompaction(spark, out2)
    assert(!fsys.exists(new org.apache.hadoop.fs.Path(s"$out2/compact_staging")))
    assert(fsys.exists(new org.apache.hadoop.fs.Path(s"$out2/progress/snapshot-000007")),
      "the staged collapsed snapshot must be installed under its planned id")
    val snaps2 = fsys.listStatus(new org.apache.hadoop.fs.Path(s"$out2/progress"))
      .map(_.getPath.getName).filter(_.startsWith("snapshot-")).sorted.toSeq
    assert(snaps2 == Seq("snapshot-000007"), s"older snapshots pruned: $snaps2")
    assert(Progress.readLatest(spark, out2)
      .select("doc_id", "attempt", "status").orderBy("doc_id").collect().toSeq == expectLatest,
      "recovered table must serve the same latest view")
    assert(attempt0RowsBefore > spark.read.parquet(s"$out2/data")
      .filter(F.col("attempt").cast("long") === 0L).count(),
      "the staged winners-only rewrite of attempt 0 must have replaced the old dir")
    // the recovered table still accepts writes (attempt + snapshot ids advance)
    ExtractJob.runAndCommit(spark, docs2, out2, 4, retryFailed = true)
    assert(Progress.nextAttempt(spark, out2) == 3L)
  }

  test("readLatest join strategy is AQE's choice, not a forced broadcast") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-aqe").toString
    val docs = fixtureDf(200)
    ExtractJob.runAndCommit(spark, docs, out, 4)
    ExtractJob.runAndCommit(spark, docs, out, 4, retryFailed = true) // creates attempt 1
    assert(Progress.attempts(spark, out).length == 2)
    // broadcast disabled (the mass-replay stand-in): the plan must degrade
    // to a non-broadcast join instead of forcing a BroadcastExchange
    val conf = spark.conf
    val prev = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", prev)
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val df = Progress.readLatest(spark, out)
      assert(df.count() == 200)
      assert(!df.queryExecution.executedPlan.toString.contains("BroadcastExchange"),
        "with broadcast disabled, readLatest must not force a BroadcastExchange")
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prevAqe)
    }
    // default config: AQE broadcasts the tiny winners side at runtime
    val df2 = Progress.readLatest(spark, out)
    assert(df2.count() == 200)
    assert(df2.queryExecution.executedPlan.toString.contains("BroadcastExchange"),
      "with defaults, AQE should pick a runtime broadcast for the small replay set")
  }

  test("salted repartition balances media-heavy skew docs") {
    import spark.implicits._
    // 64 heavy docs (200 media spans) + 1000 light docs
    val heavy = spark.range(64).mapPartitions(_.map { i =>
      Doc(f"heavy-$i%04d", (0 until 200).map(j => Span("image", "", s"media://h$i-$j", j)))
    }).toDF()
    val light = fixtureDf(1000)
    val parts = ExtractJob.extract(spark, light.unionByName(heavy), 8)
      .toDF().withColumn("pid", F.spark_partition_id())
      .filter($"doc_id".startsWith("heavy-"))
      .groupBy($"pid").count().collect()
    assert(parts.length >= 4, s"heavy docs must spread over partitions, got ${parts.length}")
    assert(parts.map(_.getLong(1)).max <= 32, "no partition may hoard heavy docs")
  }
}
