package graft

import graft.functions.GraftExtensions
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Custom expressions must be reachable from SQL and agree with the Column
  * API. NOTE: suites share one JVM-wide SparkContext, so `getOrCreate`
  * would silently reuse a session built WITHOUT `withExtensions` — the
  * tests therefore exercise the post-hoc `register` path on isolated
  * `newSession()`s (the `withExtensions` constructor delegates to the same
  * injection list). */
class ExtensionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    val base = SparkSession.builder()
      .master("local[2]")
      .appName("ext-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val s = base.newSession()
    GraftExtensions.register(s)
    s
  }

  test("SQL-registered custom functions match the Column API") {
    import spark.implicits._
    Seq(("hello world", Seq("hello", "world"))).toDF("t", "toks")
      .createOrReplaceTempView("v")
    val viaSql = spark.sql(
      """SELECT graft_fnv64(t) AS f, graft_simhash64(toks) AS s,
        |       graft_minhash(toks, 8) AS m FROM v""".stripMargin).collect()(0)
    val viaCol = spark.table("v").select(
      graft.functions.ColumnFns.fnv64($"t"),
      graft.functions.ColumnFns.simhash64($"toks"),
      graft.functions.ColumnFns.minhashSig($"toks", 8)).collect()(0)
    assert(viaSql.getLong(0) == viaCol.getLong(0))
    assert(viaSql.getLong(1) == viaCol.getLong(1))
    assert(viaSql.getSeq[Long](2) == viaCol.getSeq[Long](2))
    assert(viaSql.getSeq[Long](2).length == 8)
  }

  test("graft_bpe_count lowercases like the Column API (mixed case must not inflate counts)") {
    import spark.implicits._
    Seq(("The Stream THE", "the stream the")).toDF("mixed", "lower")
      .createOrReplaceTempView("bpe_v")
    val viaSql = spark.sql(
      "SELECT graft_bpe_count(mixed) AS a, graft_bpe_count(lower) AS b FROM bpe_v").collect()(0)
    val viaCol = spark.table("bpe_v")
      .select(graft.ops.TextAnalysis.tokenCountBpe($"mixed")).collect()(0)
    // mixed-case SQL = lowercase SQL = Column API; un-lowercased input
    // would count every uppercase letter as its own unit
    assert(viaSql.getInt(0) == viaSql.getInt(1))
    assert(viaSql.getInt(0) == viaCol.getInt(0))
  }

  test("graft_bpe_count accepts a loaded merges.txt vocabulary (production-size path)") {
    import graft.functions.BpeTokenCount
    import spark.implicits._
    // production-shaped table: the frozen 42 rules plus every (letter,
    // letter) pair — 718 ordered rules, loaded from the standard
    // one-pair-per-line merges.txt format
    val extra = for (a <- 'a' to 'z'; b <- 'a' to 'z') yield (a.toString, b.toString)
    val merges = BpeTokenCount.Merges ++ extra
    val f = java.nio.file.Files.createTempFile("merges", ".txt")
    java.nio.file.Files.writeString(f,
      "# test vocabulary\n" + merges.map { case (a, b) => s"$a $b" }.mkString("\n") + "\n")
    assert(BpeTokenCount.loadMerges(f.toString) == merges.toSeq)
    val text = "the streaming tokenizer watches the theater, don't overthink zq xv 42 times!"
    Seq(Tuple1(text)).toDF("t").createOrReplaceTempView("big_bpe_v")
    val viaSql = spark.sql(
      s"SELECT graft_bpe_count(t, '${f.toString}') AS big, graft_bpe_count(t) AS frozen " +
        "FROM big_bpe_v").collect()(0)
    val viaCol = spark.table("big_bpe_v")
      .select(graft.ops.TextAnalysis.tokenCountBpe($"t", merges).as("n")).collect()(0)
    assert(viaSql.getInt(0) == viaCol.getInt(0), "SQL file-loaded table must equal Column API")
    // a strict superset of rules can only merge more: counts shrink ("zq"
    // and "xv" are single tokens under the big table, two under frozen)
    assert(viaSql.getInt(0) < viaSql.getInt(1),
      s"big-table count ${viaSql.getInt(0)} !< frozen ${viaSql.getInt(1)}")
    // independent transcription of the scan semantics: the SAME two-space
    // replace() technique the DuckDB oracle uses, here via Java's literal
    // non-overlapping String.replace — must agree rule-for-rule
    val unitRe = "[a-z0-9]+|[^a-z0-9\\s]".r
    val replayed = unitRe.findAllIn(text.toLowerCase).map { u =>
      var s = u.map(_.toString).mkString("  ", "  ", "  ")
      merges.foreach { case (a, b) => s = s.replace(s" $a  $b ", s" $a$b ") }
      s.split(" ").count(_.nonEmpty)
    }.sum
    assert(viaCol.getInt(0) == replayed, "engine scan must match the replace-chain replay")
    // oracle generation for a table this size stages into CTE layers so
    // the SQL parser's expression depth stays bounded
    val layers = BpeTokenCount.oracleReplaceChain(merges, "s", chunk = 400)
    assert(layers.length == 2 && layers(1).contains("(m1,")
      && !layers(1).contains("(s,") && layers(0).count(_ == '(') <= 401)
  }

  test("registration is session-scoped: a sibling session does not see the functions") {
    val sibling = spark.newSession()
    val ex = intercept[Exception] {
      sibling.sql("SELECT graft_fnv64('x')").collect()
    }
    assert(ex.getMessage.contains("graft_fnv64"))
    GraftExtensions.register(sibling)
    assert(sibling.sql("SELECT graft_fnv64('x')").collect()(0).getLong(0) ==
      spark.sql("SELECT graft_fnv64('x')").collect()(0).getLong(0))
  }

  // ---- runtime adapter registry (mirror of OCREngineFactory
  // .register_engine, factory.py:102-126; tests at
  // tests/unit/test_ocr_adapters.py:177-203) ---------------------------

  import graft.adapters.{Dispatch, ExtractFailure, SpanExtractor}
  import graft.core.{Doc, Model, Span}

  private object UpperAdapter extends SpanExtractor {
    override val name = "upper"
    override def extract(span: Span): Either[ExtractFailure, Vector[Span]] =
      Right(Vector(Span(Model.Kind.Text, span.text.toUpperCase(java.util.Locale.ROOT), "", 0)))
    override def metadata(span: Span): Map[String, String] = Map("engine" -> "upper")
  }

  test("register routes a custom adapter end-to-end (case-insensitive) and unregister restores") {
    try {
      Dispatch.register("Sidecar", UpperAdapter)
      assert(Dispatch.registeredKinds.contains("sidecar"))
      // kind dispatch: both cases route to the custom adapter
      val doc = Doc("d1", Vector(Span("sidecar", "hello", "", 0), Span("SIDECAR", "world", "", 1)))
      val out = Dispatch.extractDoc(doc)
      assert(out.status == Model.Completed)
      assert(out.adapter == "upper")
      assert(out.spans.map(_.text) == Vector("HELLO", "WORLD"))
      assert(out.metadata("engine") == "upper")
      // and through the distributed pipeline (the mapPartitions path the
      // extension surface is documented for)
      import spark.implicits._
      val res = graft.pipeline.ExtractJob.extract(spark, Seq(doc).toDF()).collect()
      assert(res.length == 1 && res.head.spans.map(_.text) == Seq("HELLO", "WORLD"))
    } finally Dispatch.unregister("sidecar")
    // after unregister: the reference's unknown-engine contract resumes
    val after = Dispatch.adapterFor("sidecar")
    assert(after.isLeft)
    assert(after.swap.toOption.get.message.contains("unsupported kind"))
    assert(!Dispatch.registeredKinds.contains("sidecar"))
  }

  test("register can override a built-in kind; unregister restores the built-in") {
    try {
      Dispatch.register("text", UpperAdapter)
      val out = Dispatch.extractDoc(Doc("d", Vector(Span("text", "abc", "", 0))))
      assert(out.spans.map(_.text) == Vector("ABC"), "custom adapter must win over the built-in")
    } finally Dispatch.unregister("text")
    val restored = Dispatch.extractDoc(Doc("d", Vector(Span("text", "abc", "", 0))))
    assert(restored.spans.map(_.text) == Vector("abc"), "built-in dispatch must resume")
  }

  test("register validates its arguments (the reference's TypeError contract)") {
    val e1 = intercept[IllegalArgumentException] { Dispatch.register("bad", null) }
    assert(e1.getMessage.contains("SpanExtractor"))
    val e2 = intercept[IllegalArgumentException] { Dispatch.register("", UpperAdapter) }
    assert(e2.getMessage.contains("non-empty"))
    val e3 = intercept[IllegalArgumentException] { Dispatch.register(null, UpperAdapter) }
    assert(e3.getMessage.contains("non-empty"))
  }

  // ---- GraftAdapterPlugin: per-executor-JVM registration carrier ------

  private def pluginCtx(registrars: String): org.apache.spark.api.plugin.PluginContext = {
    val sparkConf = new org.apache.spark.SparkConf()
      .set(graft.adapters.GraftAdapterPlugin.ConfKey, registrars)
    new org.apache.spark.api.plugin.PluginContext {
      override def conf: org.apache.spark.SparkConf = sparkConf
      override def executorID(): String = "test-exec"
      override def hostname(): String = "localhost"
      override def metricRegistry(): com.codahale.metrics.MetricRegistry = null
      override def resources(): java.util.Map[String, org.apache.spark.resource.ResourceInformation] =
        java.util.Collections.emptyMap()
      override def send(message: AnyRef): Unit = ()
      override def ask(message: AnyRef): AnyRef = null
    }
  }

  test("plugin runs named registrars in the executor JVM before tasks dispatch") {
    try {
      new graft.adapters.GraftAdapterPlugin().executorPlugin()
        .init(pluginCtx(classOf[TestPlugRegistrar].getName), java.util.Collections.emptyMap())
      assert(Dispatch.registeredKinds.contains("plugkind"))
      val out = Dispatch.extractDoc(Doc("d", Vector(Span("plugkind", "x", "", 0))))
      assert(out.spans.map(_.text) == Vector("plugged:x"))
    } finally Dispatch.unregister("plugkind")
  }

  test("plugin fails fast on unknown or non-registrar classes") {
    val plug = new graft.adapters.GraftAdapterPlugin().executorPlugin()
    val e1 = intercept[IllegalArgumentException] {
      plug.init(pluginCtx("com.example.NoSuchRegistrar"), java.util.Collections.emptyMap())
    }
    assert(e1.getMessage.contains("NoSuchRegistrar"))
    val e2 = intercept[IllegalArgumentException] {
      plug.init(pluginCtx(classOf[String].getName), java.util.Collections.emptyMap())
    }
    assert(e2.getMessage.contains("must implement graft.adapters.AdapterRegistrar"))
    // empty conf is a no-op
    plug.init(pluginCtx(""), java.util.Collections.emptyMap())
  }
}

/** Top-level (reflectively instantiable) registrar used by the plugin
  * test — the shape a deployment ships in its extension jar. */
class TestPlugRegistrar extends graft.adapters.AdapterRegistrar {
  override def register(): Unit =
    graft.adapters.Dispatch.register("plugkind", new graft.adapters.SpanExtractor {
      override val name = "plug"
      override def extract(span: graft.core.Span)
          : Either[graft.adapters.ExtractFailure, Vector[graft.core.Span]] =
        Right(Vector(graft.core.Span(graft.core.Model.Kind.Text, "plugged:" + span.text, "", 0)))
    })
}
