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
}
