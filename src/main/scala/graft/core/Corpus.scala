package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derives an interleaved text+media document corpus from the driver's
  * `documents` parquet table, deterministically — the bridge that lets the
  * DuckDB oracle check REAL extraction output (span counts) from the same
  * input table (TESTDATA.md).
  *
  * Wrap spec (must stay in lockstep with `SparkEntry.oracleSql`'s
  * q_extract_spancount formula):
  *  - tokens = text split on whitespace, empties dropped;
  *  - title heading: `Document <doc_id>` → 1 text span (always kept);
  *  - body paragraphs: consecutive chunks of [[TokensPerPara]] tokens; a
  *    short tail chunk merges into the previous one, so
  *    nParas = n==0 ? 0 : max(1, n / TokensPerPara); the single-chunk case
  *    (n < TokensPerPara) survives extraction iff its normalized length ≥
  *    the extractor's MinTextLen (25); multi-token-chunk paragraphs are
  *    always ≥ 59 chars and survive;
  *  - images: min(3, n / TokensPerImage) media spans `media://doc<ID>-<j>`;
  *  - nav/footer boilerplate is rendered around the content and must be
  *    stripped by the extractor.
  */
object Corpus {

  val TokensPerPara = 30
  val TokensPerImage = 100

  /** Build the canonical (doc_id, spans) input table from documents.parquet.
    * Runs on executors; one html span per document. */
  def fromDocuments(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val raw = spark.read.parquet(s"$sfDir/documents.parquet")
    // schema-on-read enforcement (the pydantic-validation analog,
    // reference workers/nats_worker.py:205): fail fast at plan time with a
    // named-column message, not at execution with a resolution stack trace
    val missing = Seq("doc_id", "text").filterNot(raw.columns.contains)
    require(missing.isEmpty,
      s"documents table at $sfDir is missing required column(s): ${missing.mkString(", ")}; " +
        s"found schema: ${raw.schema.simpleString}")
    raw
      .select($"doc_id".cast("string").as("id"), $"text".cast("string").as("text"))
      .as[(String, String)]
      .map { case (id, text) => wrap(id, if (text == null) "" else text) }
      .toDF()
  }

  def wrap(id: String, text: String): Doc = {
    val tokens = text.split("\\s+").filter(_.nonEmpty)
    val n = tokens.length
    val nParas = if (n == 0) 0 else math.max(1, n / TokensPerPara)
    val paras = (0 until nParas).map { i =>
      val from = i * TokensPerPara
      val until = if (i == nParas - 1) n else (i + 1) * TokensPerPara
      tokens.slice(from, until).mkString(" ")
    }
    val nImgs = math.min(3, n / TokensPerImage)
    val refs = (0 until nImgs).map(j => s"media://doc$id-$j")
    val html = renderPage(id, paras, refs)
    Doc(s"doc-$id", Vector(Span(Model.Kind.Html, html, "", 0)))
  }

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def renderPage(id: String, paras: Seq[String], refs: Seq[String]): String = {
    val sb = new StringBuilder
    sb.append("<html><head><title>doc ").append(id).append("</title></head><body>\n")
    sb.append("<nav><ul><li><a href=\"/\">Home</a></li><li><a href=\"/about\">About</a></li>")
    sb.append("<li><a href=\"/contact\">Contact</a></li></ul></nav>\n")
    sb.append("<header><h1>Document ").append(id).append("</h1></header>\n")
    paras.foreach(p => sb.append("<p>").append(esc(p)).append("</p>\n"))
    refs.foreach(r => sb.append("<img src=\"").append(r).append("\">\n"))
    sb.append("<footer><p>(c) fixture</p><a href=\"#top\">Top</a></footer>\n")
    sb.append("</body></html>\n")
    sb.toString
  }

  /** Column expression: normalized token count of a raw text column — the
    * shared definition used by token-count analytics and the span-count
    * oracle (kept as built-in functions so it stays inside whole-stage
    * codegen). */
  def tokenCountCol(text: Column): Column =
    size(filter(split(regexp_replace(text, "\\s+", " "), " "), t => t =!= lit("")))
}
