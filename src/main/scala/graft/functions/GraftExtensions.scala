package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions, so `spark.sql("SELECT
  * graft_fnv64(text) …")` works next to the Column API. Activate with
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions) …
  * // or: spark.sql.extensions=graft.functions.GraftExtensions
  * }}}
  *
  * (Also injectable post-hoc via [[GraftExtensions.register]] for sessions
  * the caller does not construct, e.g. the driver-owned bench session.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.injections.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions", name, usage)

  val injections: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("graft_fnv64",
      info("graft_fnv64", "graft_fnv64(str) - FNV-1a 64-bit rolling hash of the UTF-8 bytes."),
      (es: Seq[Expression]) => Fnv64(es.head)),
    ("graft_simhash64",
      info("graft_simhash64", "graft_simhash64(array<string>) - 64-bit SimHash of a token array."),
      (es: Seq[Expression]) => SimHash64(es.head)),
    ("graft_minhash",
      info("graft_minhash", "graft_minhash(array<string>, k) - k-permutation MinHash signature."),
      (es: Seq[Expression]) => MinHashSig(es.head,
        es(1).eval().asInstanceOf[Number].intValue())),
    ("graft_top_ngram_frac",
      info("graft_top_ngram_frac",
        "graft_top_ngram_frac(array<string>, n) - per-mille share of the most frequent n-gram."),
      (es: Seq[Expression]) => TopNgramFrac(es.head,
        es(1).eval().asInstanceOf[Number].intValue())),
    ("graft_bpe_count",
      info("graft_bpe_count",
        "graft_bpe_count(str[, merges_path]) - subword token count under a BPE merge table " +
          "(input is lowercased); default table is the engine's frozen vocabulary, or load " +
          "a merges.txt file (driver-side at plan time — the table travels in the plan)."),
      // lowercase INSIDE the registration so the SQL surface matches the
      // Column API (TextAnalysis.tokenCountBpe wraps lower()): the merge
      // table's vocabulary is lowercase, and raw mixed-case input would
      // silently count every uppercase letter as its own unit
      (es: Seq[Expression]) => {
        val low = org.apache.spark.sql.catalyst.expressions.Lower(es.head)
        if (es.lengthCompare(1) <= 0) new BpeTokenCount(low)
        else BpeTokenCount(low, BpeTokenCount.loadMerges(
          es(1).eval().asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString))
      }))

  /** Register the same functions on an already-built session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    injections.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "built-in")
    }
}
