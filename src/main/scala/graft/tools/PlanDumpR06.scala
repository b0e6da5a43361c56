package graft.tools

import java.nio.file.{Files, Paths}

/** Writes `plans/r06/<query>_<suffix>.txt` — the `explain("formatted")`
  * output of each named query in a Bench-identical session (local[32],
  * 32 shuffle partitions, sf0.1) — the before/after plan evidence for the
  * round-6 optimization work. Usage:
  * `runMain graft.tools.PlanDumpR06 <suffix> <q1> <q2> …` */
object PlanDumpR06 {
  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("after")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q_dedup_pipeline", "q_semdedup", "q_embed_neardup",
        "q_ann_ivf", "q_ann_lsh", "q_ann_recall", "q_embed_topk",
        "q_dedup_ladder_sql", "q_dedup_minhash", "q_dedup_simhash",
        "q_dedup_cc", "q_ngram_jaccard", "q3_join", "q_passage_dedup")
    val dir = "/root/testdata/sf0.1"
    val s = Profile.session()
    Files.createDirectories(Paths.get("plans/r06"))
    names.foreach { q =>
      val plan = graft.SparkEntry.queries(q)(s, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"plans/r06/${q}_$suffix.txt"), plan)
      println(s"wrote plans/r06/${q}_$suffix.txt (${plan.length} chars)")
    }
    s.stop()
  }
}
