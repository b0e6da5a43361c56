package graft.examples

import org.apache.spark.sql.SparkSession

/** Regenerates the raw `@@PLAN` captures in PLANS.md (run at sf0.01,
  * local[4], matching the original capture conditions). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    Seq("q_extract_spancount", "q_resume_antijoin", "q3_join",
        "q_dedup_minhash", "q_embed_neardup", "q_sample_stratified",
        "q_decontaminate", "q_passage_dedup", "q_domain_cap",
        "q_pack_sequences", "q_passage_excise", "q_semdedup").foreach { q =>
      println(s"@@PLAN $q")
      println(graft.SparkEntry.queries(q)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      println("@@END")
    }
    spark.stop()
  }
}
