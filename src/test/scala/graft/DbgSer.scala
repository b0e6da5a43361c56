package graft
import org.apache.spark.sql.SparkSession
object DbgSer {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = spark.range(100).mapPartitions(_.map(i => graft.core.Fixtures.doc(i))).toDF()
    val agg = graft.pipeline.ExtractJob.extract(spark, docs).toDF().selectExpr("sum(span_count)", "count(*)")
    val plan = agg.queryExecution.optimizedPlan.toString
    println("serializefromobject fields: " + "named_struct".r.findAllIn(plan).size)
    println(plan.split("\n").filter(l => l.contains("SerializeFromObject") || l.contains("span_count")).take(4).mkString("\n"))
    spark.stop()
  }
}
