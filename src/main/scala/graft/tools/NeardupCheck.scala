package graft.tools
import org.apache.spark.sql.SparkSession
object NeardupCheck {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.ui.enabled","false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries("q_embed_neardup")(s, "/root/testdata/sf0.01")
      .collect().foreach(println)
    s.stop()
  }
}
