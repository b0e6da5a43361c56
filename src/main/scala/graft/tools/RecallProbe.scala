package graft.tools

import graft.ops.Similarity
import org.apache.spark.sql.SparkSession

/** One-off measurement harness behind q_ann_recall's parameter choices:
  * sweeps (nPlanes, nTables) for multi-table sign-LSH and (nCells,
  * nProbe) for IVF against the exact brute-force top-5 on the real
  * embeddings table. Run: `sbt "runMain graft.tools.RecallProbe"`. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    val emb = s.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = emb.filter($"vec_id" % 100 === 0)
    val exact = Similarity.bruteForceTopK(emb, q, 5).select($"query_id", $"vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for ((pl, nt) <- Seq((4, 12), (5, 16), (6, 16), (8, 16))) {
      val l = Similarity.annTopK(emb, q, 5, 64, nPlanes = pl, nTables = nt)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"LSH nPlanes=$pl nTables=$nt recall=${exact.intersect(l).size.toDouble / exact.size}%.3f")
    }
    for ((nc, np) <- Seq((16, 2), (16, 4), (16, 6), (8, 4))) {
      val ivf = Similarity.ivfTopK(emb, q, 5, 64, nCells = nc, nProbe = np)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"IVF nCells=$nc nProbe=$np recall=${exact.intersect(ivf).size.toDouble / exact.size}%.3f")
    }
    s.stop()
  }
}
