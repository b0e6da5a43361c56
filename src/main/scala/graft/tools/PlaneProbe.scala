package graft.tools

/** Dumps seeded LSH hyperplane literals — ground truth for prototyping
  * the q_ann_lsh / q_ann_recall DuckDB oracles. args: dim nPlanes nTables
  * baseSeed (defaults 64 8 1 7). */
object PlaneProbe {
  def main(args: Array[String]): Unit = {
    val dim = args.headOption.map(_.toInt).getOrElse(64)
    val nPlanes = args.lift(1).map(_.toInt).getOrElse(8)
    val nTables = args.lift(2).map(_.toInt).getOrElse(1)
    val seed = args.lift(3).map(_.toLong).getOrElse(7L)
    for (t <- 0 until nTables) {
      val planes = graft.ops.Similarity.hyperplanes(dim, nPlanes, seed + 1009L * t)
      planes.zipWithIndex.foreach { case (p, i) =>
        println(s"PLANE $t $i " + p.map(d => String.format(java.util.Locale.ROOT, "%.17g", Double.box(d))).mkString(","))
      }
    }
  }
}
