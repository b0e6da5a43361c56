package graft.tools

/** Dumps the seeded LSH hyperplanes as full-precision literals — ground
  * truth for prototyping the q_ann_lsh DuckDB oracle. */
object PlaneProbe {
  def main(args: Array[String]): Unit = {
    val planes = graft.ops.Similarity.hyperplanes(64, 8, 7L)
    planes.zipWithIndex.foreach { case (p, i) =>
      println(s"PLANE $i " + p.map(d => f"$d%.17g").mkString(","))
    }
  }
}
