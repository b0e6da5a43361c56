package graft.tools

import org.apache.spark.unsafe.types.UTF8String


/** Prints Spark's Murmur3_x86_32.hashUnsafeBytes for reference strings —
  * the ground truth behind the DuckDB simhash oracle's SQL murmur. */
object MurmurProbe {
  def main(args: Array[String]): Unit = {
    val tests = Seq("hello", "a", "spark", "élève", "w12")
    tests.foreach { t =>
      val s = UTF8String.fromString(t)
      val lo = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(
        s.getBaseObject, s.getBaseOffset, s.numBytes, 0x9747b28c)
      val hi = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(
        s.getBaseObject, s.getBaseOffset, s.numBytes, 0x85ebca6b)
      println(s"MURMUR $t ${lo.toLong & 0xffffffffL} ${hi.toLong & 0xffffffffL}")
    }
  }
}
