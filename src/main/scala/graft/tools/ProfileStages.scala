package graft.tools

import graft.ops.{Dedup, TextAnalysis}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the dedup ladder at a given SF dir. */
object ProfileStages {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = Profile.session()
    import s.implicits._

    val base0 = s.read.parquet(s"$dir/documents.parquet").select($"doc_id", $"text")
    val mutated = base0.filter($"doc_id" % 20 === 0)
      .select(($"doc_id" + 10000000L).as("doc_id"),
        concat_ws(" ",
          filter(split(regexp_replace($"text", "\\s+", " "), " "),
            (t, i) => i % 10 =!= 3 && t =!= lit(""))).as("text"))
    val exactCopies = base0.filter($"doc_id" % 40 === 0)
      .select(($"doc_id" + 20000000L).as("doc_id"), $"text")
    val corpus = base0.unionByName(mutated).unionByName(exactCopies)

    val (_, tFrame) = Profile.timed(Dedup.dedupFrame(corpus, "doc_id", "text", w = 3))
    println(f"STAGE dedupFrame            $tFrame%7.2fs")
    val frame = Dedup.dedupFrame(corpus, "doc_id", "text", w = 3)

    val wFp = Window.partitionBy($"fp")
    val marked = frame.select($"id", $"fp")
      .withColumn("is_exact_dup", $"id" =!= min($"id").over(wFp))
      .select($"id", $"is_exact_dup")
    val (nM, tM) = Profile.timed(marked.count())
    println(f"STAGE exact-window          $tM%7.2fs rows=$nM")

    val dupIds = marked.filter($"is_exact_dup").select($"id")
    val survFrame = frame.join(dupIds, Seq("id"), "left_anti")
    val (nS, tS) = Profile.timed(survFrame.count())
    println(f"STAGE survivors-antijoin    $tS%7.2fs rows=$nS")

    // candidate generation only (no verify)
    val rowsPerBand = Dedup.NumHashes / Dedup.NumBands
    val banded = survFrame.select(
      col("id"),
      posexplode(transform(sequence(lit(0), lit(Dedup.NumBands - 1)),
        b => xxhash64(concat_ws(",", slice(col("sig"), b * rowsPerBand + lit(1), lit(rowsPerBand)))))))
      .withColumnRenamed("pos", "band_id").withColumnRenamed("col", "band_hash")
    val candidates = banded.select(col("band_id"), col("band_hash"), col("id").as("id_a"))
      .join(banded.select(col("band_id"), col("band_hash"), col("id").as("id_b")),
        Seq("band_id", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    val (nC, tC) = Profile.timed(candidates.count())
    println(f"STAGE candidates            $tC%7.2fs rows=$nC")

    val (nP, tP) = Profile.timed(
      Dedup.minhashCandidatesFromSig(survFrame, minJaccardMilli = 700L).count())
    println(f"STAGE candidates+verify     $tP%7.2fs rows=$nP")

    val pairsNear = Dedup.minhashCandidatesFromSig(survFrame, minJaccardMilli = 700L)
    val (nCC, tCC) = Profile.timed(Dedup.connectedComponents(pairsNear).count())
    println(f"STAGE connectedComponents   $tCC%7.2fs rows=$nCC")

    s.stop()
  }
}
