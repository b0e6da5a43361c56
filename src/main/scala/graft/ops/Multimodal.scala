package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata structs, processed in BATCHES
  * inside `mapPartitions` (the Scala analog of an Arrow-batched pandas
  * UDF: fixed batch shape, per-batch setup amortization, no per-row
  * closure dispatch).
  *
  * The actual codecs are STUBBED — this container ships no image/audio
  * libraries — with deterministic fakes that derive metadata from the
  * payload bytes, clearly marked below. The Spark-side contract (schema,
  * batching, partitioning) is real and tested; swapping `decodeBatch` for
  * a JNI/codec call is the only production change.
  */
object Multimodal {

  val BatchSize = 64

  final case class MediaRow(id: Long, blob: Array[Byte])
  final case class MediaMeta(id: Long, n_bytes: Int, width: Int, height: Int, format: String)
  final case class FrameSample(id: Long, n_frames: Int, sample_hex: String)

  /** Attach a binary payload column. For the synthetic corpus the payload
    * is the UTF-8 encoding of the text column (deterministic); production
    * reads `binaryFile` sources or inline parquet binary. */
  def withBlob(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
      encode(col(textCol), "UTF-8").as("blob"))

  // ---- STUB: deterministic fake decode --------------------------------
  // A real implementation decodes the image header here. The fake derives
  // (width, height, format) from byte length alone so the DuckDB oracle
  // can replicate it; the batched dispatch shape is the part under test.
  private def decodeOne(id: Long, blob: Array[Byte]): MediaMeta = {
    val n = if (blob == null) 0 else blob.length
    val width = 320 + (n % 16) * 64
    val height = 240 + ((n / 16) % 16) * 48
    val format = (n % 3) match {
      case 0 => "png"
      case 1 => "jpeg"
      case _ => "webp"
    }
    MediaMeta(id, n, width, height, format)
  }

  /** Batched metadata extraction over the binary column. */
  def decodeMeta(spark: SparkSession, blobs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    blobs.as[MediaRow].mapPartitions { it =>
      // batch loop: a real codec would allocate its decode context once
      // here and feed it BatchSize payloads at a time
      it.grouped(BatchSize).flatMap { batch =>
        batch.map(r => decodeOne(r.id, r.blob))
      }
    }
  }

  /** STUB frame sampling ("video" path): treat every 256-byte stride as a
    * frame boundary, sample the first byte of each of the first 8 frames,
    * hex-encode. Deterministic; exercises the batched binary-slice shape. */
  def frameSample(spark: SparkSession, blobs: DataFrame, stride: Int = 256): Dataset[FrameSample] = {
    import spark.implicits._
    blobs.as[MediaRow].mapPartitions { it =>
      it.grouped(BatchSize).flatMap(_.map { r =>
        val blob = if (r.blob == null) Array.emptyByteArray else r.blob
        val nFrames = (blob.length + stride - 1) / stride
        val sampled = (0 until math.min(8, nFrames)).map(f => blob(f * stride))
        FrameSample(r.id, nFrames, sampled.map(b => f"${b & 0xff}%02x").mkString)
      })
    }
  }

  /** STUB resize: "resizes" by keeping a deterministic byte stride so the
    * output payload shrinks by ~factor; schema/partitioning path is real. */
  def resizeStub(spark: SparkSession, blobs: DataFrame, factor: Int = 4): DataFrame = {
    import spark.implicits._
    blobs.as[MediaRow].mapPartitions { it =>
      it.grouped(BatchSize).flatMap(_.map { r =>
        val blob = if (r.blob == null) Array.emptyByteArray else r.blob
        val out = new Array[Byte]((blob.length + factor - 1) / factor)
        var i = 0
        while (i < out.length) { out(i) = blob(i * factor); i += 1 }
        (r.id, out)
      })
    }.toDF("id", "blob_resized")
  }
}
