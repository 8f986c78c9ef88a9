package graft.operators

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque BINARY columns with typed metadata, processed in partition-batch
  * operators (`mapPartitions` — the Scala analog of `mapInPandas`: one JVM
  * batch per partition, vectorizable inside, no per-row UDF dispatch).
  *
  * The actual media DECODE step is a clearly-marked STUB — the container
  * has no image/audio codecs — implemented as a deterministic fake decoder
  * over a self-describing header we also generate. Everything around it is
  * real and tested: the binary schema, the batch iterator shape, the 1->N
  * frame-sample generator, partition sizing, and feature post-processing.
  * A real decoder (javacv, TwelveMonkeys, ffmpeg pipe) drops into
  * [[decodeHeader]] without touching any plumbing.
  */
object Multimodal {

  case class Media(media_id: Long, kind: String, data: Array[Byte],
      width: Int, height: Int, duration_ms: Int)

  case class ImageFeatures(media_id: Long, width: Int, height: Int,
      channels: Int, feature: Array[Float])

  case class Frame(media_id: Long, frame_idx: Int, ts_ms: Int, data: Array[Byte])

  /** Deterministic synthetic media blobs: 16-byte header
    * (magic, width, height, duration) + seeded payload. Stands in for real
    * encoded bytes; the header is what the stub decoder parses. */
  def syntheticMedia(spark: SparkSession, n: Int, kind: String = "image"): Dataset[Media] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val w = 32 + (i % 8).toInt * 16
      val h = 32 + (i % 5).toInt * 16
      val dur = if (kind == "video") 1000 + (i % 10).toInt * 500 else 0
      val payload = new Array[Byte](64)
      var j = 0
      while (j < payload.length) { payload(j) = ((i * 131 + j * 17) % 251).toByte; j += 1 }
      val buf = ByteBuffer.allocate(16 + payload.length).order(ByteOrder.LITTLE_ENDIAN)
      buf.putInt(0x47524654).putInt(w).putInt(h).putInt(dur).put(payload)
      Media(i, kind, buf.array(), w, h, dur)
    }(Encoders.media)
  }

  /** STUB decoder: parses the synthetic header + derives a deterministic
    * "feature" from payload bytes. Replace with a real codec here. */
  private def decodeHeader(data: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    val buf = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    val magic = buf.getInt()
    require(magic == 0x47524654, s"bad media magic: $magic")
    val w = buf.getInt(); val h = buf.getInt(); buf.getInt()
    val feat = new Array[Float](8)
    var i = 16
    while (i < data.length) { feat((i - 16) % 8) += (data(i) & 0xff) / 255.0f; i += 1 }
    (w, h, 3, feat)
  }

  /** Batch feature extraction: one partition = one batch, decode loop in
    * plain JVM code (the mapInPandas seam). */
  def decodeImageFeatures(media: DataFrame): Dataset[ImageFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("data"))
      .as[(Long, Array[Byte])](Encoders.idBytes)
      .mapPartitions { batch =>
        batch.map { case (id, data) =>
          val (w, h, c, feat) = decodeHeader(data)
          ImageFeatures(id, w, h, c, feat)
        }
      }(Encoders.imageFeatures)
  }

  /** 1->N frame sampling for video blobs: a generator (flatMap) emitting
    * one row per sampled frame at the given fps over the stub duration. */
  def sampleFrames(media: DataFrame, fps: Double): Dataset[Frame] = {
    val spark = media.sparkSession
    media.select(col("media_id"), col("data"))
      .as[(Long, Array[Byte])](Encoders.idBytes)
      .mapPartitions { batch =>
        batch.flatMap { case (id, data) =>
          val buf = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
          require(buf.getInt() == 0x47524654)
          buf.getInt(); buf.getInt()
          val durMs = buf.getInt()
          val stepMs = math.max(1, (1000.0 / fps).toInt)
          (0 until durMs by stepMs).zipWithIndex.map { case (ts, idx) =>
            // STUB frame bytes: offset slice of the payload
            val o = 16 + (idx % 4)
            Frame(id, idx, ts, java.util.Arrays.copyOfRange(data, o, math.min(o + 16, data.length)))
          }
        }
      }(Encoders.frame)
  }

  /** Typed-metadata projection + partition sizing for a media table: the
    * scan-side shape (select only header metadata, never the blob) that
    * keeps 100 TB of blobs out of shuffles. */
  def mediaStats(media: DataFrame): DataFrame =
    media.groupBy("kind").agg(
      count(lit(1)).as("n"),
      sum(length(col("data"))).as("total_bytes"),
      avg(col("width") * col("height")).as("avg_pixels"))

  /** Explicit encoders (library code has no implicits in scope). */
  private object Encoders {
    import org.apache.spark.sql.{Encoder, Encoders => E}
    val media: Encoder[Media] = E.product[Media]
    val idBytes: Encoder[(Long, Array[Byte])] = E.tuple(E.scalaLong, E.BINARY)
    val imageFeatures: Encoder[ImageFeatures] = E.product[ImageFeatures]
    val frame: Encoder[Frame] = E.product[Frame]
  }
}
