package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (builder prompt): image/audio/video travel as
  * opaque `binary` columns with typed metadata; decode / feature-extract /
  * resize / frame-sample run per-partition over batches.
  *
  * Codec status: IMAGE decode is real (JDK `javax.imageio` — PNG/BMP/GIF/
  * JPEG true dimensions, no external libraries); audio/video decode and
  * pixel resampling are STUBBED behind the [[MediaCodec]] trait (no such
  * codec ships with the JDK and this container has no media libraries).
  * The Spark-side plumbing is real and tested either way: schema, encoders,
  * partition batching, and the mapPartitions execution shape (the Scala
  * analogue of mapInPandas — one codec instantiation per partition,
  * streamed batches, no per-row setup cost).
  */
object MultimodalOps {

  /** A media row: opaque payload + typed envelope. */
  final case class MediaRecord(
      media_id: Long,
      media_type: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      source: String)

  /** Decoded features — what a real decoder would emit. */
  final case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      duration_ms: Long,
      feature_hash: String)

  /** Pluggable decoder. Implementations must be Serializable (shipped to
    * executors) and cheap to construct once per partition. */
  trait MediaCodec extends Serializable {
    def decode(payload: Array[Byte], mediaType: String): (Int, Int, Long)
  }

  /** Default decoder. The IMAGE branch is REAL: the JDK's built-in
    * `javax.imageio` readers decode PNG / BMP / GIF / JPEG headers to true
    * pixel dimensions with zero external dependencies (in-memory only —
    * the disk cache is disabled so a 1000-executor decode pass never
    * touches local temp storage). The AUDIO branch is REAL for
    * RIFF/WAVE-family containers: `javax.sound.sampled` parses the header
    * (WAV/AIFF/AU ship with the JDK) to frame count and frame rate, giving
    * true duration_ms without decoding samples. A payload neither branch
    * can parse — including this repo's synthetic test corpus — falls back
    * to the deterministic hash-derived envelope, keeping the operator
    * total. VIDEO stays stubbed (the JDK ships no video codec); a real
    * deployment swaps that branch for a media library and nothing else in
    * the plan changes. */
  object StubCodec extends MediaCodec {
    javax.imageio.ImageIO.setUseCache(false)
    override def decode(payload: Array[Byte], mediaType: String): (Int, Int, Long) = {
      val h = java.util.Arrays.hashCode(payload).abs
      mediaType match {
        case "image" =>
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
            catch { case _: java.io.IOException => null }
          if (img != null) (img.getWidth, img.getHeight, 0L)
          else (64 + h % 1024, 64 + (h / 7) % 1024, 0L)
        case "audio" =>
          wavDurationMs(payload) match {
            case Some(ms) => (0, 0, ms)
            case None => (0, 0, 1000L + h % 600000L)
          }
        case "video" => (64 + h % 1920, 64 + (h / 7) % 1080, 1000L + h % 3600000L)
        case _ => (0, 0, 0L)
      }
    }

    /** True duration of a WAV/AIFF/AU payload from its header — frame
      * count / frame rate, no sample decode (header-only, so a 100 TB
      * audio sweep reads a few hundred bytes per object when the source
      * supports range reads). None when the container is unparseable or
      * the header omits either figure. */
    private def wavDurationMs(payload: Array[Byte]): Option[Long] =
      try {
        val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(payload))
        val frames = aff.getFrameLength
        val rate = aff.getFormat.getFrameRate
        if (frames > 0 && rate > 0 && !rate.isNaN)
          Some(math.round(frames.toDouble / rate * 1000d))
        else None
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => None
        case _: java.io.IOException => None
      }
  }

  /** Decode/feature-extract over partition-local batches. One codec per
    * partition, rows streamed — the execution shape that scales: no shuffle,
    * no driver involvement, codec setup amortized across the partition. */
  def extractFeatures(media: Dataset[MediaRecord], codec: MediaCodec = StubCodec): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val (w, h, d) = codec.decode(r.payload, r.media_type)
        md.reset()
        val hash = md.digest(r.payload).map("%02x".format(_)).mkString
        MediaFeatures(r.media_id, r.media_type, r.payload.length.toLong, w, h, d, hash)
      }
    }
  }

  /** A resized media row: payload transformed to the target dimensions. */
  final case class ResizedMedia(media_id: Long, width: Int, height: Int, payload: Array[Byte])

  /** Resize over partition-local batches — same mapPartitions shape as
    * [[extractFeatures]] (no shuffle, per-partition setup amortized). The
    * pixel transform itself is STUBBED (no image libraries in this
    * container): the output payload is a deterministic byte-stretch of the
    * input sized to the target dims; a real deployment swaps the body for
    * an image library call and nothing else changes. */
  def resizeImages(media: Dataset[MediaRecord], width: Int, height: Int): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    val targetBytes = math.min(math.max(1, width * height / 64), 1 << 16)
    media.mapPartitions(_.map { r =>
      val src = if (r.payload.isEmpty) Array[Byte](0) else r.payload
      val out = Array.tabulate[Byte](targetBytes)(i => (src((i * 31) % src.length) ^ (i & 0x7f)).toByte)
      ResizedMedia(r.media_id, width, height, out)
    })
  }

  /** Frame sampling: every `stride`-th chunk of a video payload as its own
    * row (the explode-shaped step of a frame pipeline). Chunking stands in
    * for real frame boundaries; the plan shape (generator + no shuffle) is
    * the real thing. */
  def sampleFrames(media: DataFrame, chunkBytes: Int, stride: Int): DataFrame =
    media
      .withColumn("n_chunks", (octet_length(col("payload")) / chunkBytes).cast("int") + 1)
      .withColumn("frame_no", explode(sequence(lit(0), col("n_chunks") - 1, lit(stride))))
      .withColumn("frame", substring(col("payload"), col("frame_no") * chunkBytes + 1, lit(chunkBytes)))
      .drop("n_chunks")
}
