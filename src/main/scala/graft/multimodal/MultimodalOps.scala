package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed row shapes for the multimodal pipeline. The payload is an
  * opaque binary column; metadata travels alongside as ordinary typed
  * columns — the same "attributes next to the measure" shape the
  * reference uses for datapoint annotations (client/boostsession.go:94-184),
  * generalized from float64 metrics to arbitrary media blobs.
  */
case class MediaRow(media_id: Long, format: String, payload: Array[Byte])

case class MediaFeatures(
    media_id: Long,
    format: String,
    n_bytes: Int,
    width: Int,
    height: Int,
    n_frames: Int,
    features: Array[Float])

/** Parsed audio header metadata (all long-typed for oracle parity).
  * `real_decode` records whether the JVM audio parser recognized the
  * payload (WAV/AIFF/AU PCM) or the deterministic stub filled in. */
case class AudioMeta(
    media_id: Long,
    n_bytes: Long,
    sample_rate: Long,
    channels: Long,
    bits: Long,
    n_frames: Long,
    duration_ms: Long,
    real_decode: Boolean)

/** Multimodal-column operators: decode / feature-extract / resize /
  * frame-sample over opaque `binary` payload columns.
  *
  * The Spark-side plumbing is real and load-bearing: schema, typed
  * Datasets, per-partition batched processing (the JVM analogue of
  * `mapInPandas` — one decoder instantiation per partition, rows
  * streamed through it), and partition sizing guidance. Image
  * dimension decode is REAL for the formats the JDK ships readers for
  * (PNG/BMP/GIF/JPEG via [[ImageCodec]]/javax.imageio); payloads those
  * readers don't recognize — audio, video, the synthetic testdata —
  * fall back to [[StubCodec]], a deterministic fake that derives
  * pseudo-dimensions and features from the payload bytes (no
  * audio/video libraries exist in this environment). Swap in a heavier
  * decoder (javacv, twelvemonkeys, ffmpeg bindings) without touching
  * any of the Spark plumbing.
  *
  * Scale design: payloads dominate row size, so feature extraction is a
  * narrow map (no shuffle); keep `spark.sql.files.maxPartitionBytes`
  * at/below 128 MB so a partition of blobs fits executor memory, and
  * never collect payloads to the driver.
  */
object MultimodalOps {

  /** Real image decode via `javax.imageio` — the PNG/BMP/GIF/JPEG
    * readers that ship with the JDK, so no external media library is
    * needed for actual image dimensions. Reads only the header
    * metadata (`getWidth`/`getHeight` on the reader, not a full
    * `BufferedImage` decode), so per-payload cost is O(header), not
    * O(pixels). Payloads no ImageIO reader recognizes (the synthetic
    * testdata, audio, video) fall back to the deterministic
    * [[StubCodec]] — the declared stub boundary for codecs this
    * environment genuinely lacks.
    */
  object ImageCodec {
    def decodeDims(payload: Array[Byte]): (Int, Int, Int) = {
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (readers.hasNext) {
            val r = readers.next()
            try {
              r.setInput(iis)
              // GIF readers report frame count; single-image formats -> 1
              val frames = try math.max(r.getNumImages(true), 1)
                catch { case _: Exception => 1 }
              (r.getWidth(0), r.getHeight(0), frames)
            } finally r.dispose()
          } else StubCodec.decodeDims(payload)
        } finally if (iis != null) iis.close()
      } catch { case _: Exception => StubCodec.decodeDims(payload) }
    }
  }

  /** Real audio header decode via `javax.sound.sampled` — the WAV/AIFF/
    * AU parsers that ship with the JDK, so PCM audio metadata needs no
    * external codec (this closes the audio half of the former stub;
    * compressed formats — mp3/aac/ogg — still fall back to
    * [[StubCodec]], the declared boundary for codecs this environment
    * genuinely lacks). Header-only: `getAudioFileFormat` reads the RIFF/
    * chunk header, never the sample data — O(header) per payload.
    */
  object AudioCodec {
    /** (sampleRate, channels, bitsPerSample, frameLength), or None when
      * no JVM audio reader recognizes the payload. */
    def decodeMeta(payload: Array[Byte]): Option[(Int, Int, Int, Long)] =
      try {
        val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(payload))
        val f = aff.getFormat
        Some((math.round(f.getSampleRate), f.getChannels,
          f.getSampleSizeInBits, aff.getFrameLength.toLong))
      } catch { case _: Exception => None }

    /** Build a real PCM WAV payload (RIFF header + silent 16-bit
      * samples) through the same `javax.sound.sampled` writer — the
      * ingest-side twin of [[decodeMeta]], used to exercise the decode
      * path end to end without external media files. */
    def syntheticWav(sampleRate: Int, channels: Int, nFrames: Int): Array[Byte] = {
      import javax.sound.sampled._
      val fmt = new AudioFormat(sampleRate.toFloat, 16, channels, true, false)
      val raw = new Array[Byte](nFrames * fmt.getFrameSize)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, nFrames.toLong)
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
  }

  /** STUB codec — deterministic fake standing in for a real media
    * decoder. Every value is a pure function of the payload bytes.
    */
  object StubCodec {
    /** "Decode" pseudo-dimensions from the payload. A real impl returns
      * the actual pixel dims / duration. */
    def decodeDims(payload: Array[Byte]): (Int, Int, Int) = {
      val n = payload.length
      val h0 = if (n > 0) (payload(0) & 0xFF) else 0
      val h1 = if (n > 1) (payload(1) & 0xFF) else 0
      (64 + (h0 % 16) * 64, 64 + (h1 % 9) * 64, 1 + n % 16)
    }

    /** "Extract" an 8-dim feature vector: per-stripe byte means — a
      * real impl would run a vision/audio embedding model. */
    def features(payload: Array[Byte], dim: Int = 8): Array[Float] = {
      val out = new Array[Float](dim)
      if (payload.isEmpty) return out
      val counts = new Array[Int](dim)
      var i = 0
      while (i < payload.length) {
        val s = (i * dim) / payload.length
        out(s) += (payload(i) & 0xFF)
        counts(s) += 1
        i += 1
      }
      var s = 0
      while (s < dim) { if (counts(s) > 0) out(s) /= counts(s); s += 1 }
      out
    }
  }

  /** Wrap a DataFrame's string/binary column as a MediaRow dataset —
    * the ingest boundary where media becomes an opaque payload. */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String,
      format: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"),
        lit(format).as("format"),
        col(payloadCol).cast("binary").as("payload"))
      .as[MediaRow]
  }

  /** Decode + feature-extract, batched per partition: the decoder is
    * instantiated once per partition and rows stream through it —
    * mirroring `mapInPandas` batch shape on the JVM. Narrow (no
    * shuffle); output drops the payload so downstream stages are small.
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 8): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder setup would happen here (heavier codecs);
      // ImageIO readers are instantiated per payload by format sniffing
      rows.map { r =>
        val (w, h, frames) = ImageCodec.decodeDims(r.payload)
        MediaFeatures(r.media_id, r.format, r.payload.length, w, h, frames,
          StubCodec.features(r.payload, dim))
      }
    }
  }

  /** Audio metadata pass, batched per partition like [[extractFeatures]]:
    * real header parse for WAV/AIFF/AU ([[AudioCodec]]); unrecognized
    * payloads take deterministic stub pseudo-metadata with
    * `real_decode = false` so downstream can tell them apart. Narrow,
    * payload dropped on output.
    */
  def extractAudioMeta(media: Dataset[MediaRow]): Dataset[AudioMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        AudioCodec.decodeMeta(r.payload) match {
          case Some((rate, ch, bits, frames)) =>
            AudioMeta(r.media_id, r.payload.length.toLong, rate.toLong,
              ch.toLong, bits.toLong, frames,
              math.floor(frames * 1000.0 / rate).toLong, real_decode = true)
          case None =>
            val (w, h, f) = StubCodec.decodeDims(r.payload)
            AudioMeta(r.media_id, r.payload.length.toLong, 8000L, 1L, 16L,
              (w.toLong * h) % 65536L, f.toLong, real_decode = false)
        }
      }
    }
  }

  /** Frame-sampling plan for video-like payloads: every `stride`-th
    * frame index up to `n_frames` — pure column arithmetic over the
    * decoded metadata (the real frame decode happens in the codec).
    */
  def sampleFrames(features: Dataset[MediaFeatures], stride: Int): DataFrame =
    features.toDF().select(col("media_id"), col("n_frames"),
      sequence(lit(0), col("n_frames") - 1, lit(stride)).as("frame_ids"))

  /** Resize pass: decode → scale to (targetW, targetH) → re-encode.
    * STUB codec: the "resized payload" is a deterministic byte
    * downsample (every ceil(len/target)-th byte) — a real impl swaps in
    * an image scaler. Plumbing (narrow map, payload in/payload out,
    * metadata updated alongside) is the production shape.
    */
  def resize(media: Dataset[MediaRow], targetW: Int, targetH: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    val targetBytes = math.max(targetW * targetH / 1024, 16)
    media.mapPartitions { rows =>
      rows.map { r =>
        val n = r.payload.length
        val out =
          if (n <= targetBytes) r.payload
          else Array.tabulate(targetBytes)(i => r.payload((i.toLong * n / targetBytes).toInt))
        MediaRow(r.media_id, r.format, out)
      }
    }
  }
}
