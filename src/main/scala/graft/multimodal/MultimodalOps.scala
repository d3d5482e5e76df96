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

/** Parsed video container metadata (long-typed for oracle parity).
  * `real_decode` records whether the pure-JVM ISO-BMFF box parse
  * recognized the payload or the deterministic stub filled in. */
case class VideoMeta(
    media_id: Long,
    n_bytes: Long,
    timescale: Long,
    duration_ms: Long,
    width: Long,
    height: Long,
    n_frames: Long,
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

  /** Every ImageIO call here reads/writes in-memory byte arrays, but
    * ImageIO's default stream cache is DISK-backed: each read/write
    * creates and deletes a temp file, which serializes parallel codec
    * tasks on the filesystem (and is pure overhead even single-
    * threaded). Memory-cached streams are the right setting for
    * byte-array payloads of bounded size — set once, process-wide,
    * on first touch of this object.
    */
  javax.imageio.ImageIO.setUseCache(false)

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
    /** Real pixel resize: ImageIO decode → bilinear scale → PNG encode.
      * None when no JDK reader recognizes the payload (the stub
      * boundary). Unlike [[decodeDims]] this reads the pixels — use on
      * the resize path only, where full decode is the point.
      */
    def resizePng(payload: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
      try {
        import java.awt.image.BufferedImage
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        if (img == null) None
        else {
          val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try {
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, w, h, null)
          } finally g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          Some(bos.toByteArray)
        }
      } catch { case _: Exception => None }

    /** Build a real PNG with deterministic pixel content — the
      * ingest-side twin of [[resizePng]]/[[decodeDims]] for exercising
      * the decode/resize paths without external media files. */
    def syntheticPng(w: Int, h: Int, seed: Long): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y,
            (((x * 31 + y * 17 + seed) * 2654435761L) & 0xFFFFFF).toInt)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

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
        // javax.sound reports AudioSystem.NOT_SPECIFIED (-1) when the
        // header carries no frame count; estimate from the payload size
        // (an upper bound including the header — close for WAV's 44-byte
        // header) rather than emitting a negative count/duration
        val frames: Long =
          if (aff.getFrameLength >= 0) aff.getFrameLength.toLong
          else if (f.getFrameSize > 0) payload.length.toLong / f.getFrameSize
          else 0L
        Some((math.round(f.getSampleRate), f.getChannels,
          f.getSampleSizeInBits, frames))
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

  /** Real MP4/ISO-BMFF container metadata via a pure-JVM box parse —
    * no codec needed: the moov/mvhd/trak/tkhd/stts boxes are plain
    * big-endian structures (ISO/IEC 14496-12), so movie timescale,
    * duration, video track dimensions and sample count all come from a
    * header walk. O(header): only box headers and the few fixed-size
    * leaf boxes are touched, sample DATA (mdat) is never read. Frame
    * PIXEL decode would need a real codec and remains the declared
    * stub boundary; the container metadata here is a genuine parse.
    */
  object VideoCodec {
    private def u32(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
        ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)
    private def typ(b: Array[Byte], o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** Top-level walk: find the first child box named `name` inside
      * [from, until) and return (bodyStart, bodyEnd), honoring 64-bit
      * largesize boxes. */
    private def findBox(b: Array[Byte], from: Int, until: Int,
        name: String): Option[(Int, Int)] = {
      var o = from
      while (o + 8 <= until) {
        val size0 = u32(b, o)
        val t = typ(b, o + 4)
        val (hdr, size) =
          if (size0 == 1 && o + 16 <= until)
            (16L, (u32(b, o + 8) << 32) | u32(b, o + 12))
          else (8L, if (size0 == 0) (until - o).toLong else size0)
        if (size < hdr || o + size > until) return None
        if (t == name) return Some(((o + hdr).toInt, (o + size).toInt))
        o += size.toInt
      }
      None
    }

    /** (timescale, durationTicks, width, height, nFrames) of the first
      * `vide`-handler track, or None when the payload isn't ISO-BMFF. */
    def decodeMeta(b: Array[Byte]): Option[(Long, Long, Long, Long, Long)] = {
      try {
        if (b.length < 16 || typ(b, 4) != "ftyp") return None
        val (mvS, mvE) = findBox(b, 0, b.length, "moov").getOrElse(return None)
        val (mhS, _) = findBox(b, mvS, mvE, "mvhd").getOrElse(return None)
        val v = b(mhS) & 0xFF
        val (timescale, duration) =
          if (v == 1) (u32(b, mhS + 20), (u32(b, mhS + 24) << 32) | u32(b, mhS + 28))
          else (u32(b, mhS + 12), u32(b, mhS + 16))
        // walk sibling trak boxes; pick the first whose hdlr is 'vide'
        var o = mvS
        while (o < mvE) {
          findBox(b, o, mvE, "trak") match {
            case None => o = mvE
            case Some((tkS, tkE)) =>
              val isVideo = (for {
                (mdS, mdE) <- findBox(b, tkS, tkE, "mdia")
                (hdS, _) <- findBox(b, mdS, mdE, "hdlr")
              } yield typ(b, hdS + 8) == "vide").getOrElse(false)
              if (isVideo) {
                val (thS, _) = findBox(b, tkS, tkE, "tkhd").getOrElse(return None)
                val tv = b(thS) & 0xFF
                val dimOff = thS + (if (tv == 1) 88 else 76)
                val width = u32(b, dimOff) >> 16     // 16.16 fixed point
                val height = u32(b, dimOff + 4) >> 16
                val nFrames = (for {
                  (mdS, mdE) <- findBox(b, tkS, tkE, "mdia")
                  (miS, miE) <- findBox(b, mdS, mdE, "minf")
                  (sbS, sbE) <- findBox(b, miS, miE, "stbl")
                  (stS, _) <- findBox(b, sbS, sbE, "stts")
                } yield {
                  val entries = u32(b, stS + 4).toInt
                  (0 until entries).map(i => u32(b, stS + 8 + i * 8)).sum
                }).getOrElse(0L)
                return Some((timescale, duration, width, height, nFrames))
              }
              o = tkE
          }
        }
        None
      } catch { case _: Exception => None }
    }

    /** Build a minimal valid MP4 (ftyp + moov/mvhd + one video trak
      * with tkhd dims and an stts sample table) — the ingest-side twin
      * of [[decodeMeta]], exercising the parse end to end without
      * external media files. */
    def syntheticMp4(timescale: Long, durationTicks: Long, width: Int,
        height: Int, nFrames: Long, frameDelta: Long): Array[Byte] = {
      def be32(v: Long): Array[Byte] = Array(
        ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
        ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
      def box(t: String, parts: Array[Byte]*): Array[Byte] = {
        val body = parts.flatten.toArray
        be32(8L + body.length) ++ t.getBytes("US-ASCII") ++ body
      }
      val z4 = new Array[Byte](4)
      val matrix = // identity in 16.16 / 2.30
        be32(0x00010000L) ++ z4 ++ z4 ++ z4 ++ be32(0x00010000L) ++ z4 ++
          z4 ++ z4 ++ be32(0x40000000L)
      val mvhd = box("mvhd", z4, z4, z4, be32(timescale), be32(durationTicks),
        be32(0x00010000L), Array[Byte](0x01, 0x00, 0, 0), new Array[Byte](8),
        matrix, new Array[Byte](24), be32(2L))
      val tkhd = box("tkhd", Array[Byte](0, 0, 0, 3), z4, z4, be32(1L), z4,
        be32(durationTicks), new Array[Byte](8), new Array[Byte](8),
        matrix, be32(width.toLong << 16), be32(height.toLong << 16))
      val mdhd = box("mdhd", z4, z4, z4, be32(timescale), be32(durationTicks),
        Array[Byte](0x55, (0xC4 & 0xFF).toByte, 0, 0))
      val hdlr = box("hdlr", z4, z4, "vide".getBytes("US-ASCII"),
        new Array[Byte](12), Array[Byte](0))
      val stts = box("stts", z4, be32(1L), be32(nFrames), be32(frameDelta))
      val stbl = box("stbl", stts)
      val minf = box("minf", stbl)
      val mdia = box("mdia", mdhd, hdlr, minf)
      val trak = box("trak", tkhd, mdia)
      val moov = box("moov", mvhd, trak)
      val ftyp = box("ftyp", "isom".getBytes("US-ASCII"), be32(512L),
        "isomiso2".getBytes("US-ASCII"))
      ftyp ++ moov
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

  /** Video container metadata pass, batched per partition like
    * [[extractFeatures]]: real ISO-BMFF box parse for MP4-family
    * payloads ([[VideoCodec]]); unrecognized payloads take
    * deterministic stub pseudo-metadata with `real_decode = false`.
    * Narrow, payload dropped on output.
    */
  def extractVideoMeta(media: Dataset[MediaRow]): Dataset[VideoMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        VideoCodec.decodeMeta(r.payload) match {
          case Some((timescale, duration, w, h, frames)) =>
            VideoMeta(r.media_id, r.payload.length.toLong, timescale,
              math.floor(duration * 1000.0 / timescale).toLong,
              w, h, frames, real_decode = true)
          case None =>
            val (w, h, f) = StubCodec.decodeDims(r.payload)
            VideoMeta(r.media_id, r.payload.length.toLong, 600L,
              (w.toLong * h) % 65536L, w.toLong, h.toLong, f.toLong,
              real_decode = false)
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
    * REAL for the formats the JDK decodes (PNG/BMP/GIF/JPEG):
    * full-pixel `ImageIO` decode, bilinear `Graphics2D` scale, PNG
    * re-encode — no external media library. Payloads no reader
    * recognizes keep the deterministic stub byte-downsample (the
    * declared boundary). Plumbing is the production shape either way:
    * narrow map, payload in / payload out, one decoder pass per row.
    */
  def resize(media: Dataset[MediaRow], targetW: Int, targetH: Int): Dataset[MediaRow] = {
    require(targetW > 0 && targetH > 0, "target dims must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    val targetBytes = math.max(targetW * targetH / 1024, 16)
    media.mapPartitions { rows =>
      rows.map { r =>
        val real = ImageCodec.resizePng(r.payload, targetW, targetH)
        val out = real.getOrElse {
          val n = r.payload.length
          if (n <= targetBytes) r.payload
          else Array.tabulate(targetBytes)(i =>
            r.payload((i.toLong * n / targetBytes).toInt))
        }
        MediaRow(r.media_id, if (real.isDefined) "png" else r.format, out)
      }
    }
  }
}
