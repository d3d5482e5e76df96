package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.tables.Tables

/** The multimodal plumbing is real (schema, typed Dataset, partition-
  * batched processing), and image dimension decode is real for JDK-
  * readable formats (ImageCodec/javax.imageio); non-image payloads use
  * the deterministic stub. These tests pin the plumbing — schema shape,
  * determinism, payload-drop, frame sampling — and the real decode.
  */
class MultimodalSpec extends SparkSpec {

  private lazy val media = MultimodalOps.asMedia(
    Tables.documents(spark, sfDir), "doc_id", "text", "txt")

  private def encode(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, bos)
    bos.toByteArray
  }

  test("real PNG/BMP payloads decode actual dimensions via ImageIO") {
    val img = new java.awt.image.BufferedImage(
      37, 21, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(5, 5, 0xFF8800)
    val png = encode(img, "png")
    assert(MultimodalOps.ImageCodec.decodeDims(png) == ((37, 21, 1)))
    assert(MultimodalOps.ImageCodec.decodeDims(encode(img, "bmp")) == ((37, 21, 1)))
    // and through the Spark plumbing end to end
    val session = spark
    import session.implicits._
    val ds = Seq(MediaRow(1L, "png", png)).toDS()
    val f = MultimodalOps.extractFeatures(ds).collect().head
    assert(f.width == 37 && f.height == 21 && f.n_frames == 1)
    // non-image payloads fall back to the deterministic stub
    val junk = "definitely not an image".getBytes("UTF-8")
    assert(MultimodalOps.ImageCodec.decodeDims(junk) ==
      MultimodalOps.StubCodec.decodeDims(junk))
  }

  test("real WAV payloads round-trip header metadata via javax.sound.sampled") {
    // construct a genuine PCM WAV and parse it back: every header field
    // must survive (this is the audio half of the former stub, now real)
    val wav = MultimodalOps.AudioCodec.syntheticWav(
      sampleRate = 16000, channels = 2, nFrames = 480)
    assert(wav.length > 44, "RIFF header + samples")
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    assert(MultimodalOps.AudioCodec.decodeMeta(wav) ==
      Some((16000, 2, 16, 480L)))
    // and through the Spark plumbing end to end
    val session = spark
    import session.implicits._
    val ds = Seq(
      MediaRow(1L, "wav", wav),
      MediaRow(2L, "mp3", "not audio at all".getBytes("UTF-8"))).toDS()
    val metas = MultimodalOps.extractAudioMeta(ds)
      .collect().sortBy(_.media_id)
    assert(metas(0).real_decode &&
      metas(0).sample_rate == 16000 && metas(0).channels == 2 &&
      metas(0).bits == 16 && metas(0).n_frames == 480 &&
      metas(0).duration_ms == 30)
    // unrecognized payloads take the deterministic stub, flagged as such
    assert(!metas(1).real_decode)
    assert(MultimodalOps.extractAudioMeta(ds).collect().sortBy(_.media_id)
      .toSeq == metas.toSeq, "stub + real decode are deterministic")
  }

  test("real MP4 payloads round-trip container metadata via box parse") {
    // construct a genuine ISO-BMFF container and walk it back: movie
    // timescale/duration, video-track dims (16.16 fixed) and the stts
    // sample count must all survive
    val mp4 = MultimodalOps.VideoCodec.syntheticMp4(
      timescale = 90000L, durationTicks = 90000L * 4, width = 1280,
      height = 720, nFrames = 96, frameDelta = 3750L)
    assert(new String(mp4.slice(4, 8), "US-ASCII") == "ftyp")
    assert(MultimodalOps.VideoCodec.decodeMeta(mp4) ==
      Some((90000L, 360000L, 1280L, 720L, 96L)))
    // truncated/corrupted payloads are rejected, not mis-parsed
    assert(MultimodalOps.VideoCodec.decodeMeta(mp4.take(40)) == None)
    assert(MultimodalOps.VideoCodec.decodeMeta(
      "mdat garbage not a container".getBytes("UTF-8")) == None)
    // and through the Spark plumbing end to end
    val session = spark
    import session.implicits._
    val ds = Seq(
      MediaRow(1L, "mp4", mp4),
      MediaRow(2L, "avi", "not video at all".getBytes("UTF-8"))).toDS()
    val metas = MultimodalOps.extractVideoMeta(ds)
      .collect().sortBy(_.media_id)
    assert(metas(0).real_decode &&
      metas(0).timescale == 90000L && metas(0).duration_ms == 4000L &&
      metas(0).width == 1280L && metas(0).height == 720L &&
      metas(0).n_frames == 96L)
    assert(!metas(1).real_decode)
    assert(MultimodalOps.extractVideoMeta(ds).collect().sortBy(_.media_id)
      .toSeq == metas.toSeq, "stub + real decode are deterministic")
  }

  test("asMedia produces the opaque-payload schema") {
    val sch = media.schema
    assert(sch.fieldNames.toSeq == Seq("media_id", "format", "payload"))
    assert(sch("payload").dataType.typeName == "binary")
  }

  test("extractFeatures is deterministic, drops payloads, keeps ids") {
    val f1 = MultimodalOps.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = MultimodalOps.extractFeatures(media).collect().sortBy(_.media_id)
    assert(f1.map(_.media_id).toSeq == f2.map(_.media_id).toSeq)
    assert(f1.zip(f2).forall { case (a, b) => a.features.sameElements(b.features) })
    assert(f1.forall(_.features.length == 8))
    assert(f1.forall(r => r.width >= 64 && r.height >= 64 && r.n_frames >= 1))
    assert(f1.length == media.count())
  }

  test("feature vectors feed the similarity tier (cosine over features)") {
    import graft.functions.GraftFunctions
    val feats = MultimodalOps.extractFeatures(media).toDF()
      .select(col("media_id"), col("features"))
    val self = feats.select(
      GraftFunctions.cosine(col("features"), col("features")).as("c"))
      .agg(min("c"), max("c")).head()
    assert(self.getDouble(0) > 0.999 && self.getDouble(1) <= 1.0 + 1e-9)
  }

  test("resize bounds payloads and is deterministic") {
    // the fixture payloads are not images: they take the stub byte
    // downsample, which must bound and reproduce exactly
    val small = MultimodalOps.resize(media, 128, 128).collect()
    assert(small.forall(_.payload.length <= math.max(128 * 128 / 1024, 16)))
    val again = MultimodalOps.resize(media, 128, 128).collect()
    assert(small.sortBy(_.media_id).zip(again.sortBy(_.media_id))
      .forall { case (a, b) => a.payload.sameElements(b.payload) })
  }

  test("real PNG payloads resize through actual pixels") {
    val session = spark
    import session.implicits._
    val png = MultimodalOps.ImageCodec.syntheticPng(40, 30, seed = 7L)
    val ds = Seq(
      MediaRow(1L, "png", png),
      MediaRow(2L, "txt", "not an image".getBytes("UTF-8"))).toDS()
    val out = MultimodalOps.resize(ds, 20, 15).collect().sortBy(_.media_id)
    // the PNG went through decode -> scale -> re-encode: the output is
    // itself a valid PNG with exactly the target dimensions
    assert(out(0).format == "png")
    assert(MultimodalOps.ImageCodec.decodeDims(out(0).payload) == ((20, 15, 1)))
    assert(new String(out(0).payload.slice(1, 4), "US-ASCII") == "PNG")
    // non-images keep the stub downsample and their original format tag
    assert(out(1).format == "txt")
    assert(out(1).payload.length <= math.max(20 * 15 / 1024, 16))
    // deterministic: same input -> byte-identical resized PNG
    val again = MultimodalOps.resize(ds, 20, 15).collect().sortBy(_.media_id)
    assert(out(0).payload.sameElements(again(0).payload))
  }

  test("sampleFrames yields stride-spaced frame ids within bounds") {
    val feats = MultimodalOps.extractFeatures(media)
    val sampled = MultimodalOps.sampleFrames(feats, stride = 4).collect()
    sampled.foreach { r =>
      val n = r.getInt(1)
      val ids = r.getSeq[Int](2)
      assert(ids.head == 0 && ids.forall(i => i >= 0 && i < n))
      assert(ids.sliding(2).forall(w => w.length < 2 || w(1) - w(0) == 4))
    }
  }
}
