package graft

import java.nio.file.Files

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaBlob

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("binaryFile ingest: id, kind, bytes, content schema") {
    val dir = Files.createTempDirectory("graft_media")
    Files.write(dir.resolve("a.png"), Array[Byte](1, 2, 3, 4))
    Files.write(dir.resolve("b.mp4"), Array[Byte](9, 8, 7, 6, 5))
    val df = Multimodal.fromBinaryFiles(spark, dir.toString)
    assert(df.columns.toSeq == Seq("media_id", "kind", "n_bytes", "content"))
    val kinds = df.select("kind").collect().map(_.getString(0)).sorted
    assert(kinds.toSeq == Seq("mp4", "png"))
  }

  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("real image decode: exact PNG dimensions via ImageIO header read") {
    val blobs = Seq(
      MediaBlob(1L, "png", pngBytes(123, 45)),
      MediaBlob(2L, "PNG", pngBytes(320, 200))).toDS() // kind is case-blind
    val meta = Multimodal.decodeMeta(blobs).collect().sortBy(_.media_id)
    assert(meta(0).width == 123 && meta(0).height == 45 && meta(0).n_frames == 1)
    assert(meta(1).width == 320 && meta(1).height == 200)
  }

  test("real audio decode: WAV sample rate, channels, frames via javax.sound header read") {
    import javax.sound.sampled._
    // 8000 Hz mono 16-bit PCM, 1234 sample frames of silence
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val raw = new Array[Byte](1234 * 2)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, 1234L)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    val meta = Multimodal.MediaBatch.decode(
      Multimodal.MediaBlob(5L, "wav", bos.toByteArray))
    assert(meta.width == 8000)   // sample rate
    assert(meta.height == 1)     // channels
    assert(meta.n_frames == 1234)
  }

  test("corrupt image bytes fall back to the deterministic stub") {
    val junk = Array[Byte](1, 2, 3, 4) // not a PNG
    val meta = Multimodal.decodeMeta(Seq(MediaBlob(9L, "png", junk)).toDS()).collect().head
    assert(meta == Multimodal.MediaBatch.decodeStub(MediaBlob(9L, "png", junk)))
  }

  test("stubbed decode is deterministic and batch-shaped") {
    val blobs = Seq(
      MediaBlob(1L, "png", Array[Byte](1, 2, 3)),
      MediaBlob(2L, "mp4", Array.fill[Byte](100)(7))).toDS()
    val meta1 = Multimodal.decodeMeta(blobs, batchSize = 1).collect().sortBy(_.media_id)
    val meta2 = Multimodal.decodeMeta(blobs, batchSize = 64).collect().sortBy(_.media_id)
    assert(meta1.toSeq == meta2.toSeq) // batch size must not change results
    assert(meta1.forall(m => m.width >= 16 && m.height >= 16))
    assert(meta1.find(_.media_id == 2L).get.n_frames >= 1)
  }

  test("feature extraction emits fixed-dim vectors, deterministic") {
    val blobs = Seq(MediaBlob(1L, "mp4", Array.tabulate[Byte](32)(_.toByte))).toDS()
    val f1 = Multimodal.extractFeatures(blobs, dim = 8).collect().head
    val f2 = Multimodal.extractFeatures(blobs, dim = 8).collect().head
    assert(f1.features.length == 8)
    assert(f1.features.toSeq == f2.features.toSeq)
  }

  test("real image features: luminance histogram from actual pixels") {
    // all-black image -> all mass in bin 0; histogram sums to 1
    val black = MediaBlob(1L, "png", pngBytes(10, 10))
    val f = Multimodal.MediaBatch.features(black, dim = 8)
    assert(f.features(0) == 1.0f && f.features.drop(1).forall(_ == 0.0f))
    // a white image lands in the top bin
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics(); g.setColor(java.awt.Color.WHITE)
    g.fillRect(0, 0, 4, 4); g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val fw = Multimodal.MediaBatch.features(MediaBlob(2L, "png", bos.toByteArray), dim = 8)
    assert(fw.features(7) == 1.0f)
  }

  test("real image resize: fit-inside, aspect preserved, re-decodable PNG") {
    val blobs = Seq(
      MediaBlob(1L, "png", pngBytes(200, 100)),
      MediaBlob(2L, "png", pngBytes(30, 20)),      // already fits: untouched
      MediaBlob(3L, "mp4", Array[Byte](1, 2, 3))). // non-image: passthrough
      toDS()
    val out = Multimodal.resizeBlobs(blobs, maxW = 50, maxH = 50)
      .collect().sortBy(_.media_id)
    val dims1 = Multimodal.MediaBatch.imageDimensions(out(0).content)
    assert(dims1.contains((50, 25))) // 200x100 -> fit 50x50 = 50x25
    assert(out(1).content.toSeq == pngBytes(30, 20).toSeq) // bytes unchanged
    assert(out(2).kind == "mp4" && out(2).content.length == 3)
  }

  test("resize stub preserves aspect ratio with fit-inside policy") {
    val blobs = Seq(MediaBlob(1L, "png", Array.tabulate[Byte](64)(_.toByte))).toDS()
    val meta = Multimodal.decodeMeta(blobs)
    val orig = meta.collect().head
    val resized = Multimodal.resizeStub(meta, maxW = 100, maxH = 100).collect().head
    assert(resized.width <= 100 && resized.height <= 100)
    val origRatio = orig.width.toDouble / orig.height
    val newRatio = resized.width.toDouble / resized.height
    assert(math.abs(origRatio - newRatio) / origRatio < 0.05)
    // never upscales
    assert(resized.width <= orig.width && resized.height <= orig.height)
  }

  test("frame sampling explodes every-k frame rows") {
    val blobs = Seq(MediaBlob(5L, "mp4", Array.fill[Byte](10)(3))).toDS()
    val meta = Multimodal.decodeMeta(blobs)
    val frames = Multimodal.sampleFrameIndexes(meta, everyK = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(frames.nonEmpty && frames.forall(_._1 == 5L))
    assert(frames.map(_._2).forall(_ % 10 == 0))
  }
}
