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

  // ==== synthesized container fixtures for the MediaHeaders parsers ====

  private def mp4Box(typ: String, body: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(body.length + 8)
    bb.putInt(body.length + 8).put(typ.getBytes("ISO-8859-1")).put(body)
    bb.array()
  }

  test("mp4 header decode: tkhd dimensions + stsz frame count") {
    // tkhd v0: 84-byte body, 16.16 fixed-point width/height at 76/80
    val tkhd = java.nio.ByteBuffer.allocate(84)
      .putInt(76, 640 << 16).putInt(80, 360 << 16).array()
    val stsz = java.nio.ByteBuffer.allocate(12)
      .putInt(4, 0).putInt(8, 120).array() // variable sizes, 120 samples
    val trak = mp4Box("trak", mp4Box("tkhd", tkhd) ++
      mp4Box("mdia", mp4Box("minf", mp4Box("stbl", mp4Box("stsz", stsz)))))
    val bytes = mp4Box("ftyp", "isomiso2".getBytes) ++ mp4Box("moov", trak)
    val meta = Multimodal.MediaBatch.decode(MediaBlob(11L, "mp4", bytes))
    assert(meta.width == 640 && meta.height == 360 && meta.n_frames == 120)
  }

  private def ebmlEl(id: Long, body: Array[Byte]): Array[Byte] = {
    // id bytes as-stored (marker included); size as a 1-byte vint
    val idBytes = BigInt(id).toByteArray.dropWhile(_ == 0)
    require(body.length < 127)
    idBytes ++ Array((0x80 | body.length).toByte) ++ body
  }
  private def ebmlUint(id: Long, v: Long): Array[Byte] = {
    val b = BigInt(v).toByteArray.dropWhile(_ == 0)
    ebmlEl(id, if (b.isEmpty) Array(0.toByte) else b)
  }

  test("matroska header decode: pixel dims + duration/defaultDuration frames") {
    val video = ebmlEl(0xE0L,
      ebmlUint(0xB0L, 1280) ++ ebmlUint(0xBAL, 720))
    val trackEntry = ebmlEl(0xAEL,
      ebmlUint(0x23E383L, 40000000L) ++ video) // 40 ms/frame = 25 fps
    val tracks = ebmlEl(0x1654AE6BL, trackEntry)
    val duration = ebmlEl(0x4489L, // float64: 2000 ticks
      java.nio.ByteBuffer.allocate(8).putDouble(2000.0).array())
    val info = ebmlEl(0x1549A966L,
      ebmlUint(0x2AD7B1L, 1000000L) ++ duration) // 1 ms ticks
    val bytes = ebmlEl(0x1A45DFA3L, Array.empty[Byte]) ++
      ebmlEl(0x18538067L, info ++ tracks)
    val meta = Multimodal.MediaBatch.decode(MediaBlob(12L, "mkv", bytes))
    // 2000 ticks × 1e6 ns = 2 s; / 40 ms per frame = 50 frames
    assert(meta.width == 1280 && meta.height == 720 && meta.n_frames == 50)
  }

  test("mp3 header decode: rate/channels from frame header, frames from length") {
    // ID3v2 tag (100-byte body) then 10 CBR frames:
    // 0xFF 0xFB = MPEG1 Layer III; 0x90 = 128 kbps @ 44100; 0x44 = stereo
    val id3 = "ID3".getBytes ++ Array[Byte](3, 0, 0, 0, 0, 0, 100) ++
      new Array[Byte](100)
    val frameLen = 144 * 128000 / 44100 // 417
    val frame = Array(0xFF.toByte, 0xFB.toByte, 0x90.toByte, 0x44.toByte) ++
      new Array[Byte](frameLen - 4)
    val bytes = id3 ++ Array.fill(10)(frame).flatten
    val meta = Multimodal.MediaBatch.decode(MediaBlob(13L, "mp3", bytes))
    assert(meta.width == 44100 && meta.height == 2)
    assert(meta.n_frames == 10 * 1152) // sample frames
  }

  test("ogg opus header decode: id packet channels + last-page granule") {
    def page(headerType: Int, granule: Long, packet: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(28 + packet.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("OggS".getBytes).put(0.toByte).put(headerType.toByte)
        .putLong(granule).putInt(77).putInt(0).putInt(0)
        .put(1.toByte).put(packet.length.toByte).put(packet)
      bb.array()
    }
    val opusHead = "OpusHead".getBytes ++ Array[Byte](1, 2) ++ // v1, 2 ch
      Array[Byte](0x38, 1) ++ // preskip 312 LE
      Array[Byte](0x80.toByte, 0xBB.toByte, 0, 0) ++ // input rate 48000 LE
      Array[Byte](0, 0, 0) // gain + mapping
    val bytes = page(0x02, 0L, opusHead) ++ page(0x04, 96000L, Array[Byte](1))
    val meta = Multimodal.MediaBatch.decode(MediaBlob(14L, "ogg", bytes))
    assert(meta.width == 48000 && meta.height == 2 && meta.n_frames == 96000)
  }

  test("ogg vorbis header decode: id packet rate/channels") {
    def page(headerType: Int, granule: Long, packet: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(28 + packet.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("OggS".getBytes).put(0.toByte).put(headerType.toByte)
        .putLong(granule).putInt(88).putInt(0).putInt(0)
        .put(1.toByte).put(packet.length.toByte).put(packet)
      bb.array()
    }
    // 0x01 'vorbis' version(4) channels(1)=2 rate(4 LE)=22050 …
    val vorbisId = Array[Byte](1) ++ "vorbis".getBytes ++
      Array[Byte](0, 0, 0, 0, 2) ++
      java.nio.ByteBuffer.allocate(4).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(22050).array() ++ new Array[Byte](9)
    val bytes = page(0x02, 0L, vorbisId) ++ page(0x04, 44100L, Array[Byte](1))
    val meta = Multimodal.MediaBatch.decode(MediaBlob(17L, "ogg", bytes))
    assert(meta.width == 22050 && meta.height == 2 && meta.n_frames == 44100)
  }

  test("flac STREAMINFO decode: bit-packed rate/channels/total samples") {
    val packed = (44100L << 44) | (1L << 41) | (15L << 36) | 88200L
    val streaminfo = java.nio.ByteBuffer.allocate(34)
      .putLong(10, packed).array() // blocksize/framesize fields zeroed
    val bytes = "fLaC".getBytes ++
      Array[Byte](0x80.toByte, 0, 0, 34) ++ streaminfo // last-block, type 0
    val meta = Multimodal.MediaBatch.decode(MediaBlob(15L, "flac", bytes))
    assert(meta.width == 44100 && meta.height == 2 && meta.n_frames == 88200)
  }

  test("corrupt video/audio container bytes fall back to the stub") {
    for (kind <- Seq("mp4", "mkv", "mp3", "ogg", "flac")) {
      val junk = Array.tabulate[Byte](64)(i => (i * 7).toByte)
      val meta = Multimodal.MediaBatch.decode(MediaBlob(16L, kind, junk))
      assert(meta == Multimodal.MediaBatch.decodeStub(MediaBlob(16L, kind, junk)),
        s"$kind junk should fall back to the stub")
    }
  }

  /** Horizontal-gradient PNG with an optional per-pixel tweak. */
  private def gradientPng(w: Int, h: Int, invert: Boolean = false,
      tweak: (Int, Int) => Int = (_, _) => 0): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val base = x * 255 / (w - 1)
      val v0 = if (invert) 255 - base else base
      val v = math.max(0, math.min(255, v0 + tweak(x, y)))
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("dHash64: re-encode-identical images hash equal; gradients differ") {
    val a = Multimodal.dHash64(gradientPng(64, 48)).get
    val a2 = Multimodal.dHash64(gradientPng(64, 48)).get
    assert(a == a2, "deterministic")
    // pure horizontal gradient: every left cell < right cell -> all-ones
    assert(a == -1L)
    val inv = Multimodal.dHash64(gradientPng(64, 48, invert = true)).get
    assert(java.lang.Long.bitCount(a ^ inv) == 64, "inverted gradient flips every bit")
    assert(Multimodal.dHash64(Array[Byte](1, 2, 3)).isEmpty, "garbage -> None")
  }

  test("soak media generators: cliques are few-bit near-dups, cross-clique is far") {
    // the SOAK fixture's load-bearing property, pinned here instead of
    // assumed: per-clique patterns give distinct hashes ACROSS cliques
    // (no mega-bucket — a degenerate all-pairs join at soak scale) and
    // few-bit distances WITHIN a clique (pairs actually form)
    val ih = (0L until 30L).map(id => id -> Multimodal.dHash64(Soak.soakPng(id)).get)
    val ah = (0L until 30L).map(id => id -> Multimodal.audioFingerprint64(Soak.soakWav(id)).get)
    for (hs <- Seq(ih, ah)) {
      val within = for {
        (a, ha) <- hs; (b, hb) <- hs
        if a < b && a / 10 == b / 10
      } yield java.lang.Long.bitCount(ha ^ hb)
      val across = for {
        (a, ha) <- hs; (b, hb) <- hs
        if a < b && a / 10 != b / 10
      } yield java.lang.Long.bitCount(ha ^ hb)
      assert(within.max <= 6, s"clique pair drifted to ${within.max} bits")
      assert(within.count(_ <= 3) * 2 >= within.size,
        "most clique pairs must sit within the maxHamming=3 soak radius")
      assert(across.min >= 8, s"cross-clique collision at ${across.min} bits")
    }
  }

  test("aviFrames/videoDHashes: raw-DIB decode, everyK sampling, loud truncation") {
    val dir = graft.sources.MediaFixture.ensureVideoDHash()
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "video_a.avi"))
    val Some((w, h, frames)) = Multimodal.aviFrames(bytes)
    assert(w == 63 && h == 48 && frames.size == 4)
    // frame 0 is flat gray 0 -> dHash 0 (the PNG fixture's derivation)
    assert(Multimodal.frameDHash64(w, h, frames.head) == 0L)
    assert(Multimodal.frameDHash64(w, h, frames(1)) == -1L)
    // truncated container: None, never an exception or a short decode
    for (frac <- Seq(2, 3, 10))
      assert(Multimodal.aviFrames(
        java.util.Arrays.copyOf(bytes, bytes.length / frac)).isEmpty)
    // everyK sampling keeps frame indexes 0, 2
    val blobs = Seq(Multimodal.MediaBlob(7L, "avi", bytes)).toDS()
    val sampled = Multimodal.videoDHashes(blobs, everyK = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(sampled == Set((7L, 0), (7L, 2)))
  }

  test("MJPEG AVI: videoDHashes decodes compressed frames to the pinned constants") {
    val dir = graft.sources.MediaFixture.ensureMjpegDHash()
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "mjpeg_a.avi"))
    // raw-DIB path must NOT claim it; the MJPEG path must
    assert(Multimodal.aviFrames(bytes).isEmpty)
    val grids = Multimodal.aviMjpegDcGrids(bytes)
    assert(grids.isDefined && grids.get.size == 4)
    assert(grids.get.forall { case (wB, hB, g) =>
      wB == 18 && hB == 8 && g.length == 18 * 8 })
    val blobs = Seq(Multimodal.MediaBlob(3L, "avi", bytes)).toDS()
    val hashes = Multimodal.videoDHashes(blobs)
      .collect().map(r => (r.getInt(1), r.getLong(2))).sortBy(_._1)
    assert(hashes.map(_._2).toSeq ==
      Seq(0L, -1L, 0x0808080808080808L, 0L),
      "DC-grid dHash matches the hand derivation through a real codec")
    // truncated MJPEG container: None (frame-count check), not partial
    for (frac <- Seq(2, 3))
      assert(Multimodal.aviMjpegDcGrids(
        java.util.Arrays.copyOf(bytes, bytes.length / frac)).isEmpty)
  }

  test("features: decodable AVI (DIB and MJPEG) gets a REAL luminance histogram") {
    val mjpeg = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      graft.sources.MediaFixture.ensureMjpegDHash(), "mjpeg_a.avi"))
    val dib = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      graft.sources.MediaFixture.ensureVideoDHash(), "video_a.avi"))
    for ((bytes, what) <- Seq((mjpeg, "mjpeg"), (dib, "dib"))) {
      val blob = Multimodal.MediaBlob(1L, "avi", bytes)
      val real = Multimodal.MediaBatch.features(blob)
      val stub = Multimodal.MediaBatch.featuresStub(blob)
      assert(!real.features.sameElements(stub.features),
        s"$what: the stub must be unreachable for a decodable AVI")
      // histogram property the byte-moment stub can't have: sums to ~1
      val sum = real.features.sum
      assert(math.abs(sum - 1.0f) < 1e-3, s"$what: normalized histogram, got $sum")
      // content check: the fixture reels are dark/bright-heavy at the
      // extremes (flat mid-gray + ramps + split), every bin bounded
      assert(real.features.forall(v => v >= 0f && v <= 1f))
    }
    // corrupt avi still falls back to the stub rather than failing
    val corrupt = Multimodal.MediaBlob(2L, "avi", Array[Byte](1, 2, 3, 4))
    val f = Multimodal.MediaBatch.features(corrupt)
    assert(f.features.sameElements(
      Multimodal.MediaBatch.featuresStub(corrupt).features))
  }

  test("avi/aviDibFrames: corrupt u32 chunk sizes terminate, never hang or throw") {
    // chunk sizes are UNTRUSTED u32s: 0xFFFFFFF8 makes the Int-truncated
    // step zero (infinite loop) and ~0x7FFFFFF8 makes it negative
    // (AIOOBE) — the walk must bail like mp4Children's corrupt guard
    def le32(v: Long): Array[Byte] = Array(
      (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def fourcc(s: String) = s.getBytes("ISO-8859-1")
    def riffAvi(payload: Array[Byte]): Array[Byte] =
      fourcc("RIFF") ++ le32(payload.length + 4L) ++ fourcc("AVI ") ++ payload
    for (badSz <- Seq(0xFFFFFFF8L, 0x7FFFFFF8L, 0xFFFFFFFFL)) {
      // corrupt size in the TOP-level chunk walk
      val top = riffAvi(fourcc("JUNK") ++ le32(badSz) ++ Array.fill(32)(0.toByte))
      assert(graft.operators.MediaHeaders.avi(top).isEmpty)
      assert(graft.operators.MediaHeaders.aviDibFrames(top).isEmpty)
      // corrupt size INSIDE LIST hdrl (avi's inner walk)
      val hdrl = riffAvi(fourcc("LIST") ++ le32(64L) ++ fourcc("hdrl") ++
        fourcc("JUNK") ++ le32(badSz) ++ Array.fill(48)(0.toByte))
      assert(graft.operators.MediaHeaders.avi(hdrl).isEmpty)
      // corrupt size INSIDE LIST movi after one VALID frame chunk:
      // the good frame must survive, the walk must stop at the bad one
      val frame = Array.fill(12)(7.toByte)
      val movi = riffAvi(fourcc("LIST") ++ le32(80L) ++ fourcc("movi") ++
        fourcc("00db") ++ le32(frame.length.toLong) ++ frame ++
        fourcc("00db") ++ le32(badSz) ++ Array.fill(40)(0.toByte))
      val got = graft.operators.MediaHeaders.aviDibFrames(movi)
      assert(got.size == 1 && got.head.sameElements(frame))
    }
  }

  test("dHash64: TRUNCATED data of a recognized format is None, not an exception") {
    // a real PNG cut mid-stream: ImageIO recognizes the signature and
    // THROWS from the decoder (it returns null only for unrecognized
    // formats) — the undecodable->None contract must cover this too,
    // or one corrupt blob fails a whole fingerprint job
    val whole = gradientPng(64, 48)
    for (frac <- Seq(2, 3, 8)) {
      val cut = java.util.Arrays.copyOf(whole, whole.length / frac)
      assert(Multimodal.dHash64(cut).isEmpty, s"truncated 1/$frac -> None")
    }
  }

  test("dHash64: small local edits stay within a few bits") {
    val base = Multimodal.dHash64(gradientPng(64, 48)).get
    // brighten one 4x4 patch: at most the cells touching the patch move
    val edited = Multimodal.dHash64(gradientPng(64, 48,
      tweak = (x, y) => if (x >= 30 && x < 34 && y >= 20 && y < 24) 24 else 0)).get
    val d = java.lang.Long.bitCount(base ^ edited)
    assert(d <= 3, s"local edit moved $d bits")
  }

  test("imageNearDupPairs: edited copy pairs with original, inverse does not") {
    val blobs = Seq(
      MediaBlob(1L, "png", gradientPng(64, 48)),
      MediaBlob(2L, "png", gradientPng(64, 48,
        tweak = (x, y) => if (x >= 30 && x < 34 && y >= 20 && y < 24) 24 else 0)),
      MediaBlob(3L, "png", gradientPng(64, 48, invert = true)),
      MediaBlob(4L, "mp4", Array[Byte](1, 2, 3)), // non-image: ignored
      MediaBlob(5L, "png", Array[Byte](9, 9))     // undecodable: dropped
    ).toDS()
    val pairs = Multimodal.imageNearDupPairs(blobs, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    assert(pairs.head._3 <= 3)
    // and the hash table only carries decodable images
    val hashed = Multimodal.imageDHashes(blobs).collect().map(_.getLong(0)).toSet
    assert(hashed == Set(1L, 2L, 3L))
  }

  /** Mono 16-bit PCM WAV with per-window amplitude envelope over
    * 65 windows × 100 frames (the fingerprint's exact window grid). */
  private def envWav(amp: Int => Int, jitter: Int => Int = _ => 0): Array[Byte] = {
    import javax.sound.sampled._
    val samples = Array.tabulate(6500)(i => (amp(i / 100) + jitter(i)).toShort)
    val raw = new Array[Byte](samples.length * 2)
    for (i <- samples.indices) {
      raw(2 * i) = (samples(i) & 0xFF).toByte
      raw(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("audioFingerprint64: envelope-derived bits, deterministic, loud on junk") {
    val ramp = Multimodal.audioFingerprint64(envWav(w => (w + 1) * 10))
    assert(ramp.contains(-1L), "strictly rising envelope sets every bit")
    assert(Multimodal.audioFingerprint64(envWav(_ => 500)).contains(0L))
    assert(Multimodal.audioFingerprint64(
      envWav(w => if (w < 32) 100 else 2000)).contains(1L << 31))
    assert(Multimodal.audioFingerprint64(Array[Byte](1, 2, 3)).isEmpty)
    // small additive jitter leaves the coarse envelope intact
    val jittered = Multimodal.audioFingerprint64(
      envWav(w => (w + 1) * 10, jitter = i => (i * 7) % 5 - 2))
    assert(java.lang.Long.bitCount(ramp.get ^ jittered.get) <= 3)
  }

  test("audioFingerprint64: G.711 mu-law decode hits the hand-derived constants") {
    import graft.sources.MediaFixture
    def env(amp: Int => Int) = Array.tabulate(6500)(i => amp(i / 100).toShort)
    assert(Multimodal.audioFingerprint64(
      MediaFixture.mulawWav(env(_ => 1000))).contains(0L))
    assert(Multimodal.audioFingerprint64(
      MediaFixture.mulawWav(env(w => if (w < 32) 100 else 2000)))
      .contains(1L << 31))
    // cross-codec invariance: the mu-law step fingerprint EQUALS the
    // PCM WAV step fingerprint (the crossformat-pairs claim)
    assert(Multimodal.audioFingerprint64(
      envWav(w => if (w < 32) 100 else 2000)) ==
      Multimodal.audioFingerprint64(
        MediaFixture.mulawWav(env(w => if (w < 32) 100 else 2000))))
    // the doubling ramp sets exactly the eight window-run boundaries
    assert(Multimodal.audioFingerprint64(
      MediaFixture.mulawWav(env(w => 32 << (w / 8))))
      .contains(0x8080808080808080L))
    // a LINEAR ramp does NOT survive the lossy codec: neighbors like
    // 140 and 150 quantize to the same level (148) above segment 0,
    // clearing bits — the documented reason the fixture doubles
    val lin = Multimodal.audioFingerprint64(
      MediaFixture.mulawWav(env(w => (w + 1) * 10)))
    assert(lin.isDefined && lin.get != -1L)
    // corrupt u32 chunk size: total, fast, None — never a hang
    val bad = MediaFixture.mulawWav(env(_ => 1000))
    val di = (0 until bad.length - 4).find(i => bad(i) == 'd' &&
      bad(i + 1) == 'a' && bad(i + 2) == 't' && bad(i + 3) == 'a').get
    bad(di + 4) = 0xF8.toByte; bad(di + 5) = 0xFF.toByte
    bad(di + 6) = 0xFF.toByte; bad(di + 7) = 0xFF.toByte
    assert(Multimodal.audioFingerprint64(bad).isEmpty)
  }

  test("audioFingerprint64: IMA ADPCM decode hits the inherited constants") {
    import graft.sources.MediaFixture
    // block-authored fixtures decode to exactly envSamples(amp), so
    // the PCM-derived constants hold with zero tolerance
    assert(Multimodal.audioFingerprint64(
      MediaFixture.adpcmWav(_ => 1000)).contains(0L))
    assert(Multimodal.audioFingerprint64(
      MediaFixture.adpcmWav(w => if (w < 32) 100 else 2000))
      .contains(1L << 31))
    assert(Multimodal.audioFingerprint64(
      MediaFixture.adpcmWav(w => (w + 1) * 10)).contains(-1L))
    // cross-codec invariance: ADPCM step == PCM WAV step fingerprint
    assert(Multimodal.audioFingerprint64(
      MediaFixture.adpcmWav(w => if (w < 32) 100 else 2000)) ==
      Multimodal.audioFingerprint64(
        envWav(w => if (w < 32) 100 else 2000)))
    // the nibble state machine itself, against a hand-derived trace
    // (IMA tables on paper): pred=0 idx=0; nib 4 -> diff 7, pred 7,
    // idx 2; nib 3 -> diff 1+2+4=7, pred 14, idx 1; nib 8 -> diff
    // 8>>3=1, pred 13, idx 0; nib 15 -> diff 0+1+3+7=11, pred 2, idx 8
    val block = Array[Byte](0, 0, 0, 0, 0x34, 0xF8.toByte)
    assert(Multimodal.imaAdpcmDecodeMono(block, 6).toSeq ==
      Seq(0, 7, 14, 13, 2))
    // clamp floor: all-sign nibbles from 0 never underflow -32768
    val down = Array[Byte](0, 0x80.toByte, 0, 0) ++ Array.fill(60)(0xFF.toByte)
    val dec = Multimodal.imaAdpcmDecodeMono(down, 64)
    assert(dec.head == -32768 && dec.forall(_ >= -32768))
    // corrupt u32 chunk size: total, fast, None — never a hang
    val bad = MediaFixture.adpcmWav(_ => 1000)
    val di = (0 until bad.length - 4).find(i => bad(i) == 'd' &&
      bad(i + 1) == 'a' && bad(i + 2) == 't' && bad(i + 3) == 'a').get
    bad(di + 4) = 0xF8.toByte; bad(di + 5) = 0xFF.toByte
    bad(di + 6) = 0xFF.toByte; bad(di + 7) = 0xFF.toByte
    assert(Multimodal.audioFingerprint64(bad).isEmpty)
    // stereo ADPCM: a loud None (interleaved channel words are not
    // decoded wrong, they are not decoded at all)
    val stereo = MediaFixture.adpcmWav(_ => 1000)
    val fi = (0 until stereo.length - 4).find(i => stereo(i) == 'f' &&
      stereo(i + 1) == 'm' && stereo(i + 2) == 't').get
    stereo(fi + 10) = 2
    assert(Multimodal.audioFingerprint64(stereo).isEmpty)
  }

  // the fixture's envelope shape: 65 windows of 100 samples each
  private def envS(amp: Int => Int): Array[Short] =
    Array.tabulate(6500)(i => amp(i / 100).toShort)

  test("oggPackets: CRC-verified page walk; corruption and truncation are loud") {
    import graft.operators.MediaHeaders
    import graft.sources.MediaFixture
    val ogg = MediaFixture.oggFlacBytesPcm(Array.fill[Short](700)(100))
    val pkts = MediaHeaders.oggPackets(ogg).get
    assert(pkts.size == 2)
    assert((pkts.head(0) & 0xFF) == 0x7F && pkts.head(1) == 'F')
    // flip one PAYLOAD byte: the page CRC must catch it (never a
    // silently wrong packet)
    val flipped = ogg.clone()
    flipped(flipped.length - 1) = (flipped(flipped.length - 1) ^ 0x01).toByte
    assert(MediaHeaders.oggPackets(flipped).isEmpty)
    // drop the EOS page's tail: truncated stream, loud None
    assert(MediaHeaders.oggPackets(ogg.dropRight(3)).isEmpty)
    // a non-BOS first page is structural corruption
    val noBos = ogg.clone(); noBos(5) = 0
    assert(MediaHeaders.oggPackets(noBos).isEmpty)
    // multiplexed/grouped stream (RFC 3533 §4): a page whose serial
    // differs from the BOS serial must be a loud None, never a foreign
    // packet interleaved into the list (the serial check fires BEFORE
    // the CRC read, so the forge needs no CRC repair)
    val nSegs = ogg(26) & 0xFF
    val p2 = 27 + nSegs + (0 until nSegs).map(i => ogg(27 + i) & 0xFF).sum
    assert((ogg(p2) & 0xFF) == 'O' && ogg(p2 + 1) == 'g', "page-2 offset")
    val muxed = ogg.clone()
    muxed(p2 + 14) = (muxed(p2 + 14) ^ 0x01).toByte
    assert(MediaHeaders.oggPackets(muxed).isEmpty)
  }

  test("A-law: hand-derived quantized levels; fingerprint matches the WAV constant") {
    import graft.sources.MediaFixture
    // the scaladoc's derivation table, verified against the fixture
    // encoder + the decoder under test via a 1-sample roundtrip each:
    // seg 0 midpoint (x & ~0xF) + 8; seg s >= 1 midpoint of the
    // 2^(s+3)-wide step
    val expect = Seq(100 -> 104L, 1000 -> 1008L, 2000 -> 2016L,
      2200 -> 2240L, 32 -> 40L, 256 -> 264L, 8192 -> 8448L)
    expect.foreach { case (x, want) =>
      assert(Multimodal.alawExpand(MediaFixture.alawCompress(x) & 0xFF) == want,
        s"level $x")
      assert(Multimodal.alawExpand(MediaFixture.alawCompress(-x) & 0xFF) == -want,
        s"level -$x")
    }
    // step envelope through the REAL decode path: same constant as WAV
    val step = MediaFixture.alawWav(
      Array.tabulate[Short](6500)(i => (if (i / 100 < 32) 100 else 2000).toShort))
    assert(Multimodal.audioFingerprint64(step).contains(1L << 31))
    // doubling ramp: all 8 rises land on bits 7,15,...,63
    val ramp = MediaFixture.alawWav(
      Array.tabulate[Short](6500)(i => (32 << (i / 100 / 8)).toShort))
    assert(Multimodal.audioFingerprint64(ramp)
      .contains(0x8080808080808080L))
    // an A-law file must NOT decode through the mulaw branch (tag gate):
    // flipping the fmt tag to 9 routes to javax.sound, which fails -> None
    val bad = step.clone()
    // fmt tag lives at RIFF(12) + 'fmt '(4) + size(4) = byte 20
    bad(20) = 9
    assert(Multimodal.audioFingerprint64(bad).isEmpty)
  }

  test("Mpeg.layer1SubbandPcm: exact subband decode; malformed streams are loud") {
    import graft.operators.Mpeg
    import graft.sources.MediaFixture
    // the fixture encoder authors code offset d per window; the decode
    // contract is EXACT: round(d·32768/32767) = d for |d| <= 16383
    val mp1 = MediaFixture.mp1Bytes(w => w + 1)
    val (rate, ch, pcm) = Mpeg.layer1SubbandPcm(mp1).get
    assert(rate == 32000 && ch == 1)
    assert(pcm.length == 65 * 12 * 32)
    (0 until 65).foreach { f =>
      (0 until 12).foreach { t =>
        assert(pcm(f * 384 + t * 32) == f + 1, s"frame $f granule $t")
        (1 until 32).foreach(sb => assert(pcm(f * 384 + t * 32 + sb) == 0))
      }
    }
    // an ID3v2 prefix (size 0) is skipped, not decoded
    val id3 = "ID3".getBytes ++ Array[Byte](3, 0, 0, 0, 0, 0, 0) ++ mp1
    assert(Mpeg.layer1SubbandPcm(id3).get._3.sameElements(pcm))
    // Layer II header bits: loud None (the B.2 tables are the named
    // boundary, never a silent wrong decode)
    val l2 = mp1.clone(); l2(1) = 0xFD.toByte
    assert(Mpeg.layer1SubbandPcm(l2).isEmpty)
    // stereo mode: loud None (mono-only layout)
    val st = mp1.clone(); st(3) = 0x00
    assert(Mpeg.layer1SubbandPcm(st).isEmpty)
    // CRC-protected frame: loud None (unverified CRC never skipped)
    val prot = mp1.clone(); prot(1) = 0xFE.toByte
    assert(Mpeg.layer1SubbandPcm(prot).isEmpty)
    // forbidden scalefactor index 63 (bits 160-165 of the frame)
    val badSf = mp1.clone(); badSf(20) = (badSf(20) | 0xFC).toByte
    assert(Mpeg.layer1SubbandPcm(badSf).isEmpty)
    // truncated final frame
    assert(Mpeg.layer1SubbandPcm(mp1.dropRight(1)).isEmpty)
    // the fingerprint constants are the WAV hand derivation verbatim
    assert(Multimodal.audioFingerprint64(
      MediaFixture.mp1Bytes(w => if (w < 32) 100 else 2000))
      .contains(1L << 31))
  }

  test("ogg-FLAC: native stream recovery, fingerprint equals the FLAC/WAV one") {
    import graft.operators.MediaHeaders
    import graft.sources.MediaFixture
    val samples = envS(w => if (w < 32) 100 else 2000)
    val viaOgg = Multimodal.audioFingerprint64(
      MediaFixture.oggFlacBytesPcm(samples))
    val viaFlac = Multimodal.audioFingerprint64(
      MediaFixture.flacBytesPcm(samples))
    assert(viaOgg.contains(1L << 31), "the hand-derived step constant")
    assert(viaOgg == viaFlac, "lossless: the container cannot move a bit")
    // ogg metadata path: rate/channels/total from the embedded STREAMINFO
    val meta = MediaHeaders.ogg(MediaFixture.oggFlacBytesPcm(samples))
    assert(meta.contains(MediaHeaders.AudioMeta(8000, 1, samples.length.toLong)))
    // an ogg-opus stream has no FLAC mapping magic: fingerprint None,
    // metadata still real via the opus branch
    assert(MediaHeaders.oggFlacNative("OggS".getBytes ++ Array[Byte](0)).isEmpty)
  }

  test("mp4JpegSamples: sample-table walk recovers every frame; corrupt is None") {
    import graft.operators.MediaHeaders
    import graft.sources.MediaFixture
    val mp4 = MediaFixture.mp4MjpegBytes(144, 64, Seq(
      (_, _) => 128, (x, _) => x * 255 / 143, (_, _) => 10))
    val samples = MediaHeaders.mp4JpegSamples(mp4).get
    assert(samples.size == 3)
    // every recovered sample is a standalone JPEG (SOI marker) and
    // decodes through the T.81 DC decoder
    assert(samples.forall(s => (s(0) & 0xFF) == 0xFF && (s(1) & 0xFF) == 0xD8))
    assert(samples.forall(s => graft.operators.Jpeg.dcLuma(s).isDefined))
    // truncating mdat keeps leading whole frames: still a loud None
    // (every DECLARED sample must be recovered)
    assert(MediaHeaders.mp4JpegSamples(mp4.take(mp4.length / 2)).isEmpty)
    // a moov without stsd is not a jpeg track — None, not a crash
    val tkhd = java.nio.ByteBuffer.allocate(84)
      .putInt(76, 64 << 16).putInt(80, 48 << 16).array()
    def box(t: String, b: Array[Byte]) = {
      val bb = java.nio.ByteBuffer.allocate(b.length + 8)
      bb.putInt(b.length + 8).put(t.getBytes("ISO-8859-1")).put(b)
      bb.array()
    }
    val metaOnly = box("ftyp", "isomiso2".getBytes) ++
      box("moov", box("trak", box("tkhd", tkhd)))
    assert(MediaHeaders.mp4JpegSamples(metaOnly).isEmpty)
  }

  test("mp4 MJPEG: videoDHashes pins the SAME constants as the AVI reel") {
    import graft.sources.MediaFixture
    val blobs = Seq(
      MediaBlob(1L, "mp4", MediaFixture.mp4MjpegBytes(144, 64, Seq(
        (_, _) => 128,
        (x, _) => x * 255 / 143,
        (x, _) => if (x < 64) 0 else 255,
        (x, _) => 255 - x * 255 / 143)))).toDS()
    val got = Multimodal.videoDHashes(blobs).collect()
      .map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(got == Map(0 -> 0L, 1 -> -1L, 2 -> 0x0808080808080808L, 3 -> 0L))
  }

  test("mkv MJPEG: EBML block walk pins the SAME constants; lacing is loud") {
    import graft.operators.MediaHeaders
    import graft.sources.MediaFixture
    val mkv = MediaFixture.mkvMjpegBytes(144, 64, Seq(
      (_, _) => 128,
      (x, _) => x * 255 / 143,
      (x, _) => if (x < 64) 0 else 255,
      (x, _) => 255 - x * 255 / 143))
    val frames = MediaHeaders.matroskaJpegFrames(mkv).get
    assert(frames.size == 4)
    assert(frames.forall(f => (f(0) & 0xFF) == 0xFF && (f(1) & 0xFF) == 0xD8))
    val blobs = Seq(MediaBlob(1L, "mkv", mkv)).toDS()
    val got = Multimodal.videoDHashes(blobs).collect()
      .map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(got == Map(0 -> 0L, 1 -> -1L, 2 -> 0x0808080808080808L, 3 -> 0L))
    // a non-MJPEG codec id stays header-only: loud None
    val vorbisId = mkv.clone()
    val at = (0 until mkv.length - 7).find(i =>
      new String(mkv, i, 7, "ISO-8859-1") == "V_MJPEG").get
    System.arraycopy("V_MPEG4".getBytes("ISO-8859-1"), 0, vorbisId, at, 7)
    assert(MediaHeaders.matroskaJpegFrames(vorbisId).isEmpty)
    // flipping the lacing bits on is a loud None, not a wrong decode
    val laced = mkv.clone()
    // first SimpleBlock header: track vint 0x81, ts 0x0000, flags 0x80
    val sb = (0 until laced.length - 4).find(i =>
      (laced(i) & 0xFF) == 0x81 && laced(i + 1) == 0 && laced(i + 2) == 0 &&
        (laced(i + 3) & 0xFF) == 0x80 && (laced(i + 4) & 0xFF) == 0xFF).get
    laced(sb + 3) = (0x80 | 0x02).toByte
    assert(MediaHeaders.matroskaJpegFrames(laced).isEmpty)
  }

  test("audioNearDupPairs: jittered copy pairs, reversed envelope does not") {
    val blobs = Seq(
      MediaBlob(1L, "wav", envWav(w => (w + 1) * 10)),
      MediaBlob(2L, "wav", envWav(w => (w + 1) * 10, jitter = i => (i * 7) % 5 - 2)),
      MediaBlob(3L, "wav", envWav(w => (65 - w) * 10)),
      MediaBlob(4L, "mp3", Array[Byte](1, 2, 3)) // non-PCM kind: ignored
    ).toDS()
    val pairs = Multimodal.audioNearDupPairs(blobs, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((1L, 2L)))
    assert(Multimodal.audioFingerprints(blobs).collect()
      .map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
  }
}
