package graft.sources

import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** Deterministic multimodal fixture: one tiny well-formed file per
  * supported container (PNG via ImageIO, WAV via javax.sound, and
  * hand-assembled MP4 / Matroska / MP3 / OGG-Opus / FLAC headers —
  * public byte formats, the same constructions unit-tested in
  * MultimodalSpec), plus the PINNED post-decode truth as a CSV for
  * DuckDB.
  *
  * This puts the multimodal metadata path (binaryFile source → typed
  * header decode) under the hard oracle gate: the expected
  * width/height/n_frames values are hand-derived constants from the
  * container specs — NOT computed by the code under test; only
  * `n_bytes` (a length the fixture controls, not a decode result) is
  * taken from the written arrays. */
object MediaFixture {

  val dir: String = s"${FixtureDirs.base}/media"
  val expectedCsvPath: String = s"${FixtureDirs.base}/media_expected.csv"

  // ---- container byte builders (public formats) ----

  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def wavBytes(rate: Float, channels: Int, frames: Int): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(rate, 16, channels, true, false)
    val raw = new Array[Byte](frames * 2 * channels)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def mp4Box(typ: String, body: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(body.length + 8)
    bb.putInt(body.length + 8).put(typ.getBytes("ISO-8859-1")).put(body)
    bb.array()
  }

  /** ftyp + moov/trak/tkhd(dims) + stbl/stsz(sample count). */
  private def mp4Bytes(w: Int, h: Int, frames: Int): Array[Byte] = {
    val tkhd = java.nio.ByteBuffer.allocate(84)
      .putInt(76, w << 16).putInt(80, h << 16).array()
    val stsz = java.nio.ByteBuffer.allocate(12)
      .putInt(4, 0).putInt(8, frames).array()
    val trak = mp4Box("trak", mp4Box("tkhd", tkhd) ++
      mp4Box("mdia", mp4Box("minf", mp4Box("stbl", mp4Box("stsz", stsz)))))
    mp4Box("ftyp", "isomiso2".getBytes) ++ mp4Box("moov", trak)
  }

  private def ebmlEl(id: Long, body: Array[Byte]): Array[Byte] = {
    val idBytes = BigInt(id).toByteArray.dropWhile(_ == 0)
    require(body.length < 127)
    idBytes ++ Array((0x80 | body.length).toByte) ++ body
  }
  private def ebmlUint(id: Long, v: Long): Array[Byte] = {
    val b = BigInt(v).toByteArray.dropWhile(_ == 0)
    ebmlEl(id, if (b.isEmpty) Array(0.toByte) else b)
  }

  /** EBML header + Segment(Info(scale, duration), Tracks(video dims,
    * default frame duration)). */
  private def mkvBytes(w: Int, h: Int, frames: Int, fps: Int): Array[Byte] = {
    val nsPerFrame = 1000000000L / fps
    val video = ebmlEl(0xE0L, ebmlUint(0xB0L, w) ++ ebmlUint(0xBAL, h))
    val trackEntry = ebmlEl(0xAEL, ebmlUint(0x23E383L, nsPerFrame) ++ video)
    val tracks = ebmlEl(0x1654AE6BL, trackEntry)
    val durationTicks = frames.toDouble * nsPerFrame / 1000000.0 // 1 ms ticks
    val duration = ebmlEl(0x4489L,
      java.nio.ByteBuffer.allocate(8).putDouble(durationTicks).array())
    val info = ebmlEl(0x1549A966L, ebmlUint(0x2AD7B1L, 1000000L) ++ duration)
    ebmlEl(0x1A45DFA3L, Array.empty[Byte]) ++
      ebmlEl(0x18538067L, info ++ tracks)
  }

  /** ID3v2 tag + `frames` CBR MPEG1 Layer-III frames
    * (128 kbps @ 44100, stereo). */
  private def mp3Bytes(frames: Int): Array[Byte] = {
    val id3 = "ID3".getBytes ++ Array[Byte](3, 0, 0, 0, 0, 0, 100) ++
      new Array[Byte](100)
    val frameLen = 144 * 128000 / 44100
    val frame = Array(0xFF.toByte, 0xFB.toByte, 0x90.toByte, 0x44.toByte) ++
      new Array[Byte](frameLen - 4)
    id3 ++ Array.fill(frames)(frame).flatten
  }

  private def oggPage(headerType: Int, granule: Long,
                      packet: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(28 + packet.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("OggS".getBytes).put(0.toByte).put(headerType.toByte)
      .putLong(granule).putInt(77).putInt(0).putInt(0)
      .put(1.toByte).put(packet.length.toByte).put(packet)
    bb.array()
  }

  /** BOS page with an OpusHead id packet + EOS page carrying the final
    * granule (total 48 kHz samples). */
  private def oggOpusBytes(channels: Int, granule: Long): Array[Byte] = {
    val opusHead = "OpusHead".getBytes ++ Array[Byte](1, channels.toByte) ++
      Array[Byte](0x38, 1) ++
      Array[Byte](0x80.toByte, 0xBB.toByte, 0, 0) ++
      Array[Byte](0, 0, 0)
    oggPage(0x02, 0L, opusHead) ++ oggPage(0x04, granule, Array[Byte](1))
  }

  /** fLaC + STREAMINFO (rate 20 bits, channels-1 3 bits, bps-1 5 bits,
    * total samples 36 bits, bit-packed at body offset 10). */
  private def flacBytes(rate: Long, channels: Int, total: Long): Array[Byte] = {
    val packed = (rate << 44) | ((channels - 1).toLong << 41) |
      (15L << 36) | total
    val streaminfo = java.nio.ByteBuffer.allocate(34).putLong(10, packed).array()
    "fLaC".getBytes ++ Array[Byte](0, 0, 0, 34) ++ streaminfo
  }

  // ---- RIFF/AVI with uncompressed-DIB frames (public Microsoft
  // layout; raw 24-bit BGR, bottom-up rows, 4-byte row padding) ----

  private def le32(v: Long): Array[Byte] =
    java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v.toInt).array()

  private def riffChunk(id: String, body: Array[Byte]): Array[Byte] =
    id.getBytes("ISO-8859-1") ++ le32(body.length.toLong) ++ body ++
      (if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])

  private def riffList(typ: String, body: Array[Byte]): Array[Byte] =
    riffChunk("LIST", typ.getBytes("ISO-8859-1") ++ body)

  /** AVI of `frames.size` uncompressed gray frames; `frames(k)(x, y)`
    * is the gray level of pixel (x, y) in frame k (stored as B=G=R,
    * so luminance == the gray value exactly — the lumPng trick).
    * `private[graft]`: the soak's map-side video generator reuses it. */
  private[graft] def aviBytes(w: Int, h: Int,
                              frames: Seq[(Int, Int) => Int]): Array[Byte] = {
    val avih = new Array[Byte](56)
    System.arraycopy(le32(frames.size.toLong), 0, avih, 16, 4) // dwTotalFrames
    System.arraycopy(le32(w.toLong), 0, avih, 32, 4)           // dwWidth
    System.arraycopy(le32(h.toLong), 0, avih, 36, 4)           // dwHeight
    val strh = "vids".getBytes("ISO-8859-1") ++
      "DIB ".getBytes("ISO-8859-1") ++ new Array[Byte](48)
    val bih = new Array[Byte](40) // BITMAPINFOHEADER
    System.arraycopy(le32(40L), 0, bih, 0, 4)
    System.arraycopy(le32(w.toLong), 0, bih, 4, 4)
    System.arraycopy(le32(h.toLong), 0, bih, 8, 4)
    bih(12) = 1 // biPlanes (LE u16)
    bih(14) = 24 // biBitCount (LE u16)
    val hdrl = riffList("hdrl", riffChunk("avih", avih) ++
      riffList("strl", riffChunk("strh", strh) ++ riffChunk("strf", bih)))
    val stride = ((w * 3 + 3) / 4) * 4
    val movi = riffList("movi", frames.map { f =>
      val data = new Array[Byte](stride * h)
      for (y <- 0 until h; x <- 0 until w) {
        val v = (f(x, y) & 0xFF).toByte
        val o = (h - 1 - y) * stride + x * 3 // bottom-up rows
        data(o) = v; data(o + 1) = v; data(o + 2) = v
      }
      riffChunk("00db", data)
    }.reduce(_ ++ _))
    "RIFF".getBytes("ISO-8859-1") ++
      le32((4 + hdrl.length + movi.length).toLong) ++
      "AVI ".getBytes("ISO-8859-1") ++ hdrl ++ movi
  }

  /** The meta fixture's AVI frame patterns (w=63, h=48 — the dHash
    * fixture geometry, see [[dhashEntries]] for the derivations). */
  private def aviMetaFrames: Seq[(Int, Int) => Int] = Seq(
    (_, _) => 0,
    (x, _) => x * 255 / 62,
    (x, _) => if (x < 28) 0 else 255,
    (x, _) => 255 - x * 255 / 62)

  /** (filename, bytes, pinned width, height, n_frames) per container. */
  private def entries: Seq[(String, Array[Byte], Int, Int, Int)] = Seq(
    ("img_320x200.png", pngBytes(320, 200), 320, 200, 1),
    ("audio_8k_mono.wav", wavBytes(8000f, 1, 1234), 8000, 1, 1234),
    ("video_640x360.mp4", mp4Bytes(640, 360, 120), 640, 360, 120),
    ("video_1280x720.mkv", mkvBytes(1280, 720, 50, 25), 1280, 720, 50),
    ("video_63x48.avi", aviBytes(63, 48, aviMetaFrames), 63, 48, 4),
    ("audio_cbr.mp3", mp3Bytes(10), 44100, 2, 10 * 1152),
    ("audio_opus.ogg", oggOpusBytes(2, 96000L), 48000, 2, 96000),
    ("audio_44k.flac", flacBytes(44100L, 2, 88200L), 44100, 2, 88200))

  /** Write the media files + the pinned expected CSV; returns `dir`. */
  def ensure(): String = {
    Files.createDirectories(Paths.get(dir))
    val rows = entries.map { case (name, bytes, w, h, n) =>
      Files.write(Paths.get(dir, name), bytes)
      val kind = name.substring(name.lastIndexOf('.') + 1)
      s"$name,$kind,${bytes.length},$w,$h,$n"
    }
    Files.write(Paths.get(expectedCsvPath),
      ("name,kind,n_bytes,width,height,n_frames\n" + rows.mkString("\n") + "\n")
        .getBytes(StandardCharsets.UTF_8))
    dir
  }

  // ---- perceptual-hash fixture (hand-derivable dHash truths) ----

  val dhashDir: String = s"${FixtureDirs.base}/media_dhash"
  val expectedDHashCsvPath: String = s"${FixtureDirs.base}/media_dhash_expected.csv"

  private def lumPng(w: Int, h: Int, v: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = v(x, y) & 0xFF
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** (filename, bytes, HAND-DERIVED dHash). The pinned values follow
    * from the dHash definition alone (9×8 area-averaged luminance
    * cells, bit i set iff cell(i/8, i%8) < its right neighbor), never
    * from running the code under test. Width 63 makes the 9 grid
    * columns exactly 7 px wide (rows are 6 px); gray pixels make
    * luminance == the gray value ((299+587+114)/1000 = 1 exactly):
    *  - flat       → all cells equal, no strict `<` → 0
    *  - hgrad      → cell means strictly increase left→right (block
    *                 means are ~28.8 gray levels apart) → all 64 bits → -1
    *  - hgrad_inv  → strictly decrease → no bit → 0
    *  - half_split → black cols 0-3 (x<28=4·7), white cols 4-8: the
    *                 only strict rise is col 3→4, bit 3 of every row
    *                 byte → 0x0808080808080808.
    * Round-8 near-dup variants (for the PAIRS oracle —
    * q_multimodal_dhash_pairs):
    *  - hgrad_edit → hgrad with cells (7,0) and (7,1) zeroed (x<14,
    *                 y≥42): comparison c(7,0)<c(7,1) becomes 0<0 =
    *                 false, clearing exactly bit 56 (c(7,1)=0 < c(7,2)
    *                 stays true) → -1 ^ (1<<56), Hamming 1 from hgrad
    *  - half_split_edit → half_split with cell (0,4) at 100 instead of
    *                 255 (28≤x<35, y<6): row 0 gains bit 4 (100<255)
    *                 and keeps bit 3 (0<100) → row-0 byte 0x18 →
    *                 0x0808080808080818, Hamming 1 from half_split. */
  private def dhashEntries: Seq[(String, Array[Byte], Long)] = Seq(
    ("flat.png", lumPng(64, 48, (_, _) => 0), 0L),
    ("hgrad.png", lumPng(63, 48, (x, _) => x * 255 / 62), -1L),
    ("hgrad_inv.png", lumPng(63, 48, (x, _) => 255 - x * 255 / 62), 0L),
    ("half_split.png", lumPng(63, 48, (x, _) => if (x < 28) 0 else 255),
      0x0808080808080808L),
    ("hgrad_edit.png", lumPng(63, 48,
      (x, y) => if (y >= 42 && x < 14) 0 else x * 255 / 62),
      -1L ^ (1L << 56)),
    ("half_split_edit.png", lumPng(63, 48,
      (x, y) => if (x < 28) 0 else if (x < 35 && y < 6) 100 else 255),
      0x0808080808080818L))

  /** Write the dHash images + the pinned hash CSV; returns `dhashDir`. */
  def ensureDHash(): String = {
    Files.createDirectories(Paths.get(dhashDir))
    val rows = dhashEntries.map { case (name, bytes, hash) =>
      Files.write(Paths.get(dhashDir, name), bytes)
      s"$name,$hash"
    }
    Files.write(Paths.get(expectedDHashCsvPath),
      ("name,dhash\n" + rows.mkString("\n") + "\n")
        .getBytes(StandardCharsets.UTF_8))
    dhashDir
  }

  // ---- audio-fingerprint fixture (hand-derivable energy hashes) ----

  val audioFpDir: String = s"${FixtureDirs.base}/media_audiofp"
  val expectedAudioFpCsvPath: String = s"${FixtureDirs.base}/media_audiofp_expected.csv"

  /** Mono 16-bit little-endian PCM WAV from explicit samples. */
  private def pcmWav(samples: Array[Short]): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val raw = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      raw(2 * i) = (samples(i) & 0xFF).toByte
      raw(2 * i + 1) = ((samples(i) >> 8) & 0xFF).toByte
      i += 1
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** 6500 frames = 65 fingerprint windows of exactly 100 frames each;
    * `amp(w)` is the constant sample value inside window w. */
  private def envSamples(amp: Int => Int): Array[Short] =
    Array.tabulate(6500)(i => amp(i / 100).toShort)

  /** (filename, bytes, HAND-DERIVED energy fingerprint): window
    * energy = 100·amp², bit i set iff window i+1 louder than i —
    *  - flat envelope  → all windows equal → 0
    *  - rising ramp    → strictly increasing → all 64 bits → -1
    *  - step at w=32   → one louder transition, bit 31 → 2^31.
    * Round-8 near-dup variants (q_multimodal_audiofp_pairs):
    *  - step_louder    → same single transition at w=32, louder top
    *                     (amp 2200): the envelope SHAPE is the hash, so
    *                     the fingerprint is IDENTICAL to step — 2^31
    *                     (Hamming 0: level-invariance by construction)
    *  - two_step       → rises at w=21 and w=43 → bits 20 and 42 →
    *                     (1<<20)|(1<<42); Hamming 3 from step (bits
    *                     20, 31, 42) — exactly the banding radius. */
  private def audioFpEntries: Seq[(String, Array[Byte], Long)] = Seq(
    ("flat_tone.wav", pcmWav(envSamples(_ => 1000)), 0L),
    ("ramp.wav", pcmWav(envSamples(w => (w + 1) * 10)), -1L),
    ("step.wav", pcmWav(envSamples(w => if (w < 32) 100 else 2000)), 1L << 31),
    ("step_louder.wav", pcmWav(envSamples(w => if (w < 32) 100 else 2200)), 1L << 31),
    ("two_step.wav", pcmWav(envSamples(w =>
      if (w < 21) 100 else if (w < 43) 1000 else 2000)),
      (1L << 20) | (1L << 42)))

  // ---- FLAC fingerprint fixture (lossless COMPRESSED audio) ----

  val audioFlacDir: String = s"${FixtureDirs.base}/media_flacfp"
  val expectedFlacFpCsvPath: String =
    s"${FixtureDirs.base}/media_flacfp_expected.csv"

  private final class BitW {
    private val bos = new java.io.ByteArrayOutputStream()
    private var buf = 0; private var cnt = 0
    def bit(v: Int): Unit = {
      buf = (buf << 1) | (v & 1); cnt += 1
      if (cnt == 8) { bos.write(buf); buf = 0; cnt = 0 }
    }
    def bits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bit(((v >> i) & 1L).toInt); i -= 1 }
    }
    def align(): Unit = while (cnt != 0) bit(0)
    def snapshot: Array[Byte] = { require(cnt == 0, "unaligned"); bos.toByteArray }
  }
  /** CRC-8 poly 0x07 init 0 (FLAC frame-header CRC). */
  private def flacCrc8(b: Array[Byte]): Int = {
    var c = 0
    for (x <- b) {
      c ^= (x & 0xFF)
      var i = 0
      while (i < 8) {
        c = if ((c & 0x80) != 0) ((c << 1) ^ 0x07) & 0xFF else (c << 1) & 0xFF
        i += 1
      }
    }
    c
  }
  /** CRC-16 poly 0x8005 init 0 (FLAC frame CRC). */
  private def flacCrc16(b: Array[Byte]): Int = {
    var c = 0
    for (x <- b) {
      c ^= (x & 0xFF) << 8
      var i = 0
      while (i < 8) {
        c = if ((c & 0x8000) != 0) ((c << 1) ^ 0x8005) & 0xFFFF
            else (c << 1) & 0xFFFF
        i += 1
      }
    }
    c
  }

  /** Minimal spec-correct FLAC ENCODER (mono 16-bit): STREAMINFO,
    * fixed 4096-sample frames, FIXED order-1 subframes (order 0 for a
    * 1-sample tail) with rice residuals at partition order 0, cost-
    * minimized rice parameter, real header CRC-8 and frame CRC-16.
    * Exists only to manufacture fixtures — the DECODER under test is
    * [[graft.operators.Flac]], and losslessness makes the contract
    * absolute: decoded PCM must equal `samples` bit-for-bit, and the
    * energy fingerprint must equal the SAME envelope's WAV constant.
    * `private[graft]`: specs and the soak reuse it. */
  private[graft] def flacBytesPcm(samples: Array[Short],
                                  rate: Int = 8000): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("ISO-8859-1"))
    val si = new BitW
    si.bits(4096, 16); si.bits(4096, 16) // min/max block size
    si.bits(0, 24); si.bits(0, 24)       // frame sizes unknown
    si.bits(rate, 20)
    si.bits(0, 3)   // channels - 1
    si.bits(15, 5)  // bps - 1
    si.bits(samples.length.toLong, 36)   // 144 bits = 18 bytes exactly
    val siBytes = si.snapshot ++ new Array[Byte](16) // MD5 unset
    out.write(0x80) // last-metadata flag | type 0 (STREAMINFO)
    out.write(Array((siBytes.length >> 16).toByte,
      (siBytes.length >> 8).toByte, siBytes.length.toByte))
    out.write(siBytes)
    var pos = 0; var fi = 0
    while (pos < samples.length) {
      val bs = math.min(4096, samples.length - pos)
      val w = new BitW
      w.bits(0x3FFE, 14); w.bit(0); w.bit(0) // sync, reserved, fixed blocking
      w.bits(7, 4) // block size: explicit 16-bit at end of header
      w.bits(0, 4) // sample rate: from STREAMINFO
      w.bits(0, 4) // channel assignment: 1 independent channel
      w.bits(4, 3) // 16-bit samples
      w.bit(0)
      require(fi < 128, "single-byte frame numbers only")
      w.bits(fi, 8)        // UTF-8 coded frame number (1-byte form)
      w.bits(bs - 1, 16)
      w.bits(flacCrc8(w.snapshot), 8)
      // FIXED order-1 subframe (order 0 when the tail has one sample)
      val blk = Array.tabulate(bs)(j => samples(pos + j).toInt)
      val order = if (bs >= 2) 1 else 0
      w.bit(0); w.bits(8 | order, 6); w.bit(0) // pad, type 001ooo, no wasted
      var i = 0
      while (i < order) { w.bits(blk(i) & 0xFFFF, 16); i += 1 }
      val zz = Array.tabulate(bs - order) { j =>
        val r = if (order == 0) blk(j) else blk(j + 1) - blk(j)
        ((r << 1) ^ (r >> 31)).toLong & 0xFFFFFFFFL
      }
      val p = (0 to 14).minBy(pp => zz.map(z => (z >>> pp) + 1 + pp).sum)
      w.bits(0, 2) // residual method: 4-bit rice
      w.bits(0, 4) // partition order 0
      w.bits(p, 4)
      for (z <- zz) {
        var q = (z >>> p).toInt
        while (q > 0) { w.bit(0); q -= 1 }
        w.bit(1)
        w.bits(z & ((1L << p) - 1), p)
      }
      w.align()
      w.bits(flacCrc16(w.snapshot), 16)
      out.write(w.snapshot)
      pos += bs; fi += 1
    }
    out.toByteArray
  }

  /** (filename, bytes, fingerprint): the SAME envelopes as
    * [[audioFpEntries]] and therefore the SAME hand-derived constants —
    * FLAC is lossless, so the decoded PCM is bit-identical to the WAV
    * fixture's and the energy-delta bits cannot differ. */
  private def flacFpEntries: Seq[(String, Array[Byte], Long)] = Seq(
    ("flat_tone.flac", flacBytesPcm(envSamples(_ => 1000)), 0L),
    ("ramp.flac", flacBytesPcm(envSamples(w => (w + 1) * 10)), -1L),
    ("step.flac", flacBytesPcm(envSamples(w => if (w < 32) 100 else 2000)),
      1L << 31),
    ("two_step.flac", flacBytesPcm(envSamples(w =>
      if (w < 21) 100 else if (w < 43) 1000 else 2000)),
      (1L << 20) | (1L << 42)))

  /** Write the FLAC files + the pinned CSV; returns `audioFlacDir`. */
  def ensureFlacFp(): String = {
    Files.createDirectories(Paths.get(audioFlacDir))
    val rows = flacFpEntries.map { case (name, bytes, hash) =>
      Files.write(Paths.get(audioFlacDir, name), bytes)
      s"$name,$hash"
    }
    Files.write(Paths.get(expectedFlacFpCsvPath),
      ("name,afp\n" + rows.mkString("\n") + "\n")
        .getBytes(StandardCharsets.UTF_8))
    audioFlacDir
  }

  // ---- Ogg-FLAC fingerprint fixture (RFC 5334 container walk) ----

  val audioOggFlacDir: String = s"${FixtureDirs.base}/media_oggflacfp"
  val expectedOggFlacFpCsvPath: String =
    s"${FixtureDirs.base}/media_oggflacfp_expected.csv"

  /** RFC 3533 page CRC-32 (poly 0x04c11db7, init 0, unreflected, no
    * final xor) — fixture-only encoder side; the verifying decoder is
    * [[graft.operators.MediaHeaders.oggPackets]]. */
  private def fixOggCrc(page: Array[Byte]): Int = {
    var r = 0
    var i = 0
    while (i < page.length) {
      r = (r << 8) ^ {
        var t = ((r >>> 24) ^ (page(i) & 0xFF)) << 24
        var j = 0
        while (j < 8) {
          t = if ((t & 0x80000000) != 0) (t << 1) ^ 0x04c11db7 else t << 1
          j += 1
        }
        t
      }
      i += 1
    }
    r
  }

  /** One Ogg page with REAL lacing (255-runs + terminator — packets
    * larger than 255 bytes span several segments) and a real CRC,
    * unlike the crc-0 metadata-only [[oggPage]]: the packet walk under
    * test verifies both. One packet per page is all the fixture
    * needs. */
  private def oggPageLaced(headerType: Int, granule: Long, seq: Int,
                           packet: Array[Byte]): Array[Byte] = {
    val lacing = Array.newBuilder[Byte]
    var rem = packet.length
    while (rem >= 255) { lacing += 255.toByte; rem -= 255 }
    lacing += rem.toByte
    val lac = lacing.result()
    require(lac.length <= 255, "fixture packet exceeds one page")
    val bb = java.nio.ByteBuffer
      .allocate(27 + lac.length + packet.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("OggS".getBytes).put(0.toByte).put(headerType.toByte)
      .putLong(granule).putInt(777).putInt(seq).putInt(0)
      .put(lac.length.toByte).put(lac).put(packet)
    val page = bb.array()
    val crc = fixOggCrc(page) // CRC field is still zero here
    page(22) = crc.toByte
    page(23) = (crc >> 8).toByte
    page(24) = (crc >> 16).toByte
    page(25) = (crc >> 24).toByte
    page
  }

  /** Ogg-FLAC encapsulation of [[flacBytesPcm]]'s native stream (the
    * xiph mapping): BOS page carries the 0x7F"FLAC" v1.0 nheaders=0
    * prefix + fLaC magic + STREAMINFO (the native stream's first 42
    * bytes); the EOS page carries every audio frame as one packet and
    * the total-samples granule. Losslessness is inherited — the
    * recovered native stream is byte-identical. */
  private[graft] def oggFlacBytesPcm(samples: Array[Short],
                                     rate: Int = 8000): Array[Byte] = {
    val native = flacBytesPcm(samples, rate)
    val p0 = Array(0x7F.toByte) ++ "FLAC".getBytes("ISO-8859-1") ++
      Array[Byte](1, 0, 0, 0) ++ native.take(42)
    oggPageLaced(0x02, 0L, 0, p0) ++
      oggPageLaced(0x04, samples.length.toLong, 1, native.drop(42))
  }

  /** Same envelopes, same hand-derived constants as [[flacFpEntries]]
    * and [[audioFpEntries]]: the container adds framing, not samples. */
  private def oggFlacFpEntries: Seq[(String, Array[Byte], Long)] = Seq(
    ("flat_tone.ogg", oggFlacBytesPcm(envSamples(_ => 1000)), 0L),
    ("ramp.ogg", oggFlacBytesPcm(envSamples(w => (w + 1) * 10)), -1L),
    ("step.ogg", oggFlacBytesPcm(envSamples(w => if (w < 32) 100 else 2000)),
      1L << 31),
    ("two_step.ogg", oggFlacBytesPcm(envSamples(w =>
      if (w < 21) 100 else if (w < 43) 1000 else 2000)),
      (1L << 20) | (1L << 42)))

  /** Write the Ogg-FLAC files + the pinned CSV; returns
    * `audioOggFlacDir`. */
  def ensureOggFlacFp(): String = {
    Files.createDirectories(Paths.get(audioOggFlacDir))
    val rows = oggFlacFpEntries.map { case (name, bytes, hash) =>
      Files.write(Paths.get(audioOggFlacDir, name), bytes)
      s"$name,$hash"
    }
    Files.write(Paths.get(expectedOggFlacFpCsvPath),
      ("name,afp\n" + rows.mkString("\n") + "\n")
        .getBytes(StandardCharsets.UTF_8))
    audioOggFlacDir
  }

  // ---- MPEG-1 Layer I fingerprint fixture (LOSSY transform audio) ----

  val audioMp1Dir: String = s"${FixtureDirs.base}/media_mp1fp"
  val expectedMp1FpCsvPath: String =
    s"${FixtureDirs.base}/media_mp1fp_expected.csv"

  /** Minimal spec-correct MPEG-1 Layer I ENCODER (ISO 11172-3; mono,
    * 32 kbps @ 32 kHz → 48-byte frames, unprotected): ONE frame per
    * fingerprint window — 65 frames × 384 subband-domain values =
    * 24960, so the 65 energy windows align exactly with frame
    * boundaries. Subband 0 carries the window's constant value at
    * allocation code 14 (nb = 15) and scalefactor index 3 (sf = 1.0);
    * subbands 1-31 are unallocated. The DECODER under test is
    * [[graft.operators.Mpeg.layer1SubbandPcm]].
    *
    * Losslessness of the ENVELOPE by construction: the code
    * c = (2^14 − 1) + d decodes to s'' = 2d/(2^15 − 1), and
    * round(sf·s''·16384) = round(d·32768/32767) = d exactly for
    * |d| ≤ 16383 — so each authored window decodes to 12 copies of
    * exactly d (plus 31×12 zeros) and window energy is exactly 12·d²:
    * the energy-delta bits are integer comparisons of the authored
    * d values, the same hand derivation as the WAV twins. */
  private[graft] def mp1Bytes(windowValue: Int => Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    (0 until 65).foreach { win =>
      val d = windowValue(win)
      require(math.abs(d) <= 16383, s"quantizer offset $d out of range")
      val w = new BitW
      w.bits(0xFF, 8)  // sync
      w.bits(0xFF, 8)  // sync + MPEG-1 + Layer I + no CRC
      w.bits(1, 4)     // bitrate index 1 = 32 kbps (Layer I table)
      w.bits(2, 2)     // sample-rate index 2 = 32000 Hz
      w.bits(0, 1)     // padding
      w.bits(0, 1)     // private
      w.bits(3, 2)     // mode 11 = single channel
      w.bits(0, 2)     // mode extension
      w.bits(0, 1)     // copyright
      w.bits(0, 1)     // original
      w.bits(0, 2)     // emphasis
      w.bits(14, 4)    // subband 0: allocation code 14 -> nb = 15
      (1 until 32).foreach(_ => w.bits(0, 4))
      w.bits(3, 6)     // scalefactor index 3 -> 2*2^(-1) = 1.0
      (0 until 12).foreach(_ => w.bits((16383 + d).toLong, 15))
      w.bits(0L, 38)   // ancillary padding to the 48-byte slot length
      val frame = w.snapshot
      require(frame.length == 48, s"frame ${frame.length} != 48")
      out.write(frame, 0, frame.length)
    }
    out.toByteArray
  }

  /** Same envelopes, same hand-derived constants as [[audioFpEntries]]:
    * window energy is exactly 12·d², so the bits compare the authored
    * d values directly (see [[mp1Bytes]]). */
  private def mp1FpEntries: Seq[(String, Array[Byte], Long)] = Seq(
    ("flat_tone.mp1", mp1Bytes(_ => 1000), 0L),
    ("ramp.mp1", mp1Bytes(w => (w + 1) * 10), -1L),
    ("step.mp1", mp1Bytes(w => if (w < 32) 100 else 2000), 1L << 31),
    ("two_step.mp1", mp1Bytes(w =>
      if (w < 21) 100 else if (w < 43) 1000 else 2000),
      (1L << 20) | (1L << 42)))

  /** Write the Layer I files + the pinned CSV; returns [[audioMp1Dir]]. */
  def ensureMp1Fp(): String = {
    Files.createDirectories(Paths.get(audioMp1Dir))
    val rows = mp1FpEntries.map { case (name, bytes, hash) =>
      Files.write(Paths.get(audioMp1Dir, name), bytes)
      s"$name,$hash"
    }
    Files.write(Paths.get(expectedMp1FpCsvPath),
      ("name,afp\n" + rows.mkString("\n") + "\n")
        .getBytes(StandardCharsets.UTF_8))
    audioMp1Dir
  }

  // ---- G.711 µ-law fingerprint fixture (LOSSY compressed audio) ----

  val audioMulawDir: String = s"${FixtureDirs.base}/media_mulawfp"
  val expectedMulawFpCsvPath: String =
    s"${FixtureDirs.base}/media_mulawfp_expected.csv"

  /** ITU-T G.711 µ-law compress of a 16-bit linear sample (BIAS 0x84,
    * CLIP 32635, complemented output) — fixture-only encoder; the
    * decoder under test is the expand in [[graft.operators.Multimodal
    * .audioFingerprint64]]. */
  private[graft] def mulawCompress(s16: Int): Byte = {
    var x = s16
    val sign = if (x < 0) { x = -x; 0x80 } else 0
    if (x > 32635) x = 32635
    x += 0x84
    var exp = 7; var mask = 0x4000
    while (exp > 0 && (x & mask) == 0) { exp -= 1; mask >>= 1 }
    val mant = (x >> (exp + 3)) & 0x0F
    (~(sign | (exp << 4) | mant)).toByte
  }

  /** Canonical mono 8 kHz µ-law WAV (fmt tag 7, 8 bits/sample) —
    * hand-written RIFF so no JDK writer sits between the spec and the
    * fixture bytes. */
  private[graft] def mulawWav(samples: Array[Short]): Array[Byte] = {
    val data = samples.map(s => mulawCompress(s.toInt))
    val fmt = java.nio.ByteBuffer.allocate(16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putShort(7).putShort(1).putInt(8000).putInt(8000)
      .putShort(1).putShort(8).array()
    riffChunk("RIFF",
      "WAVE".getBytes("ISO-8859-1") ++
        riffChunk("fmt ", fmt) ++ riffChunk("data", data))
  }

  /** (filename, bytes, HAND-DERIVED fingerprint). µ-law is LOSSY, so
    * unlike FLAC the constants are not inherited automatically — they
    * hold because G.711's expand∘compress is MONOTONE and the
    * envelopes only use levels that quantize to DISTINCT values
    * (derived by hand from the closed form ((m·8+132)·2^e − 132):
    * 100→104, 1000→988, 2000→1980; 32·2^k → 32, 64, 132, 260, 516,
    * 1028, 2052, 4100, 8196 — strictly increasing). Shared envelopes
    * therefore pin the SAME constants as the PCM WAV fixture — the
    * louder-than-previous bits survive the codec by envelope margin,
    * which is exactly the cross-codec dedup claim:
    *  - flat      → 0 (constant stays constant)
    *  - step      → 2^31 (one rise at w=32)
    *  - two_step  → bits 20|42
    *  - ramp8     → µ-law-only envelope: amp 32·2^(w/8) doubles every
    *    8 windows (a (w+1)·10 ramp would NOT survive — µ-law step
    *    sizes exceed 10 above segment 0, collapsing neighbors; the
    *    doubling ramp keeps every transition a full quantizer segment
    *    apart) → rises at w = 8,16,…,64 → bits 7,15,…,63. */
  private def mulawFpEntries: Seq[(String, Array[Byte], Long)] = Seq(
    ("flat_tone_mulaw.wav", mulawWav(envSamples(_ => 1000)), 0L),
    ("step_mulaw.wav", mulawWav(envSamples(w => if (w < 32) 100 else 2000)),
      1L << 31),
    ("two_step_mulaw.wav", mulawWav(envSamples(w =>
      if (w < 21) 100 else if (w < 43) 1000 else 2000)),
      (1L << 20) | (1L << 42)),
    ("ramp8_mulaw.wav", mulawWav(envSamples(w => 32 << (w / 8))),
      0x8080808080808080L))

  // ---- IMA ADPCM fingerprint fixture (adaptive-delta compressed) ----

  val audioAdpcmDir: String = s"${FixtureDirs.base}/media_adpcmfp"
  val expectedAdpcmFpCsvPath: String =
    s"${FixtureDirs.base}/media_adpcmfp_expected.csv"

  /** Mono 8 kHz IMA/DVI ADPCM WAV (fmt tag 0x11, 4 bits/sample),
    * hand-authored at the BLOCK level: 260 blocks × blockAlign 16 =
    * 25 samples per block (header sample + 24 nibble samples), i.e.
    * FOUR blocks per 100-sample fingerprint window. Every block's
    * header carries (predictor = amp(window), step index 0) and every
    * nibble is 0 — so the decode is exact BY THE SPEC'S OWN TABLES:
    * step index 0 → step 7, nibble 0 → diff = 7>>3 = 0 (predictor
    * never moves inside a block) and index += indexTable(0) = −1
    * clamps at 0 (step never grows). The decoded stream is therefore
    * IDENTICAL to `envSamples(amp)` sample-for-sample, and the pinned
    * fingerprints are the SAME hand-derived constants as the PCM WAV
    * fixture — authored nibbles, not an encoder, keep the derivation
    * honest (the codec under test never produces its own expected
    * values). A `fact` chunk carries the 6500-sample count per the
    * WAVE spec for compressed formats. */
  private[graft] def adpcmWav(amp: Int => Int): Array[Byte] = {
    val nBlocks = 260; val blockAlign = 16
    val data = new Array[Byte](nBlocks * blockAlign)
    var b = 0
    while (b < nBlocks) {
      val pred = amp((b * 25) / 100)
      val o = b * blockAlign
      data(o) = (pred & 0xFF).toByte
      data(o + 1) = ((pred >> 8) & 0xFF).toByte
      // index byte, reserved byte and all 12 nibble bytes stay 0
      b += 1
    }
    val fmt = java.nio.ByteBuffer.allocate(22)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putShort(0x11).putShort(1).putInt(8000).putInt(4100)
      .putShort(16).putShort(4).putShort(2).putShort(25).array()
    val fact = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(6500).array()
    riffChunk("RIFF",
      "WAVE".getBytes("ISO-8859-1") ++
        riffChunk("fmt ", fmt) ++ riffChunk("fact", fact) ++
        riffChunk("data", data))
  }

  /** (filename, bytes, HAND-DERIVED fingerprint) — constants inherited
    * from the PCM envelope derivation because the authored blocks
    * decode to exactly `envSamples(amp)` (see [[adpcmWav]]):
    * flat → 0, step at w=32 → 2^31, two_step → bits 20|42,
    * ramp (+10 per window, exact via block headers) → all bits → -1. */
  private def adpcmFpEntries: Seq[(String, Array[Byte], Long)] = Seq(
    ("flat_tone_adpcm.wav", adpcmWav(_ => 1000), 0L),
    ("ramp_adpcm.wav", adpcmWav(w => (w + 1) * 10), -1L),
    ("step_adpcm.wav", adpcmWav(w => if (w < 32) 100 else 2000), 1L << 31),
    ("two_step_adpcm.wav", adpcmWav(w =>
      if (w < 21) 100 else if (w < 43) 1000 else 2000),
      (1L << 20) | (1L << 42)))

  /** Write the IMA ADPCM WAVs + the pinned CSV; returns
    * `audioAdpcmDir`. */
  def ensureAdpcmFp(): String = {
    Files.createDirectories(Paths.get(audioAdpcmDir))
    val rows = adpcmFpEntries.map { case (name, bytes, hash) =>
      Files.write(Paths.get(audioAdpcmDir, name), bytes)
      s"$name,$hash"
    }
    Files.write(Paths.get(expectedAdpcmFpCsvPath),
      ("name,afp\n" + rows.mkString("\n") + "\n")
        .getBytes(StandardCharsets.UTF_8))
    audioAdpcmDir
  }

  // ---- G.711 A-law fingerprint fixture (the European twin) ----

  val audioAlawDir: String = s"${FixtureDirs.base}/media_alawfp"
  val expectedAlawFpCsvPath: String =
    s"${FixtureDirs.base}/media_alawfp_expected.csv"

  /** ITU-T G.711 A-law compress of a 16-bit linear sample (segment/
    * mantissa coding, even bits inverted by XOR 0x55, sign bit SET for
    * positive) — fixture-only encoder; the decoder under test is the
    * expand in [[graft.operators.Multimodal.audioFingerprint64]]. */
  private[graft] def alawCompress(s16: Int): Byte = {
    var x = s16
    val sign = if (x >= 0) 0x80 else { x = -x; 0 }
    if (x > 32767) x = 32767
    val (seg, mant) =
      if (x < 256) (0, x >> 4)
      else {
        var s = 1
        while (s < 7 && x >= (256 << s)) s += 1
        (s, (x >> (s + 3)) & 0xF)
      }
    ((sign | (seg << 4) | mant) ^ 0x55).toByte
  }

  /** Canonical mono 8 kHz A-law WAV (fmt tag 6, 8 bits/sample). */
  private[graft] def alawWav(samples: Array[Short]): Array[Byte] = {
    val data = samples.map(s => alawCompress(s.toInt))
    val fmt = java.nio.ByteBuffer.allocate(16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putShort(6).putShort(1).putInt(8000).putInt(8000)
      .putShort(1).putShort(8).array()
    riffChunk("RIFF",
      "WAVE".getBytes("ISO-8859-1") ++
        riffChunk("fmt ", fmt) ++ riffChunk("data", data))
  }

  /** (filename, bytes, HAND-DERIVED fingerprint). Same posture as
    * [[mulawFpEntries]]: A-law's expand∘compress is MONOTONE and the
    * envelope levels quantize to DISTINCT values, derived by hand from
    * the segment closed form (seg 0: (x & ~0xF) + 8; seg s ≥ 1:
    * midpoint of the 2^(s+3)-wide step): 100→104, 1000→1008,
    * 2000→2016, 2200→2240; the doubling ramp 32·2^(w/8) → 40, 72,
    * 136, 264, 528, 1056, 2112, 4224, 8448 — strictly increasing
    * (a (w+1)·10 linear ramp would NOT survive: seg-0 steps are 16
    * wide, collapsing 20 and 30 both to 24). Shared envelopes pin the
    * SAME constants as the PCM WAV fixture. */
  private def alawFpEntries: Seq[(String, Array[Byte], Long)] = Seq(
    ("flat_tone_alaw.wav", alawWav(envSamples(_ => 1000)), 0L),
    ("step_alaw.wav", alawWav(envSamples(w => if (w < 32) 100 else 2000)),
      1L << 31),
    ("two_step_alaw.wav", alawWav(envSamples(w =>
      if (w < 21) 100 else if (w < 43) 1000 else 2000)),
      (1L << 20) | (1L << 42)),
    ("ramp8_alaw.wav", alawWav(envSamples(w => 32 << (w / 8))),
      0x8080808080808080L))

  /** Write the A-law WAVs + the pinned CSV; returns `audioAlawDir`. */
  def ensureAlawFp(): String = {
    Files.createDirectories(Paths.get(audioAlawDir))
    val rows = alawFpEntries.map { case (name, bytes, hash) =>
      Files.write(Paths.get(audioAlawDir, name), bytes)
      s"$name,$hash"
    }
    Files.write(Paths.get(expectedAlawFpCsvPath),
      ("name,afp\n" + rows.mkString("\n") + "\n")
        .getBytes(StandardCharsets.UTF_8))
    audioAlawDir
  }

  /** Write the µ-law WAVs + the pinned CSV; returns `audioMulawDir`. */
  def ensureMulawFp(): String = {
    Files.createDirectories(Paths.get(audioMulawDir))
    val rows = mulawFpEntries.map { case (name, bytes, hash) =>
      Files.write(Paths.get(audioMulawDir, name), bytes)
      s"$name,$hash"
    }
    Files.write(Paths.get(expectedMulawFpCsvPath),
      ("name,afp\n" + rows.mkString("\n") + "\n")
        .getBytes(StandardCharsets.UTF_8))
    audioMulawDir
  }

  // ---- video frame-hash fixture (hand-derivable per-frame dHashes) --

  val videoDHashDir: String = s"${FixtureDirs.base}/media_vdhash"
  val expectedVideoDHashCsvPath: String =
    s"${FixtureDirs.base}/media_vdhash_expected.csv"

  /** (filename, bytes, HAND-DERIVED per-frame dHash). Frames reuse the
    * [[dhashEntries]] gray patterns at the same 63×48 geometry, and a
    * gray DIB frame's luminance equals its gray level exactly, so each
    * frame's pinned hash is the SAME constant derived for the PNG
    * fixture — no codec is trusted anywhere:
    *  - video_a: flat(0), hgrad(-1), half_split(0x0808080808080808),
    *             hgrad_inv(0)
    *  - video_a_edit: same sequence with the 1-bit edits of
    *             hgrad_edit / half_split_edit in frames 1 and 2 —
    *             the near-dup twin at Hamming 1 per edited frame. */
  private def videoDHashEntries: Seq[(String, Array[Byte], Seq[Long])] = Seq(
    ("video_a.avi", aviBytes(63, 48, Seq(
      (_, _) => 0,
      (x, _) => x * 255 / 62,
      (x, _) => if (x < 28) 0 else 255,
      (x, _) => 255 - x * 255 / 62)),
      Seq(0L, -1L, 0x0808080808080808L, 0L)),
    ("video_a_edit.avi", aviBytes(63, 48, Seq(
      (_, _) => 0,
      (x, y) => if (y >= 42 && x < 14) 0 else x * 255 / 62,
      (x, y) => if (x < 28) 0 else if (x < 35 && y < 6) 100 else 255,
      (x, _) => 255 - x * 255 / 62)),
      Seq(0L, -1L ^ (1L << 56), 0x0808080808080818L, 0L)))

  /** Write the AVIs + the pinned (name, frame_idx, vdhash) CSV;
    * returns `videoDHashDir`. */
  def ensureVideoDHash(): String = {
    Files.createDirectories(Paths.get(videoDHashDir))
    val rows = videoDHashEntries.flatMap { case (name, bytes, hashes) =>
      Files.write(Paths.get(videoDHashDir, name), bytes)
      hashes.zipWithIndex.map { case (hv, i) => s"$name,$i,$hv" }
    }
    Files.write(Paths.get(expectedVideoDHashCsvPath),
      ("name,frame_idx,vdhash\n" + rows.mkString("\n") + "\n")
        .getBytes(StandardCharsets.UTF_8))
    videoDHashDir
  }

  // ---- DTMF dial fixture (Goertzel demodulation end-to-end) --------

  val dtmfDir: String = s"${FixtureDirs.base}/media_dtmf"
  val expectedDtmfCsvPath: String = s"${FixtureDirs.base}/media_dtmf_expected.csv"

  private val DtmfRow = Map('1' -> 697.0, '2' -> 697.0, '3' -> 697.0, 'A' -> 697.0,
    '4' -> 770.0, '5' -> 770.0, '6' -> 770.0, 'B' -> 770.0,
    '7' -> 852.0, '8' -> 852.0, '9' -> 852.0, 'C' -> 852.0,
    '*' -> 941.0, '0' -> 941.0, '#' -> 941.0, 'D' -> 941.0)
  private val DtmfCol = Map('1' -> 1209.0, '4' -> 1209.0, '7' -> 1209.0, '*' -> 1209.0,
    '2' -> 1336.0, '5' -> 1336.0, '8' -> 1336.0, '0' -> 1336.0,
    '3' -> 1477.0, '6' -> 1477.0, '9' -> 1477.0, '#' -> 1477.0,
    'A' -> 1633.0, 'B' -> 1633.0, 'C' -> 1633.0, 'D' -> 1633.0)

  /** Mono 8 kHz PCM WAV dialing `digits`: 200 ms two-tone bursts
    * (ITU-T Q.23 row+column pair, amplitude 5000 each) separated by
    * 150 ms silence, with lead-in/lead-out silence. The EXPECTED
    * decoder output is the dialed string itself — chosen by hand, so
    * the oracle never depends on the decoder under test. */
  private[graft] def dtmfWav(digits: String): Array[Byte] = {
    val tone = 1600; val gap = 1200
    val total = gap + digits.length * (tone + gap)
    val samples = new Array[Short](total)
    var off = gap
    digits.foreach { d =>
      val fr = DtmfRow(d); val fc = DtmfCol(d)
      var i = 0
      while (i < tone) {
        val t = i.toDouble / 8000.0
        samples(off + i) =
          ((5000 * math.sin(2 * math.Pi * fr * t)) +
            (5000 * math.sin(2 * math.Pi * fc * t))).toInt.toShort
        i += 1
      }
      off += tone + gap
    }
    pcmWav(samples)
  }

  private def dtmfEntries: Seq[(String, Array[Byte], String)] = Seq(
    ("dial_15A9.wav", dtmfWav("15A9"), "15A9"),
    ("dial_0842.wav", dtmfWav("0842"), "0842"),
    ("dial_star_hash.wav", dtmfWav("*#06"), "*#06"),
    ("dial_full_pad.wav", dtmfWav("123A456B789C*0#D"), "123A456B789C*0#D"))

  /** Write the dial WAVs + the pinned (name, digits) CSV; returns
    * `dtmfDir`. */
  def ensureDtmf(): String = {
    Files.createDirectories(Paths.get(dtmfDir))
    val rows = dtmfEntries.map { case (name, bytes, digits) =>
      Files.write(Paths.get(dtmfDir, name), bytes)
      s"$name,$digits"
    }
    Files.write(Paths.get(expectedDtmfCsvPath),
      ("name,digits\n" + rows.mkString("\n") + "\n")
        .getBytes(StandardCharsets.UTF_8))
    dtmfDir
  }

  // ---- animated-GIF video fixture (LZW-compressed frames) ----------

  val gifDHashDir: String = s"${FixtureDirs.base}/media_gif"
  val expectedGifDHashCsvPath: String =
    s"${FixtureDirs.base}/media_gif_expected.csv"

  /** Animated GIF89a from gray frame patterns: 256-entry grayscale
    * global palette (entry i = (i,i,i) — pixel index IS the gray
    * level, so decoded luminance equals the pattern exactly), each
    * frame a full-canvas image with a disposal-1 graphic control.
    *
    * The LZW stream is authored ROOT-CODES-ONLY: a CLEAR, then each
    * pixel as its own 9-bit literal, with a CLEAR every 200 literals
    * so the decoder's table never reaches the 10-bit boundary, then
    * EOI. That is valid LZW by the spec (an encoder may emit CLEAR
    * whenever it likes and is never obliged to use table entries),
    * and it keeps the fixture's bytes hand-derivable end-to-end: the
    * decoder under test faces real variable-width machinery (widths,
    * clears, sub-block reassembly) while the expected pixels remain
    * the authored patterns BY CONSTRUCTION, not by running any
    * encoder's compression heuristics. */
  private[graft] def gifAnimBytes(w: Int, h: Int,
                                  frames: Seq[(Int, Int) => Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("ISO-8859-1"))
    out.write(w & 0xFF); out.write(w >> 8)
    out.write(h & 0xFF); out.write(h >> 8)
    out.write(0xF7) // GCT present, 8-bit color res, 256 entries
    out.write(0)    // background index
    out.write(0)    // aspect
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    frames.foreach { f =>
      // graphic control: disposal 1 (keep), no transparency
      out.write(Array[Byte](0x21, 0xF9.toByte, 4, 0x04, 0, 0, 0, 0))
      out.write(0x2C)
      out.write(0); out.write(0); out.write(0); out.write(0) // x, y
      out.write(w & 0xFF); out.write(w >> 8)
      out.write(h & 0xFF); out.write(h >> 8)
      out.write(0) // no LCT, not interlaced
      out.write(8) // LZW min code size
      val bits = new java.io.ByteArrayOutputStream()
      var acc = 0L; var nAcc = 0
      def put(code: Int): Unit = {
        acc |= code.toLong << nAcc; nAcc += 9
        while (nAcc >= 8) {
          bits.write((acc & 0xFF).toInt); acc >>= 8; nAcc -= 8
        }
      }
      put(256) // CLEAR
      var n = 0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          put(f(x, y) & 0xFF)
          n += 1
          if (n % 200 == 0) put(256)
          x += 1
        }
        y += 1
      }
      put(257) // EOI
      if (nAcc > 0) bits.write((acc & 0xFF).toInt)
      val payload = bits.toByteArray
      var p = 0
      while (p < payload.length) {
        val len = math.min(255, payload.length - p)
        out.write(len)
        out.write(payload, p, len)
        p += len
      }
      out.write(0) // block terminator
    }
    out.write(0x3B)
    out.toByteArray
  }

  /** (filename, bytes, HAND-DERIVED per-frame dHash): the same 63×48
    * gray patterns as the raw-DIB reel, so each frame's pinned hash
    * is the SAME constant derived once for the PNG fixture — three
    * containers, two codecs, one derivation, no codec trusted. */
  private def gifDHashEntries: Seq[(String, Array[Byte], Seq[Long])] = Seq(
    ("gif_a.gif", gifAnimBytes(63, 48, Seq(
      (_, _) => 0,
      (x, _) => x * 255 / 62,
      (x, _) => if (x < 28) 0 else 255,
      (x, _) => 255 - x * 255 / 62)),
      Seq(0L, -1L, 0x0808080808080808L, 0L)),
    ("gif_a_edit.gif", gifAnimBytes(63, 48, Seq(
      (_, _) => 0,
      (x, y) => if (y >= 42 && x < 14) 0 else x * 255 / 62,
      (x, y) => if (x < 28) 0 else if (x < 35 && y < 6) 100 else 255,
      (x, _) => 255 - x * 255 / 62)),
      Seq(0L, -1L ^ (1L << 56), 0x0808080808080818L, 0L)))

  /** Write the GIFs + the pinned (name, frame_idx, vdhash) CSV;
    * returns `gifDHashDir`. */
  def ensureGifDHash(): String = {
    Files.createDirectories(Paths.get(gifDHashDir))
    val rows = gifDHashEntries.flatMap { case (name, bytes, hashes) =>
      Files.write(Paths.get(gifDHashDir, name), bytes)
      hashes.zipWithIndex.map { case (hv, i) => s"$name,$i,$hv" }
    }
    Files.write(Paths.get(expectedGifDHashCsvPath),
      ("name,frame_idx,vdhash\n" + rows.mkString("\n") + "\n")
        .getBytes(StandardCharsets.UTF_8))
    gifDHashDir
  }

  // ---- MJPEG video fixture (DC-grid dHash over COMPRESSED frames) --

  val mjpegDHashDir: String = s"${FixtureDirs.base}/media_mjpeg"
  val expectedMjpegDHashCsvPath: String =
    s"${FixtureDirs.base}/media_mjpeg_expected.csv"

  /** Gray baseline JPEG of the pattern via the JDK's ENCODER (SOF0 +
    * Annex K tables) — the decoder under test is [[graft.operators.Jpeg]],
    * written from the T.81 spec; using the JDK only to produce input
    * keeps encoder and decoder independent. */
  private def jpegBytes(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { r.setSample(x, y, 0, f(x, y) & 0xFF); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** MJPEG AVI: same RIFF skeleton as [[aviBytes]] but the stream
    * handler is MJPG and each frame is a standalone baseline JPEG in a
    * '00dc' chunk — the compressed-codec sibling of the raw-DIB
    * fixture. `private[graft]`: specs and the soak reuse it. */
  private[graft] def mjpegAviBytes(w: Int, h: Int,
                                   frames: Seq[(Int, Int) => Int]): Array[Byte] = {
    val avih = new Array[Byte](56)
    System.arraycopy(le32(frames.size.toLong), 0, avih, 16, 4)
    System.arraycopy(le32(w.toLong), 0, avih, 32, 4)
    System.arraycopy(le32(h.toLong), 0, avih, 36, 4)
    val strh = "vids".getBytes("ISO-8859-1") ++
      "MJPG".getBytes("ISO-8859-1") ++ new Array[Byte](48)
    val bih = new Array[Byte](40)
    System.arraycopy(le32(40L), 0, bih, 0, 4)
    System.arraycopy(le32(w.toLong), 0, bih, 4, 4)
    System.arraycopy(le32(h.toLong), 0, bih, 8, 4)
    bih(12) = 1; bih(14) = 24
    System.arraycopy("MJPG".getBytes("ISO-8859-1"), 0, bih, 16, 4) // biCompression
    val hdrl = riffList("hdrl", riffChunk("avih", avih) ++
      riffList("strl", riffChunk("strh", strh) ++ riffChunk("strf", bih)))
    val movi = riffList("movi",
      frames.map(f => riffChunk("00dc", jpegBytes(w, h, f))).reduce(_ ++ _))
    "RIFF".getBytes("ISO-8859-1") ++
      le32((4 + hdrl.length + movi.length).toLong) ++
      "AVI ".getBytes("ISO-8859-1") ++ hdrl ++ movi
  }

  /** 144×64 patterns whose DC-grid dHash is HAND-DERIVABLE despite the
    * lossy codec: the 18×8 DC grid (one value per 8×8 block) maps onto
    * the 9×8 dHash cells as exact 2-block column pairs (x0 = 2·gx), so
    *  - flat 128: every block identical → every comparison false → 0
    *  - ramp x·255/143: block means rise ~14 gray levels/block (~14
    *    DC quantization steps at the JDK encoder's tables — far above
    *    rounding), cells strictly increase → all 64 bits → -1
    *  - half split at x=64 (block boundary): cells 0-3 are identical
    *    black blocks, 4-8 identical white (identical blocks quantize
    *    IDENTICALLY, so equality is exact) → single rise at column 3 →
    *    bit 3 of every row → 0x0808080808080808, the SAME constant the
    *    PNG/DIB fixtures pin
    *  - inverse ramp: strictly decreasing → 0. */
  private def mjpegPatterns: Seq[(Int, Int) => Int] = Seq(
    (_, _) => 128,
    (x, _) => x * 255 / 143,
    (x, _) => if (x < 64) 0 else 255,
    (x, _) => 255 - x * 255 / 143)

  private def mjpegDHashEntries: Seq[(String, Array[Byte], Seq[Long])] = Seq(
    ("mjpeg_a.avi", mjpegAviBytes(144, 64, mjpegPatterns),
      Seq(0L, -1L, 0x0808080808080808L, 0L)),
    // a second reel so the query output is not a single-file case:
    // its split sits at x=72 (blocks 0-8 black, 9-17 white) → cells
    // 0-3 black, cell 4 = blocks {8,9} = mixed ≈128, cells 5-8 white
    // → TWO rises, (3,4) and (4,5) → bits 3 and 4 of every row.
    ("mjpeg_b.avi", mjpegAviBytes(144, 64, Seq(
      (_, _) => 128,
      (x, _) => if (x < 72) 0 else 255)),
      Seq(0L, 0x1818181818181818L)))

  /** Write the MJPEG AVIs + the pinned (name, frame_idx, vdhash) CSV;
    * returns `mjpegDHashDir`. */
  def ensureMjpegDHash(): String = {
    Files.createDirectories(Paths.get(mjpegDHashDir))
    val rows = mjpegDHashEntries.flatMap { case (name, bytes, hashes) =>
      Files.write(Paths.get(mjpegDHashDir, name), bytes)
      hashes.zipWithIndex.map { case (hv, i) => s"$name,$i,$hv" }
    }
    Files.write(Paths.get(expectedMjpegDHashCsvPath),
      ("name,frame_idx,vdhash\n" + rows.mkString("\n") + "\n")
        .getBytes(StandardCharsets.UTF_8))
    mjpegDHashDir
  }

  // ---- MJPEG-in-MP4 fixture (ISO 14496-12 sample-table walk) ----

  val mp4DHashDir: String = s"${FixtureDirs.base}/media_mp4"
  val expectedMp4DHashCsvPath: String =
    s"${FixtureDirs.base}/media_mp4_expected.csv"

  /** MJPEG-in-MP4: ftyp + mdat of concatenated baseline JPEGs + a moov
    * whose video trak carries a REAL sample table — 'jpeg' stsd entry,
    * per-sample stsz sizes, chunks of TWO samples so the stsc run map
    * and intra-chunk size accumulation are genuinely exercised (an
    * all-samples-in-one-chunk layout would never walk a second chunk).
    * Same JDK-encoder frames as [[mjpegAviBytes]]; the decoder under
    * test is the spec-written [[graft.operators.Jpeg]] behind
    * [[graft.operators.MediaHeaders.mp4JpegSamples]]. */
  private[graft] def mp4MjpegBytes(w: Int, h: Int,
                                   frames: Seq[(Int, Int) => Int]): Array[Byte] = {
    val jpegs = frames.map(f => jpegBytes(w, h, f))
    val ftyp = mp4Box("ftyp", "isomiso2".getBytes("ISO-8859-1"))
    val mdat = mp4Box("mdat", jpegs.reduce(_ ++ _))
    val mdatBodyOff = ftyp.length + 8
    val chunks = jpegs.grouped(2).toSeq
    val chunkOffsets = chunks.map(_.map(_.length).sum)
      .scanLeft(mdatBodyOff)(_ + _).init
    // stsc run-length map of samples-per-chunk
    val stscRuns = chunks.map(_.size).zipWithIndex
      .foldLeft(Vector.empty[(Int, Int)]) { case (acc, (spc, i)) =>
        if (acc.nonEmpty && acc.last._2 == spc) acc else acc :+ ((i + 1, spc))
      }
    val tkhd = java.nio.ByteBuffer.allocate(84)
      .putInt(76, w << 16).putInt(80, h << 16).array()
    val stsd = {
      val bb = java.nio.ByteBuffer.allocate(8 + 16)
      bb.putInt(4, 1)  // entry_count
      bb.putInt(8, 16) // sample-entry box size
      System.arraycopy("jpeg".getBytes("ISO-8859-1"), 0, bb.array(), 12, 4)
      bb.array()
    }
    val stsz = {
      val bb = java.nio.ByteBuffer.allocate(12 + 4 * jpegs.size)
      bb.putInt(8, jpegs.size) // sample_size 0 -> per-sample table
      jpegs.zipWithIndex.foreach { case (j, i) => bb.putInt(12 + 4 * i, j.length) }
      bb.array()
    }
    val stsc = {
      val bb = java.nio.ByteBuffer.allocate(8 + 12 * stscRuns.size)
      bb.putInt(4, stscRuns.size)
      stscRuns.zipWithIndex.foreach { case ((first, spc), i) =>
        bb.putInt(8 + 12 * i, first)
        bb.putInt(12 + 12 * i, spc)
        bb.putInt(16 + 12 * i, 1)
      }
      bb.array()
    }
    val stco = {
      val bb = java.nio.ByteBuffer.allocate(8 + 4 * chunkOffsets.size)
      bb.putInt(4, chunkOffsets.size)
      chunkOffsets.zipWithIndex.foreach { case (o, i) => bb.putInt(8 + 4 * i, o) }
      bb.array()
    }
    val stbl = mp4Box("stbl", mp4Box("stsd", stsd) ++ mp4Box("stsz", stsz) ++
      mp4Box("stsc", stsc) ++ mp4Box("stco", stco))
    val trak = mp4Box("trak", mp4Box("tkhd", tkhd) ++
      mp4Box("mdia", mp4Box("minf", stbl)))
    ftyp ++ mdat ++ mp4Box("moov", trak)
  }

  /** Same patterns, same hand-derived DC-grid constants as
    * [[mjpegDHashEntries]]: identical codec, different container. */
  private def mp4DHashEntries: Seq[(String, Array[Byte], Seq[Long])] = Seq(
    ("mp4_a.mp4", mp4MjpegBytes(144, 64, mjpegPatterns),
      Seq(0L, -1L, 0x0808080808080808L, 0L)),
    ("mp4_b.mp4", mp4MjpegBytes(144, 64, Seq(
      (_, _) => 128,
      (x, _) => if (x < 72) 0 else 255)),
      Seq(0L, 0x1818181818181818L)))

  // ---- MJPEG-in-Matroska fixture (EBML SimpleBlock walk) ----

  val mkvDHashDir: String = s"${FixtureDirs.base}/media_mkv"
  val expectedMkvDHashCsvPath: String =
    s"${FixtureDirs.base}/media_mkv_expected.csv"

  /** EBML size vint of any width (the single-byte [[ebmlEl]] caps at
    * 126 — JPEG payloads need 2-3 byte sizes). */
  private def ebmlSize(n: Long): Array[Byte] = {
    var width = 1
    while (n >= (1L << (7 * width)) - 1) width += 1
    val out = new Array[Byte](width)
    var v = n | (1L << (7 * width))
    var i = width - 1
    while (i >= 0) { out(i) = (v & 0xFF).toByte; v >>= 8; i -= 1 }
    out
  }
  private def ebmlElL(id: Long, body: Array[Byte]): Array[Byte] = {
    val idBytes = BigInt(id).toByteArray.dropWhile(_ == 0)
    idBytes ++ ebmlSize(body.length.toLong) ++ body
  }

  /** MJPEG-in-Matroska: EBML header + Segment(Info(scale, duration),
    * Tracks(track 1, CodecID V_MJPEG, dims, per-frame duration),
    * one Cluster per frame whose SimpleBlock carries a standalone
    * baseline JPEG (track vint 0x81, zero relative timestamp,
    * keyframe flags 0x80, no lacing). Duration is set so the header
    * parser's duration-derived frame count EQUALS the block count —
    * the consistency check the decoder enforces. */
  private[graft] def mkvMjpegBytes(w: Int, h: Int,
                                   frames: Seq[(Int, Int) => Int],
                                   fps: Int = 25): Array[Byte] = {
    val jpegs = frames.map(f => jpegBytes(w, h, f))
    val nsPerFrame = 1000000000L / fps
    val video = ebmlEl(0xE0L, ebmlUint(0xB0L, w) ++ ebmlUint(0xBAL, h))
    val codec = ebmlEl(0x86L, "V_MJPEG".getBytes("ISO-8859-1"))
    val trackEntry = ebmlElL(0xAEL, ebmlUint(0xD7L, 1) ++ codec ++
      ebmlUint(0x23E383L, nsPerFrame) ++ video)
    val tracks = ebmlElL(0x1654AE6BL, trackEntry)
    val durationTicks = jpegs.size.toDouble * nsPerFrame / 1000000.0
    val duration = ebmlEl(0x4489L,
      java.nio.ByteBuffer.allocate(8).putDouble(durationTicks).array())
    val info = ebmlEl(0x1549A966L, ebmlUint(0x2AD7B1L, 1000000L) ++ duration)
    val clusters = jpegs.zipWithIndex.map { case (j, i) =>
      val block = ebmlElL(0xA3L,
        Array[Byte](0x81.toByte, 0, 0, 0x80.toByte) ++ j)
      ebmlElL(0x1F43B675L,
        ebmlUint(0xE7L, i * nsPerFrame / 1000000L) ++ block)
    }.reduce(_ ++ _)
    ebmlEl(0x1A45DFA3L, Array.empty[Byte]) ++
      ebmlElL(0x18538067L, info ++ tracks ++ clusters)
  }

  /** Same patterns, same hand-derived DC-grid constants as the AVI and
    * MP4 MJPEG reels: one codec, three containers. */
  private def mkvDHashEntries: Seq[(String, Array[Byte], Seq[Long])] = Seq(
    ("mkv_a.mkv", mkvMjpegBytes(144, 64, mjpegPatterns),
      Seq(0L, -1L, 0x0808080808080808L, 0L)),
    ("mkv_b.mkv", mkvMjpegBytes(144, 64, Seq(
      (_, _) => 128,
      (x, _) => if (x < 72) 0 else 255)),
      Seq(0L, 0x1818181818181818L)))

  /** Write the MKVs + the pinned (name, frame_idx, vdhash) CSV;
    * returns `mkvDHashDir`. */
  def ensureMkvDHash(): String = {
    Files.createDirectories(Paths.get(mkvDHashDir))
    val rows = mkvDHashEntries.flatMap { case (name, bytes, hashes) =>
      Files.write(Paths.get(mkvDHashDir, name), bytes)
      hashes.zipWithIndex.map { case (hv, i) => s"$name,$i,$hv" }
    }
    Files.write(Paths.get(expectedMkvDHashCsvPath),
      ("name,frame_idx,vdhash\n" + rows.mkString("\n") + "\n")
        .getBytes(StandardCharsets.UTF_8))
    mkvDHashDir
  }

  /** Write the MP4s + the pinned (name, frame_idx, vdhash) CSV;
    * returns `mp4DHashDir`. */
  def ensureMp4DHash(): String = {
    Files.createDirectories(Paths.get(mp4DHashDir))
    val rows = mp4DHashEntries.flatMap { case (name, bytes, hashes) =>
      Files.write(Paths.get(mp4DHashDir, name), bytes)
      hashes.zipWithIndex.map { case (hv, i) => s"$name,$i,$hv" }
    }
    Files.write(Paths.get(expectedMp4DHashCsvPath),
      ("name,frame_idx,vdhash\n" + rows.mkString("\n") + "\n")
        .getBytes(StandardCharsets.UTF_8))
    mp4DHashDir
  }

  /** Write the fingerprint WAVs + the pinned CSV; returns `audioFpDir`. */
  def ensureAudioFp(): String = {
    Files.createDirectories(Paths.get(audioFpDir))
    val rows = audioFpEntries.map { case (name, bytes, hash) =>
      Files.write(Paths.get(audioFpDir, name), bytes)
      s"$name,$hash"
    }
    Files.write(Paths.get(expectedAudioFpCsvPath),
      ("name,afp\n" + rows.mkString("\n") + "\n")
        .getBytes(StandardCharsets.UTF_8))
    audioFpDir
  }
}
