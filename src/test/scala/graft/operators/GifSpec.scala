package graft.operators

import graft.SparkSpec

/** Decoder-level coverage for the spec-written [[Gif]] — the corners
  * the fixture's root-codes-only streams never reach: the KwKwK
  * `code == next` case, code-width growth, disposal-2 restore,
  * transparent-index compositing, and interlaced row order. Streams
  * here are authored BY HAND at the bit level (expected outputs
  * derived on paper from the LZW algorithm, never from the decoder). */
class GifSpec extends SparkSpec {

  test("lzwDecode: KwKwK code==next — the 'aaaa' textbook case") {
    // minCodeSize 2: clear=4, eoi=5. Codes [4, 0, 6, 5]: 0 emits 'a',
    // 6 == next emits string(prev)+first = 'aa'. 3-bit LSB packing of
    // (4,0,6,5) = bytes 0x84, 0x0B.
    val out = Gif.lzwDecode(2, Array(0x84.toByte, 0x0B.toByte), 3)
    assert(out.map(_.toSeq).contains(Seq(0, 0, 0)))
  }

  test("lzwDecode: truncation and pixel-count mismatch are loud Nones") {
    // the same stream cut before EOI
    assert(Gif.lzwDecode(2, Array(0x84.toByte), 3).isEmpty)
    // declared pixel count not met / exceeded
    assert(Gif.lzwDecode(2, Array(0x84.toByte, 0x0B.toByte), 4).isEmpty)
    assert(Gif.lzwDecode(2, Array(0x84.toByte, 0x0B.toByte), 2).isEmpty)
    // a code referencing beyond the table
    assert(Gif.lzwDecode(2, Array(0xFC.toByte, 0x0B.toByte), 3).isEmpty)
  }

  test("frames: disposal-2 restore + transparent index, hand-built bytes") {
    // 2×2, GCT {c0=(10,10,10), c1=(200,200,200)}, bg index 0.
    // Frame 1 (disposal 2): indices 0,1,0,1 — codes (4,0,1,0,1,5)
    // with the width growing to 4 bits after entry 7 lands: bytes
    // 0x44 0x10 0x05 (derived on paper).
    // Frame 2 (transparent=0): 2×1 strip at y=1, indices 0,1 — the
    // transparent 0 leaves the RESTORED background visible.
    val c0 = (10 << 16) | (10 << 8) | 10
    val c1 = (200 << 16) | (200 << 8) | 200
    val b = Array.concat(
      "GIF89a".getBytes("ISO-8859-1"),
      Array[Byte](2, 0, 2, 0, 0xF0.toByte, 0, 0), // LSD: 2×2, GCT of 2
      Array[Byte](10, 10, 10, 200.toByte, 200.toByte, 200.toByte),
      Array[Byte](0x21, 0xF9.toByte, 4, 0x08, 0, 0, 0, 0), // GCE: disposal 2
      Array[Byte](0x2C, 0, 0, 0, 0, 2, 0, 2, 0, 0), // full-frame desc
      Array[Byte](2, 3, 0x44, 0x10, 0x05, 0), // LZW: 3 payload bytes
      Array[Byte](0x21, 0xF9.toByte, 4, 0x01, 0, 0, 0, 0), // GCE: trans=0
      Array[Byte](0x2C, 0, 0, 1, 0, 2, 0, 1, 0, 0), // 2×1 at (0,1)
      Array[Byte](2, 2, 0x44, 0x0A, 0), // codes (4,0,1,5)
      Array[Byte](0x3B))
    val Some((w, h, fs)) = Gif.frames(b)
    assert(w == 2 && h == 2 && fs.length == 2)
    assert(fs(0).toSeq == Seq(c0, c1, c0, c1))
    // disposal-2 restored the full canvas to bg (c0), then the strip
    // drew only its NON-transparent pixel
    assert(fs(1).toSeq == Seq(c0, c0, c0, c1))
  }

  test("frames: disposal 3-7 (restore-previous / undefined) is a loud None") {
    // same hand-built stream as the disposal-2 test, with the first
    // GCE's disposal field set to 3 (0x0C = 3 << 2): the decoder keeps
    // no previous-canvas copy, so decoding as 'keep' would composite a
    // WRONG frame 2 — total-parser contract says None, never a guess.
    val b = Array.concat(
      "GIF89a".getBytes("ISO-8859-1"),
      Array[Byte](2, 0, 2, 0, 0xF0.toByte, 0, 0),
      Array[Byte](10, 10, 10, 200.toByte, 200.toByte, 200.toByte),
      Array[Byte](0x21, 0xF9.toByte, 4, 0x0C, 0, 0, 0, 0), // disposal 3
      Array[Byte](0x2C, 0, 0, 0, 0, 2, 0, 2, 0, 0),
      Array[Byte](2, 3, 0x44, 0x10, 0x05, 0),
      Array[Byte](0x3B))
    assert(Gif.frames(b).isEmpty)
  }

  test("frames: interlaced rows land at their de-interlaced positions") {
    // 1×4, y-gradient values 3,60,120,180 via a 256-gray GCT GIF with
    // the interlace flag: payload rows are written in interlace order
    // (0, 2, 1, 3), the decoder must restore 0,1,2,3.
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("ISO-8859-1"))
    out.write(Array[Byte](1, 0, 4, 0, 0xF7.toByte, 0, 0))
    (0 until 256).foreach { i => out.write(i); out.write(i); out.write(i) }
    out.write(Array[Byte](0x2C, 0, 0, 0, 0, 1, 0, 4, 0, 0x40)) // interlaced
    out.write(8) // min code size
    // 9-bit codes: CLEAR, 3, 120, 60, 180, EOI — interlace order
    val bits = new java.io.ByteArrayOutputStream()
    var acc = 0L; var n = 0
    def put(c: Int): Unit = {
      acc |= c.toLong << n; n += 9
      while (n >= 8) { bits.write((acc & 0xFF).toInt); acc >>= 8; n -= 8 }
    }
    put(256); put(3); put(120); put(60); put(180); put(257)
    if (n > 0) bits.write((acc & 0xFF).toInt)
    val payload = bits.toByteArray
    out.write(payload.length); out.write(payload); out.write(0)
    out.write(0x3B)
    val Some((_, _, fs)) = Gif.frames(out.toByteArray)
    def g(v: Int) = (v << 16) | (v << 8) | v
    assert(fs.head.toSeq == Seq(g(3), g(60), g(120), g(180)))
  }

  test("frames: corrupt inputs are total Nones, never hangs or throws") {
    assert(Gif.frames(Array[Byte](1, 2, 3)).isEmpty)
    assert(Gif.frames("GIF89a".getBytes("ISO-8859-1")).isEmpty)
    val good = graft.sources.MediaFixture.gifAnimBytes(8, 8,
      Seq((_, _) => 100))
    assert(Gif.frames(good).isDefined)
    // truncate mid-stream: loud None (no partial frame list)
    assert(Gif.frames(good.take(good.length / 2)).isEmpty)
    // flip the trailer away
    val noTrailer = good.dropRight(1)
    assert(Gif.frames(noTrailer).isEmpty)
  }

  test("gifFrameDHashes: the GIF reel pins the PNG-derived constants") {
    val bytes = graft.sources.MediaFixture.gifAnimBytes(63, 48, Seq(
      (_, _) => 0,
      (x, _) => x * 255 / 62,
      (x, _) => if (x < 28) 0 else 255,
      (x, _) => 255 - x * 255 / 62))
    assert(Multimodal.gifFrameDHashes(bytes).contains(
      Seq(0L, -1L, 0x0808080808080808L, 0L)))
  }
}
