package graft

import graft.operators.Flac

/** The RFC 9639 FLAC decoder against the fixture encoder (independent
  * subset implementations) and against hand-computed spec arithmetic
  * for the paths the encoder does not emit (LPC, stereo modes). */
class FlacSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def enc(samples: Array[Short]): Array[Byte] =
    graft.sources.MediaFixture.flacBytesPcm(samples)

  test("lossless roundtrip: decoded PCM is bit-identical to the input") {
    val patterns = Seq[Int => Short](
      i => 1000,
      i => ((i % 200) * 30 - 3000).toShort,
      i => (if ((i / 100) % 2 == 0) 100 else 2000).toShort,
      i => (((i * 2654435761L) >>> 17) & 0xFFFF).toShort, // incompressible
      i => Short.MinValue, // extreme constants
      i => Short.MaxValue)
    for ((p, k) <- patterns.zipWithIndex; n <- Seq(65, 4096, 6500, 8193)) {
      val src = Array.tabulate(n)(p)
      val decoded = Flac.pcm(enc(src))
      assert(decoded.isDefined, s"pattern $k n=$n")
      val (rate, ch, pcm) = decoded.get
      assert(rate == 8000 && ch == 1)
      assert(pcm.length == n, s"pattern $k n=$n: got ${pcm.length}")
      assert(pcm.zip(src).forall { case (a, b) => a == b.toInt },
        s"pattern $k n=$n: lossless means BIT-identical")
    }
  }

  test("truncated and corrupt streams are None, never a hang or crash") {
    val whole = enc(Array.tabulate(6500)(i => ((i % 100) * 11).toShort))
    for (frac <- Seq(2, 3, 5, 50))
      assert(Flac.pcm(java.util.Arrays.copyOf(whole, whole.length / frac)).isEmpty,
        s"truncated 1/$frac")
    assert(Flac.pcm(Array[Byte]('f', 'L', 'a', 'C')).isEmpty)
    assert(Flac.pcm(Array.empty[Byte]).isEmpty)
    assert(Flac.pcm("RIFFxxxxWAVE".getBytes("ISO-8859-1")).isEmpty)
    // corrupt one byte of entropy-coded data: the decode must either
    // fail structurally or produce different samples — never silently
    // return the original (the byte IS part of the coded signal)
    val bad = whole.clone()
    bad(60) = 0x00 // inside the first frame's residual region
    // compare VALUES (tuple equality on Array is by reference)
    assert(Flac.pcm(bad).map(_._3.toSeq) != Flac.pcm(whole).map(_._3.toSeq))
  }

  // ---- hand-built streams for paths the fixture encoder never emits --

  private final class BitW {
    val bos = new java.io.ByteArrayOutputStream()
    private var buf = 0; private var cnt = 0
    def bit(v: Int): Unit = {
      buf = (buf << 1) | (v & 1); cnt += 1
      if (cnt == 8) { bos.write(buf); buf = 0; cnt = 0 }
    }
    def bits(v: Long, n: Int): Unit = {
      var i = n - 1; while (i >= 0) { bit(((v >> i) & 1L).toInt); i -= 1 }
    }
    def align(): Unit = while (cnt != 0) bit(0)
    def bytes: Array[Byte] = { align(); bos.toByteArray }
  }

  /** STREAMINFO for mono 16-bit, n total samples. */
  private def streamInfo(n: Int): Array[Byte] = {
    val w = new BitW
    w.bits(192, 16); w.bits(192, 16); w.bits(0, 24); w.bits(0, 24)
    w.bits(8000, 20); w.bits(0, 3); w.bits(15, 5); w.bits(n.toLong, 36)
    "fLaC".getBytes("ISO-8859-1") ++ Array[Byte](0x80.toByte, 0, 0, 34) ++
      w.bytes ++ new Array[Byte](16)
  }

  /** Frame header for block size 192 (code 0001), mono 16-bit, frame 0
    * — CRC-8 intentionally 0 (the decoder parses over CRCs). */
  private def frameHeader(w: BitW, chAssign: Int = 0): Unit = {
    w.bits(0x3FFE, 14); w.bit(0); w.bit(0)
    w.bits(1, 4)  // block size 192
    w.bits(0, 4)  // rate from STREAMINFO
    w.bits(chAssign, 4)
    w.bits(4, 3)  // 16 bit
    w.bit(0)
    w.bits(0, 8)  // frame number 0
    w.bits(0, 8)  // CRC-8 (unverified)
  }

  test("LPC subframe: decode matches the hand-computed shift-predictor recurrence") {
    // order-2 LPC with coef = [3, -1], shift = 1:
    //   s[i] = ((3*s[i-1] - 1*s[i-2]) >> 1) + r[i]
    // warmup [100, 110], residuals all 2 (rice p=2: z=4 -> q=1,rem=0)
    val w = new BitW
    frameHeader(w)
    w.bit(0); w.bits(0x20 | 1, 6); w.bit(0) // LPC order 2 (code 1ooooo, o=order-1)
    w.bits(100, 16); w.bits(110, 16)        // warmup
    w.bits(11, 4)  // qlp precision 12 (code = precision-1)
    w.bits(1, 5)   // shift 1
    w.bits(3 & 0xFFF, 12); w.bits(-1 & 0xFFF, 12) // coefficients
    w.bits(0, 2); w.bits(0, 4); w.bits(2, 4)      // rice method 0, 1 partition, p=2
    for (_ <- 0 until 190) { w.bit(0); w.bit(1); w.bits(0, 2) } // z=4 each
    w.align(); w.bits(0, 16) // frame CRC (unverified)
    val bytes = streamInfo(192) ++ w.bytes
    val got = Flac.pcm(bytes)
    assert(got.isDefined, "hand-built LPC stream must decode")
    val pcm = got.get._3
    val exp = new Array[Int](192)
    exp(0) = 100; exp(1) = 110
    for (i <- 2 until 192)
      exp(i) = ((3 * exp(i - 1) - exp(i - 2)) >> 1) + 2
    assert(pcm.sameElements(exp), "LPC shift-predictor recurrence (RFC 9639)")
  }

  test("stereo decorrelation: left/side, right/side, mid/side reconstruct exactly") {
    // two CONSTANT subframes per mode; side channels carry bps+1 bits
    def mk(chAssign: Int, c1: Int, c2: Int, side: Int): Array[Byte] = {
      val w = new BitW
      frameHeader(w, chAssign)
      for ((v, isSide) <- Seq((c1, side == 0), (c2, side == 1))) {
        w.bit(0); w.bits(0, 6); w.bit(0) // CONSTANT
        w.bits(v.toLong & 0x1FFFF, if (isSide) 17 else 16)
      }
      w.align(); w.bits(0, 16)
      // stereo STREAMINFO: channels-1 = 1
      val si = new BitW
      si.bits(192, 16); si.bits(192, 16); si.bits(0, 24); si.bits(0, 24)
      si.bits(8000, 20); si.bits(1, 3); si.bits(15, 5); si.bits(192L, 36)
      "fLaC".getBytes("ISO-8859-1") ++ Array[Byte](0x80.toByte, 0, 0, 34) ++
        si.bytes ++ new Array[Byte](16) ++ w.bytes
    }
    // left/side (8): left=500, side=300 -> right=200
    val ls = Flac.pcm(mk(8, 500, 300, side = 1)).get
    assert(ls._2 == 2 && ls._3(0) == 500 && ls._3(1) == 200)
    // right/side (9): side=300, right=200 -> left=500
    val rs = Flac.pcm(mk(9, 300, 200, side = 0)).get
    assert(rs._3(0) == 500 && rs._3(1) == 200)
    // mid/side (10): l=501, r=200 -> mid=(501+200)>>1=350, side=301
    val ms = Flac.pcm(mk(10, 350, 301, side = 1)).get
    assert(ms._3(0) == 501 && ms._3(1) == 200,
      s"mid/side: got ${ms._3(0)}, ${ms._3(1)}")
  }

  test("audioFingerprint64: FLAC equals the SAME envelope's WAV constants") {
    import graft.operators.Multimodal
    val dir = graft.sources.MediaFixture.ensureFlacFp()
    val expect = Map("flat_tone.flac" -> 0L, "ramp.flac" -> -1L,
      "step.flac" -> (1L << 31), "two_step.flac" -> ((1L << 20) | (1L << 42)))
    for ((name, fp) <- expect) {
      val bytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, name))
      assert(Multimodal.audioFingerprint64(bytes).contains(fp), name)
    }
  }
}
