package graft

import graft.operators.Jpeg

/** The T.81 baseline DC decoder, tested against the JDK's ENCODER
  * (independent implementations: the JDK writes SOF0 + Annex K typical
  * tables; [[Jpeg]] decodes from the spec). */
class JpegSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def grayJpeg(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    for (y <- 0 until h; x <- 0 until w) r.setSample(x, y, 0, f(x, y) & 0xFF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  private def rgbJpeg(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = f(x, y) & 0xFF
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Per-8×8-block means of the source pattern, at the decoder's
    * grid geometry (wB×hB, padding blocks extend the edge pixels the
    * way the encoder's MCU padding does — only compared for blocks
    * fully inside the image). */
  private def blockMeans(w: Int, h: Int, f: (Int, Int) => Int,
                         bx: Int, by: Int): Int = {
    var sum = 0
    for (y <- by * 8 until by * 8 + 8; x <- bx * 8 until bx * 8 + 8)
      sum += f(math.min(x, w - 1), math.min(y, h - 1)) & 0xFF
    sum / 64
  }

  private def assertGridClose(w: Int, h: Int, f: (Int, Int) => Int,
                              got: (Int, Int, Array[Int]), tol: Int): Unit = {
    val (wB, hB, g) = got
    assert(wB >= w / 8 && hB >= h / 8, s"grid $wB x $hB for $w x $h")
    for (by <- 0 until h / 8; bx <- 0 until w / 8) {
      val want = blockMeans(w, h, f, bx, by)
      val have = g(by * wB + bx)
      assert(math.abs(want - have) <= tol,
        s"block ($bx,$by): want ~$want got $have")
    }
  }

  test("dcLuma: gray single-component JPEG reproduces per-block means") {
    val f = (x: Int, y: Int) => (x * 3 + y * 2) % 256
    val bytes = grayJpeg(144, 64, f)
    val got = Jpeg.dcLuma(bytes)
    assert(got.isDefined, "gray JFIF must decode")
    // DC is the exact block mean up to quantization (one q-step ~ 1-2
    // gray levels at the JDK's default quality) + integer truncation
    assertGridClose(144, 64, f, got.get, tol = 6)
  }

  test("dcLuma: 3-component RGB JPEG (subsampled chroma) decodes the luma plane") {
    val f = (x: Int, y: Int) => (x * 2 + y * 5) % 256
    val bytes = rgbJpeg(128, 96, f)
    val got = Jpeg.dcLuma(bytes)
    assert(got.isDefined, "RGB JFIF must decode")
    // gray-valued RGB: luma == the gray value (BT.601 weights sum to 1)
    assertGridClose(128, 96, f, got.get, tol = 8)
  }

  /** Drop every DHT segment — the MJPEG-in-AVI convention. The decode
    * must be BIT-IDENTICAL via the Annex K fallback tables, which
    * cross-checks every entry of the four hardcoded typical tables
    * against the JDK encoder's (it writes exactly those). */
  private def stripDht(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(b, 0, 2) // SOI
    var o = 2
    var done = false
    while (!done && o + 4 <= b.length) {
      val m = b(o + 1) & 0xFF
      if (m == 0xDA) { out.write(b, o, b.length - o); done = true }
      else {
        val len = ((b(o + 2) & 0xFF) << 8) | (b(o + 3) & 0xFF)
        if (m != 0xC4) out.write(b, o, 2 + len)
        o += 2 + len
      }
    }
    out.toByteArray
  }

  test("dcLuma: DHT-less scan decodes identically via the Annex K typical tables") {
    for (mk <- Seq(() => grayJpeg(144, 64, (x, y) => (x * 7 + y) % 256),
                   () => rgbJpeg(80, 48, (x, y) => (x + y * 3) % 256))) {
      val whole = mk()
      val bare = stripDht(whole)
      assert(bare.length < whole.length, "DHT was present and stripped")
      val a = Jpeg.dcLuma(whole); val b = Jpeg.dcLuma(bare)
      assert(a.isDefined && b.isDefined)
      assert(a.get._1 == b.get._1 && a.get._2 == b.get._2)
      assert(a.get._3.sameElements(b.get._3),
        "fallback tables must reproduce the explicit-table decode exactly")
    }
  }

  test("dcLuma: truncated, corrupt and unsupported inputs are None, never a hang") {
    val whole = grayJpeg(144, 64, (x, _) => x % 256)
    for (frac <- Seq(2, 3, 5, 20))
      assert(Jpeg.dcLuma(java.util.Arrays.copyOf(whole, whole.length / frac)).isEmpty,
        s"truncated 1/$frac")
    // SOF0 -> SOF2 (progressive): explicitly out of scope
    val prog = whole.clone()
    val sof = prog.indices.dropRight(1)
      .find(i => (prog(i) & 0xFF) == 0xFF && (prog(i + 1) & 0xFF) == 0xC0)
    assert(sof.isDefined)
    prog(sof.get + 1) = 0xC2.toByte
    assert(Jpeg.dcLuma(prog).isEmpty)
    // not a JPEG at all
    assert(Jpeg.dcLuma(Array[Byte](1, 2, 3)).isEmpty)
    assert(Jpeg.dcLuma(Array.empty[Byte]).isEmpty)
    // forged segment length running past the buffer
    val forged = whole.clone()
    forged(4) = 0x7F.toByte; forged(5) = 0xFF.toByte // APP0 length -> huge
    assert(Jpeg.dcLuma(forged).isEmpty)
  }

  test("jpegDcDHash64: DC-grid hash matches the pixel-domain hand derivation") {
    import graft.operators.Multimodal
    // the fixture patterns' derivation (MediaFixture.mjpegPatterns):
    // flat -> 0, strong ramp -> -1, block-aligned split -> 0x0808...
    assert(Multimodal.jpegDcDHash64(grayJpeg(144, 64, (_, _) => 128)).contains(0L))
    assert(Multimodal.jpegDcDHash64(grayJpeg(144, 64, (x, _) => x * 255 / 143)).contains(-1L))
    assert(Multimodal.jpegDcDHash64(
      grayJpeg(144, 64, (x, _) => if (x < 64) 0 else 255))
      .contains(0x0808080808080808L))
    assert(Multimodal.jpegDcDHash64(
      grayJpeg(144, 64, (x, _) => 255 - x * 255 / 143)).contains(0L))
  }
}
