package graft.operators

/** Spec-written animated-GIF decoder — the THIRD video container on
  * the real side of the codec boundary (raw-DIB AVI, MJPEG AVI, now
  * GIF87a/89a), written from the public CompuServe/W3C specification
  * with no ImageIO anywhere on the path (reference behavior target:
  * the k8e-fetch pipeline treats fetched media as opaque bytes; this
  * engine fingerprints them content-level).
  *
  * Covered: logical screen descriptor + global/local color tables,
  * the full variable-width LZW scheme (code widths 3..12 bits, CLEAR
  * / EOI, the KwKwK `code == next` case, deferred-clear at 4096),
  * interlaced row order, GIF89a graphic-control extensions with
  * disposal methods 0/1 (keep) and 2 (restore-to-background) and
  * transparent-index compositing. Every length/offset is treated as
  * untrusted: all walks bail to None instead of looping or throwing
  * (the MediaHeaders total-parser contract).
  */
object Gif {

  /** Decode every frame: (width, height, frames), each frame the
    * fully-composited W×H canvas as row-major 0xRRGGBB ints. None for
    * non-GIF bytes, truncated streams, or LZW data that does not
    * cleanly decode to each image's pixel count — loud, never a
    * partial frame sequence presented as complete. */
  def frames(b: Array[Byte]): Option[(Int, Int, Seq[Array[Int]])] = {
    if (b.length < 13) return None
    val hdr = new String(b, 0, 6, "ISO-8859-1")
    if (hdr != "GIF87a" && hdr != "GIF89a") return None
    def u16(o: Int) = (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
    val w = u16(6); val h = u16(8)
    if (w <= 0 || h <= 0 || w.toLong * h > 64L * 1024 * 1024) return None
    val flags = b(10) & 0xFF
    val bgIndex = b(11) & 0xFF
    var o = 13
    val gct: Array[Int] =
      if ((flags & 0x80) != 0) {
        val n = 1 << ((flags & 7) + 1)
        if (o + 3 * n > b.length) return None
        val t = readColorTable(b, o, n); o += 3 * n; t
      } else null
    val canvas = new Array[Int](w * h)
    val bgColor =
      if (gct != null && bgIndex < gct.length) gct(bgIndex) else 0
    java.util.Arrays.fill(canvas, bgColor)
    val out = Seq.newBuilder[Array[Int]]
    var nFrames = 0
    // pending graphic-control state for the NEXT image
    var transIndex = -1
    var disposal = 0
    // previous frame's disposal rectangle (for method 2)
    var prevDisposal = 0
    var prevRect: (Int, Int, Int, Int) = null
    while (o < b.length) {
      (b(o) & 0xFF) match {
        case 0x3B => // trailer
          return if (nFrames > 0) Some((w, h, out.result())) else None
        case 0x21 => // extension
          if (o + 2 > b.length) return None
          val label = b(o + 1) & 0xFF
          o += 2
          if (label == 0xF9) { // graphic control
            if (o + 6 > b.length || (b(o) & 0xFF) != 4) return None
            val f = b(o + 1) & 0xFF
            disposal = (f >> 2) & 7
            // Disposal 3 (restore-to-previous) needs a saved canvas we do
            // not keep; 4-7 are undefined by GIF89a. Decoding either as
            // "keep" would composite wrong frames and silently corrupt
            // downstream dHash verdicts — loud None, same boundary as
            // stereo ADPCM / non-16-bit PCM.
            if (disposal > 2) return None
            transIndex = if ((f & 1) != 0) b(o + 4) & 0xFF else -1
            o += 5
            if ((b(o) & 0xFF) != 0) return None
            o += 1
          } else {
            // skip any other extension's sub-blocks
            var done = false
            while (!done) {
              if (o >= b.length) return None
              val n = b(o) & 0xFF; o += 1
              if (n == 0) done = true
              else { if (o + n > b.length) return None; o += n }
            }
          }
        case 0x2C => // image descriptor
          if (o + 10 > b.length) return None
          val ix = u16(o + 1); val iy = u16(o + 3)
          val iw = u16(o + 5); val ih = u16(o + 7)
          val ifl = b(o + 9) & 0xFF
          o += 10
          if (iw <= 0 || ih <= 0 || ix + iw > w || iy + ih > h) return None
          val lct: Array[Int] =
            if ((ifl & 0x80) != 0) {
              val n = 1 << ((ifl & 7) + 1)
              if (o + 3 * n > b.length) return None
              val t = readColorTable(b, o, n); o += 3 * n; t
            } else gct
          if (lct == null) return None
          val interlaced = (ifl & 0x40) != 0
          if (o >= b.length) return None
          val minCodeSize = b(o) & 0xFF; o += 1
          if (minCodeSize < 2 || minCodeSize > 11) return None
          // collect the LZW payload from the ≤255-byte sub-blocks
          val data = new java.io.ByteArrayOutputStream()
          var done = false
          while (!done) {
            if (o >= b.length) return None
            val n = b(o) & 0xFF; o += 1
            if (n == 0) done = true
            else {
              if (o + n > b.length) return None
              data.write(b, o, n); o += n
            }
          }
          val indices = lzwDecode(minCodeSize, data.toByteArray, iw * ih)
            .getOrElse(return None)
          // disposal of the PREVIOUS frame happens before drawing this one
          if (prevDisposal == 2 && prevRect != null) {
            val (px, py, pw, ph) = prevRect
            var y = py
            while (y < py + ph) {
              var x = px
              while (x < px + pw) { canvas(y * w + x) = bgColor; x += 1 }
              y += 1
            }
          }
          val rowOrder: Array[Int] =
            if (!interlaced) Array.range(0, ih)
            else Array.range(0, ih, 8) ++ Array.range(4, ih, 8) ++
              Array.range(2, ih, 4) ++ Array.range(1, ih, 2)
          var src = 0
          var ri = 0
          while (ri < rowOrder.length) {
            val ry = rowOrder(ri)
            var x = 0
            while (x < iw) {
              val idx = indices(src); src += 1
              if (idx != transIndex) {
                if (idx >= lct.length) return None
                canvas((iy + ry) * w + (ix + x)) = lct(idx)
              }
              x += 1
            }
            ri += 1
          }
          out += canvas.clone()
          nFrames += 1
          prevDisposal = disposal
          prevRect = (ix, iy, iw, ih)
          disposal = 0; transIndex = -1
        case _ => return None
      }
    }
    None // ran off the end without a trailer: truncated
  }

  private def readColorTable(b: Array[Byte], o: Int, n: Int): Array[Int] = {
    val t = new Array[Int](n)
    var i = 0
    while (i < n) {
      t(i) = ((b(o + 3 * i) & 0xFF) << 16) |
        ((b(o + 3 * i + 1) & 0xFF) << 8) | (b(o + 3 * i + 2) & 0xFF)
      i += 1
    }
    t
  }

  /** GIF variable-width LZW decode to exactly `nPixels` indices. The
    * dictionary is prefix/suffix arrays (4096 cap, deferred clear);
    * code width starts at minCodeSize+1 and grows at 2^width up to
    * 12. None on truncation, an invalid code, or a pixel-count
    * mismatch in either direction. */
  private[operators] def lzwDecode(minCodeSize: Int, data: Array[Byte],
                                   nPixels: Int): Option[Array[Int]] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    var codeSize = minCodeSize + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    var next = eoi + 1
    val out = new Array[Int](nPixels)
    var outN = 0
    var bitPos = 0L
    val nBits = data.length.toLong * 8
    var prev = -1
    val stack = new Array[Int](4097)
    def firstChar(code0: Int): Int = {
      var c = code0
      while (c >= clear) c = prefix(c)
      c
    }
    def emit(code0: Int, extra: Int): Boolean = {
      var sp = 0
      if (extra >= 0) { stack(sp) = extra; sp += 1 }
      var c = code0
      while (c >= clear) {
        if (sp > 4096) return false // corrupt chain loop guard
        stack(sp) = suffix(c); sp += 1; c = prefix(c)
      }
      stack(sp) = c; sp += 1
      if (outN + sp > nPixels) return false
      while (sp > 0) { sp -= 1; out(outN) = stack(sp); outN += 1 }
      true
    }
    while (true) {
      if (bitPos + codeSize > nBits) return None // truncated: no EOI
      var code = 0; var i = 0
      while (i < codeSize) {
        val p = bitPos + i
        if (((data((p >> 3).toInt) >> (p & 7).toInt) & 1) != 0)
          code |= 1 << i
        i += 1
      }
      bitPos += codeSize
      if (code == clear) {
        next = eoi + 1; codeSize = minCodeSize + 1; prev = -1
      } else if (code == eoi) {
        return if (outN == nPixels) Some(out) else None
      } else if (prev == -1) {
        if (code >= clear) return None // first code must be a root
        out(outN) = code; outN += 1
        if (outN > nPixels) return None
        prev = code
      } else {
        if (code > next || code == next && next >= 4096) return None
        if (code < next) {
          if (!emit(code, -1)) return None
        } else { // KwKwK: string(prev) + firstChar(string(prev))
          if (!emit(prev, firstChar(prev))) return None
        }
        if (next < 4096) {
          prefix(next) = prev
          suffix(next) = if (code < next) firstChar(code) else firstChar(prev)
          next += 1
          if (next < 4096 && next == (1 << codeSize) && codeSize < 12)
            codeSize += 1
        }
        prev = code
      }
    }
    None
  }
}
