package graft.operators

/** FLAC decoder written from the public format spec (RFC 9639 /
  * xiph.org "format" document): metadata-block walk, frame-header
  * parse, CONSTANT / VERBATIM / FIXED / LPC subframes, rice-coded
  * residual partitions (both 4- and 5-bit parameter widths, escape
  * partitions), wasted bits, and the three stereo decorrelation modes.
  *
  * The second COMPRESSED codec on the real side of the no-codec
  * boundary, and the stronger kind: FLAC is LOSSLESS, so the decoded
  * PCM is bit-identical to the encoder's input and every downstream
  * fingerprint ([[Multimodal.audioFingerprint64]]'s energy-delta
  * bits) matches the same samples' WAV fingerprint EXACTLY — the
  * pinned-constant oracle scheme needs no tolerance at all.
  *
  * Scope: the streamable subset every real encoder emits (fixed
  * predictors and LPC up to order 32, 4-32 bit samples, up to 8
  * channels). Frame CRCs are parsed over but not verified — the
  * decode itself fails loudly on any structural corruption, which is
  * the contract fingerprint jobs need (one bad blob → None, never a
  * hang, never a crash; the MediaHeaders corrupt-u32 lesson).
  *
  * Every read is bounds-checked through the bit reader; any overrun,
  * reserved code, or malformed structure surfaces as None via the
  * catch-all in [[pcm]].
  */
object Flac {

  /** Decode a whole FLAC stream: (sampleRate, channels, interleaved
    * samples). None for non-FLAC/corrupt/truncated input. */
  def pcm(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] =
    try decode(bytes) catch { case _: Exception => None }

  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var buf = 0; private var cnt = 0
    def bitPosAligned: Boolean = cnt == 0
    def nextBit(): Int = {
      if (cnt == 0) {
        if (pos >= b.length) throw new IllegalStateException("truncated")
        buf = b(pos) & 0xFF; pos += 1; cnt = 8
      }
      cnt -= 1
      (buf >> cnt) & 1
    }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
    def bitsLong(n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
    def signedBits(n: Int): Int = {
      if (n == 0) return 0
      val v = bits(n)
      if (n == 32) v // already a full two's-complement Int
      else if ((v & (1 << (n - 1))) != 0) v - (1 << n)
      else v
    }
    /** Unary: number of 0 bits before the terminating 1. */
    def unary(): Int = {
      var n = 0
      while (nextBit() == 0) {
        n += 1
        if (n > (1 << 24)) throw new IllegalStateException("runaway unary")
      }
      n
    }
    def align(): Unit = cnt = 0
  }

  private def u24be(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xFF) << 16) | ((b(o + 1) & 0xFF) << 8) | (b(o + 2) & 0xFF)

  private def decode(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (b.length < 42 || b(0) != 'f' || b(1) != 'L' || b(2) != 'a' ||
        b(3) != 'C') return None
    // metadata blocks; STREAMINFO is mandatory and first
    var o = 4
    var sampleRate = 0; var channels = 0; var bps = 0; var total = 0L
    var sawStreamInfo = false
    var last = false
    while (!last) {
      if (o + 4 > b.length) return None
      last = (b(o) & 0x80) != 0
      val typ = b(o) & 0x7F
      val len = u24be(b, o + 1)
      if (o + 4 + len > b.length) return None
      if (typ == 0) { // STREAMINFO: 34 bytes
        if (len < 34) return None
        val r = new BitReader(b, o + 4)
        r.bits(16); r.bits(16) // min/max block size
        r.bits(24); r.bits(24) // min/max frame size
        sampleRate = r.bits(20)
        channels = r.bits(3) + 1
        bps = r.bits(5) + 1
        total = r.bitsLong(36)
        sawStreamInfo = true
      }
      o += 4 + len
    }
    if (!sawStreamInfo || sampleRate <= 0 || channels < 1 || channels > 8 ||
        bps < 4 || bps > 32) return None
    // a forged 36-bit total must not pre-allocate GBs
    if (total > (1L << 31) / math.max(1, channels)) return None
    val out =
      if (total > 0) new java.util.ArrayList[Array[Int]]((total / 4096 + 2).toInt)
      else new java.util.ArrayList[Array[Int]]()
    var decoded = 0L
    val r = new BitReader(b, o)
    while (r.pos < b.length && (total == 0 || decoded < total)) {
      val block = decodeFrame(r, sampleRate, channels, bps)
      out.add(block)
      decoded += block.length / channels
    }
    if (total > 0 && decoded < total) return None
    var n = 0
    val it0 = out.iterator()
    while (it0.hasNext) n += it0.next().length
    val all = new Array[Int](n)
    var w = 0
    val it = out.iterator()
    while (it.hasNext) {
      val blk = it.next()
      System.arraycopy(blk, 0, all, w, blk.length); w += blk.length
    }
    Some((sampleRate, channels, all))
  }

  /** One frame → interleaved samples (blockSize·channels). */
  private def decodeFrame(r: BitReader, siRate: Int, siChannels: Int,
                          siBps: Int): Array[Int] = {
    require(r.bitPosAligned, "frame must start byte-aligned")
    if (r.bits(14) != 0x3FFE) throw new IllegalStateException("bad sync")
    r.nextBit() // reserved
    r.nextBit() // blocking strategy
    val bsCode = r.bits(4)
    val srCode = r.bits(4)
    val chAssign = r.bits(4)
    val ssCode = r.bits(3)
    r.nextBit() // reserved
    // UTF-8-style coded frame/sample number: skip (leading-ones count)
    val first = r.bits(8)
    var extra = 0
    var m = first
    while ((m & 0x80) != 0) { extra += 1; m <<= 1 }
    // up to 7 leading ones: sample numbers span 36 bits (7-byte form)
    if (extra == 1 || extra > 7) throw new IllegalStateException("bad number")
    var i = 0
    while (i < math.max(0, extra - 1)) { r.bits(8); i += 1 }
    val blockSize = bsCode match {
      case 0 => throw new IllegalStateException("reserved block size")
      case 1 => 192
      case n if n >= 2 && n <= 5 => 576 << (n - 2)
      case 6 => r.bits(8) + 1
      case 7 => r.bits(16) + 1
      case n => 256 << (n - 8)
    }
    srCode match { // values unused (STREAMINFO governs); consume operands
      case 12 => r.bits(8)
      case 13 | 14 => r.bits(16)
      case 15 => throw new IllegalStateException("invalid sample rate code")
      case _ =>
    }
    val bps = ssCode match {
      case 0 => siBps
      case 1 => 8
      case 2 => 12
      case 4 => 16
      case 5 => 20
      case 6 => 24
      case 7 => 32
      case _ => throw new IllegalStateException("reserved sample size")
    }
    r.bits(8) // header CRC-8 (parsed over, not verified)
    val (nCh, sideIdx) = chAssign match {
      case a if a <= 7 => (a + 1, -1)
      case 8 => (2, 1)  // left/side
      case 9 => (2, 0)  // right/side
      case 10 => (2, 1) // mid/side
      case _ => throw new IllegalStateException("reserved channel assignment")
    }
    if (chAssign <= 7 && nCh != siChannels)
      throw new IllegalStateException("channel count mismatch")
    val chans = Array.tabulate(nCh) { c =>
      decodeSubframe(r, blockSize, bps + (if (c == sideIdx) 1 else 0))
    }
    r.align()
    r.bits(16) // frame CRC-16 (parsed over, not verified)
    // undo stereo decorrelation
    val out = new Array[Int](blockSize * nCh)
    var s = 0
    while (s < blockSize) {
      chAssign match {
        case 8 => // left/side: right = left - side
          out(2 * s) = chans(0)(s)
          out(2 * s + 1) = chans(0)(s) - chans(1)(s)
        case 9 => // right/side: left = side + right
          out(2 * s) = chans(0)(s) + chans(1)(s)
          out(2 * s + 1) = chans(1)(s)
        case 10 => // mid/side
          val mid = chans(0)(s); val side = chans(1)(s)
          val lr = (mid << 1) | (side & 1)
          out(2 * s) = (lr + side) >> 1
          out(2 * s + 1) = (lr - side) >> 1
        case _ =>
          var c = 0
          while (c < nCh) { out(s * nCh + c) = chans(c)(s); c += 1 }
      }
      s += 1
    }
    out
  }

  private def decodeSubframe(r: BitReader, blockSize: Int, bps0: Int)
      : Array[Int] = {
    if (r.nextBit() != 0) throw new IllegalStateException("subframe pad bit")
    val typ = r.bits(6)
    val wasted = if (r.nextBit() == 1) r.unary() + 1 else 0
    val bps = bps0 - wasted
    if (bps <= 0 || bps > 32) throw new IllegalStateException("bad subframe bps")
    val out = new Array[Int](blockSize)
    typ match {
      case 0 => // CONSTANT
        val v = r.signedBits(bps)
        java.util.Arrays.fill(out, v)
      case 1 => // VERBATIM
        var i = 0
        while (i < blockSize) { out(i) = r.signedBits(bps); i += 1 }
      case t if (t & 0x38) == 0x08 && (t & 0x07) <= 4 => // FIXED order 0-4
        val order = t & 0x07
        var i = 0
        while (i < order) { out(i) = r.signedBits(bps); i += 1 }
        val res = residual(r, blockSize, order)
        i = order
        while (i < blockSize) {
          val p = order match {
            case 0 => 0L
            case 1 => out(i - 1).toLong
            case 2 => 2L * out(i - 1) - out(i - 2)
            case 3 => 3L * out(i - 1) - 3L * out(i - 2) + out(i - 3)
            case _ => 4L * out(i - 1) - 6L * out(i - 2) +
              4L * out(i - 3) - out(i - 4)
          }
          out(i) = (p + res(i - order)).toInt
          i += 1
        }
      case t if (t & 0x20) != 0 => // LPC, order 1-32
        val order = (t & 0x1F) + 1
        var i = 0
        while (i < order) { out(i) = r.signedBits(bps); i += 1 }
        val precision = r.bits(4) + 1
        if (precision == 16) throw new IllegalStateException("invalid qlp precision")
        val shift = r.signedBits(5)
        if (shift < 0) throw new IllegalStateException("negative qlp shift")
        val coef = Array.fill(order)(r.signedBits(precision))
        val res = residual(r, blockSize, order)
        i = order
        while (i < blockSize) {
          var acc = 0L
          var j = 0
          while (j < order) { acc += coef(j).toLong * out(i - 1 - j); j += 1 }
          out(i) = ((acc >> shift) + res(i - order)).toInt
          i += 1
        }
      case _ => throw new IllegalStateException("reserved subframe type")
    }
    if (wasted > 0) {
      var i = 0
      while (i < blockSize) { out(i) = out(i) << wasted; i += 1 }
    }
    out
  }

  /** Rice-coded residual: 2-bit method selects 4- or 5-bit parameters,
    * 4-bit partition order, 2^order partitions (the first shortened by
    * the predictor order), escape parameter = raw n-bit samples. */
  private def residual(r: BitReader, blockSize: Int, order: Int): Array[Int] = {
    val method = r.bits(2)
    if (method > 1) throw new IllegalStateException("reserved residual method")
    val pBits = if (method == 0) 4 else 5
    val escape = (1 << pBits) - 1
    val partOrder = r.bits(4)
    val nParts = 1 << partOrder
    if ((blockSize & (nParts - 1)) != 0)
      throw new IllegalStateException("block size not divisible by partitions")
    val perPart = blockSize >> partOrder
    if (perPart <= order && nParts == 1)
      throw new IllegalStateException("partition shorter than predictor order")
    val out = new Array[Int](blockSize - order)
    var w = 0
    var p = 0
    while (p < nParts) {
      val count = if (p == 0) perPart - order else perPart
      if (count < 0) throw new IllegalStateException("negative partition length")
      val param = r.bits(pBits)
      if (param == escape) {
        val raw = r.bits(5)
        var i = 0
        while (i < count) { out(w) = r.signedBits(raw); w += 1; i += 1 }
      } else {
        var i = 0
        while (i < count) {
          val q = r.unary()
          val v = (q.toLong << param) | r.bits(param).toLong
          // zigzag: even → v/2, odd → -(v+1)/2
          out(w) = (((v >>> 1) ^ -(v & 1L))).toInt
          w += 1; i += 1
        }
      }
      p += 1
    }
    out
  }
}
