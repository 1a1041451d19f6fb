package graft.operators

/** MPEG-1 Audio Layer I decoder (ISO/IEC 11172-3) — the most common
  * lossy-audio family a crawl corpus carries, opened here to the same
  * depth the spec's STRUCTURE allows from-spec-by-hand work to go:
  *
  *  - frame-header walk: 12-bit syncword, version/layer/protection
  *    fields, the Layer I bitrate table (32..448 kbps), the MPEG-1
  *    sample-rate table, padding — every frame re-validated, slot
  *    arithmetic in Long, non-advance bails (total parser);
  *  - 4-bit bit allocation per subband (Layer I is UNIFORM: code a in
  *    1..14 means nb = a+1 sample bits, 15 is forbidden — no lookup
  *    table exists for Layer I, which is what makes it fully
  *    structural);
  *  - 6-bit scalefactor indices into Table B.1, whose values ARE
  *    closed-form: sf(i) = 2·2^(−i/3) (index 0 = 2.0, each step one
  *    third of an octave down; index 63 forbidden);
  *  - (2^nb − 1)-level midtread requantization: the bitstream code c
  *    (MSB-inverted offset binary, all-ones forbidden) decodes to
  *    s'' = (2^nb/(2^nb − 1)) · (s''' + 2^(1−nb)) with
  *    s''' = (c − 2^(nb−1))/2^(nb−1) — evaluated here in the exact
  *    integer form s'' = (2c + 2 − 2^nb)/(2^nb − 1), so the decode is
  *    one integer expression and one IEEE division per sample.
  *
  * BOUNDARY (named, not silent): the output is the CRITICALLY SAMPLED
  * SUBBAND-DOMAIN signal — per frame, 12 granules × 32 requantized,
  * scalefactored subband values in time-major order — not windowed
  * PCM. The last synthesis step (matrixing by cos((16+i)(2k+1)π/64),
  * which IS closed-form, then windowing by the 512-tap prototype of
  * Table B.3) needs Table B.3's tabulated coefficients: spec DATA
  * with no derivation, which this repo's from-spec-by-hand rule does
  * not fake. The same boundary class covers Layer II (Table B.2
  * allocation tables) and Layer III (Huffman code tables + IMDCT
  * window data) — see [[Multimodal.audioFingerprint64]]'s boundary
  * note. For the energy-delta fingerprint the missing step is
  * immaterial: the polyphase filterbank is power-complementary, so a
  * window's subband-domain energy equals its PCM energy up to filter
  * leakage, and the fixtures derive their pinned constants with a
  * full order-of-magnitude envelope margin
  * ([[graft.sources.MediaFixture]]).
  *
  * Mono only (single-channel bitstream layout); stereo modes return
  * None loudly — the IMA-ADPCM precedent: a wrong channel interleave
  * must never decode plausibly. Protected frames (CRC) return None
  * rather than skipping an unverified CRC. */
object Mpeg {

  /** Layer I bitrates (kbps), ISO 11172-3: index 1..14; 0 = free
    * (unsupported here — frame length would be undefined), 15 = bad. */
  private val BitrateL1 =
    Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
  private val RateV1 = Array(44100, 48000, 32000)

  private def u8(b: Array[Byte], o: Int): Int = b(o) & 0xFF

  private final class BitR(b: Array[Byte], startBit: Long) {
    private var pos = startBit
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val byte = (pos >> 3).toInt
        val bit = 7 - (pos & 7).toInt
        v = (v << 1) | ((b(byte) >> bit) & 1)
        pos += 1
        i += 1
      }
      v
    }
  }

  /** Decode a whole mono MPEG-1 Layer I stream to the subband-domain
    * sample stream: (rate, channels = 1, values), where `values` holds
    * 12·32 ints per frame (granule-major: for t in 0..11, subbands
    * 0..31), each round(sf · s'' · 16384) — the 16-bit-ish fixed-point
    * scale the fingerprint's integer energy sums expect. An optional
    * leading ID3v2 tag is skipped (same syncsafe arithmetic as
    * [[MediaHeaders.mp3]]). None for anything that is not a clean
    * mono MPEG-1 Layer I unprotected stream: wrong sync, MPEG-2,
    * Layers II/III, CRC-protected frames, stereo modes, free-format
    * bitrate (index 0 — frame length is encoder-defined, so framing
    * would be a guess), forbidden bitrate/rate/allocation/scalefactor
    * codes, the forbidden all-ones sample code, rate changes
    * mid-stream, or trailing bytes. */
  def layer1SubbandPcm(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    var o = 0L
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' &&
        bytes(2) == '3') {
      val size = (u8(bytes, 6) << 21) | (u8(bytes, 7) << 14) |
        (u8(bytes, 8) << 7) | u8(bytes, 9)
      o = 10L + size
    }
    if (o + 4 > bytes.length) return None
    val out = new java.util.ArrayList[Int]()
    var rate = -1
    while (o < bytes.length) {
      val p = o.toInt
      if (o + 4 > bytes.length) return None
      val b1 = u8(bytes, p); val b2 = u8(bytes, p + 1)
      val b3 = u8(bytes, p + 2); val b4 = u8(bytes, p + 3)
      if (b1 != 0xFF || (b2 & 0xE0) != 0xE0) return None
      if (((b2 >> 3) & 0x3) != 3) return None // MPEG-1 only
      if (((b2 >> 1) & 0x3) != 3) return None // Layer I only
      if ((b2 & 0x1) != 1) return None // protected (CRC) unsupported
      val brIdx = (b3 >> 4) & 0xF
      val srIdx = (b3 >> 2) & 0x3
      if (brIdx <= 0 || brIdx >= 15 || srIdx == 3) return None
      val thisRate = RateV1(srIdx)
      if (rate == -1) rate = thisRate
      else if (rate != thisRate) return None
      if (((b4 >> 6) & 0x3) != 3) return None // mono only
      val padding = (b3 >> 1) & 0x1
      // Layer I slots are 4 bytes: frame = (12·bitrate/rate + pad)·4
      val frameLen = (12L * (BitrateL1(brIdx) * 1000L) / rate + padding) * 4
      if (frameLen <= 4 || o + frameLen > bytes.length) return None
      val r = new BitR(bytes, (o + 4) * 8)
      val frameBits = (frameLen - 4) * 8
      var used = 0L
      // bit allocation: 32 × 4 bits
      val alloc = new Array[Int](32)
      if (frameBits < 128) return None
      var sb = 0
      while (sb < 32) {
        alloc(sb) = r.bits(4)
        if (alloc(sb) == 15) return None // forbidden code
        sb += 1
      }
      used += 128
      // scalefactors: 6 bits per allocated subband, Table B.1 closed
      // form sf(i) = 2·2^(−i/3); index 63 forbidden
      val sf = new Array[Double](32)
      sb = 0
      while (sb < 32) {
        if (alloc(sb) != 0) {
          if (used + 6 > frameBits) return None
          val i = r.bits(6)
          if (i == 63) return None
          sf(sb) = 2.0 * math.pow(2.0, -i / 3.0)
          used += 6
        }
        sb += 1
      }
      // samples: 12 granules × one nb-bit code per allocated subband
      var t = 0
      while (t < 12) {
        sb = 0
        while (sb < 32) {
          if (alloc(sb) == 0) out.add(0)
          else {
            val nb = alloc(sb) + 1
            if (used + nb > frameBits) return None
            val c = r.bits(nb)
            val full = (1 << nb) - 1
            if (c == full) return None // forbidden all-ones code
            // s'' = (2c + 2 − 2^nb)/(2^nb − 1), s = sf · s''
            val s = sf(sb) * (2.0 * c + 2.0 - (1 << nb)) / full
            out.add(math.round(s * 16384.0).toInt)
            used += nb
          }
          sb += 1
        }
        t += 1
      }
      // remaining frame bits are ancillary data (spec-legal)
      o += frameLen
    }
    if (out.isEmpty) None
    else {
      val arr = new Array[Int](out.size)
      var i = 0
      while (i < arr.length) { arr(i) = out.get(i); i += 1 }
      Some((rate, 1, arr))
    }
  }
}
