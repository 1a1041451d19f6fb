package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}

/** DTMF (touch-tone) digit decoding by the Goertzel algorithm — the
  * classic telephony signal-processing kernel (ITU-T Q.23/Q.24
  * frequency plan; Goertzel 1958), here as a corpus-scale audio
  * CONTENT extractor: given WAV blobs, emit the dialed digit string
  * per recording. This is the audio twin of OCR-ish text extraction —
  * a deterministic, spec-defined decode from raw samples to symbols,
  * exercising the real PCM path end-to-end ([[Multimodal]]'s
  * fingerprints compare envelopes; this one demodulates content).
  *
  * Detection is deliberately margin-based and integer-friendly so the
  * SYMBOL output is robustly deterministic even though Goertzel runs
  * in doubles (cos/sin are not IEEE-reproducible across platforms):
  * a frame maps to a key only when the best row and column energies
  * dominate every sibling bin by 8× — pure DTMF frames clear that by
  * >30× (rectangular-window leakage at the 39 Hz bin spacing is
  * ≤ 3%), and a last-ulp wobble cannot cross a 8× power ratio. The
  * oracle therefore pins the DIALED STRING, which the fixture chose
  * by hand — end-to-end honest: encode digits, decode digits.
  *
  * Scale shape: decode is map-side per blob (one pass over samples,
  * 8 Goertzel accumulators per 205-sample frame); only (id, digits)
  * rows leave the scan — audio bytes never shuffle. */
object Dtmf {

  /** ITU-T Q.23 low (row) and high (column) group frequencies. */
  private val RowFreqs = Array(697.0, 770.0, 852.0, 941.0)
  private val ColFreqs = Array(1209.0, 1336.0, 1477.0, 1633.0)
  private val Keys = Array(
    "1", "2", "3", "A",
    "4", "5", "6", "B",
    "7", "8", "9", "C",
    "*", "0", "#", "D")

  /** Goertzel energy of frequency `f` over samples[off, off+n):
    * |X(f)|² via the standard two-pole recurrence — O(n) per bin,
    * no FFT, no allocation. */
  private[operators] def goertzel(samples: Array[Int], off: Int, n: Int,
                                  f: Double, rate: Double): Double = {
    val coeff = 2.0 * math.cos(2.0 * math.Pi * f / rate)
    var s1 = 0.0; var s2 = 0.0
    var i = 0
    while (i < n) {
      val s0 = samples(off + i) + coeff * s1 - s2
      s2 = s1; s1 = s0; i += 1
    }
    s1 * s1 + s2 * s2 - coeff * s1 * s2
  }

  /** Decode the dialed string from mono PCM samples: 205-sample frames
    * (the classic DTMF block at 8 kHz, scaled for other rates) at a
    * 50% hop, each classified to a key iff its best row/column bins
    * dominate every sibling by `margin`× in power; a key is emitted
    * once per run of ≥ `minFrames` consecutive same-key frames, runs
    * broken by silence or invalid frames. Returns "" for all-silence
    * input.
    *
    * Minimum tone duration (named, not implied): `minFrames` fully-
    * contained frames at 50% hop span (minFrames+1)/2 frame lengths,
    * plus up to one hop of alignment slack — at 8 kHz/minFrames=3
    * that is ~51 ms aligned, ~64 ms worst-case. ITU-T Q.24 spec-
    * minimum 40 ms digits therefore still need `minFrames = 2`
    * (~38 ms aligned); the default favors the Q.24 RECOMMENDED
    * ≥ 65 ms signaling over edge-of-spec bursts. The pre-overlap
    * decoder needed ~77-103 ms — 50% hop halves the floor without
    * changing any clean-fixture output (emission is once per run). */
  def decode(samples: Array[Int], rate: Int = 8000, margin: Double = 8.0,
             minFrames: Int = 3): String = {
    val frameN = math.max(1, 205 * rate / 8000)
    val hop = math.max(1, frameN / 2)
    val sb = new StringBuilder
    var runKey = -1; var runLen = 0; var emitted = false
    def endRun(): Unit = { runKey = -1; runLen = 0; emitted = false }
    var off = 0
    while (off + frameN <= samples.length) {
      var energy = 0L
      var i = 0
      while (i < frameN) {
        val s = samples(off + i).toLong; energy += s * s; i += 1
      }
      var key = -1
      if (energy > frameN.toLong * 100) { // not silence
        val er = RowFreqs.map(goertzel(samples, off, frameN, _, rate))
        val ec = ColFreqs.map(goertzel(samples, off, frameN, _, rate))
        val br = er.indices.maxBy(er(_)); val bc = ec.indices.maxBy(ec(_))
        val rowOk = er.indices.forall(j => j == br || er(br) >= margin * er(j))
        val colOk = ec.indices.forall(j => j == bc || ec(bc) >= margin * ec(j))
        if (rowOk && colOk) key = br * 4 + bc
      }
      if (key != -1 && key == runKey) {
        runLen += 1
        if (runLen >= minFrames && !emitted) { sb ++= Keys(key); emitted = true }
      } else if (key != -1) { runKey = key; runLen = 1; emitted = false }
      else endRun()
      off += hop
    }
    sb.result()
  }

  /** Blob-level decode: 16-bit PCM WAV/AIFF via javax.sound, channels
    * mixed, then [[decode]]. None for undecodable or non-16-bit
    * input (loud, never an empty-string guess). */
  def dtmfDigits(content: Array[Byte]): Option[String] = {
    import javax.sound.sampled._
    try {
      val ais = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(content))
      val fmt = ais.getFormat
      if (fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
          fmt.getSampleSizeInBits != 16) return None
      val ch = fmt.getChannels
      val bytes = ais.readAllBytes()
      val n = bytes.length / (2 * ch)
      val big = fmt.isBigEndian
      val mono = new Array[Int](n)
      var i = 0
      while (i < n) {
        var s = 0; var c = 0
        while (c < ch) {
          val o = (i * ch + c) * 2
          val v = if (big) ((bytes(o) << 8) | (bytes(o + 1) & 0xFF)).toShort
                  else ((bytes(o + 1) << 8) | (bytes(o) & 0xFF)).toShort
          s += v; c += 1
        }
        mono(i) = s / ch; i += 1
      }
      Some(decode(mono, fmt.getSampleRate.toInt))
    } catch { case _: Exception => None }
  }

  /** Batched demodulation for audio blobs → (media_id, digits);
    * undecodable blobs drop here, countable by anti-join (the
    * [[Multimodal.imageDHashes]] contract). */
  def audioDtmf(blobs: Dataset[Multimodal.MediaBlob]): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.mapPartitions { it =>
      it.flatMap { b =>
        if (Set("wav", "wave", "aiff", "aif")(b.kind.toLowerCase))
          dtmfDigits(b.content).map(d => (b.media_id, d))
        else None
      }
    }.toDF("media_id", "digits")
  }
}
