package graft.operators

import graft.SparkSpec
import graft.sources.MediaFixture

class DtmfSpec extends SparkSpec {

  private def tonePair(fr: Double, fc: Double, n: Int,
                       amp: Int = 5000): Array[Int] =
    Array.tabulate(n) { i =>
      val t = i / 8000.0
      (amp * math.sin(2 * math.Pi * fr * t) +
        amp * math.sin(2 * math.Pi * fc * t)).toInt
    }

  test("goertzel: on-probe tone dominates off-probe bins by far") {
    val s = tonePair(770.0, 1336.0, 205)
    val on = Dtmf.goertzel(s, 0, 205, 770.0, 8000)
    val off = Dtmf.goertzel(s, 0, 205, 852.0, 8000)
    assert(on > 30 * off, s"margin ${on / off} should exceed 30x")
  }

  test("decode: repeated digit separated by silence emits twice") {
    val gap = Array.fill(1200)(0)
    val five = tonePair(770.0, 1336.0, 1600)
    val s = gap ++ five ++ gap ++ five ++ gap
    assert(Dtmf.decode(s) == "55")
  }

  test("decode: one long tone emits once; silence decodes empty") {
    val s = Array.fill(1200)(0) ++ tonePair(697.0, 1209.0, 6400) ++
      Array.fill(1200)(0)
    assert(Dtmf.decode(s) == "1")
    assert(Dtmf.decode(Array.fill(4000)(0)) == "")
  }

  test("decode: a single tone (no column partner) is rejected, not guessed") {
    val onlyRow = Array.tabulate(2000)(i =>
      (5000 * math.sin(2 * math.Pi * 697.0 * i / 8000.0)).toInt)
    assert(Dtmf.decode(Array.fill(600)(0) ++ onlyRow) == "")
  }

  test("decode survives additive noise well under the tone level") {
    val gap = Array.fill(1200)(0)
    val nine = tonePair(852.0, 1477.0, 1600)
      .zipWithIndex.map { case (v, i) => v + (i * 31 % 201) - 100 }
    assert(Dtmf.decode(gap ++ nine ++ gap) == "9")
  }

  test("decode: 45 ms burst needs minFrames=2 (50% hop floor), not default 3") {
    // 360 samples @ 8 kHz = 45 ms: frames at offsets 0 and 102 are fully
    // contained (307 ≤ 360), a third is not — so the Q.24-edge burst
    // decodes at minFrames=2 and is (documentedly) dropped at the default.
    val burst = tonePair(941.0, 1336.0, 360)
    assert(Dtmf.decode(burst, minFrames = 2) == "0")
    assert(Dtmf.decode(burst) == "")
  }

  test("dtmfDigits: full 16-key pad through the WAV container") {
    val all = "123A456B789C*0#D"
    assert(Dtmf.dtmfDigits(MediaFixture.dtmfWav(all)).contains(all))
    assert(Dtmf.dtmfDigits(Array[Byte](1, 2, 3)).isEmpty)
  }
}
