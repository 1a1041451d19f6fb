package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the quiet-baseline parser against BOTH serialization styles and —
  * critically — against the COMMITTED BENCH_QUIET.json. Round 6's parser
  * regex rejected the committed pretty-printed file (`"q_x": 0.8` with a
  * space after the colon), silently parsed 0 entries, and made the
  * outlier re-probe dead code while the artifact reported n_reprobed:0
  * as if no outliers existed. This suite makes that failure impossible
  * to reintroduce without a red test.
  */
class BenchSpec extends AnyFunSuite {

  test("parses compact style") {
    val m = Bench.parseQuietBaseline("""{"queries":{"q_a":0.5,"q_b":1.25,"q_c":3}}""")
    assert(m === Map("q_a" -> 0.5, "q_b" -> 1.25, "q_c" -> 3.0))
  }

  test("parses pretty-printed style (space after colon)") {
    val m = Bench.parseQuietBaseline(
      """{
        |  "queries": {
        |    "q_a": 0.5,
        |    "q_b": 1.25
        |  }
        |}""".stripMargin)
    assert(m === Map("q_a" -> 0.5, "q_b" -> 1.25))
  }

  test("first occurrence wins (min map precedes medians in BENCH_DETAIL shape)") {
    val m = Bench.parseQuietBaseline(
      """{"queries":{"q_a":0.5},"queries_median":{"q_a":0.9}}""")
    assert(m === Map("q_a" -> 0.5))
  }

  test("round-trips the COMMITTED BENCH_QUIET.json with every pin present") {
    val p = java.nio.file.Paths.get("BENCH_QUIET.json")
    assume(java.nio.file.Files.exists(p), "BENCH_QUIET.json not committed")
    val txt = java.nio.file.Files.readString(p)
    val m = Bench.parseQuietBaseline(txt)
    // the committed record carries the full suite (139 pins as of round 6;
    // only grows as queries are added)
    assert(m.size >= 139, s"parsed only ${m.size} pins from the committed file")
    assert(m.values.forall(v => v > 0 && v < 600), "pin values out of sane range")
    assert(m.keys.forall(_.startsWith("q")), "non-query key parsed as a pin")
  }
}
